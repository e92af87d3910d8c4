package graft.catalog

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

/** Native reader of APACHE ICEBERG table metadata — the real format the
  * reference's users hold (`CatalogMigrator.java:212-213` registers a
  * genuine Iceberg `metadataFileLocation`; the reference rides
  * `iceberg-spark-runtime`, `gradle/libs.versions.toml:46`). Everything
  * here is implemented from the PUBLIC Iceberg table spec
  * (iceberg.apache.org/spec): the v1/v2 `metadata.json` document, the
  * avro manifest list, avro manifest files, and Appendix D's
  * single-value binary serialization for column bounds. No Iceberg
  * jars are involved — the avro jars ship with Spark.
  *
  * The design move: an Iceberg snapshot is CONVERTED into this engine's
  * own [[CatalogIO.TableLayout]] — file manifest (paths + sizes from
  * `file_size_in_bytes`), schema (Iceberg schema JSON → Spark DDL), and
  * per-file pruning stats (`lower_bounds`/`upper_bounds`/
  * `null_value_counts` → [[FileStats]] text) — so every existing scan
  * face works unchanged on a genuine Iceberg table: manifest-planned
  * file index (zero listing calls), stats-pruned DSv2 scans, SQL reads
  * through the catalog, and migration (`registerTable` copies the
  * pointer; reads resolve it here). Read-only: version commits against
  * an Iceberg-format location refuse with the existing no-local-history
  * error.
  *
  * Scope honestly held (refused loudly, never guessed):
  *  - live DELETE manifests (v2 merge-on-read) — a scan that ignored
  *    them would resurrect rows;
  *  - data files outside the table's `location` prefix (no common
  *    root to relativize against);
  *  - `timestamp_ns` / `time` / `uuid` / `unknown` column types (no
  *    exact catalyst mapping).
  * Identity-partition columns need no partition-dir parsing: Iceberg
  * data files materialize partition source columns as ordinary columns,
  * so the layout reads them as an unpartitioned table — correct rows,
  * with file-level pruning carried by the converted bounds instead of
  * directory pruning. */
object IcebergFormat {

  /** Cheap structural sniff: Iceberg TableMetadata carries
    * `format-version`; this engine's format never does (and always has
    * `dataLocation`). */
  def isIcebergMetadata(text: String): Boolean =
    text.contains("\"format-version\"") && !text.contains("\"dataLocation\"")

  /** Parse a real Iceberg metadata.json (+ its avro manifests) into a
    * scannable [[CatalogIO.TableLayout]]. `snapshotId` selects a
    * historical snapshot from the metadata's snapshot list (Iceberg
    * time travel — every metadata.json carries the full retained
    * history); None reads the current one. */
  def toTableLayout(text: String, metadataLocation: String,
      conf: Configuration,
      snapshotId: Option[Long] = None): CatalogIO.TableLayout = {
    val root = new ObjectMapper().readTree(text)
    val fv = root.path("format-version").asInt(-1)
    if (fv != 1 && fv != 2)
      throw new UnsupportedOperationException(
        s"Iceberg metadata $metadataLocation has format-version $fv; " +
          "this reader implements the public v1/v2 spec")
    val location = Option(root.get("location")).map(_.asText).getOrElse(
      throw new IllegalStateException(
        s"Iceberg metadata $metadataLocation has no location"))
    val schema = currentSchema(root, metadataLocation)
    val sparkSchema = schemaToSpark(schema, metadataLocation)
    // name → (field id, type) ONCE — statsText runs per data file, and
    // a per-file scan of the field list would be O(files × cols²)
    val fieldsByName: Map[String, (Int, JsonNode)] =
      fieldIdsOf(schema).map { case (id, (n, t)) => n -> (id, t) }
    val props = Option(root.get("properties")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty)
    val curId = snapshotId.getOrElse(root.path("current-snapshot-id").asLong(-1L))
    val base = CatalogIO.TableLayout(
      dataLocation = location,
      schemaDdl = Some(sparkSchema.toDDL),
      dataFiles = Some(Nil),
      dataFileSizes = Some(Nil),
      dataFileStats = Some(Nil),
      properties = props)
    if (curId == -1L) return base // no snapshot yet: a committed empty table
    val snapshot = Option(root.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .find(_.path("snapshot-id").asLong(-2L) == curId)
      .getOrElse(throw new IllegalStateException(
        s"Iceberg metadata $metadataLocation: " +
          snapshotId.fold("current-snapshot-id")(_ => "requested snapshot-id") +
          s" $curId not in snapshots"))
    // v2 (and modern v1) points at a manifest LIST; early v1 snapshots
    // may inline the manifest paths instead
    val manifestPaths: Seq[(String, Int)] = Option(snapshot.get("manifest-list")) match {
      case Some(ml) =>
        readAvroRecords(new Path(ml.asText), conf).map { r =>
          (r.get("manifest_path").toString,
            opt(r, "content").map(_.asInstanceOf[Int]).getOrElse(0))
        }
      case None =>
        Option(snapshot.get("manifests")).toSeq
          .flatMap(_.elements().asScala).map(m => (m.asText, 0))
    }
    manifestPaths.filter(_._2 == 1).foreach { case (p, _) =>
      // content=1 = a DELETE manifest. Opening it to check for live
      // entries would not help: any live positional/equality delete
      // changes row visibility this read path does not apply.
      val live = readAvroRecords(new Path(p), conf)
        .exists(r => r.get("status").asInstanceOf[Int] != 2)
      if (live)
        throw new UnsupportedOperationException(
          s"Iceberg table at $metadataLocation carries live row-level " +
            "delete files (v2 merge-on-read); this reader serves " +
            "append/overwrite tables only — compact the table (rewrite " +
            "data files) to materialize deletes before registering it")
    }
    // one avro read per manifest, in parallel — a 10⁶-file table carries
    // hundreds of manifests and the driver should not walk them serially
    // (same shape as the chunked-manifest reader in CatalogIO)
    val parEntries = {
      import scala.collection.parallel.CollectionConverters._
      manifestPaths.filter(_._2 == 0).par
    }
    val entries = parEntries.flatMap { case (mp, _) =>
      readAvroRecords(new Path(mp), conf).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED entry: not part of this snapshot
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          // v2 data_file.content: 0=data, 1/2=delete files (those live
          // in content=1 manifests, but be defensive)
          val content = opt(df, "content")
            .map(_.asInstanceOf[Int]).getOrElse(0)
          if (content != 0)
            throw new UnsupportedOperationException(
              s"Iceberg manifest $mp lists a delete file inside a data " +
                "manifest; this reader serves append/overwrite tables only")
          val format = df.get("file_format").toString
          if (!format.equalsIgnoreCase("parquet"))
            throw new UnsupportedOperationException(
              s"Iceberg data file format $format is not supported " +
                "(parquet only)")
          Some((df.get("file_path").toString,
            df.get("file_size_in_bytes").asInstanceOf[Long],
            statsText(df, fieldsByName, sparkSchema)))
        }
      }
    }
    val prefix = location.stripSuffix("/") + "/"
    val rels = entries.seq.map { case (p, size, stats) =>
      if (!p.startsWith(prefix))
        throw new UnsupportedOperationException(
          s"Iceberg data file $p lies outside the table location " +
            s"$location; relocated-file layouts are not supported")
      (p.stripPrefix(prefix), size, stats)
    }.toVector
    base.copy(
      dataFiles = Some(rels.map(_._1)),
      dataFileSizes = Some(rels.map(_._2)),
      dataFileStats = Some(rels.map(_._3)))
  }


  /** Schema-checked optional field read: GenericData.Record.get(name)
    * THROWS on a field absent from the writer schema (a real v1
    * manifest has no `content`, no bounds) — absent must mean None. */
  private def opt(r: GenericRecord, field: String): Option[Any] =
    if (r.getSchema.getField(field) == null) None else Option(r.get(field))

  // ----- schema conversion ------------------------------------------

  private def currentSchema(root: JsonNode, where: String): JsonNode =
    Option(root.get("schemas")) match {
      case Some(schemas) =>
        val cur = root.path("current-schema-id").asInt(0)
        schemas.elements().asScala
          .find(_.path("schema-id").asInt(-1) == cur)
          .getOrElse(throw new IllegalStateException(
            s"Iceberg metadata $where: current-schema-id $cur not in schemas"))
      case None => Option(root.get("schema")).getOrElse(
        throw new IllegalStateException(s"Iceberg metadata $where has no schema"))
    }

  /** Iceberg type JSON → catalyst type (public spec §Schemas). Types
    * with no exact catalyst mapping REFUSE — a lossy read would change
    * query answers silently. */
  private def typeToSpark(t: JsonNode, where: String): DataType =
    if (t.isTextual) {
      val s = t.asText
      val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      val FixedRe = """fixed\[\s*(\d+)\s*\]""".r
      s match {
        case "boolean" => BooleanType
        case "int" => IntegerType
        case "long" => LongType
        case "float" => FloatType
        case "double" => DoubleType
        case "date" => DateType
        case "string" => StringType
        case "binary" => BinaryType
        case "timestamp" => TimestampNTZType
        case "timestamptz" => TimestampType
        case DecimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
        case FixedRe(_) => BinaryType
        case other =>
          throw new UnsupportedOperationException(
            s"Iceberg type '$other' in $where has no exact catalyst " +
              "mapping (time/uuid/timestamp_ns/unknown are not served)")
      }
    } else t.path("type").asText match {
      case "struct" => structToSpark(t, where)
      case "list" =>
        ArrayType(typeToSpark(t.get("element"), where),
          containsNull = !t.path("element-required").asBoolean(false))
      case "map" =>
        MapType(typeToSpark(t.get("key"), where),
          typeToSpark(t.get("value"), where),
          valueContainsNull = !t.path("value-required").asBoolean(false))
      case other =>
        throw new UnsupportedOperationException(
          s"Iceberg nested type '$other' in $where is not supported")
    }

  private def structToSpark(t: JsonNode, where: String): StructType =
    StructType(t.get("fields").elements().asScala.map { f =>
      StructField(f.get("name").asText, typeToSpark(f.get("type"), where),
        nullable = !f.path("required").asBoolean(false))
    }.toSeq)

  private def schemaToSpark(schema: JsonNode, where: String): StructType =
    structToSpark(schema, where)

  /** Top-level field id → (name, type node) — bounds and null counts in
    * manifests are keyed by field id. Nested ids are not mapped: the
    * engine's stats prune on top-level columns only. */
  private def fieldIdsOf(schema: JsonNode): Map[Int, (String, JsonNode)] =
    schema.get("fields").elements().asScala.map { f =>
      f.get("id").asInt -> (f.get("name").asText, f.get("type"))
    }.toMap

  // ----- manifest stats → FileStats ---------------------------------

  /** Convert one data_file record's bounds/null-counts into the
    * engine's [[FileStats]] text, so Iceberg files prune through the
    * same [[graft.sources.StatsPruning]] path as native tables. Bounds
    * use Iceberg's single-value binary serialization (spec Appendix D).
    * Anything unconvertible degrades to "no bound" — never a wrong
    * bound. Float/double bounds are dropped when the file has (or may
    * have) NaNs: Iceberg excludes NaN from bounds, and a NaN-blind
    * envelope must not prune. */
  private def statsText(df: GenericRecord,
      fields: Map[String, (Int, JsonNode)], schema: StructType): String = {
    val rowCount = df.get("record_count").asInstanceOf[Long]
    def idMap(field: String): Map[Int, Array[Byte]] =
      opt(df, field).map(avroMap(_).map { case (k, v) =>
        k -> bytesOf(v)
      }).getOrElse(Map.empty)
    def idLongs(field: String): Map[Int, Long] =
      opt(df, field).map(avroMap(_).map { case (k, v) =>
        k -> v.asInstanceOf[Long]
      }).getOrElse(Map.empty)
    val lower = idMap("lower_bounds")
    val upper = idMap("upper_bounds")
    val nulls = idLongs("null_value_counts")
    val nans = opt(df, "nan_value_counts").map(avroMap(_).map {
      case (k, v) => k -> v.asInstanceOf[Long]
    }).getOrElse(Map.empty)
    val cols = schema.fields.toSeq.flatMap { sf =>
      fields.get(sf.name).map { case (id, tnode) =>
        val floaty = sf.dataType == FloatType || sf.dataType == DoubleType
        // NaN-safety: absent nan count on a float column = unknowable
        val nanSafe = !floaty || nans.get(id).contains(0L)
        def dec(b: Option[Array[Byte]]): Option[String] =
          if (!nanSafe) None
          else b.flatMap(decodeBound(tnode, sf.dataType, _))
        (sf.name, sf.dataType, dec(lower.get(id)), dec(upper.get(id)),
          nulls.get(id))
      }
    }
    FileStats.encodeExternal(rowCount, cols)
  }

  private def avroMap(v: Any): Map[Int, Any] = v match {
    // manifests encode these maps as arrays of {key, value} records
    // (spec: k121/v122 style pairs); java.util.Map also appears when a
    // writer uses avro map encoding
    case l: java.util.Collection[_] =>
      l.asScala.map { e =>
        val r = e.asInstanceOf[GenericRecord]
        r.get("key").asInstanceOf[Int] -> r.get("value")
      }.toMap
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v2) =>
        k.asInstanceOf[Number].intValue() -> (v2: Any)
      }.toMap
    case null => Map.empty
  }

  private def bytesOf(v: Any): Array[Byte] = v match {
    case b: java.nio.ByteBuffer =>
      val d = new Array[Byte](b.remaining()); b.duplicate().get(d); d
    case a: Array[Byte] => a
    case f: org.apache.avro.generic.GenericFixed => f.bytes()
  }

  /** Iceberg single-value serialization (spec Appendix D) → the textual
    * bound form [[FileStats]] stores. Little-endian for numerics,
    * UTF-8 for strings, big-endian unscaled bytes for decimals. */
  private[catalog] def decodeBound(tnode: JsonNode, spark: DataType,
      bytes: Array[Byte]): Option[String] = {
    def le = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val t = if (tnode.isTextual) tnode.asText else tnode.path("type").asText
    try (t, spark) match {
      case ("int", IntegerType) if bytes.length == 4 =>
        Some(le.getInt.toString)
      case ("long", LongType) if bytes.length == 8 =>
        Some(le.getLong.toString)
      case ("date", DateType) if bytes.length == 4 =>
        Some(le.getInt.toString)
      case ("timestamp", TimestampNTZType) if bytes.length == 8 =>
        Some(le.getLong.toString)
      case ("timestamptz", TimestampType) if bytes.length == 8 =>
        Some(le.getLong.toString)
      case ("float", FloatType) if bytes.length == 4 =>
        val f = le.getFloat
        if (f.isNaN) None else Some(f.toString)
      case ("double", DoubleType) if bytes.length == 8 =>
        val d = le.getDouble
        if (d.isNaN) None else Some(d.toString)
      case ("boolean", BooleanType) if bytes.length == 1 =>
        Some((bytes(0) != 0).toString)
      case ("string", StringType) =>
        val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        if (s.length > FileStats.MaxStringBound) None else Some(s)
      case (_, dt: DecimalType) if t.startsWith("decimal") =>
        Some(new java.math.BigDecimal(
          new java.math.BigInteger(bytes), dt.scale).toPlainString)
      case _ => None // binary/fixed/mismatched: no textual bound
    } catch { case _: RuntimeException => None }
  }

  // ----- avro -------------------------------------------------------

  private def readAvroRecords(p: Path, conf: Configuration): Vector[GenericRecord] = {
    val reader = DataFileReader.openReader(new FsInput(p, conf),
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Vector.newBuilder[GenericRecord]
      while (reader.hasNext) out += reader.next()
      out.result()
    } finally reader.close()
  }
}
