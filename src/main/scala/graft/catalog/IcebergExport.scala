package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Writer of a REAL Apache Iceberg v2 table (public spec:
  * iceberg.apache.org/spec) — the interop counterpart of
  * [[IcebergFormat]]: parquet data + an avro manifest + an avro
  * manifest list + `v1.metadata.json`, all per the published format, so
  * the exported directory is registrable by any Iceberg catalog (and by
  * this engine's own reader, which the specs and the w-gate
  * round-trip through).
  *
  * Bounds: one Spark pass computes per-file row counts and min/max for
  * every bound-supported column (`groupBy(input_file_name())` — O(data)
  * once, never per-file jobs), serialized per spec Appendix D
  * (little-endian numerics, UTF-8 strings, big-endian unscaled
  * decimals). Since Spark's parquet writer records no Iceberg field
  * ids, the metadata carries `schema.name-mapping.default` — the spec's
  * published mechanism for id-less files (Iceberg readers resolve
  * columns by name through it; this engine's reader is name-addressed
  * anyway). */
object IcebergExport {

  /** Write `df` as an Iceberg v2 table under `tableDir` (created; must
    * not exist). Returns the metadata.json location. */
  def writeTable(spark: SparkSession, df: DataFrame, tableDir: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(tableDir)
    val fs = root.getFileSystem(conf)
    require(!fs.exists(root), s"Iceberg export target $tableDir already exists")
    val location = fs.makeQualified(root).toString
    val dataDir = new Path(root, "data")
    df.write.parquet(dataDir.toString)

    val schema = df.schema
    // field ids 1..n in schema order — the ids the manifests key
    // bounds by and the name mapping publishes
    val fieldIds = schema.fields.zipWithIndex.map { case (f, i) => (f, i + 1) }

    // ---- one-pass per-file stats ----
    import org.apache.spark.sql.functions._
    val boundCols = fieldIds.filter { case (f, _) => boundSupported(f.dataType) }
    val aggs = count(lit(1)).as("_cnt") +:
      boundCols.flatMap { case (f, id) =>
        Seq(min(col(f.name)).as(s"_mn$id"), max(col(f.name)).as(s"_mx$id"),
          sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"_nu$id")) ++
          (f.dataType match {
            case FloatType | DoubleType =>
              Seq(sum(when(isnan(col(f.name)), 1L).otherwise(0L)).as(s"_na$id"))
            case _ => Nil
          })
      }.toSeq
    val perFile = spark.read.schema(schema).parquet(dataDir.toString)
      .groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()

    val files = CatalogIO.listDataFiles(fs, dataDir)
    // compare by URI PATH: input_file_name renders file:///p while
    // hadoop's makeQualified renders file:/p — same file, two spellings
    val dataPathPrefix = fs.makeQualified(dataDir).toUri.getPath
    val statsByRel = perFile.map { r =>
      val abs = r.getAs[String]("_file")
      val rel = java.net.URI.create(abs).getPath
        .stripPrefix(dataPathPrefix).stripPrefix("/")
      rel -> r
    }.toMap

    val snapshotId = math.abs(java.util.UUID.randomUUID()
      .getLeastSignificantBits)
    val metaDir = new Path(root, "metadata")
    fs.mkdirs(metaDir)

    // ---- manifest (one, listing every data file) ----
    val manifestPath = new Path(metaDir,
      s"m0-${java.util.UUID.randomUUID()}.avro")
    val mSchema = new Schema.Parser().parse(manifestSchemaJson)
    val dfSchema = mSchema.getField("data_file").schema()
    val kvBytes = dfSchema.getField("lower_bounds").schema()
      .getTypes.get(1).getElementType
    val kvLong = dfSchema.getField("null_value_counts").schema()
      .getTypes.get(1).getElementType
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](mSchema))
    writer.create(mSchema, fs.create(manifestPath, false))
    try files.foreach { rel =>
      val row = statsByRel.getOrElse(rel, throw new IllegalStateException(
        s"no stats row for exported file $rel"))
      val st = fs.getFileStatus(new Path(dataDir, rel))
      val d = new GenericData.Record(dfSchema)
      d.put("content", 0)
      d.put("file_path", s"$location/data/$rel")
      d.put("file_format", "PARQUET")
      d.put("record_count", row.getAs[Long]("_cnt"))
      d.put("file_size_in_bytes", st.getLen)
      def kvRecs(schema: Schema, vals: Seq[(Int, Any)]): GenericData.Array[GenericRecord] = {
        val arr = new GenericData.Array[GenericRecord](vals.size,
          Schema.createArray(schema))
        vals.foreach { case (k, v) =>
          val r = new GenericData.Record(schema)
          r.put("key", k); r.put("value", v); arr.add(r)
        }
        arr
      }
      val lowers = boundCols.flatMap { case (f, id) =>
        Option(row.getAs[Any](s"_mn$id"))
          .flatMap(serializeBound(f.dataType, _))
          .map(b => id -> (java.nio.ByteBuffer.wrap(b): Any))
      }.toSeq
      val uppers = boundCols.flatMap { case (f, id) =>
        Option(row.getAs[Any](s"_mx$id"))
          .flatMap(serializeBound(f.dataType, _))
          .map(b => id -> (java.nio.ByteBuffer.wrap(b): Any))
      }.toSeq
      val nulls = boundCols.map { case (_, id) =>
        id -> (row.getAs[Long](s"_nu$id"): Any)
      }.toSeq
      val nans = boundCols.collect { case (f, id)
          if f.dataType == FloatType || f.dataType == DoubleType =>
        id -> (row.getAs[Long](s"_na$id"): Any)
      }.toSeq
      d.put("lower_bounds", kvRecs(kvBytes, lowers))
      d.put("upper_bounds", kvRecs(kvBytes, uppers))
      d.put("null_value_counts", kvRecs(kvLong, nulls))
      d.put("nan_value_counts", kvRecs(kvLong, nans))
      val e = new GenericData.Record(mSchema)
      e.put("status", 1) // ADDED in this snapshot
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", 1L)
      e.put("file_sequence_number", 1L)
      e.put("data_file", d)
      writer.append(e)
    } finally writer.close()
    val manifestLen = fs.getFileStatus(manifestPath).getLen

    // ---- manifest list ----
    val listPath = new Path(metaDir, s"snap-$snapshotId-1.avro")
    val lSchema = new Schema.Parser().parse(manifestListSchemaJson)
    val lw = new DataFileWriter(new GenericDatumWriter[GenericRecord](lSchema))
    lw.create(lSchema, fs.create(listPath, false))
    try {
      val m = new GenericData.Record(lSchema)
      m.put("manifest_path", fs.makeQualified(manifestPath).toString)
      m.put("manifest_length", manifestLen)
      m.put("partition_spec_id", 0)
      m.put("content", 0)
      m.put("sequence_number", 1L)
      m.put("min_sequence_number", 1L)
      m.put("added_snapshot_id", snapshotId)
      m.put("added_files_count", files.size)
      m.put("existing_files_count", 0)
      m.put("deleted_files_count", 0)
      m.put("added_rows_count", perFile.map(_.getAs[Long]("_cnt")).sum)
      m.put("existing_rows_count", 0L)
      m.put("deleted_rows_count", 0L)
      lw.append(m)
    } finally lw.close()

    // ---- metadata.json ----
    val metaPath = new Path(metaDir, "v1.metadata.json")
    val out = fs.create(metaPath, false)
    try out.write(metadataJson(location, schema, fieldIds.toSeq, snapshotId,
      fs.makeQualified(listPath).toString)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.makeQualified(metaPath).toString
  }

  private def boundSupported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         DateType | TimestampType | TimestampNTZType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Spec Appendix D single-value serialization of a Spark EXTERNAL
    * value (what Row.getAs returns). */
  private[catalog] def serializeBound(dt: DataType, v: Any): Option[Array[Byte]] = {
    def le(n: Int) = java.nio.ByteBuffer.allocate(n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (dt, v) match {
      case (LongType, l: Long) => Some(le(8).putLong(l).array())
      case (IntegerType, i: Int) => Some(le(4).putInt(i).array())
      case (DoubleType, d: Double) =>
        if (d.isNaN) None else Some(le(8).putDouble(d).array())
      case (FloatType, f: Float) =>
        if (f.isNaN) None else Some(le(4).putFloat(f).array())
      case (BooleanType, b: Boolean) =>
        Some(Array[Byte](if (b) 1 else 0))
      case (StringType, s: String) =>
        Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (DateType, d: java.sql.Date) =>
        Some(le(4).putInt(d.toLocalDate.toEpochDay.toInt).array())
      case (DateType, d: java.time.LocalDate) =>
        Some(le(4).putInt(d.toEpochDay.toInt).array())
      case (TimestampType, t: java.sql.Timestamp) =>
        Some(le(8).putLong(t.getTime * 1000L + t.getNanos / 1000 % 1000).array())
      case (TimestampType, t: java.time.Instant) =>
        Some(le(8).putLong(t.getEpochSecond * 1000000L + t.getNano / 1000).array())
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        Some(le(8).putLong(
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            t.getNano / 1000).array())
      case (dt: DecimalType, d: java.math.BigDecimal) =>
        Some(d.setScale(dt.scale).unscaledValue().toByteArray)
      case _ => None
    }
  }

  private def icebergTypeName(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date"
    case StringType => "string"
    case BinaryType => "binary"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new UnsupportedOperationException(
      s"Iceberg export does not map catalyst type ${other.catalogString}")
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def metadataJson(location: String, schema: StructType,
      fieldIds: Seq[(StructField, Int)], snapshotId: Long,
      manifestList: String): String = {
    val fields = fieldIds.map { case (f, id) =>
      s"""{"id": $id, "name": "${esc(f.name)}", "required": ${!f.nullable}, """ +
        s""""type": "${icebergTypeName(f.dataType)}"}"""
    }.mkString(", ")
    // the property VALUE is itself a JSON document → escaped as a string
    val mapping = esc(fieldIds.map { case (f, id) =>
      s"""{"field-id": $id, "names": ["${esc(f.name)}"]}"""
    }.mkString("[", ", ", "]"))
    s"""{
       |  "format-version": 2,
       |  "table-uuid": "${java.util.UUID.randomUUID()}",
       |  "location": "${esc(location)}",
       |  "last-sequence-number": 1,
       |  "last-updated-ms": ${System.currentTimeMillis()},
       |  "last-column-id": ${fieldIds.size},
       |  "current-schema-id": 0,
       |  "schemas": [{"type": "struct", "schema-id": 0, "fields": [$fields]}],
       |  "default-spec-id": 0,
       |  "partition-specs": [{"spec-id": 0, "fields": []}],
       |  "last-partition-id": 999,
       |  "default-sort-order-id": 0,
       |  "sort-orders": [{"order-id": 0, "fields": []}],
       |  "properties": {"schema.name-mapping.default": "$mapping"},
       |  "current-snapshot-id": $snapshotId,
       |  "refs": {"main": {"snapshot-id": $snapshotId, "type": "branch"}},
       |  "snapshots": [{
       |    "sequence-number": 1,
       |    "snapshot-id": $snapshotId,
       |    "timestamp-ms": ${System.currentTimeMillis()},
       |    "summary": {"operation": "append"},
       |    "manifest-list": "${esc(manifestList)}",
       |    "schema-id": 0
       |  }],
       |  "snapshot-log": [],
       |  "metadata-log": []
       |}
       |""".stripMargin
  }

  // Avro schemas per the public spec's manifest-file / manifest-list
  // field ids and names (spec §Manifests, §Snapshots). Optional fields
  // this writer does not populate are omitted — avro readers resolve by
  // name, and [[IcebergFormat]] (like Iceberg's own readers) treats
  // absent optional fields as unknown.
  private val kvBytesSchema =
    """{"type": "record", "name": "k_v_bytes", "fields": [
      |  {"name": "key", "type": "int", "field-id": 117},
      |  {"name": "value", "type": "bytes", "field-id": 118}]}""".stripMargin

  private val kvLongSchema =
    """{"type": "record", "name": "k_v_long", "fields": [
      |  {"name": "key", "type": "int", "field-id": 119},
      |  {"name": "value", "type": "long", "field-id": 120}]}""".stripMargin

  private val manifestSchemaJson =
    s"""{"type": "record", "name": "manifest_entry", "fields": [
       |  {"name": "status", "type": "int", "field-id": 0},
       |  {"name": "snapshot_id", "type": ["null", "long"], "default": null, "field-id": 1},
       |  {"name": "sequence_number", "type": ["null", "long"], "default": null, "field-id": 3},
       |  {"name": "file_sequence_number", "type": ["null", "long"], "default": null, "field-id": 4},
       |  {"name": "data_file", "field-id": 2, "type": {
       |    "type": "record", "name": "r2", "fields": [
       |      {"name": "content", "type": "int", "field-id": 134},
       |      {"name": "file_path", "type": "string", "field-id": 100},
       |      {"name": "file_format", "type": "string", "field-id": 101},
       |      {"name": "record_count", "type": "long", "field-id": 103},
       |      {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
       |      {"name": "null_value_counts", "type": ["null", {"type": "array", "items": $kvLongSchema}], "default": null, "field-id": 110},
       |      {"name": "nan_value_counts", "type": ["null", {"type": "array", "items": {"type": "record", "name": "k_v_long2", "fields": [{"name": "key", "type": "int", "field-id": 138}, {"name": "value", "type": "long", "field-id": 139}]}}], "default": null, "field-id": 137},
       |      {"name": "lower_bounds", "type": ["null", {"type": "array", "items": $kvBytesSchema}], "default": null, "field-id": 125},
       |      {"name": "upper_bounds", "type": ["null", {"type": "array", "items": {"type": "record", "name": "k_v_bytes2", "fields": [{"name": "key", "type": "int", "field-id": 129}, {"name": "value", "type": "bytes", "field-id": 130}]}}], "default": null, "field-id": 128}
       |    ]}}
       |]}""".stripMargin

  private val manifestListSchemaJson =
    """{"type": "record", "name": "manifest_file", "fields": [
      |  {"name": "manifest_path", "type": "string", "field-id": 500},
      |  {"name": "manifest_length", "type": "long", "field-id": 501},
      |  {"name": "partition_spec_id", "type": "int", "field-id": 502},
      |  {"name": "content", "type": "int", "field-id": 517},
      |  {"name": "sequence_number", "type": "long", "field-id": 515},
      |  {"name": "min_sequence_number", "type": "long", "field-id": 516},
      |  {"name": "added_snapshot_id", "type": "long", "field-id": 503},
      |  {"name": "added_files_count", "type": "int", "field-id": 504},
      |  {"name": "existing_files_count", "type": "int", "field-id": 505},
      |  {"name": "deleted_files_count", "type": "int", "field-id": 506},
      |  {"name": "added_rows_count", "type": "long", "field-id": 512},
      |  {"name": "existing_rows_count", "type": "long", "field-id": 513},
      |  {"name": "deleted_rows_count", "type": "long", "field-id": 514}
      |]}""".stripMargin
}
