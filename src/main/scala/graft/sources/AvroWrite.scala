package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Native Avro object-container WRITER for Iceberg exports (round 15)
  * — the counterpart of [[AvroRead]], needed because no spark-avro
  * module exists in this environment (`df.write.format("avro")` is not
  * an option). One distributed pass writes one avro file per non-empty
  * partition AND computes the manifest stats (record counts, per-field
  * lower/upper bounds, null/NaN counts) task-side in the same stream —
  * at export scale that halves the I/O the parquet/orc paths pay
  * (write, then a stats read-back scan).
  *
  * The avro schema follows Iceberg's avro spec mapping (field-ids as
  * `field-id` attributes, date = int/`date`, timestamptz =
  * long/`timestamp-micros` with `adjust-to-utc`, timestamp =
  * long/`local-timestamp-micros`, decimal = minimal fixed with the
  * `decimal` logical type), so the files read back through real
  * Iceberg readers as well as [[AvroRead]]. Round 16: NESTED types
  * write too — struct → record, list → array (`element-id`), map →
  * avro map for string keys / the spec's array-of-k/v-records
  * otherwise (`key-id`/`value-id`) — with member ids from the same
  * [[graft.catalog.IcebergSchemaIds]] tree the metadata schema
  * declares. Manifest bounds stay primitive-top-level (nested columns
  * record counts only, like real writers' default). */
object AvroWrite {

  /** Per-file write result: everything the manifest entry needs, keyed
    * by the Iceberg field id. Bound values are Spark EXTERNAL types
    * (what `IcebergExport.serializeBound` consumes). */
  final case class FileResult(name: String, size: Long, count: Long,
      lowers: Map[Int, Any], uppers: Map[Int, Any],
      nulls: Map[Int, Long], nans: Map[Int, Long])

  /** Write `df` under `dir` as `part-<p>-<uuid>.avro` files (one per
    * non-empty partition) and return the per-file manifest stats.
    * `tree` (round 16, avro APPENDS): the loaded table's own id tree —
    * a re-derived tree would re-bind nested member ids away from the
    * verbatim foreign ids the table's existing files carry. */
  def write(df: DataFrame, dir: Path, fieldIds: Seq[(StructField, Int)],
      conf: SerializableConfiguration,
      tree: Option[graft.catalog.IcebergSchemaIds.Tree] = None): Seq[FileResult] = {
    val schemaJson = avroSchemaJson(fieldIds, tree)
    val fields = fieldIds.toIndexedSeq
    val dirStr = {
      val fs = dir.getFileSystem(conf.value)
      fs.mkdirs(dir)
      fs.makeQualified(dir).toString
    }
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val avroSchema = new AvroSchema.Parser().parse(schemaJson)
        // DETERMINISTIC final name, written via an attempt-unique temp +
        // rename: a retried/speculated task can never orphan a sibling
        // file (the manifest writer lists the data dir, so an orphan
        // would DUPLICATE the partition), and two live attempts can
        // never interleave bytes in one stream — the rename loser just
        // discards its temp (review round 15: create-with-overwrite
        // would let a zombie attempt truncate the winner's completed
        // file AFTER its stats were reported)
        val name = f"part-$pid%05d.avro"
        val path = new Path(dirStr, name)
        val tmp = new Path(dirStr,
          s".tmp-$name-${java.util.UUID.randomUUID().toString.take(8)}")
        val fs = path.getFileSystem(conf.value)
        val writers = fields.zipWithIndex.map { case ((f, _), i) =>
          valueWriter(f.dataType, avroSchema.getFields.get(i).schema())
        }
        val trackers = fields.map { case (f, _) => ColTracker(f.dataType) }
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
        var count = 0L
        try {
          w.create(avroSchema, fs.create(tmp, false))
          while (rows.hasNext) {
            val row: InternalRow = rows.next()
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < fields.length) {
              if (row.isNullAt(i)) trackers(i).nulls += 1
              else {
                val v = row.get(i, fields(i)._1.dataType)
                rec.put(i, writers(i)(v))
                trackers(i).update(v)
              }
              i += 1
            }
            w.append(rec)
            count += 1
          }
        } finally w.close()
        // rename into place; a loser (the final file already exists from
        // another attempt of THIS partition — logically identical rows)
        // discards its temp and reports the winner's file. POSIX/
        // RawLocalFileSystem rename REPLACES an existing destination
        // (advisor r15 #3: a zombie attempt could overwrite the winner
        // AFTER its stats were reported), so losers are detected by an
        // exists-check FIRST, and a won rename re-stats the destination
        // and refuses on a size mismatch — an undersized manifest
        // length would make sync-split reads silently drop trailing
        // rows, which is corruption, not a race to tolerate
        val tmpLen = fs.getFileStatus(tmp).getLen
        val won =
          if (fs.exists(path)) { fs.delete(tmp, false); false }
          else if (fs.rename(tmp, path)) true
          else {
            fs.delete(tmp, false)
            if (!fs.exists(path))
              throw new java.io.IOException(
                s"could not commit avro part file $path (rename failed and " +
                  "no prior attempt's file exists)")
            false
          }
        val size = fs.getFileStatus(path).getLen
        if (won && size != tmpLen)
          throw new java.io.IOException(
            s"avro part file $path changed size after commit " +
              s"($tmpLen -> $size bytes): a concurrent attempt overwrote " +
              "the committed file with different bytes — the upstream is " +
              "non-deterministic; refusing to record a manifest length " +
              "that disagrees with the data")
        val lowers = fields.zip(trackers).collect {
          case ((f, id), t) if t.min != null => id -> external(f.dataType, t.min)
        }.toMap
        val uppers = fields.zip(trackers).collect {
          case ((f, id), t) if t.max != null => id -> external(f.dataType, t.max)
        }.toMap
        val nulls = fields.zip(trackers).collect {
          case ((f, id), t) if t.tracksBounds => id -> t.nulls
        }.toMap
        val nans = fields.zip(trackers).collect {
          case ((f, id), t) if f.dataType == FloatType ||
            f.dataType == DoubleType => id -> t.nans
        }.toMap
        Iterator.single(FileResult(name, size, count, lowers, uppers, nulls, nans))
      }
    }.collect().toIndexedSeq
  }

  /** Iceberg-avro schema document with per-member id attributes as the
    * spec requires (`field-id` on record fields, `element-id` on
    * arrays, `key-id`/`value-id` on maps). NESTED types (round 16):
    * struct → named record, list → array, map → avro map for string
    * keys or the spec's array-of-key/value-records encoding otherwise
    * (`"logicalType": "map"`) — the ids come from the SAME
    * [[graft.catalog.IcebergSchemaIds]] tree the metadata schema
    * renders, so the file and the table schema can never disagree. */
  private[sources] def avroSchemaJson(fieldIds: Seq[(StructField, Int)],
      treeOverride: Option[graft.catalog.IcebergSchemaIds.Tree] = None): String = {
    import graft.catalog.IcebergSchemaIds._
    def avroName(name: String, what: String): String = {
      // avro NAMES are [A-Za-z_][A-Za-z0-9_]* by spec — a column outside
      // that alphabet cannot be spelled in an avro schema at all (real
      // Iceberg writers sanitize + name-map); refuse with the column
      // named rather than emit unparseable JSON (review round 15)
      require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"$what '$name' is not an avro-safe name " +
          "([A-Za-z_][A-Za-z0-9_]*); export this schema as parquet/orc, " +
          "or rename it first")
      name
    }
    // a LOADED table's tree (appendSnapshot avro — round 16) declares
    // primitives by their Iceberg NAMES; map the ones this writer's
    // value encoder serves onto the same catalyst rendering, refuse the
    // rest (uuid/fixed/time have no encode path here)
    val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
    def primOfName(name: String): DataType = name match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "string" => StringType
      case "binary" => BinaryType
      case "date" => DateType
      case "timestamptz" => TimestampType
      case "timestamp" => TimestampNTZType
      case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
      case other => throw new UnsupportedOperationException(
        s"Iceberg avro append does not map declared type '$other'")
    }
    // `id` uniquifies generated record/fixed names (field / element /
    // key / value ids are schema-unique by construction)
    def typeNode(n: Node, id: Int): String = n match {
      case Prim(dt) => primNode(dt, id)
      case PrimName(name) => primNode(primOfName(name), id)
      case Struct(fs) =>
        s"""{"type": "record", "name": "r_$id", "fields": [${
          fs.map(fieldNode).mkString(", ")}]}"""
      case Arr(eid, cn, e) =>
        val et = typeNode(e, eid)
        s"""{"type": "array", "items": ${
          if (cn) s"""["null", $et]""" else et}, "element-id": $eid}"""
      // string keys take the avro MAP encoding — in BOTH tree forms:
      // a derived tree says Prim(StringType), a LOADED table's parsed
      // tree says PrimName("string") (round-16 review: matching only
      // the former silently flipped avro appends' string-key maps to
      // the array-of-records encoding, diverging from the table's
      // existing files)
      case MapN(kid, Prim(StringType) | PrimName("string"), vid, vcn, v) =>
        val vt = typeNode(v, vid)
        s"""{"type": "map", "values": ${
          if (vcn) s"""["null", $vt]""" else vt}, """ +
          s""""key-id": $kid, "value-id": $vid}"""
      case MapN(kid, k, vid, vcn, v) =>
        // non-string keys: the spec's array-of-k/v-records encoding
        val vt = typeNode(v, vid)
        s"""{"type": "array", "logicalType": "map", "items": {""" +
          s""""type": "record", "name": "k_v_$kid", "fields": [""" +
          s"""{"name": "key", "type": ${typeNode(k, kid)}, "field-id": $kid}, """ +
          s"""{"name": "value", "type": ${
            if (vcn) s"""["null", $vt]""" else vt}, "field-id": $vid}]}}"""
    }
    def fieldNode(f: Field): String = {
      val t = typeNode(f.node, f.id)
      val tt = if (f.nullable) s"""["null", $t]""" else t
      s"""{"name": "${avroName(f.name, "column")}", "type": $tt, "field-id": ${f.id}}"""
    }
    def primNode(dt: DataType, id: Int): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case DateType => """{"type": "int", "logicalType": "date"}"""
      case TimestampType =>
        """{"type": "long", "logicalType": "timestamp-micros", "adjust-to-utc": true}"""
      case TimestampNTZType =>
        """{"type": "long", "logicalType": "local-timestamp-micros", "adjust-to-utc": false}"""
      case d: DecimalType =>
        s"""{"type": "fixed", "name": "decimal_$id", "size": ${decimalBytes(d.precision)}, """ +
          s""""logicalType": "decimal", "precision": ${d.precision}, "scale": ${d.scale}}"""
      case other => throw new UnsupportedOperationException(
        s"Iceberg avro export does not map catalyst type ${other.catalogString}")
    }
    val tree = treeOverride.getOrElse(graft.catalog.IcebergSchemaIds.of(fieldIds))
    s"""{"type": "record", "name": "r_graft", "fields": [${
      tree.fields.map(fieldNode).mkString(", ")}]}"""
  }

  /** Minimal fixed size holding any unscaled value of `precision`
    * digits (the size real Iceberg writers use). */
  private[sources] def decimalBytes(precision: Int): Int =
    java.math.BigInteger.TEN.pow(precision)
      .subtract(java.math.BigInteger.ONE).toByteArray.length

  /** Converter from a catalyst INTERNAL value to the avro runtime value
    * of the (possibly union-wrapped) field schema. */
  private def valueWriter(dt: DataType, fieldSchema: AvroSchema): Any => AnyRef = {
    def unwrapped: AvroSchema =
      if (fieldSchema.getType != AvroSchema.Type.UNION) fieldSchema
      else fieldSchema.getTypes.asScala
        .find(_.getType != AvroSchema.Type.NULL).get
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType | TimestampNTZType =>
        v => v.asInstanceOf[AnyRef] // already the avro boxed primitive
      case StringType => v => v.asInstanceOf[UTF8String].toString
      case BinaryType =>
        v => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case d: DecimalType =>
        val fixed = unwrapped
        val n = fixed.getFixedSize
        v => {
          val unscaled = v.asInstanceOf[Decimal].toJavaBigDecimal
            .setScale(d.scale).unscaledValue()
          val raw = unscaled.toByteArray
          require(raw.length <= n,
            s"decimal $unscaled overflows ${d.precision} digits")
          val out = new Array[Byte](n)
          // sign-extend to the fixed width (big-endian two's complement)
          val pad: Byte = if (unscaled.signum() < 0) -1 else 0
          java.util.Arrays.fill(out, 0, n - raw.length, pad)
          System.arraycopy(raw, 0, out, n - raw.length, raw.length)
          new GenericData.Fixed(fixed, out)
        }
      // NESTED shapes (round 16): catalyst internal values (InternalRow
      // / ArrayData / MapData) convert recursively into avro runtime
      // values against the (possibly union-wrapped) child schemas
      case s: StructType =>
        val rec = unwrapped
        val childTypes = s.fields.map(_.dataType)
        val childWriters = s.fields.zipWithIndex.map { case (f, i) =>
          valueWriter(f.dataType, rec.getFields.get(i).schema())
        }
        v => {
          val row = v.asInstanceOf[InternalRow]
          val out = new GenericData.Record(rec)
          var i = 0
          while (i < childWriters.length) {
            out.put(i,
              if (row.isNullAt(i)) null
              else childWriters(i)(row.get(i, childTypes(i))))
            i += 1
          }
          out
        }
      case ArrayType(et, _) =>
        val arr = unwrapped
        val ew = valueWriter(et, arr.getElementType)
        v => {
          val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          val out = new java.util.ArrayList[AnyRef](ad.numElements())
          var i = 0
          while (i < ad.numElements()) {
            out.add(if (ad.isNullAt(i)) null else ew(ad.get(i, et)))
            i += 1
          }
          out
        }
      case MapType(StringType, vt, _)
          if unwrapped.getType == AvroSchema.Type.MAP =>
        val vw = valueWriter(vt, unwrapped.getValueType)
        v => {
          val md = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val keys = md.keyArray()
          val vals = md.valueArray()
          val out = new java.util.HashMap[String, AnyRef](md.numElements() * 2)
          var i = 0
          while (i < md.numElements()) {
            out.put(keys.get(i, StringType).asInstanceOf[UTF8String].toString,
              if (vals.isNullAt(i)) null else vw(vals.get(i, vt)))
            i += 1
          }
          out
        }
      case MapType(kt, vt, _) =>
        // non-string keys: the spec's array-of-k/v-records encoding
        val itemSchema = unwrapped.getElementType
        val kw = valueWriter(kt, itemSchema.getField("key").schema())
        val vw = valueWriter(vt, itemSchema.getField("value").schema())
        v => {
          val md = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val keys = md.keyArray()
          val vals = md.valueArray()
          val out = new java.util.ArrayList[AnyRef](md.numElements())
          var i = 0
          while (i < md.numElements()) {
            val r = new GenericData.Record(itemSchema)
            r.put(0, kw(keys.get(i, kt)))
            r.put(1, if (vals.isNullAt(i)) null else vw(vals.get(i, vt)))
            out.add(r)
            i += 1
          }
          out
        }
      case other => throw new UnsupportedOperationException(
        s"Iceberg avro export does not map catalyst type ${other.catalogString}")
    }
  }

  /** Streaming min/max/null/NaN tracker over INTERNAL values of one
    * column. Retained values are defensively copied where the source
    * buffer is task-reused (UTF8String views into UnsafeRows). */
  private final class ColTracker(cmp: (Any, Any) => Int, copy: Any => Any,
      val tracksBounds: Boolean, nanOf: Any => Boolean) extends Serializable {
    var nulls = 0L
    var nans = 0L
    var min: Any = null
    var max: Any = null
    def update(v: Any): Unit = if (tracksBounds) {
      if (nanOf(v)) { nans += 1; return }
      if (min == null || cmp(v, min) < 0) min = copy(v)
      if (max == null || cmp(v, max) > 0) max = copy(v)
    }
  }

  private object ColTracker {
    private val never: Any => Boolean = _ => false
    def apply(dt: DataType): ColTracker = dt match {
      case IntegerType | DateType => new ColTracker(
        (a, b) => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int]),
        identity, true, never)
      case LongType | TimestampType | TimestampNTZType => new ColTracker(
        (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long]),
        identity, true, never)
      case FloatType => new ColTracker(
        (a, b) => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float]),
        identity, true, v => java.lang.Float.isNaN(v.asInstanceOf[Float]))
      case DoubleType => new ColTracker(
        (a, b) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double]),
        identity, true, v => java.lang.Double.isNaN(v.asInstanceOf[Double]))
      case BooleanType => new ColTracker(
        (a, b) => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean]),
        identity, true, never)
      case StringType => new ColTracker(
        (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]),
        v => v.asInstanceOf[UTF8String].clone(), true, never)
      case _: DecimalType => new ColTracker(
        (a, b) => a.asInstanceOf[Decimal].compare(b.asInstanceOf[Decimal]),
        identity, true, never)
      case _ => new ColTracker((_, _) => 0, identity, false, never)
    }
  }

  /** Internal bound value → the Spark EXTERNAL type
    * `IcebergExport.serializeBound` consumes. */
  private def external(dt: DataType, v: Any): Any = dt match {
    case DateType => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
    case TimestampType =>
      val us = v.asInstanceOf[Long]
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L)
    case TimestampNTZType =>
      val us = v.asInstanceOf[Long]
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case StringType => v.asInstanceOf[UTF8String].toString
    case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal
    case _ => v
  }
}
