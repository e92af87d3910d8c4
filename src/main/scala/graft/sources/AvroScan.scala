package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.catalog.CatalogIO.TableLayout

/** Native reader for Iceberg tables whose DATA files are Avro object
  * container files (round 14) — the third and last of the spec's data
  * formats (`file_format: AVRO`), implemented from the public Avro +
  * Iceberg specs over the avro jars Spark already ships (no spark-avro
  * module exists in this environment, so `spark.read.format("avro")`
  * is not an option).
  *
  * Both faces plan from the manifest (zero listing) and split files at
  * Avro SYNC markers — `DataFileReader.sync(start)`/`pastSync(end)` is
  * the format's own split contract, so a 1 GB avro file fans out
  * across tasks exactly like parquet row groups. Since round 15 the
  * DataFrame face is the SAME DSv2 scan (served through
  * [[AvroTableProvider]]'s driver-side plan handoff), so both faces
  * share splits, pruning, and decode. Records decode STRAIGHT to
  * catalyst internal values (UTF8String / days-int / micros-long /
  * unscaled Decimal) — one conversion, no external-row detour. Values
  * convert per the TABLE schema (Iceberg's avro encoding: date = int
  * days, timestamps = long micros, decimal = fixed/bytes big-endian
  * unscaled, non-string-key maps = arrays of key/value records); a
  * shape the decoder does not cover exactly refuses with the field
  * named.
  *
  * Scope matches ORC interop: read-only, delete-free, rename-free,
  * fill-free (refused upstream by [[graft.catalog.IcebergFormat]]),
  * no adoption. Column pruning is honored (unread fields are never
  * converted); filters stay post-scan (avro is row-oriented — there is
  * nothing sound to push below the record decode). */
object AvroRead {

  /** Internal-typed rows of one avro file slice, plus an explicit
    * closer (DSv2 readers close on task end; the iterator also closes
    * itself on exhaustion). `start`/`length` follow the avro split
    * contract: the slice owns every sync block beginning in
    * [start, start+length). */
  def openSlice(path: String, start: Long, length: Long,
      conf: Configuration, schema: StructType)
      : (Iterator[InternalRow], () => Unit) = {
    val reader = DataFileReader.openReader(
      new FsInput(new Path(path), conf),
      new GenericDatumReader[GenericRecord]())
    reader.sync(start)
    val convs = schema.fields.map(f =>
      fieldConverter(reader.getSchema, f, s"$path/${f.name}"))
    var closed = false
    def closeNow(): Unit = if (!closed) { closed = true; reader.close() }
    // hoisted OUTSIDE the anonymous Iterator: inside it, the inherited
    // Iterator.length member shadows the method parameter
    val end = start + length
    val width = convs.length
    val it = new Iterator[InternalRow] {
      override def hasNext: Boolean = {
        if (closed) return false
        val h = reader.hasNext && !reader.pastSync(end)
        if (!h) closeNow()
        h
      }
      override def next(): InternalRow = {
        val rec = reader.next()
        val vals = new Array[Any](width)
        var i = 0
        while (i < width) { vals(i) = convs(i)(rec); i += 1 }
        new GenericInternalRow(vals)
      }
    }
    (it, () => closeNow())
  }

  /** The DataFrame face: the SAME DSv2 table as the SQL face, handed to
    * `spark.read.format(...)` through [[AvroTableProvider]]'s plan
    * registry — sync-marker splits, manifest-bounds pruning, and column
    * pruning all apply identically on both faces. */
  def dataFrame(spark: SparkSession, schema: StructType,
      files: Seq[(String, Long)], options: Map[String, String],
      statsByPath: Map[String, String] = Map.empty): DataFrame = {
    val nullable = StructType(schema.fields.map(_.copy(nullable = true)))
    val table = new GraftAvroTable(spark, s"graft-avro-df(${files.size} files)",
      nullable, files, statsByPath, options)
    val key = AvroTableProvider.register(table)
    // a load() failure between register and the provider's one-shot
    // take() would strand the entry (table + file list + session ref)
    // in the registry for the life of the driver (advisor r15 #4) —
    // deregister on the failure path; success consumed the key already
    try spark.read.format(classOf[AvroTableProvider].getName)
      .option(AvroTableProvider.PlanKey, key).load()
    catch {
      case e: Throwable =>
        AvroTableProvider.deregister(key)
        throw e
    }
  }

  /** Converter for one top-level (or nested) field: resolves the avro
    * field by NAME against the record's own schema — a file written
    * before the column was added yields nulls, Iceberg's semantics for
    * id-less name-addressed evolution. */
  private def fieldConverter(rec: AvroSchema, f: StructField,
      where: String): GenericRecord => Any = {
    val af = Option(rec.getField(f.name))
    af match {
      case None => _ => null
      case Some(field) =>
        val c = valueConverter(field.schema(), f.dataType, where)
        val pos = field.pos()
        r => {
          val v = r.get(pos)
          if (v == null) null else c(v)
        }
    }
  }

  /** Strip a `[null, T]` union down to T; refuse wider unions (no
    * catalyst shape represents them exactly). */
  private def nonNull(s: AvroSchema, where: String): AvroSchema =
    if (s.getType != AvroSchema.Type.UNION) s
    else {
      val ts = s.getTypes.asScala.filter(_.getType != AvroSchema.Type.NULL)
      if (ts.size != 1)
        throw new UnsupportedOperationException(
          s"avro union of ${ts.size} non-null branches at $where has no " +
            "exact catalyst mapping")
      ts.head
    }

  private def bytesOf(v: Any): Array[Byte] = v match {
    case b: java.nio.ByteBuffer =>
      val d = new Array[Byte](b.remaining()); b.duplicate().get(d); d
    case f: GenericFixed => f.bytes()
    case other => throw new IllegalStateException(
      s"unexpected avro binary representation ${other.getClass.getName}")
  }

  /** Decoder from an avro runtime value to the CATALYST INTERNAL value
    * of `dt` — UTF8String for strings, epoch-days int for dates,
    * micros long for timestamps, [[Decimal]] for decimals, internal
    * rows/arrays/maps for nested shapes. One conversion per value; the
    * scan hands these rows to Spark as-is. */
  private def valueConverter(raw: AvroSchema, dt: DataType,
      where: String): Any => Any = {
    val s = nonNull(raw, where)
    def refuse(): Nothing = throw new UnsupportedOperationException(
      s"avro ${s.getType} at $where has no exact decoding to catalyst " +
        s"$dt — this reader refuses rather than mis-serve")
    // a DECLARED avro logical type must agree with the decoding this
    // converter applies — a timestamp-millis long decoded as micros
    // (or a decimal at another scale) would be served silently wrong.
    // An absent logical type is tolerated (Iceberg's own avro files
    // always declare them; id-less migrated files may not).
    val logical = Option(s.getLogicalType).map(_.getName)
    def requireLogical(ok: String*): Unit =
      logical.filterNot(ok.contains).foreach(lt =>
        throw new UnsupportedOperationException(
          s"avro logical type '$lt' at $where does not match the " +
            s"catalyst type $dt decoding " +
            ok.mkString("(expected one of ", ", ", ")") +
            " — this reader refuses rather than mis-serve"))
    dt match {
      case BooleanType => { case b: java.lang.Boolean => b; case _ => refuse() }
      case IntegerType => { case i: java.lang.Integer => i; case _ => refuse() }
      case LongType => {
        case l: java.lang.Long => l
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue()) // int widened
        case _ => refuse()
      }
      case FloatType => { case f: java.lang.Float => f; case _ => refuse() }
      case DoubleType => {
        case d: java.lang.Double => d
        case f: java.lang.Float => java.lang.Double.valueOf(f.doubleValue()) // float widened
        case _ => refuse()
      }
      case StringType => v => UTF8String.fromString(v.toString)
      case BinaryType => v => bytesOf(v)
      case DateType => // iceberg avro: int days since epoch = catalyst internal
        requireLogical("date");
        { case i: java.lang.Integer => i; case _ => refuse() }
      case TimestampType => // long micros, UTC-adjusted = catalyst internal
        requireLogical("timestamp-micros");
        { case l: java.lang.Long => l; case _ => refuse() }
      case TimestampNTZType => // long micros, no zone = catalyst internal
        requireLogical("local-timestamp-micros", "timestamp-micros");
        { case l: java.lang.Long => l; case _ => refuse() }
      case d: DecimalType => // big-endian unscaled in fixed/bytes
        requireLogical("decimal")
        s.getLogicalType match {
          case dec: org.apache.avro.LogicalTypes.Decimal
              if dec.getScale != d.scale =>
            throw new UnsupportedOperationException(
              s"avro decimal scale ${dec.getScale} at $where does not " +
                s"match the table's $dt — this reader refuses rather " +
                "than mis-serve")
          case _ => ()
        }
        v => Decimal(new java.math.BigDecimal(
          new java.math.BigInteger(bytesOf(v)), d.scale), d.precision, d.scale)
      case st: StructType =>
        val inner = nonNull(s, where)
        if (inner.getType != AvroSchema.Type.RECORD) refuse()
        val convs = st.fields.map(f =>
          fieldConverter(inner, f, s"$where.${f.name}"))
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          val vals = new Array[Any](convs.length)
          var i = 0
          while (i < convs.length) { vals(i) = convs(i)(rec); i += 1 }
          new GenericInternalRow(vals)
        }
      case ArrayType(et, _) =>
        if (s.getType != AvroSchema.Type.ARRAY) refuse()
        val c = valueConverter(s.getElementType, et, s"$where[]")
        v => new GenericArrayData(
          v.asInstanceOf[java.util.Collection[Any]].asScala
            .map(e => if (e == null) null else c(e)).toArray)
      case MapType(kt, vt, _) => s.getType match {
        case AvroSchema.Type.MAP if kt == StringType =>
          val c = valueConverter(s.getValueType, vt, s"$where{}")
          v => {
            val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala
            val keys = new Array[Any](m.size)
            val vals = new Array[Any](m.size)
            var i = 0
            m.foreach { case (k, mv) =>
              keys(i) = UTF8String.fromString(k.toString)
              vals(i) = if (mv == null) null else c(mv)
              i += 1
            }
            new ArrayBasedMapData(new GenericArrayData(keys),
              new GenericArrayData(vals))
          }
        case AvroSchema.Type.ARRAY
            if s.getElementType.getType == AvroSchema.Type.RECORD =>
          // iceberg's non-string-key map encoding: array of k/v records
          val es = s.getElementType
          val kc = valueConverter(es.getField("key").schema(), kt, s"$where.key")
          val vc = valueConverter(es.getField("value").schema(), vt, s"$where.value")
          val kp = es.getField("key").pos()
          val vp = es.getField("value").pos()
          v => {
            val entries = v.asInstanceOf[java.util.Collection[Any]].asScala.toArray
            val keys = new Array[Any](entries.length)
            val vals = new Array[Any](entries.length)
            var i = 0
            while (i < entries.length) {
              val r = entries(i).asInstanceOf[GenericRecord]
              val mv = r.get(vp)
              keys(i) = kc(r.get(kp))
              vals(i) = if (mv == null) null else vc(mv)
              i += 1
            }
            new ArrayBasedMapData(new GenericArrayData(keys),
              new GenericArrayData(vals))
          }
        case _ => refuse()
      }
      case _ => refuse()
    }
  }
}

/** DSv2 TableProvider that serves a driver-side [[GraftAvroTable]] by
  * registry key — the bridge that lets the DataFrame face
  * (`spark.read.format(...)`) reuse the exact DSv2 scan the SQL face
  * plans (same sync-marker splits, same internal-row decode), with no
  * layout re-parse and no file list squeezed through string options.
  * Keys are one-shot: [[AvroRead.dataFrame]] registers, `load()`
  * consumes (planning is driver-side; executors only ever see the
  * serialized [[AvroScan]]). */
final class AvroTableProvider extends TableProvider {
  import AvroTableProvider._

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    lookup(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    take(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object AvroTableProvider {
  /** Option key carrying the registry handle. */
  val PlanKey = "graft.avro.plan"

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, GraftAvroTable]()

  private[sources] def register(t: GraftAvroTable): String = {
    val k = java.util.UUID.randomUUID().toString
    registry.put(k, t)
    k
  }

  /** Failure-path cleanup for [[AvroRead.dataFrame]] (idempotent —
    * `load()` may already have consumed the key before failing). */
  private[sources] def deregister(key: String): Unit = registry.remove(key)

  /** Test-only visibility: is the key still registered? */
  private[sources] def registered(key: String): Boolean =
    registry.containsKey(key)

  private[sources] def registrySize: Int = registry.size()

  private def lookup(options: CaseInsensitiveStringMap): GraftAvroTable = {
    val k = options.get(PlanKey)
    val t = if (k == null) null else registry.get(k)
    if (t == null) throw new IllegalStateException(
      "AvroTableProvider is driver-internal: construct reads through " +
        "graft.sources.AvroRead.dataFrame, not spark.read.format(...)")
    t
  }

  /** `getTable` consumes the key (one `load()` per registration) so the
    * registry never accumulates file lists across a long session. */
  private def take(options: CaseInsensitiveStringMap): GraftAvroTable = {
    val t = lookup(options)
    registry.remove(options.get(PlanKey))
    t
  }
}

/** The DSv2 face: a read-only avro table planned from the manifest. */
final class GraftAvroTable(spark: SparkSession, tableName: String,
    currentSchema: StructType, sized: Seq[(String, Long)],
    statsRaw: Map[String, String], hadoopOpts: Map[String, String])
  extends Table with SupportsRead {

  /** Layout-driven construction (the SQL face): schema from the
    * recorded DDL, file list + sizes + pruning stats from the
    * manifest. */
  def this(spark: SparkSession, tableName: String, layout: TableLayout,
      hadoopOpts: Map[String, String]) = this(
    spark, tableName,
    StructType(StructType.fromDDL(
      layout.schemaDdl.getOrElse(throw new IllegalStateException(
        s"avro table $tableName has no recorded schema")))
      .fields.map(_.copy(nullable = true))),
    // the helper enforces the complete-sizes contract (a -1 entry would
    // make a slice's pastSync fire immediately — silent row loss)
    layout.absoluteDataFilesWithSizes.getOrElse(throw new IllegalStateException(
      s"avro table $tableName has no complete file-size manifest")),
    layout.absoluteDataFilesWithStats
      .map(_.collect { case (p, s) if s.nonEmpty => p -> s }.toMap)
      .getOrElse(Map.empty),
    hadoopOpts)

  override def name(): String = tableName
  override def schema(): StructType = currentSchema
  override def properties(): util.Map[String, String] = util.Collections.emptyMap()
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  /** Per-file pruning stats (manifest bounds), keyed by absolute path —
    * avro files carry no parquet-style footer pushdown, so the
    * manifest envelope is the ONLY file-skipping layer this format
    * gets; same kill-switch as the parquet/orc paths. */
  private def statsByPath: Map[String, String] = {
    val enabled = spark.conf
      .getOption("spark.graft.stats.pruning").forall(_ == "true")
    if (!enabled) Map.empty else statsRaw
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(spark, tableName, currentSchema, sized, statsByPath,
      hadoopOpts)
}

private final class AvroScanBuilder(spark: SparkSession, tableName: String,
    fullSchema: StructType, sized: Seq[(String, Long)],
    statsByPath: Map[String, String], hadoopOpts: Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var required: StructType = fullSchema
  private var captured: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the table's field order and types; honor the subset
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.exists(_.equalsIgnoreCase(f.name))))

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    // captured only for manifest-envelope FILE pruning; every conjunct
    // is re-evaluated post-scan (nothing sound to push below the
    // row-oriented record decode)
    captured = filters
    filters
  }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def build(): Scan = {
    val conf = {
      val c = spark.sessionState.newHadoopConf()
      hadoopOpts.foreach { case (k, v) => c.set(k, v) }
      new SerializableConfiguration(c)
    }
    // the same envelope test as StatsPrunedScan, applied to whole files
    val kept =
      if (captured.isEmpty || statsByPath.isEmpty) sized
      else sized.filter { case (p, _) =>
        statsByPath.get(p).flatMap(graft.catalog.FileStats
          .decode(_, fullSchema)) match {
          case Some(d) => !StatsPruning.filePrunable(captured, d)
          case None => true // no stats: must read
        }
      }
    StatsPruning.recordPlan(sized.size - kept.size, sized.size, tableName)
    new AvroScan(kept.toVector, required)(conf,
      spark.sessionState.conf.filesMaxPartitionBytes)
  }
}

private[sources] final case class AvroSlice(path: String, start: Long,
    length: Long) extends InputPartition

/** Plans one slice per `maxSplitBytes` range of each file (avro sync
  * markers make any byte range a valid split) and decodes records
  * task-side. A case class so identical scans compare equal (exchange
  * reuse). `conf` is excluded from equality by the case-class trick of
  * comparing only the first parameter list — conf rides along. */
private[sources] final case class AvroScan(sized: Vector[(String, Long)],
    required: StructType)(
    conf: SerializableConfiguration, maxSplit: Long)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro(${sized.size} files)"

  /** Post-pruning byte size from the manifest (round 15): without it a
    * DSv2 scan reports no statistics and the optimizer assumes
    * infinity — a small avro dimension table would NEVER broadcast. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(sized.map(_._2).sum, 1L))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    sized.flatMap { case (p, size) =>
      val step = math.max(maxSplit, 1L)
      (0L until math.max(size, 1L) by step).map(off =>
        AvroSlice(p, off, math.min(step, size - off)): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required, conf)
}

private final class AvroReaderFactory(schema: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[AvroSlice]
    new PartitionReader[InternalRow] {
      // records decode straight to internal rows — no per-row encoder
      private val (it, closer) =
        AvroRead.openSlice(s.path, s.start, s.length, conf.value, schema)
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        current = it.next()
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = closer()
    }
  }
}
