package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.CatalogIO.TableLayout

/** Iceberg v3 `initial-default` columns through the DSv2 front door
  * (round 14): when a converted Iceberg layout carries per-file FILL
  * sets ([[TableLayout.dataFileFills]] — the constant a pre-addition
  * data file must serve for a column added after it was written),
  * [[GraftSparkCatalog.loadTable]] serves a [[GraftFillTable]].
  *
  * Shape mirrors [[GraftEpochTable]]: files group by their fill set,
  * each group reads through one stock `ParquetScan` (manifest-planned
  * when sizes allow — the zero-listing win), and only the groups with
  * fills pay anything extra — a constant-injection wrapper at the
  * reader seam. Columnar batches stay columnar: the filled column's
  * vector is REPLACED with Spark's own [[ConstantColumnVector]] (the
  * mechanism Spark uses for partition values), so vectorized reading
  * and the downstream codegen'd operators are untouched. Row-based
  * reads pass through one codegen'd `UnsafeProjection`.
  *
  * Filters referencing a filled column are NOT pushed to that group's
  * file scan (the file lacks the column; parquet would evaluate the
  * predicate against NULL and wrongly drop row groups) — they are
  * reported back as post-scan filters, evaluated AFTER the constants
  * are injected. Fill-free groups still push everything.
  *
  * Fill groups are bounded by the number of ADD COLUMN commits since
  * the last rewrite (typically 1), so at 100 TB this stays a handful
  * of stock scans planned from the manifest. */
final class GraftFillTable(spark: SparkSession, tableName: String,
    layout: TableLayout, hadoopOpts: Map[String, String]) extends Table
  with SupportsRead {

  // nullable-forced: a REQUIRED column with a default is physically
  // absent from pre-addition files; the strict schema would refuse the
  // very scan the fill machinery exists to serve (the injected
  // constants are non-null, so served rows still honor the contract)
  private val currentSchema: StructType = StructType(StructType.fromDDL(
    layout.schemaDdl.getOrElse(throw new IllegalStateException(
      s"fill table $tableName has no recorded schema")))
    .fields.map(_.copy(nullable = true)))

  /** Per-file formats: the one recorded format for homogeneous layouts,
    * the manifest's per-entry formats for MIXED ones (round 16 — the
    * partitioned Hive-migration append shape: an ORC base plus parquet
    * appends, all lacking the partition column). Avro never reaches
    * here (layout invariant: fills + avro refuse upstream). */
  private val fileFormats: Seq[String] = {
    val n = layout.absoluteDataFiles.map(_.size).getOrElse(0)
    layout.dataFileFormats.getOrElse(Seq.fill(n)(layout.dataFormat))
  }

  /** (fill set, format, that group's absolute files) — fill-free groups
    * first. */
  private val groups: Seq[(Seq[(String, Any)], String, Seq[String])] =
    layout.absoluteDataFiles.getOrElse(throw new IllegalStateException(
      s"fill table $tableName has no file manifest"))
      .zip(layout.dataFileFills.getOrElse(throw new IllegalStateException(
        s"fill table $tableName has no fill sets")))
      .zip(fileFormats)
      .groupBy { case ((_, fills), fmt) => (fills, fmt) }.toSeq
      .sortBy { case ((fills, fmt), _) =>
        (fills.nonEmpty, fills.map(_._1).mkString(","), fmt) }
      .map { case ((fills, fmt), triples) =>
        (fills, fmt, triples.map(_._1._1)) }

  // shared lookups, computed ONCE per table load (not per group — the
  // group count is O(partitions) on imported hive trees)
  private lazy val relByAbs: Map[String, String] =
    layout.absoluteDataFiles.getOrElse(Nil)
      .zip(layout.dataFiles.getOrElse(Nil)).toMap
  private lazy val statsByPath: Map[String, String] = {
    val statsEnabled = spark.conf
      .getOption("spark.graft.stats.pruning").forall(_ == "true")
    if (!statsEnabled) Map.empty
    else layout.absoluteDataFilesWithStats
      .map(_.collect { case (p, s) if s.nonEmpty =>
        new org.apache.hadoop.fs.Path(p).toUri.getPath -> s }.toMap)
      .getOrElse(Map.empty)
  }

  /** ONE group's stock table — invoked LAZILY per group at scan build
    * (round 16): a dropped group (fill constants contradict the pushed
    * filters) never constructs a table, builder, or stats evaluation,
    * so a selective partition filter over a 10k-partition imported
    * tree plans in O(matching partitions), not O(table).
    *
    * Manifest stats still skip whole files per group (a filter on a
    * NON-fill column prunes like any plain scan). totalDataFiles = -1
    * disables manifest-ANSWERED aggregates: this builder does not
    * forward aggregate pushdown, and a per-group answer would be a
    * partial one anyway. */
  private def groupTable(i: Int): Table with SupportsRead = {
    val (_, fmt, files) = groups(i)
    val manifestPlanning = spark.conf
      .getOption("spark.graft.manifest.planning").forall(_ == "true")
    val manifest: Option[Table with SupportsRead] =
      if (!manifestPlanning) None
      else ManifestFileIndex.tableFor(s"$tableName@fill", spark,
        hadoopOpts, layout, schemaOverride = Some(currentSchema),
        fileSubset = Some(files.map(relByAbs)),
        formatOverride = Some(fmt))
    // format dispatch (round 16): converted Iceberg ORC layouts with
    // identity-partition fills read through Spark's stock ORC table —
    // the constant injection wraps the reader seam, format-blind.
    // NO basePath: the manifest is the single source of truth for
    // these columns — a basePath would make Spark infer partition
    // columns from `col=value` directory names, double-serving the
    // fill columns and CONFLICTING on layouts whose snapshots nest at
    // different depths (imported tree + appended `data/sN/col=v`)
    val table = manifest.getOrElse(fmt match {
      case "orc" =>
        org.apache.spark.sql.execution.datasources.v2.orc.OrcTable(
          s"$tableName@fill", spark,
          new CaseInsensitiveStringMap(hadoopOpts.asJava),
          files, userSpecifiedSchema = Some(currentSchema),
          fallbackFileFormat = classOf[org.apache.spark.sql.execution
            .datasources.orc.OrcFileFormat])
      case _ =>
        ParquetTable(s"$tableName@fill", spark,
          new CaseInsensitiveStringMap(hadoopOpts.asJava),
          files, userSpecifiedSchema = Some(currentSchema),
          fallbackFileFormat = classOf[ParquetFileFormat])
    })
    val groupStats = {
      val keep = files.map(f =>
        new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
      statsByPath.filter { case (p, _) => keep(p) }
    }
    if (groupStats.isEmpty) table
    else new StatsPrunedTable(table, groupStats, totalDataFiles = -1)
  }

  override def name(): String = tableName
  override def schema(): StructType = currentSchema
  override def properties(): util.Map[String, String] = util.Collections.emptyMap()
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FillScanBuilder(
      groups.map(_._1),
      i => groupTable(i).newScanBuilder(options)
        .asInstanceOf[ScanBuilder with SupportsPushDownRequiredColumns
          with SupportsPushDownCatalystFilters],
      groups.map(_._3.size), tableName)
}

/** Fans pruning out to each group's builder (the stock FileScanBuilder,
  * or the StatsPrunedScanBuilder wrapping it); filters touching a
  * group's fill columns are withheld from THAT group's pushdown. All
  * filters are reported back as not-fully-handled, so Spark re-checks
  * them after the constants are injected.
  *
  * GROUP pruning (round 16, the hive-import scale path): a group's fill
  * constants are known at PLAN time, so any pushed filter whose fill-
  * column references can be substituted away and that then evaluates to
  * false/null proves the whole group empty — its files are never
  * listed, split, or scheduled. This is Iceberg's partition pruning
  * re-expressed over the fill machinery: a `WHERE p = 3` on a
  * 10k-partition imported hive tree plans exactly the matching
  * partition's files instead of O(table) tasks. Conservative on
  * anything unevaluable (remaining attributes, non-deterministic,
  * subqueries, type mismatches → keep the group). */
private final class FillScanBuilder(
    groupFills: Seq[Seq[(String, Any)]],
    builderFor: Int => ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters,
    groupFileCounts: Seq[Int], tableName: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters {

  private var captured: Seq[Expression] = Nil
  private var requiredSchema: Option[StructType] = None

  // pruning and pushdown are CAPTURED, then replayed onto exactly the
  // SURVIVING groups' builders at build() — a dropped group never
  // instantiates a table or builder at all
  override def pruneColumns(schema: StructType): Unit =
    requiredSchema = Some(schema)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    captured ++= filters
    filters // evaluated again post-scan, over the injected constants
  }

  // nothing is reported as pushed: every filter re-evaluates above the
  // scan (the per-group builders still push their safe subsets for
  // row-group/stats pruning — that is an optimization, not a contract)
  override def pushedFilters: Array[Predicate] = Array.empty

  /** True iff some captured filter PROVES the group empty under its
    * fill constants (evaluates to false or null — a WHERE discards
    * both). Any doubt keeps the group. */
  private def groupDropped(fills: Seq[(String, Any)]): Boolean = {
    if (fills.isEmpty || captured.isEmpty) return false
    val byName = fills.map { case (c, v) => c.toLowerCase -> v }.toMap
    captured.exists { f =>
      f.deterministic && scala.util.Try {
        val sub = f.transform {
          case a: AttributeReference if byName.contains(a.name.toLowerCase) =>
            Literal.create(byName(a.name.toLowerCase), a.dataType)
        }
        if (sub.exists(e => e.isInstanceOf[AttributeReference] ||
            e.isInstanceOf[org.apache.spark.sql.catalyst.expressions
              .PlanExpression[_]])) false
        else {
          val v = sub.eval(InternalRow.empty)
          v == null || v == false
        }
      }.getOrElse(false)
    }
  }

  override def build(): Scan = {
    val dropped = groupFills.indices
      .filter(i => groupDropped(groupFills(i))).toSet
    // instantiate ONLY the surviving groups' builders (plus group 0 as
    // the schema witness when everything is pruned), replay the
    // captured pruning/pushdown, and build — capturing BUILD-time
    // telemetry per group (the stats-pruned file scans record at
    // PLANNING time instead; FillScan aggregates both kinds when it
    // plans, mirroring MixedScan)
    val scans: Seq[(Seq[(String, Any)], Option[Scan],
        Option[(Int, Int)])] =
      groupFills.indices.map { i =>
        val fills = groupFills(i)
        if (dropped(i) && !(i == 0 && dropped.size == groupFills.size))
          (fills, None, None)
        else {
          val b = builderFor(i)
          requiredSchema.foreach(b.pruneColumns)
          val fillNames = fills.map(_._1.toLowerCase).toSet
          b.pushFilters(captured.filterNot(_.exists {
            case a: AttributeReference => fillNames(a.name.toLowerCase)
            case _ => false
          }))
          val (s, c) = StatsPruning.collectPlanned(b.build())
          (fills, Some(s), c)
        }
      }
    new FillScan(scans.map(t => (t._1, t._2)), dropped)(
      scans.map(_._3), groupFileCounts, tableName)
  }
}

/** One group's planned file slices. */
private[sources] final case class FillFilePartition(group: Int,
    files: FilePartition) extends InputPartition {
  override def preferredLocations(): Array[String] = files.preferredLocations()
}

/** Concatenates the per-group stock scans; groups with fills get their
  * readers wrapped with the constant injection. */
private final class FillScan(
    private val scans: Seq[(Seq[(String, Any)], Option[Scan])],
    /** Group indices proven empty by their fill constants at plan time
      * — never split, never scheduled. */
    private val droppedGroups: Set[Int])(
    /** Pruning telemetry recorded at each group's BUILD; plan-time
      * telemetry joins it in [[planned]]. The second parameter list
      * keeps scan equality (exchange reuse) on the scans + drops. */
    buildCounts: Seq[Option[(Int, Int)]],
    groupFileCounts: Seq[Int], tableName: String)
  extends Scan with Batch {

  // the schema/description witness: the first BUILT group (the builder
  // always builds at least one, even when every group is pruned)
  private def witness: Scan = scans.collectFirst {
    case (_, Some(sc)) => sc }.getOrElse(throw new IllegalStateException(
    "fill scan with no built group"))

  override def readSchema(): StructType = witness.readSchema()
  override def description(): String =
    s"graft-fills(${scans.size}, ${droppedGroups.size} pruned: " +
      s"${witness.description()})"
  override def toBatch: Batch = this

  /** Spark refuses a scan mixing row-based and columnar partitions, so
    * PARTITION_DEFINED only when every planned partition agrees (mixed
    * parquet+orc groups normally both vectorize); a disagreeing group
    * demotes the whole scan to row-based — the same rule as
    * [[MixedScan]], and the row path injects through one codegen'd
    * projection, so correctness is untouched. */
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    if (uniformColumnar) Scan.ColumnarSupportMode.PARTITION_DEFINED
    else Scan.ColumnarSupportMode.UNSUPPORTED

  private lazy val uniformColumnar: Boolean =
    planned.map(p => factory.supportColumnarReads(p)).distinct.size <= 1

  override def equals(other: Any): Boolean = other match {
    case f: FillScan => scans == f.scans && droppedGroups == f.droppedGroups
    case _ => false
  }
  override def hashCode(): Int = (scans, droppedGroups).hashCode()

  private lazy val planned: Array[InputPartition] = {
    var skipped = 0
    var total = 0
    var recorded = false
    val parts = scans.zipWithIndex.flatMap { case ((_, so), i) =>
      if (droppedGroups(i) || so.isEmpty) {
        // the whole group was proven empty by its fill constants: its
        // files count as skipped without being listed or split
        skipped += groupFileCounts(i); total += groupFileCounts(i)
        recorded = true
        Nil
      } else {
        val (ps, c) = StatsPruning.collectPlanned(
          so.get.toBatch.planInputPartitions())
        c.orElse(buildCounts(i)).foreach { case (sk, t) =>
          skipped += sk; total += t; recorded = true
        }
        ps.map {
          case fp: FilePartition => FillFilePartition(i, fp): InputPartition
          case other => throw new IllegalStateException(
            s"unexpected fill-scan partition ${other.getClass.getName}")
        }
      }
    }.toArray
    // one aggregated (skipped, total) for the whole table's plan
    if (recorded) StatsPruning.recordPlan(skipped, total, tableName)
    parts
  }

  override def planInputPartitions(): Array[InputPartition] = planned

  private lazy val factory: PartitionReaderFactory = {
    // resolve each group's fills against ITS pruned read schema: a
    // fill column the query never asked for needs no injection.
    // Un-built (pruned) groups plan no partitions, so their slot is
    // never dereferenced
    val perGroup = scans.map {
      case (fills, Some(s)) =>
        val out = s.readSchema()
        val resolved = fills.flatMap { case (c, v) =>
          val i = out.fieldNames.indexWhere(_.equalsIgnoreCase(c))
          if (i < 0) None
          else Some((i, out.fields(i).dataType,
            Literal.create(v, out.fields(i).dataType).value))
        }
        (resolved.toArray, s.toBatch.createReaderFactory())
      case (_, None) => null
    }
    new FillReaderFactory(perGroup.toArray, readSchema())
  }

  override def createReaderFactory(): PartitionReaderFactory = factory
}

/** Dispatches each partition to its group's stock reader factory,
  * wrapping it with the constant injection when the group has fills. */
private final class FillReaderFactory(
    groups: Array[(Array[(Int, DataType, Any)], PartitionReaderFactory)],
    out: StructType) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[FillFilePartition]
    val (fills, inner) = groups(fp.group)
    val reader = inner.createReader(fp.files)
    if (fills.isEmpty) reader
    else new PartitionReader[InternalRow] {
      private val byOrd = fills.map { case (i, _, v) => i -> v }.toMap
      private val proj = UnsafeProjection.create(
        out.fields.zipWithIndex.map { case (f, i) =>
          byOrd.get(i)
            .map(v => Literal(v, f.dataType): Expression)
            .getOrElse(BoundReference(i, f.dataType, f.nullable))
        }.toIndexedSeq)
      override def next(): Boolean = reader.next()
      override def get(): InternalRow = proj(reader.get())
      override def close(): Unit = reader.close()
    }
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val fp = p.asInstanceOf[FillFilePartition]
    val (fills, inner) = groups(fp.group)
    val reader = inner.createColumnarReader(fp.files)
    if (fills.isEmpty) reader
    else new PartitionReader[ColumnarBatch] {
      // a ConstantColumnVector answers every row index with the one
      // value, so a single instance serves batches of any size
      private val constants: Map[Int, ColumnVector] = fills.map {
        case (i, dt, v) => i -> FillReaderFactory.constantVector(dt, v)
      }.toMap
      override def next(): Boolean = reader.next()
      override def get(): ColumnarBatch = {
        val b = reader.get()
        val cols = Array.tabulate[ColumnVector](b.numCols())(i =>
          constants.getOrElse(i, b.column(i)))
        new ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = reader.close()
    }
  }

  override def supportColumnarReads(p: InputPartition): Boolean = {
    val fp = p.asInstanceOf[FillFilePartition]
    groups(fp.group)._2.supportColumnarReads(fp.files)
  }
}

private[graft] object FillReaderFactory {
  /** A [[ConstantColumnVector]] holding one CATALYST value of `dt` —
    * the scalar types [[graft.catalog.IcebergFormat]]'s default and
    * identity-partition decoders admit. A null constant (a NULL
    * identity partition value) sets the vector's null mask. */
  def constantVector(dt: DataType, v: Any): ColumnVector = {
    val c = new ConstantColumnVector(1, dt)
    if (v == null) { c.setNull(); return c }
    dt match {
      case BooleanType => c.setBoolean(v.asInstanceOf[Boolean])
      case IntegerType | DateType => c.setInt(v.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType =>
        c.setLong(v.asInstanceOf[Long])
      case FloatType => c.setFloat(v.asInstanceOf[Float])
      case DoubleType => c.setDouble(v.asInstanceOf[Double])
      case StringType => c.setUtf8String(v.asInstanceOf[UTF8String])
      case d: DecimalType =>
        c.setDecimal(v.asInstanceOf[org.apache.spark.sql.types.Decimal],
          d.precision)
      case other => throw new IllegalStateException(
        s"initial-default fill over unsupported vector type $other")
    }
    c
  }
}

/** Format-agnostic constant injection over ANY stock reader factory —
  * the fill machinery's seam factored out for consumers that dispatch
  * partitions themselves (round 16: the streaming sources' per-batch
  * scans over appended hive-layout files, which lack their identity
  * partition columns exactly like the batch faces' files). `fills`
  * maps column NAMES to EXTERNAL JVM values; they are resolved against
  * `out` (the scan's output schema) here, once. */
private[graft] object FillInjection {
  /** Resolve name-keyed external fills against the scan output schema
    * `out`: (ordinal, type, CATALYST value). Serializable — safe to
    * resolve driver-side or task-side. */
  def resolve(fills: Seq[(String, Any)], out: StructType)
      : Array[(Int, DataType, Any)] =
    fills.flatMap { case (c, v) =>
      val i = out.fieldNames.indexWhere(_.equalsIgnoreCase(c))
      if (i < 0) None
      else Some((i, out.fields(i).dataType,
        Literal.create(v, out.fields(i).dataType).value))
    }.toArray

  /** One row reader with the constants projected in (codegen'd). */
  def wrapRow(reader: PartitionReader[InternalRow],
      resolved: Array[(Int, DataType, Any)], out: StructType)
      : PartitionReader[InternalRow] = {
    if (resolved.isEmpty) return reader
    new PartitionReader[InternalRow] {
      private val byOrd = resolved.map { case (i, _, v) => i -> v }.toMap
      private val proj = UnsafeProjection.create(
        out.fields.zipWithIndex.map { case (f, i) =>
          byOrd.get(i)
            .map(v => Literal(v, f.dataType): Expression)
            .getOrElse(BoundReference(i, f.dataType, f.nullable))
        }.toIndexedSeq)
      override def next(): Boolean = reader.next()
      override def get(): InternalRow = proj(reader.get())
      override def close(): Unit = reader.close()
    }
  }

  /** One columnar reader with the filled columns' vectors REPLACED by
    * [[ConstantColumnVector]]s (batches stay columnar). */
  def wrapColumnar(reader: PartitionReader[ColumnarBatch],
      resolved: Array[(Int, DataType, Any)])
      : PartitionReader[ColumnarBatch] = {
    if (resolved.isEmpty) return reader
    new PartitionReader[ColumnarBatch] {
      private val constants: Map[Int, ColumnVector] = resolved.map {
        case (i, dt, v) => i -> FillReaderFactory.constantVector(dt, v)
      }.toMap
      override def next(): Boolean = reader.next()
      override def get(): ColumnarBatch = {
        val b = reader.get()
        val cols = Array.tabulate[ColumnVector](b.numCols())(i =>
          constants.getOrElse(i, b.column(i)))
        new ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = reader.close()
    }
  }

  def wrap(inner: PartitionReaderFactory, fills: Seq[(String, Any)],
      out: StructType): PartitionReaderFactory = {
    val resolved = resolve(fills, out)
    if (resolved.isEmpty) return inner
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] =
        wrapRow(inner.createReader(p), resolved, out)
      override def createColumnarReader(p: InputPartition)
          : PartitionReader[ColumnarBatch] =
        wrapColumnar(inner.createColumnarReader(p), resolved)
      override def supportColumnarReads(p: InputPartition): Boolean =
        inner.supportColumnarReads(p)
    }
  }
}
