package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{Catalog, CatalogConfig, CatalogFactory, CatalogIO, SupportsTableVersions, TableRef}

/** Structured Streaming FROM a graft catalog table (round 10): the
  * read twin of [[StreamMaterialize]]'s stream-INTO-table face, and the
  * streaming face of [[CatalogIO.readAppendsBetween]] — Iceberg's
  * streaming read re-expressed for this format.
  *
  * Offsets ARE committed version numbers: micro-batch (start, end]
  * serves exactly the files commits in that version range appended
  * (manifest set difference), so replay after any crash is
  * deterministic — versions are immutable and totally ordered, which is
  * the whole exactly-once story; no source-side state beyond the
  * checkpointed offset. Non-append history inside a batch range
  * (overwrite, manifest shrink, delete files) fails the stream loudly
  * with the same re-sync contract as the batch face. At 100 TB each
  * trigger costs O(files appended since the last trigger) — the
  * manifest diff is two small JSON reads; no listing, no full scan.
  *
  *   spark.readStream.format("graft-table")
  *     .option("type", "hadoop").option("warehouse", wh)
  *     .option("table", "db.events")
  *     .option("startingVersion", "earliest" | <N>)   // default: latest
  *     .load()
  *
  * `startingVersion` absent → only appends AFTER stream start;
  * `earliest` → full bootstrap (refused while delete files are live —
  * it would resurrect deleted rows; compact first); `N` → start at
  * version N's changes. Un-materialized column renames refuse at plan
  * time (compact first); reading is Spark's own vectorized parquet
  * reader over the exact added files.
  */
final class GraftTableStreamProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"
  override def supportsExternalMetadata(): Boolean = false

  private def cfgOf(options: CaseInsensitiveStringMap): (CatalogConfig, TableRef) =
    GraftTableStreamProvider.parse(options)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (cfg, ref) = cfgOf(options)
    val cat = CatalogFactory.build(cfg)
    try {
      val c = new Configuration()
      cfg.hadoopConf.foreach { case (k, v) => c.set(k, v) }
      val layout = CatalogIO.readLayout(cat.loadTableMetadataLocation(ref), c)
      StructType.fromDDL(layout.schemaDdl.getOrElse(
        throw new UnsupportedOperationException(
          s"Table $ref has no recorded schema; INSERT OVERWRITE once to " +
            "upgrade it before streaming reads")))
    } finally cat.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val ci = new CaseInsensitiveStringMap(properties)
    val (cfg, ref) = cfgOf(ci)
    new GraftStreamTable(cfg, ref, schema, Option(ci.get("startingVersion")),
      ci.getBoolean("skipRewrites", false))
  }
}

private[streaming] object GraftTableStreamProvider {
  /** Option parsing, case-insensitive like every Spark option surface:
    * `type`/`table`/`name`/`startingVersion` are control keys,
    * `hadoop.`-prefixed keys become the Hadoop Configuration overlay
    * (same convention as the DSv2 catalog face), everything else passes
    * to the catalog factory as properties. */
  def parse(options: CaseInsensitiveStringMap): (CatalogConfig, TableRef) = {
    // CaseInsensitiveStringMap lowercases keys; Hadoop conf keys are
    // case-sensitive in principle but universally lowercase in practice
    val props = options.asScala.toMap
    val control = Set("type", "table", "startingversion", "name", "skiprewrites")
    val tpe = props.getOrElse("type", throw new IllegalArgumentException(
      "graft-table stream source requires a 'type' option (catalog type)"))
    val table = props.getOrElse("table", throw new IllegalArgumentException(
      "graft-table stream source requires a 'table' option (dotted table name)"))
    val (hadoop, plain) = (props -- control).partition(_._1.startsWith("hadoop."))
    val cfg = CatalogConfig(tpe, props.getOrElse("name", "graft-stream-source"),
      properties = plain,
      hadoopConf = hadoop.map { case (k, v) => k.stripPrefix("hadoop.") -> v })
    (cfg, TableRef.parse(table))
  }
}

private[streaming] final class GraftStreamTable(cfg: CatalogConfig,
    ref: TableRef, tableSchema: StructType, startingVersion: Option[String],
    skipRewrites: Boolean)
  extends Table with SupportsRead {

  override def name(): String = s"graft-stream:${cfg.name}.$ref"
  override def schema(): StructType = tableSchema
  override def properties(): util.Map[String, String] =
    util.Collections.emptyMap()
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def description(): String = name()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          // mode decided once per stream from the table's metadata
          // document: a REGISTERED Apache Iceberg pointer streams by its
          // OWN snapshot chain (sequence-number offsets, round 15) — no
          // graft version history exists or is needed there
          val probe = CatalogFactory.build(cfg)
          val iceberg =
            try {
              val c = new Configuration()
              cfg.hadoopConf.foreach { case (k, v) => c.set(k, v) }
              graft.catalog.IcebergFormat.isIcebergMetadata(
                CatalogIO.readMetadataText(
                  probe.loadTableMetadataLocation(ref), c))
            } finally probe.close()
          if (iceberg) {
            // refuse rather than silently drop the option: the
            // ride-through-maintenance walk is graft-commitOp-based and
            // has no Iceberg equivalent here (rewrites refuse loudly)
            if (skipRewrites)
              throw new UnsupportedOperationException(
                "skipRewrites is not supported when streaming a " +
                  "registered Apache Iceberg pointer; rewrites fail the " +
                  "stream loudly instead")
            new IcebergMicroBatchStream(cfg, ref, tableSchema, startingVersion)
          } else
            new GraftTableMicroBatchStream(cfg, ref, tableSchema,
              startingVersion, skipRewrites)
        }
      }
    }
}

/** One committed version number = one offset. */
private[streaming] final case class VersionOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

private[streaming] final class GraftTableMicroBatchStream(cfg: CatalogConfig,
    ref: TableRef, tableSchema: StructType, startingVersion: Option[String],
    skipRewrites: Boolean)
  extends MicroBatchStream {

  // a REGISTERED Apache Iceberg pointer streams by its OWN history
  // (round 15): offsets are Iceberg sequence numbers from the snapshot
  // chain the metadata.json retains, so no graft version history is
  // needed — [[IcebergMicroBatchStream]] handles that mode and this
  // class keeps the graft-format path. The mode is decided once per
  // stream from the table's metadata document.
  private val cat: Catalog with SupportsTableVersions =
    CatalogFactory.build(cfg) match {
      case v: SupportsTableVersions => v.asInstanceOf[Catalog with SupportsTableVersions]
      case other =>
        other.close()
        throw new UnsupportedOperationException(
          s"graft-table stream source needs a versioning catalog; " +
            s"type '${cfg.catalogType}' keeps no history")
    }
  // the catalog's Hadoop overlay (hadoop.* options), like the DSv2 face
  private def conf: Configuration = {
    val c = new Configuration()
    cfg.hadoopConf.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def latestVersion: Int =
    cat.listTableVersions(ref).lastOption.getOrElse(
      throw new graft.catalog.NoSuchTableException(
        s"Table does not exist: $ref"))

  override def initialOffset(): Offset = VersionOffset(startingVersion match {
    case None => latestVersion // only appends after stream start
    case Some("earliest") => 0 // full bootstrap, then incremental
    case Some(n) => n.toIntOption.filter(_ >= 1).getOrElse(
      throw new IllegalArgumentException(
        s"startingVersion must be 'earliest' or a version >= 1, got '$n'")) - 1
  })

  override def latestOffset(): Offset = VersionOffset(latestVersion)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toInt)

  // the factory of the most recent per-batch scan; a template over the
  // current manifest serves the (factory-before-plan / empty-batch) case
  @volatile private var lastFactory: PartitionReaderFactory = _

  private def parquetScanOver(paths: Seq[String], dataLocation: String) = {
    val spark = SparkSession.active
    // FileTable merges these options into its Hadoop conf, so the
    // catalog's hadoop.* overlay reaches the parquet reader
    val opts = new CaseInsensitiveStringMap(
      (cfg.hadoopConf + ("basePath" -> dataLocation)).asJava)
    ParquetTable(s"$ref-stream", spark, opts,
      paths, userSpecifiedSchema = Some(tableSchema),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(opts)
      .build()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[VersionOffset].v, end.asInstanceOf[VersionOffset].v)
    // skipRewrites (round 11): a long-lived stream rides through
    // row-preserving maintenance commits (compaction, clustering,
    // metadata-only) instead of dying on the first nightly compaction —
    // the walk serves only genuinely appended files, grouped by the
    // segment each lived in when appended, and still refuses loudly on
    // overwrites and deletes (CatalogIO.appendsAcrossRewrites)
    val (to, groups) =
      if (skipRewrites) CatalogIO.appendsAcrossRewrites(cat, ref, s, e, conf)
      else {
        val (t, added) = CatalogIO.appendsLayoutBetween(cat, ref, s, e, conf)
        (t, if (added.isEmpty) Nil else Seq((t.dataLocation, added)))
      }
    if (to.renameOps.nonEmpty)
      throw new UnsupportedOperationException(
        s"Table $ref carries un-materialized column renames; compact to " +
          "materialize them before streaming reads")
    val live = groups.filter(_._2.nonEmpty)
    if (live.isEmpty) return Array.empty
    // partitions across segment groups concatenate; the reader factory
    // is path-agnostic (partitions name their own files), so the first
    // group's factory serves them all
    var factory: PartitionReaderFactory = null
    val parts = live.flatMap { case (segLoc, added) =>
      val abs = added.map { case (f, _) =>
        new org.apache.hadoop.fs.Path(segLoc, f).toString }
      val scan = parquetScanOver(abs, segLoc)
      if (factory == null) factory = scan.toBatch.createReaderFactory()
      scan.toBatch.planInputPartitions()
    }.toArray
    lastFactory = factory
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val f = lastFactory
    if (f != null) f
    else {
      // empty first batch: build a factory from the current layout (it
      // only carries schema + conf; partitions name their own files)
      val layout = CatalogIO.readLayout(cat.loadTableMetadataLocation(ref), conf)
      parquetScanOver(Nil, layout.dataLocation).toBatch.createReaderFactory()
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = cat.close()
}

/** One Iceberg SEQUENCE NUMBER = one offset. */
private[streaming] final case class SeqOffset(s: Long) extends Offset {
  override def json(): String = s.toString
}

/** Structured Streaming FROM a registered Apache Iceberg pointer
  * (round 15): offsets are the table's own SEQUENCE NUMBERS — totally
  * ordered, immutable once committed, and retained with the snapshot
  * history inside every metadata.json, so a micro-batch (start, end]
  * serves exactly the data files of snapshots in that sequence range
  * (file-set difference of the two snapshots' manifests, the same diff
  * as [[graft.catalog.CatalogIO.readIcebergAppendsBetween]]). The
  * catalog pointer is re-read per trigger, so a migrator that
  * re-registers the table on each upstream Iceberg commit feeds the
  * stream continuously. Non-append ranges (live deletes, removed or
  * rewritten files), renames, fills, and non-parquet ADDED files
  * refuse loudly — note a MIXED table whose appends are parquet (the
  * Hive-migration shape) streams fine: only the ADDED files are read.
  * Each trigger costs two in-memory manifest walks + O(added files). */
private[streaming] final class IcebergMicroBatchStream(cfg: CatalogConfig,
    ref: TableRef, tableSchema: StructType, startingVersion: Option[String])
  extends MicroBatchStream {

  private val cat: Catalog = CatalogFactory.build(cfg)

  private def conf: Configuration = {
    val c = new Configuration()
    cfg.hadoopConf.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def currentMeta(): (String, String) = {
    val loc = cat.loadTableMetadataLocation(ref)
    (loc, CatalogIO.readMetadataText(loc, conf))
  }

  /** (snapshot id, sequence number) per retained snapshot, seq-sorted. */
  private def snapshots(text: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    Option(root.get("snapshots")).toSeq.flatMap(_.elements().asScala)
      .map(s => (s.path("snapshot-id").asLong(-1L),
        s.path("sequence-number").asLong(0L)))
      .sortBy(_._2).toSeq
  }

  private def lastSeq(text: String): Long =
    snapshots(text).lastOption.map(_._2).getOrElse(0L)

  override def initialOffset(): Offset = SeqOffset(startingVersion match {
    case None => lastSeq(currentMeta()._2) // only appends after stream start
    case Some("earliest") => 0L // full bootstrap, then incremental
    case Some(n) => n.toLongOption.filter(_ >= 1).getOrElse(
      throw new IllegalArgumentException(
        s"startingVersion must be 'earliest' or a sequence number >= 1, " +
          s"got '$n'")) - 1
  })

  override def latestOffset(): Offset = SeqOffset(lastSeq(currentMeta()._2))

  override def deserializeOffset(json: String): Offset =
    SeqOffset(json.trim.toLong)

  @volatile private var lastFactory: PartitionReaderFactory = _

  private def parquetScanOver(paths: Seq[String], dataLocation: String) = {
    val spark = SparkSession.active
    val opts = new CaseInsensitiveStringMap(
      (cfg.hadoopConf + ("basePath" -> dataLocation)).asJava)
    ParquetTable(s"$ref-icestream", spark, opts,
      paths, userSpecifiedSchema = Some(tableSchema),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(opts)
      .build()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[SeqOffset].s, end.asInstanceOf[SeqOffset].s)
    if (e <= s) return Array.empty
    val (loc, text) = currentMeta()
    def refuse(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"$ref: Iceberg sequence range $s..$e is not append-only ($what) " +
          "— restart the stream from a full snapshot read")
    val snaps = snapshots(text)
    def layoutOf(id: Long): graft.catalog.CatalogIO.TableLayout =
      graft.catalog.IcebergFormat.toTableLayout(text, loc, conf, Some(id))
    // the START anchor must be a snapshot retained EXACTLY at the
    // checkpointed sequence: every offset this stream emits is a real
    // snapshot's seq, so a missing one means expireSnapshots dropped it
    // — anchoring at an OLDER survivor (e.g. a tag-pinned snapshot)
    // would silently re-serve rows already emitted (review round 15)
    val fromL: Option[graft.catalog.CatalogIO.TableLayout] =
      if (s == 0) None
      else snaps.find(_._2 == s) match {
        case Some((id, _)) => Some(layoutOf(id))
        case None =>
          refuse(s"the snapshot at checkpointed sequence $s is no longer " +
            "retained (expired?)")
      }
    // the END anchor must match exactly too: `e` is always a seq this
    // stream's latestOffset() observed as a real snapshot, and the
    // checkpoint will record the batch as served THROUGH e — anchoring
    // at a retained predecessor would under-serve the batch and then
    // skip the gap forever
    val toL = snaps.find(_._2 == e) match {
      case Some((id, _)) => layoutOf(id)
      case None =>
        refuse(s"the snapshot at batch-end sequence $e is no longer " +
          "retained (expired?)")
    }
    if (fromL.exists(_.deleteFiles.nonEmpty) || toL.deleteFiles.nonEmpty)
      refuse("live delete files")
    if (toL.renameOps.nonEmpty) refuse("un-materialized column renames")
    if (toL.hasFills) refuse("initial-default fills")
    val fromFiles = fromL.flatMap(_.dataFiles).getOrElse(Nil).toSet
    val toFiles = toL.dataFiles.getOrElse(Nil)
    val removed = fromFiles -- toFiles.toSet
    if (removed.nonEmpty)
      refuse(s"${removed.size} data file(s) removed/rewritten in the range")
    // ADDED files must be parquet — but the TABLE may be mixed (orc base
    // + parquet appends): only the increment is read here
    val formats = toL.dataFileFormats
      .getOrElse(Seq.fill(toFiles.size)(toL.dataFormat))
    val added = toFiles.zip(formats).filterNot { case (f, _) => fromFiles(f) }
    added.collectFirst { case (f, fmt) if fmt != "parquet" =>
      refuse(s"appended file $f is $fmt; streaming reads serve parquet appends")
    }
    if (added.isEmpty) return Array.empty
    val abs = added.map { case (f, _) =>
      new org.apache.hadoop.fs.Path(toL.dataLocation, f).toString }
    val scan = parquetScanOver(abs, toL.dataLocation)
    lastFactory = scan.toBatch.createReaderFactory()
    scan.toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val f = lastFactory
    if (f != null) f
    else {
      val (loc, _) = currentMeta()
      val dataLoc = graft.catalog.CatalogIO.readLayout(loc, conf).dataLocation
      parquetScanOver(Nil, dataLoc).toBatch.createReaderFactory()
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = cat.close()
}
