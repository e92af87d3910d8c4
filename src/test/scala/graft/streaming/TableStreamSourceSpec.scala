package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.catalog.{CatalogIO, HadoopFsCatalog, Namespace, TableRef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** Streaming FROM a catalog table (TableStream.scala): version numbers
  * are the offsets, each micro-batch is the manifest diff of its
  * version range, and non-append history fails the stream with the
  * batch face's re-sync contract. */
class TableStreamSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshTable(): (HadoopFsCatalog, String, TableRef) = {
    val wh = Files.createTempDirectory("tstream-wh").toString
    val hc = new HadoopFsCatalog("tstream", wh)
    hc.createNamespace(Namespace.of("db"))
    (hc, wh, TableRef.parse("db.t"))
  }

  private def batch(lo: Int, n: Int): DataFrame =
    spark.sql(s"SELECT id AS k, concat('v', id) AS s FROM range($lo, ${lo + n})")

  private def streamFrom(wh: String, starting: Option[String],
      skipRewrites: Boolean = false): DataFrame = {
    var r = spark.readStream.format("graft-table")
      .option("type", "hadoop").option("warehouse", wh).option("table", "db.t")
    starting.foreach(v => r = r.option("startingVersion", v))
    if (skipRewrites) r = r.option("skipRewrites", "true")
    r.load()
  }

  private def sinkRows(name: String): Seq[Long] =
    spark.table(name).select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("micro-batches serve exactly the appended versions, earliest bootstraps") {
    val (hc, wh, ref) = freshTable()
    CatalogIO.createTable(spark, hc, ref, batch(0, 5))        // v1
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, Some("earliest")).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(name) == (0L until 5L)) // full bootstrap of v1
      CatalogIO.commitAppend(spark, hc, ref, batch(100, 3))   // v2
      CatalogIO.commitAppend(spark, hc, ref, batch(200, 2))   // v3
      q.processAllAvailable()
      assert(sinkRows(name) == ((0L until 5L) ++ (100L until 103L) ++ (200L until 202L)))
    } finally q.stop()
  }

  test("default start is the stream-start version: history is skipped") {
    val (hc, wh, ref) = freshTable()
    CatalogIO.createTable(spark, hc, ref, batch(0, 5))        // v1 (history)
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, None).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(name).isEmpty) // nothing before stream start
      CatalogIO.commitAppend(spark, hc, ref, batch(500, 4))   // v2
      q.processAllAvailable()
      assert(sinkRows(name) == (500L until 504L))
    } finally q.stop()
  }

  test("a registered Iceberg pointer streams by its snapshot chain " +
    "(sequence-number offsets; re-pointed commits feed the stream)") {
    import graft.catalog.IcebergExport
    val (hc, wh, ref) = freshTable()
    val dir = s"${Files.createTempDirectory("tstream-ice").toString}/t"
    val meta1 = IcebergExport.writeTable(spark, batch(0, 5).coalesce(1), dir)
    hc.registerTable(ref, meta1)
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, Some("earliest")).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(name) == (0L until 5L)) // bootstrap: snapshot 1
      // the upstream writer commits; the pointer advances
      val meta2 = IcebergExport.appendSnapshot(spark,
        batch(100, 3).coalesce(1), meta1)
      hc.replaceTablePointer(ref, meta2)
      q.processAllAvailable()
      assert(sinkRows(name) == ((0L until 5L) ++ (100L until 103L)))
      // TWO commits inside one trigger serve as one batch
      val meta3 = IcebergExport.appendSnapshot(spark,
        batch(200, 2).coalesce(1), meta2)
      val meta4 = IcebergExport.appendSnapshot(spark,
        batch(300, 2).coalesce(1), meta3)
      hc.replaceTablePointer(ref, meta4)
      q.processAllAvailable()
      assert(sinkRows(name) == ((0L until 5L) ++ (100L until 103L) ++
        (200L until 202L) ++ (300L until 302L)))
      // a DELETE commit is not append-only: the stream must fail loudly
      val meta5 = IcebergExport.appendDeletes(spark, meta4,
        equality = Some(spark.sql("SELECT CAST(0 AS BIGINT) AS k")))
      hc.replaceTablePointer(ref, meta5)
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + msgs(t.getCause)
      assert(msgs(e).contains("not append-only"), msgs(e))
    } finally q.stop()
  }

  test("a MIXED Iceberg table streams its parquet appends (orc base " +
    "registered first; only the increment is read)") {
    import graft.catalog.IcebergExport
    val (hc, wh, ref) = freshTable()
    val dir = s"${Files.createTempDirectory("tstream-mix").toString}/t"
    val meta1 = IcebergExport.writeTable(spark, batch(0, 5).coalesce(1), dir,
      fileFormat = "orc")
    hc.registerTable(ref, meta1)
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    // default start = latest: the ORC base is history, not an increment
    val q = streamFrom(wh, None).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(name).isEmpty)
      val meta2 = IcebergExport.appendSnapshot(spark,
        batch(50, 4).coalesce(1), meta1) // parquet append → mixed table
      hc.replaceTablePointer(ref, meta2)
      q.processAllAvailable()
      assert(sinkRows(name) == (50L until 54L))
    } finally q.stop()
  }

  test("ORC appends stream (round 16): earliest bootstrap of an ORC " +
    "pointer, orc-onto-orc appends, one batch mixing formats; avro refuses") {
    import graft.catalog.IcebergExport
    val (hc, wh, ref) = freshTable()
    val dir = s"${Files.createTempDirectory("tstream-orc").toString}/t"
    val meta1 = IcebergExport.writeTable(spark, batch(0, 5).coalesce(1), dir,
      fileFormat = "orc")
    hc.registerTable(ref, meta1)
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, Some("earliest")).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(name) == (0L until 5L),
        "earliest bootstrap must serve the ORC base through the ORC reader")
      // orc-onto-orc: the table stays homogeneous and the appends flow
      val meta2 = IcebergExport.appendSnapshot(spark,
        batch(100, 3).coalesce(1), meta1, fileFormat = "orc")
      hc.replaceTablePointer(ref, meta2)
      q.processAllAvailable()
      assert(sinkRows(name) == ((0L until 5L) ++ (100L until 103L)))
      // ONE trigger covering an orc append AND a parquet append: the
      // batch mixes formats and each file reads through its own factory
      val meta3 = IcebergExport.appendSnapshot(spark,
        batch(200, 2).coalesce(1), meta2, fileFormat = "orc")
      val meta4 = IcebergExport.appendSnapshot(spark,
        batch(300, 2).coalesce(1), meta3) // parquet
      hc.replaceTablePointer(ref, meta4)
      q.processAllAvailable()
      assert(sinkRows(name) == ((0L until 5L) ++ (100L until 103L) ++
        (200L until 202L) ++ (300L until 302L)),
        "a mixed-format batch must serve both format groups")
      // avro appends refuse loudly at plan time
      val meta5 = IcebergExport.appendSnapshot(spark,
        batch(400, 2).coalesce(1), meta4, fileFormat = "avro")
      hc.replaceTablePointer(ref, meta5)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + msgs(t.getCause)
      assert(msgs(e).contains("parquet and ORC appends only"), msgs(e))
      // columnar DEMOTION (round-16 review): with ORC vectorization
      // OFF, a mixed parquet+ORC batch's per-format verdicts DISAGREE —
      // the plan must demote the whole batch to row-based (Spark's
      // all-or-none rule), not die on 'cannot mix row-based and
      // columnar'. A fresh stream (its session conf snapshots at
      // start) bootstraps the orc-base + parquet-append history as one
      // mixed batch.
      hc.replaceTablePointer(ref, meta4) // back to the parquet+orc state
      val orcVect = "spark.sql.orc.enableVectorizedReader"
      val priorVect = spark.conf.get(orcVect)
      val name2 = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
      val q2 = try {
        spark.conf.set(orcVect, "false")
        streamFrom(wh, Some("earliest")).writeStream
          .format("memory").queryName(name2).outputMode("append").start()
      } finally spark.conf.set(orcVect, priorVect)
      try {
        q2.processAllAvailable()
        assert(spark.table(name2).select("k").collect()
          .map(_.getLong(0)).sorted.toSeq ==
          ((0L until 5L) ++ (100L until 103L) ++ (200L until 202L) ++
            (300L until 302L)),
          "a columnar-disagreeing mixed batch must demote to rows and serve")
      } finally q2.stop()
    } finally q.stop()
  }

  test("an identity-partitioned Iceberg pointer streams: bootstrap and " +
    "appends serve the manifest partition values as per-file fills") {
    import graft.catalog.IcebergExport
    import org.apache.spark.sql.functions.col
    val (hc, wh, ref) = freshTable()
    val dir = s"${Files.createTempDirectory("tstream-part").toString}/t"
    // partitioned base: files lack p; every p value rides the manifest
    val mk = (lo: Int, n: Int) => spark.sql(
      s"SELECT id AS k, concat('v', id) AS s, CAST(id % 3 AS INT) AS p " +
        s"FROM range($lo, ${lo + n})")
    val meta1 = IcebergExport.writeTable(spark, mk(0, 9).coalesce(1), dir,
      partitionBy = Seq("p"))
    hc.registerTable(ref, meta1)
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = spark.readStream.format("graft-table")
      .option("type", "hadoop").option("warehouse", wh).option("table", "db.t")
      .option("startingVersion", "earliest").load()
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      def got(): Map[Long, Int] = spark.table(name).select("k", "p")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got() == (0L until 9L).map(k => k -> (k % 3).toInt).toMap,
        "the bootstrap must serve p from the manifest partition records")
      // a parquet append (files still lack p) and an ORC append — the
      // table goes mixed-with-fills and the stream keeps serving
      val meta2 = IcebergExport.appendSnapshot(spark, mk(100, 3), meta1)
      val meta3 = IcebergExport.appendSnapshot(spark, mk(200, 3), meta2,
        fileFormat = "orc")
      hc.replaceTablePointer(ref, meta3)
      q.processAllAvailable()
      assert(got() == ((0L until 9L) ++ (100L until 103L) ++
        (200L until 203L)).map(k => k -> (k % 3).toInt).toMap,
        "appended hive-layout files must serve their partition fills")
      // NULL-masking sanity via a filter on the fill column post-sink
      assert(spark.table(name).filter(col("p") === 1).count() ==
        ((0L until 9L) ++ (100L until 103L) ++ (200L until 203L))
          .count(_ % 3 == 1))
    } finally q.stop()
  }

  test("an ADOPTED ORC table bootstraps through the graft stream source " +
    "(round 16: the parquet-only batch refusal lifted)") {
    import graft.catalog.IcebergExport
    val (hc, wh, ref) = freshTable()
    val dir = s"${Files.createTempDirectory("tstream-oad").toString}/t"
    val meta = IcebergExport.writeTable(spark, batch(0, 6).coalesce(1), dir,
      fileFormat = "orc")
    CatalogIO.adoptIcebergTable(spark, hc, ref, meta)
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, Some("earliest")).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(name) == (0L until 6L),
        "the adopted ORC base must bootstrap through the ORC reader")
      // post-adoption parquet appends keep flowing (mixed history)
      CatalogIO.commitAppend(spark, hc, ref, batch(50, 3))
      q.processAllAvailable()
      assert(sinkRows(name) == ((0L until 6L) ++ (50L until 53L)))
    } finally q.stop()
  }

  test("a non-append commit fails the stream with the re-sync message") {
    val (hc, wh, ref) = freshTable()
    CatalogIO.createTable(spark, hc, ref, batch(0, 5))        // v1
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, None).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      CatalogIO.commitVersion(spark, hc, ref, batch(900, 2))  // overwrite: v2
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .take(8).exists(_.getMessage.contains("not append-only")),
        s"unexpected failure: $e")
    } finally q.stop()
  }

  test("earliest bootstrap refuses live delete files (would resurrect rows)") {
    val (hc, wh, ref) = freshTable()
    CatalogIO.createTable(spark, hc, ref, batch(0, 5))        // v1
    graft.sources.MergeOps.deleteMatchedMergeOnRead(spark, hc, ref,
      spark.sql("SELECT CAST(1 AS BIGINT) AS k"), Seq("k"))   // v2: MOR delete
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, Some("earliest")).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .take(8).exists(_.getMessage.contains("resurrect")), s"unexpected: $e")
    } finally q.stop()
  }

  test("skipRewrites rides a long-lived stream through compaction; appends keep flowing") {
    val (hc, wh, ref) = freshTable()
    CatalogIO.createTable(spark, hc, ref, batch(0, 5))        // v1
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, Some("earliest"), skipRewrites = true).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      CatalogIO.commitAppend(spark, hc, ref, batch(100, 3))   // v2
      q.processAllAvailable()
      // nightly maintenance: full compaction (new segment) — the r10
      // source killed every reader here; skipRewrites serves nothing
      // for the replace commit and keeps the stream alive
      val res = CatalogIO.compactTable(spark, hc, ref)
      assert(res.compacted)
      CatalogIO.commitAppend(spark, hc, ref, batch(200, 2))   // post-compact append
      q.processAllAvailable()
      assert(sinkRows(name) ==
        ((0L until 5L) ++ (100L until 103L) ++ (200L until 202L)),
        "appends across the compaction must flow exactly once")
      // a genuine overwrite still fails the stream loudly
      CatalogIO.commitVersion(spark, hc, ref, batch(0, 1))
      CatalogIO.commitAppend(spark, hc, ref, batch(300, 1))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("re-sync"),
        s"overwrite should keep the re-sync contract: ${e.getCause.getMessage}")
    } finally q.stop()
  }

  test("without skipRewrites a compaction still fails the stream (unchanged contract)") {
    val (hc, wh, ref) = freshTable()
    CatalogIO.createTable(spark, hc, ref, batch(0, 5))
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, Some("earliest")).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      CatalogIO.commitAppend(spark, hc, ref, batch(100, 3))
      assert(CatalogIO.compactTable(spark, hc, ref).compacted)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("re-sync"))
    } finally q.stop()
  }
  test("a RELOCATED Iceberg pointer streams: bootstrap and appends " +
    "read data files outside the table location (round 18)") {
    import graft.catalog.IcebergExport
    val (hc, wh, ref) = freshTable()
    val base = Files.createTempDirectory("tstream-reloc").toString
    val meta1 = IcebergExport.writeTable(spark, batch(0, 8).coalesce(1),
      s"$base/store")
    // re-home: metadata at a sibling dir; manifests + data stay put
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(meta1).getFileSystem(conf)
    def relocate(meta: String, v: Int): String = {
      val text = CatalogIO.readMetadataText(meta, conf)
      val LocRe = """"location"\s*:\s*"([^"]+)"""".r
      val oldLoc = LocRe.findFirstMatchIn(text).get.group(1)
      val newLoc = fs.makeQualified(
        new org.apache.hadoop.fs.Path(s"$base/tbl")).toString
      val out = new org.apache.hadoop.fs.Path(
        s"$base/tbl/metadata/v$v.metadata.json")
      fs.mkdirs(out.getParent)
      val os = fs.create(out, true)
      try os.write(text.replace(s""""location": "$oldLoc"""",
        s""""location": "$newLoc"""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      out.toString
    }
    val reloc1 = relocate(meta1, 1)
    assert(CatalogIO.readLayout(reloc1, conf).hasRelocated)
    hc.registerTable(ref, reloc1)
    val name = s"ts${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    val q = streamFrom(wh, Some("earliest")).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(name) == (0L until 8L),
        "the relocated bootstrap must read the out-of-root files")
      // an append to the ORIGINAL table, re-homed again: the stream
      // rides the snapshot chain over relocated spellings
      val meta2 = IcebergExport.appendSnapshot(spark,
        batch(50, 4).coalesce(1), meta1)
      hc.replaceTablePointer(ref, relocate(meta2, 2))
      q.processAllAvailable()
      assert(sinkRows(name) == ((0L until 8L) ++ (50L until 54L)),
        "appends must flow with their relocated spellings")
    } finally q.stop()
  }

}
