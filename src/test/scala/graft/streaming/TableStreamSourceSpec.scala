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
}
