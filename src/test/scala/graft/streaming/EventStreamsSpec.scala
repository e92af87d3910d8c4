package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** E22 verification: streaming results equal batch results after full
  * file replay (deterministic per FIXTURES.md — `processAllAvailable`).
  */
class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** events.parquet alone in a directory, as a file-stream source. */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def batchEvents: DataFrame = graft.Tables(spark, sfDir, "events")

  /** Stream source normalized at the boundary exactly like the batch
    * path — EventStreams.eventSource delegates to graft.Tables.normalize. */
  private def streamEvents: DataFrame = EventStreams.eventSource(spark, streamDir)

  private def runToCompletion(df: DataFrame, mode: String): Seq[String] = {
    val name = s"sink_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name).collect().map(_.mkString("|")).sorted.toSeq
  }

  test("tumbling window counts: stream == batch after replay") {
    val streamed = runToCompletion(
      EventStreams.tumblingCounts(streamEvents), "complete")
    val batch = EventStreams.tumblingCounts(batchEvents)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("session windows: stream == batch after replay") {
    val streamed = runToCompletion(EventStreams.userSessions(streamEvents), "complete")
    val batch = EventStreams.userSessions(batchEvents)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("watermarked append mode emits only finalized windows (late-data drop)") {
    val appended = runToCompletion(
      EventStreams.tumblingCounts(streamEvents), "append")
    val complete = runToCompletion(
      EventStreams.tumblingCounts(streamEvents), "complete")
    // append can only finalize windows older than max(ts) - watermark
    assert(appended.size < complete.size)
    assert(appended.toSet.subsetOf(complete.toSet))
  }

  test("streaming dedup drops a fully duplicated input file") {
    // stream dir with the same events file twice: every event_id is a dup
    val dir = Files.createTempDirectory("graft-stream-dup")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("b.parquet"))
    val src = EventStreams.eventSource(spark, dir.toString)
    val got = runToCompletion(
      EventStreams.dedupEvents(src).selectExpr("event_id"), "append")
    val want = batchEvents.select("event_id").distinct().count()
    assert(got.size == want)
    assert(got.distinct.size == got.size)
  }

  test("flatMapGroupsWithState threshold alerts match batch cumulative sums") {
    import spark.implicits._
    implicit val s = spark
    val threshold = 50.0
    val streamedDs = streamEvents
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.EventRow]
    val name = s"sink_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = EventStreams.thresholdAlerts(streamedDs, threshold)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // batch: first event_id-ordered cumulative total >= threshold per user
    val batch = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      batchEvents
        .withColumn("ct", sum("value").over(w))
        .filter(col("ct") >= threshold)
        .groupBy("user_id").agg(min(struct(col("event_id"), col("ct"))).as("f"))
        .select(col("user_id"), col("f.ct"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    }
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stream-stream attribution join: stream == batch after replay") {
    val streamed = runToCompletion(
      EventStreams.clickViewAttribution(streamEvents), "append")
    val batch = EventStreams.clickViewAttribution(batchEvents)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("mapGroupsWithState running totals match batch aggregation") {
    import spark.implicits._
    implicit val s = spark
    val streamedDs = streamEvents
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.EventRow]
    val result = {
      val name = s"sink_${java.util.UUID.randomUUID().toString.take(8)}"
      val q = EventStreams.runningUserTotals(streamedDs)
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
      // last update per user is the final running total
      spark.table(name)
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    val batch = batchEvents.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(result == batch)
  }
}
