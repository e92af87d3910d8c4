package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` stream (SURVEY §2B
  * E22): event-time windowed aggregation with watermarked late-data
  * handling, session windows, and custom keyed state via
  * mapGroupsWithState. Each transform takes a DataFrame so the same code
  * runs on `readStream` sources and on batch frames — the equivalence the
  * streaming spec asserts (file-replay determinism per FIXTURES.md).
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream source over a directory of events parquet, normalized to
    * [[eventSchema]] regardless of the physical `ts` encoding the driver
    * served (TIMESTAMP(NANOS)-as-long or µs TIMESTAMP_NTZ — both have
    * occurred across testdata re-provisions). A one-file batch peek
    * supplies the physical schema (the file source requires one), then
    * [[graft.Tables.normalize]] applies the same boundary normalization
    * the batch path uses, so `stream == batch` equivalence holds by
    * construction rather than by each caller re-deriving the cast. */
  def eventSource(spark: SparkSession, dir: String,
      /** Source options (round 17 — e.g. Spark's own
        * `maxFilesPerTrigger`, so this source is admission-bounded
        * like the table/pointer streams). */
      options: Map[String, String] = Map.empty): DataFrame = {
    val physical = spark.read.parquet(dir).schema
    graft.Tables.normalize(
      spark.readStream.options(options).schema(physical).parquet(dir),
      "events")
  }

  /** Tumbling 1-hour windows with a 2-hour watermark: counts + exact
    * decimal sums per (window, event_type). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"),
        round(sum(col("value").cast(DecimalType(38, 4))), 4).as("sv"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"),
        col("c"), col("sv"))

  /** Session windows (30-minute gap) per user. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("session_window.start")).as("ss"),
        unix_timestamp(col("session_window.end")).as("se"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup on event_id — the stream face of the
    * pipeline's exact-dedup operators (E19). dropDuplicatesWithinWatermark
    * bounds the dedup state by the watermark instead of keeping every key
    * forever, which is what survives an unbounded 100 TB stream. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Stream-stream inner join with watermarks (attribution): each click
    * joined to the same user's views within the preceding 10 minutes.
    * The time-range condition plus both-side watermarks bound the join
    * state, so this runs indefinitely on an unbounded stream; on batch
    * frames the same code is a plain range join (the equivalence the
    * spec asserts). */
  def clickViewAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("vts"))
      .withWatermark("vts", "1 hour")
    clicks.join(views,
      col("user_id") === col("v_user") &&
        col("vts") <= col("cts") &&
        col("vts") >= col("cts") - expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("user_id"),
        unix_micros(col("cts")).as("cus"), unix_micros(col("vts")).as("vus"))
  }

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  final case class Threshold(user_id: Long, crossed_at_total: Double)

  /** Custom keyed state emitting 0..n rows per group per batch
    * (flatMapGroupsWithState): one alert the first time a user's running
    * value total crosses `threshold`. Rows are folded in event_id order
    * WITHIN each micro-batch, so a given replay is deterministic; global
    * event_id order (and thus exact batch equivalence) additionally
    * requires event_id-ordered arrival across micro-batches — true for
    * single-batch file replay (the spec's setup) and for sources that
    * deliver in id order, but not for arbitrary multi-batch arrival. */
  def thresholdAlerts(events: Dataset[EventRow], threshold: Double)(
      implicit spark: SparkSession): Dataset[Threshold] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, Threshold](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[Double]) =>
          var tot = state.getOption.getOrElse(0.0)
          val out = rows.toSeq.sortBy(_.event_id).flatMap { r =>
            val prev = tot
            tot += r.value
            if (prev < threshold && tot >= threshold) Some(Threshold(uid, tot))
            else None
          }
          state.update(tot)
          out.iterator
      }
  }

  /** Custom keyed state (KeyValueGroupedDataset.mapGroupsWithState):
    * running per-user event count + value total across micro-batches. */
  def runningUserTotals(events: Dataset[EventRow])(
      implicit spark: SparkSession): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { r => n += 1; tot += r.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }
}
