package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Operational telemetry for operators that attach `observe(...)` metrics
  * to their plans (e.g. [[graft.operators.Dedup.minhashLsh]]'s band-bucket
  * stats): a once-per-session QueryExecutionListener that, after every
  * successful action, logs any observation whose name starts with
  * `graft_`.
  *
  * Why observe + listener instead of a stats job: the metrics ride the
  * SAME job as the query via accumulators, so an operator gets
  * bucket-size / candidate-count visibility at zero extra passes — the
  * difference between free and a full corpus re-scan at 100 TB. The
  * trade is that metrics arrive AFTER the action, so they are a loud
  * post-hoc signal (log-scraped by ops, asserted by specs), not a
  * pre-execution guard; pre-execution refusal is a separate knob on the
  * operators that need one.
  */
object Telemetry {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.catalog.telemetry")

  /** Last value seen per observation name, for specs (driver-side only). */
  @volatile private var lastSeen: Map[String, Map[String, Any]] = Map.empty

  def last(name: String): Option[Map[String, Any]] = lastSeen.get(name)

  /** Drop recorded observations (specs call this before re-running a
    * query so [[await]] sees the fresh value, not a stale one). */
  def clear(): Unit = lastSeen = Map.empty

  /** [[last]] with a bounded poll: the listener bus delivers onSuccess
    * asynchronously, so the metric can trail the action by a beat. */
  def await(name: String, timeoutMs: Long = 10000L): Option[Map[String, Any]] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var got = last(name)
    while (got.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(20)
      got = last(name)
    }
    got
  }

  private final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        if (name.startsWith("graft_")) {
          val kv = row.schema.fieldNames.zip(row.toSeq).toMap
          lastSeen = lastSeen.updated(name, kv)
          log.info(s"$name ${kv.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
        }
      }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
  }

  /** Register the listener once per session (conf-flagged, idempotent). */
  def install(spark: SparkSession): Unit =
    if (spark.conf.getOption("spark.graft.telemetry.installed").isEmpty) {
      spark.listenerManager.register(new Listener)
      spark.conf.set("spark.graft.telemetry.installed", "true")
    }
}
