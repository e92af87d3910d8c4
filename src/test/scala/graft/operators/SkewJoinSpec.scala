package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Locks the SURVEY §4.3 claim that AQE's skew-join handling covers the
  * LSH band-bucket self-joins (d02/d05): a boilerplate cluster that lands
  * thousands of docs in ONE (band, bandValue) bucket must be split by
  * `spark.sql.adaptive.skewJoin` rather than serializing one giant
  * partition — at 100 TB a hot bucket is otherwise the stage straggler.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("AQE splits a deliberately hot LSH band bucket (skew=true in final plan)") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: the production defaults (256 MB / 5×
      // median) only trip on real data volumes
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot bucket (1500 docs share band 0 / bv 0 — a boilerplate
      // cluster) over a background of singleton buckets
      val hot = (0 until 1500).map(i => (i.toLong, 0, 0L))
      val bg = (0 until 3000).map(i => ((10000 + i).toLong, 1 + i % 7, (i % 500).toLong))
      val banded = (hot ++ bg).toDF("doc_id", "band", "bv")
      // the d02/d05 candidate-join shape
      val cand = banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.bv" === $"y.bv" && $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("a"), $"y.doc_id".as("b"))
      // execute THIS query execution, then read its finalized adaptive plan
      val rows = cand.collect()
      // background keys are all singletons, so candidates = hot pairs only
      assert(rows.length == 1500 * 1499 / 2)
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
