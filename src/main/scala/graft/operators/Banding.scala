package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH banding tail: band-bucket candidate generation with
  * observe-telemetry, used by the MinHash path ([[Dedup.minhashLsh]]) and
  * the SRP path ([[Similarity.srpCandidates]]).
  *
  * Buckets are a groupBy + sorted collect_list; pairs come from a
  * prefix-slice double explode — exactly n·(n−1)/2 rows per bucket,
  * never the n² a filtered band self-join expands before its a<b
  * predicate. Bucket stats (candidate count, max bucket, bucket count,
  * suppressed buckets) ride the SAME job via `observe` and land in the
  * engine log through [[graft.Telemetry]] — zero extra passes, which at
  * 100 TB is the difference between free and a second corpus scan.
  */
private[operators] object Banding {

  /** `banded` must carry (band, bv, id). Returns distinct (a, b), a < b.
    *
    * `maxBucket > 0` drops buckets above that size from candidate
    * generation — a recall trade for survivability on corpora whose
    * buckets balloon without duplicate structure; the observation's
    * `suppressed_buckets` makes the loss loud, not silent.
    */
  def bucketedPairs(banded: DataFrame, obsName: String, maxBucket: Long): DataFrame = {
    graft.Telemetry.install(banded.sparkSession)
    val buckets = banded.groupBy("band", "bv")
      .agg(sort_array(collect_list(col("id"))).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    val keep = if (maxBucket > 0) col("n") <= maxBucket else lit(true)
    buckets.observe(obsName,
      sum(when(keep, expr("n*(n-1)/2")).otherwise(lit(0))).cast("long").as("candidates"),
      max(col("n")).as("max_bucket"),
      count(lit(1)).as("buckets"),
      sum(when(keep, lit(0)).otherwise(lit(1))).cast("long").as("suppressed_buckets"))
      .filter(keep)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("a"), explode(expr("slice(ids, i + 2, size(ids))")).as("b"))
      .distinct()
  }
}
