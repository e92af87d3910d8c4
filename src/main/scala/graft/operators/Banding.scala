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
      // The bucket table is tiny in BYTES (one row per bucket) but each
      // bucket explodes into n·(n−1)/2 pair rows below — a blowup AQE's
      // byte-based partition coalescing cannot see, so without this it
      // merges the post-agg stage down to ONE task and the entire pair
      // generation (plus the distinct's partial aggregation) runs
      // single-threaded (measured: 4.7 s of 5.5 s in d05 at sf0.1 on one
      // core). An explicit cores-proportional ROUND-ROBIN repartition pins
      // the explode's parallelism (explicit N is exempt from AQE
      // coalescing; a hash repartition on (band, bv) would be elided as
      // redundant against the aggregation's own partitioning) and spreads
      // buckets evenly by COUNT, not bytes. The exchange moves only the
      // bucket rows, so its cost is O(buckets), not O(pairs).
      // defaultParallelism scales with the cluster — no local-shaped
      // constant (guide §2.2/§2.5) — and the max() with the session's
      // configured shuffle width guarantees this pin can only WIDEN the
      // explode stage relative to the plan it replaces, never narrow it
      // on clusters that size shuffle.partitions above the core count.
      .repartition(math.max(
        banded.sparkSession.sparkContext.defaultParallelism,
        banded.sparkSession.sessionState.conf.numShufflePartitions))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("a"), explode(expr("slice(ids, i + 2, size(ids))")).as("b"))
      .distinct()
  }
}
