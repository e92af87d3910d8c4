package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-data pipeline, composed from the engine's
  * operators as ONE declarative DataFrame program (p01) — the workload
  * this engine exists for, run the way a user would actually run it:
  *
  *   documents
  *     ─ drop the eval split (it is never training data)
  *     ─ repetition filter        (t07, Gopher duplicate-n-gram gate)
  *     ─ decontamination          (d07, 5-gram overlap vs the eval split)
  *     ─ near-dup dedup           (d01 exact Jaccard pairs →
  *                                 d06 canonical: keep the best member
  *                                 per duplicate cluster, singletons pass)
  *     ─ stratified sampling      (t05, per-language mixing rates)
  *     ─ sequence packing         (t06, concat-and-chunk shard layout)
  *
  * Every stage is the SAME operator the standalone queries verify, so the
  * composition is oracle-checkable end-to-end: the DuckDB oracle chains
  * the per-stage oracles as CTEs and must reproduce the final packed
  * layout row-for-row — one hash over the whole pipeline.
  *
  * Scale posture is inherited stage-by-stage (each is individually
  * plan-locked and ScaleSmoke-measured): the only corpus-wide shuffles
  * are the dedup candidate generation and the per-shard packing window;
  * filters are scan-side, decontamination joins a broadcast gram set,
  * and sampling is a shuffle-free filter. The two multiply-consumed
  * stage boundaries (the survivor set and the pair table) are
  * materialized via localCheckpoint here; at 100 TB they would be
  * persisted catalog tables (CatalogIO.createTable) consumed by the next
  * stage unchanged — the composition contract (pure `*Of` forms over
  * (doc_id, text, lang) frames) is what makes both deployments the same
  * code.
  */
object Pipeline {

  /** The filtered survivor set entering dedup — the repetition gate,
    * eval-split drop, and decontamination, composed. Exposed separately
    * so plan audits can inspect the pair generation OVER THIS COMPOSED
    * INPUT pre-checkpoint (checkpoint boundaries truncate executedPlan,
    * which would otherwise blind the no-cartesian sweep to the
    * pipeline's quadratic-risk stage). */
  private[graft] def survivorsOf(docs: DataFrame): DataFrame = {
    // eval holdout: never trains, and defines the contamination grams
    val training = docs.filter(col("doc_id") % 10 =!= 7)
    val bench = Dedup.gramsOf(docs.filter(col("doc_id") % 10 === 7))
      .select("g").distinct()

    // Gopher repetition gate — a pass-through projection, no self-join
    val clean = TextOps.repetitionKeepOf(training).filter(col("keep")).drop("keep")

    // decontamination: drop docs sharing any 5-gram with the eval split.
    // Batch keeps the broadcast-HASH-join anti shape (gram table built
    // once, probed per exploded gram) — the plan-locked d07 scale shape.
    clean.join(
      Dedup.contaminationOf(clean, bench).select("doc_id"),
      Seq("doc_id"), "left_anti")
  }

  /** The pipeline's stream-capable prefix: the SAME two gates as
    * [[survivorsOf]] — Gopher repetition, then decontamination — with the
    * decontamination re-expressed as a projection probing a broadcast
    * gram set ([[Dedup.decontaminationKeepOf]]), because a streaming doc
    * source cannot anti-join against ids derived from itself
    * (stream-stream anti joins are unsupported; per-row probe of a
    * static set is). No aggregation, no join, no state — append-mode
    * safe, which is how a 100 TB ingest gates documents continuously
    * while the quadratic-risk dedup stages run batch-side on the gated
    * output. TextStreamSpec proves BOTH equivalences on the same corpus:
    * stream output == batch output of this prefix, and this prefix ==
    * the batch anti-join formulation p01 consumes. Inherits
    * decontaminationKeepOf's eager contract (benchmark grams collected
    * at construction). */
  def streamPrefixOf(training: DataFrame, benchGrams: DataFrame): DataFrame =
    Dedup.decontaminationKeepOf(
        TextOps.repetitionKeepOf(training).filter(col("keep")).drop("keep"),
        benchGrams)
      .filter(col("keep_decon")).drop("keep_decon")

  /** EAGER construction (same contract as Similarity.annIvfOver): the
    * checkpoints below and the component loop inside canonicalOf run
    * Spark jobs when this is CALLED, not at the first action. Checkpoint
    * blocks are reclaimed by the ContextCleaner once the returned frame
    * becomes unreachable; within one invocation they are what bounds
    * recomputation, not a leak. */
  def trainingPipelineOf(docs: DataFrame): DataFrame = {
    // stage boundary: the survivor set is consumed three ways below
    // (pair generation, quality scores, the final anti-joins) — without
    // this checkpoint the scan-side filter/explode work above replays
    // once per reference. At 100 TB this boundary is a persisted catalog
    // table (CatalogIO.createTable) instead; the composition contract is
    // identical.
    val decon = survivorsOf(docs).localCheckpoint()

    // near-dup dedup: detect pairs once (materialized), canonicalize,
    // drop every cluster member except the highest-quality one
    val pairs = Dedup.ngramJaccardOf(decon).select("a", "b").localCheckpoint()
    val canon = Dedup.canonicalOf(pairs,
      TextOps.qualityOf(decon).select(col("doc_id"), col("score")))
    val members = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val losers = members.join(canon.select(col("keep_doc").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val deduped = decon.join(losers, Seq("doc_id"), "left_anti")

    // language mixing, then deterministic packed layout for export
    val sampled = deduped.join(
      TextOps.stratifiedSampleOf(deduped, Map("en" -> 25, "zh" -> 75),
        defaultPct = 50).select("doc_id"),
      "doc_id")
    TextOps.packSequencesOf(sampled, shards = 8, budget = 512L)
  }

  def trainingPipeline(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    trainingPipelineOf(Tables(s, dir, "documents")).orderBy("doc_id")
  }
}
