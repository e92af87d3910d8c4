package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for a training-data pipeline (SURVEY §2B E19).
  *
  * Three detectors over the `documents` table, all reporting the same
  * verified output — pairs (a < b) whose exact 3-word-shingle Jaccard is
  * ≥ 0.8 — so they hash-match one DuckDB oracle:
  *
  *  - [[ngramJaccard]]: exact, via AllPairs-style prefix filtering —
  *    each doc indexes only its globally-rarest `(1−τ)·|s|+1` shingles,
  *    which is provably complete for J ≥ τ and immune to the Σ df²
  *    blowup that high-df boilerplate shingles cause a full inverted
  *    index (measured: 77 s → 24 s at 10× sf0.1 with planted
  *    boilerplate).
  *  - [[minhashLsh]]: 32 minhashes → 16 bands × 2 rows; band-bucket
  *    equi-join produces candidates, which are then exactly verified.
  *    At 100 TB this is the shape that survives: the only shuffle is on
  *    (band, bandValue), candidates are a tiny fraction of pairs, and
  *    verification touches candidates only.
  *  - [[simhash]]: 64-bit simhash; 13-block pigeonhole blocking
  *    (hamming ≤ 12 ⇒ some block equal), hamming + Jaccard verify.
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

  /** Exact shingle-Jaccard ≥ 0.8 via prefix filtering (AllPairs/PPJoin
    * candidate generation) + exact verification.
    *
    * Each doc indexes only its `|s| − ⌈τ·|s|⌉ + 1` globally-RAREST
    * shingles (total order = (df, shingle)); the prefix-filter theorem
    * guarantees every pair with J ≥ τ collides on at least one indexed
    * shingle, so recall is exact. This is what survives boilerplate at
    * scale: a full inverted index costs Σ df² — one shared header line
    * across a 50k-doc corpus (df=50k) alone is 1.25B candidate pairs —
    * while prefixes hold only rare shingles, so high-df boilerplate never
    * generates candidates. Measured at 10× sf0.1 with planted
    * boilerplate: 77 s (full index) → seconds (prefix). Shuffles: one df
    * aggregation, one df join, one prefix self-join, then
    * candidates-only verification.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val tau = 0.8
    val sh = shingled(s, dir)
    val ex = sh.selectExpr("doc_id", "size(sh) AS sz", "explode(sh) AS s")
    val df = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    // df = 1 shingles must participate in the prefix RANKING (they are
    // the rarest), but can never match another doc — drop them after.
    val prefix = ex.join(df, "s")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * tau) + 1)
      .filter(col("df") >= 2)
      .select("doc_id", "s")
    val cand = prefix.as("x")
      .join(prefix.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    verified(cand, sh)
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

  /** Canonical selection — the step after near-dup detection in a
    * training-data pipeline: group duplicate pairs into clusters
    * (connected components) and keep ONE representative per cluster, the
    * highest-quality member.
    *
    * Components come from min-label propagation over the undirected pair
    * graph: every vertex starts labeled with its own id, and each round
    * takes the min of its own and its neighbors' labels until fixpoint —
    * each round is one join + one aggregation, so the loop is a driver
    * loop over declarative plans, converging in O(component diameter)
    * rounds (near-dup clusters are shallow; typically ≤ 3). At 100 TB
    * the same loop holds because labels/edges shuffle on id — for
    * adversarially long chains the large-star/small-star variant
    * (Kiveris et al., "Connected Components in MapReduce") halves the
    * diameter per round with the same join+agg primitives.
    *
    * The representative is argmax by the t02 quality score (tie-broken
    * by min doc_id); the component label converges to the min member id,
    * which the oracle reproduces via a recursive-CTE closure.
    */
  def canonical(s: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccard(s, dir).select(col("a"), col("b"))
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
      .cache()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .cache()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 50) {
      val nbrMin = edges
        .join(labels.select(col("id").as("b"), col("comp").as("bcomp")), "b")
        .groupBy(col("a").as("id")).agg(min(col("bcomp")).as("nbrComp"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"))
        .cache()
      changed = next.join(labels.select(col("id"), col("comp").as("old")), "id")
        .filter(col("comp") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    val quality = TextOps.quality(s, dir).select(col("doc_id"), col("score"))
    val w = Window.partitionBy(col("comp")).orderBy(col("score").desc, col("id"))
    labels
      .join(quality, labels("id") === quality("doc_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("comp"))
      .agg(max(when(col("rn") === 1, col("id"))).as("keep_doc"),
        count(lit(1)).as("n_members"))
      .orderBy(col("comp"))
  }

  /** 64-bit SimHash with 13-block pigeonhole blocking (12×5 bits +
    * 1×4 bits — any pair within hamming ≤ 12 shares a block), hamming
    * ≤ 12 pre-filter, then exact Jaccard verification. The simhash
    * itself is the codegen'd [[graft.functions.SimHash64]] expression —
    * the interpreted HOF formulation took ~21 ms/doc and dominated the
    * whole pipeline. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val sim = sh
      .withColumn("hs", expr("transform(sh, x -> xxhash64(x))"))
      .withColumn("sim", expr("graft_simhash(hs)"))
      .select("doc_id", "sim")
    // Pigeonhole blocking: 13 blocks (12×5 bits + 1×4 bits) guarantee
    // that any pair within hamming ≤ 12 shares at least one block —
    // exactly the radius of the pre-filter below, with 2.3× fewer
    // bucket-internal candidate pairs than 4-bit blocks. Measured
    // separation on this corpus: true pairs ≤ 10 vs impostors ≥ 14.
    // SimHash blocking is inherently the small-radius (J ≳ 0.95) tool;
    // at J ≥ 0.8 scale the MinHash-LSH path (d02) is the one whose
    // buckets track duplicate clusters rather than corpus size.
    val blocks = sim.select(col("doc_id"), col("sim"),
      posexplode(expr(
        """transform(sequence(0, 12), k ->
          | CASE WHEN k < 12 THEN shiftright(sim, k * 5) & 31
          |  ELSE shiftright(sim, 60) & 15 END)""".stripMargin))
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
