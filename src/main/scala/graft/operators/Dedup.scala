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

  /** Operational telemetry rides the engine's log channel (R22): the
    * logger sits under `graft.catalog`, so [[graft.catalog.EngineLogFile]]
    * routes it into the run's `catalog_migration.log` alongside the
    * migration lines. */
  private val log = org.slf4j.LoggerFactory.getLogger("graft.catalog.dedup")

  /** doc_id + distinct 3-word shingles (the unit of textual identity).
    * Shingling is the codegen'd [[graft.functions.Shingle3]]; the HOF
    * formulation it replaced cost ~0.6 ms/doc interpreted and is
    * recomputed per reference in the self-join pipelines below. */
  def shingledOf(docs: DataFrame): DataFrame =
    // NO narrow-scan spread here (round 21): round 20 spread this front
    // and the driver's cold 32-core bench read d01/d02/d03 at 2-3x their
    // round-19 times (anti-scaling: the same code ran 2-3x FASTER at 8
    // cores), because the added exchange ships the full text column and
    // pays a single-task sort-before-repartition under contention. The
    // warm same-session A/Bs that justified it measured the opposite —
    // an optimization that inverts under load is not one. Reverted to
    // the round-19 shape the driver measured at d01 2.26 / d03 1.68.
    docs.selectExpr("doc_id", "graft_shingles(split(lower(text), ' ')) AS sh")

  /** [[shingledOf]] mapped into the 64-bit hash domain: every shingle is
    * replaced by its xxhash64 image, and ALL downstream work — document
    * frequencies, prefix indexing, candidate self-joins, and exact
    * verification — runs over longs. Two reasons, both scale-bound:
    *
    *  - shuffle payload: an 8-byte long vs a ~30-byte UTF-8 trigram cuts
    *    the dominant shuffles (exploded-shingle df agg, prefix self-join,
    *    and above all the candidate-verify join that ships both docs'
    *    full shingle arrays per candidate pair) by ~4×. This is what
    *    brought the exact path's 50× ScaleSmoke run back inside a single
    *    node's scratch disk (SURVEY §6.1).
    *  - compare cost: array_intersect over longs beats string equality
    *    in the verify inner loop.
    *
    * Exactness: Jaccard over hash images equals Jaccard over strings
    * unless two distinct shingles in the compared pair collide in 64
    * bits — probability < 1e-13 per pair for 1k-shingle docs, and the
    * string-side DuckDB oracle certifies zero collisions on every gated
    * corpus. `array_distinct` guards the (equally improbable) intra-doc
    * collision so set sizes stay consistent. */
  def hashedShingledOf(docs: DataFrame): DataFrame =
    shingledOf(docs).selectExpr("doc_id",
      "array_distinct(transform(sh, x -> xxhash64(x))) AS sh")

  def shingled(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    hashedShingledOf(Tables(s, dir, "documents"))
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
    graft.functions.VectorFunctions.register(s)
    ngramJaccardOf(Tables(s, dir, "documents"), materialize = true)
  }

  /** [[ngramJaccard]] over any (doc_id, text) frame — the composable
    * face p01 uses on the post-filter survivor set. `materialize` folds
    * the four text passes (df aggregation + prefix join + both verify
    * sides) into one stored shingle table (round 14, as in [[simhash]])
    * — right for a full-corpus run, a net LOSS for p01's small
    * post-filter survivor set, where recompute is cheaper than the
    * extra job + storage barrier (measured 2.5 s vs 3.2 s), so the
    * composable face defaults off. */
  def ngramJaccardOf(docs: DataFrame, materialize: Boolean = false): DataFrame = {
    val tau = 0.8
    val sh0 = hashedShingledOf(docs)
    val sh = if (materialize) sh0.localCheckpoint() else sh0
    val ex = sh.selectExpr("doc_id", "size(sh) AS sz", "explode(sh) AS s")
    val df = ex.groupBy("s").agg(count(lit(1)).as("df"))
    // prefix filtering only needs SOME globally-consistent total order of
    // shingles; (df, hash image) is one, so the hash domain changes the
    // candidate set at most cosmetically and the verified output not at
    // all
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

  /** MinHash + LSH banding (32 hashes; default 16 bands × 2 rows ⇒
    * catches J ≥ ~0.7 with near-certainty), then exact verification. The
    * 32 signature mins come from the codegen'd
    * [[graft.functions.MinHash32]] (one pass over the hash array)
    * instead of 32 interpreted transform/array_min columns.
    *
    * Bucketing is a groupBy + sorted collect_list, and candidate pairs
    * come from a per-bucket prefix-slice double explode — exactly
    * n·(n−1)/2 rows per bucket, never the n² a filtered self-join
    * expands first. Bucket-size telemetry rides the SAME job via
    * `observe` (zero extra passes over the corpus — at 100 TB a
    * pre-flight count would itself be a full scan):
    * candidates/max-bucket/bucket-count land in the engine log through
    * [[graft.Telemetry]] after every action.
    *
    * Operational knobs for corpora where band buckets balloon without a
    * duplicate gap (candidates explode while emitted pairs stay small):
    *  - `spark.graft.lsh.rowsPerBand` (default 2; must divide 32): more
    *    rows per band moves the S-curve midpoint `(1/b)^(1/r)` up
    *    (2 rows → 0.25, 4 rows → 0.59), trading guaranteed-recall
    *    margin at τ = 0.8 for selectivity against mid-J corpora.
    *  - `spark.graft.lsh.maxBucket` (default 0 = unbounded): buckets
    *    larger than this are DROPPED from candidate generation — a
    *    documented recall trade for survivability; the telemetry line
    *    reports how many buckets were suppressed so the loss is loud,
    *    not silent. Off by default: the oracle gate requires exact
    *    recall at τ = 0.8.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val rowsPerBand = s.conf.getOption("spark.graft.lsh.rowsPerBand").map(_.toInt).getOrElse(2)
    val maxBucket = s.conf.getOption("spark.graft.lsh.maxBucket").map(_.toLong).getOrElse(0L)
    graft.Telemetry.install(s)
    // materialized once (round 14, as in [[simhash]]): banding reads it
    // once and the verify join twice — three corpus text passes folded
    // into one compute + stored reads
    val sh = shingled(s, dir).localCheckpoint()
    val banded = bandedSigs(sh, rowsPerBand).select(col("doc_id").as("id"),
      col("band"), col("bv"))
    val cand = Banding.bucketedPairs(banded, "graft_lsh_d02", maxBucket)
    verified(cand, sh)
  }

  /** (doc_id, band, bv) MinHash band signatures of hash-shingled docs —
    * the shared banding front of [[minhashLsh]] (self-dedup) and
    * [[fuzzyContaminationOf]] (cross-corpus). */
  private def bandedSigs(sh: DataFrame, rowsPerBand: Int): DataFrame = {
    require(rowsPerBand > 0 && 32 % rowsPerBand == 0,
      s"rowsPerBand must divide 32, got $rowsPerBand")
    val nBands = 32 / rowsPerBand
    // gram-less docs (<3 tokens) have NO minhash signature — banding
    // them would give every such doc identical all-null band values,
    // making each pair of short docs a candidate in EVERY band (a
    // quadratic blowup on crawl corpora full of near-empty docs) and
    // sending 0/0 Jaccards into verification. They can never clear a
    // shingle-Jaccard gate, so they simply don't band — matching the
    // oracle, whose shingle-intersection join emits no rows for them.
    val sigs = sh.filter(size(col("sh")) > 0)
      .withColumn("mh", expr("graft_minhash(sh)"))
    val bandCols = (0 until nBands).map { k =>
      val rows = (0 until rowsPerBand).map(j =>
        element_at(col("mh"), rowsPerBand * k + j + 1))
      xxhash64(rows :+ lit(k): _*)
    }
    sigs.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bv")))
  }

  /** Fuzzy (near-duplicate) decontamination (d09): training docs whose
    * shingle Jaccard against ANY benchmark doc clears τ = 0.8 — the
    * near-dup face of [[contaminationOf]]'s exact 5-gram scrub, the
    * standard fuzzy train/eval-overlap policy (GPT-3's 13-gram overlap
    * removal, PaLM's fuzzy decontamination) where paraphrased or
    * lightly-edited benchmark copies slip past exact gram matching.
    *
    * Scale shape: the benchmark side is eval-suite-sized by
    * construction, so its band signatures AND its shingle arrays ride
    * broadcasts — the corpus is banded map-side, candidates come from a
    * broadcast equi-join on (band, bv), and the exact-verify join ships
    * only the CANDIDATES' shingle arrays. The corpus never shuffles;
    * cost is O(corpus) map work + O(candidates) verification, the same
    * envelope as [[decontaminationKeepOf]]'s exact face. Emits verified
    * pairs only (no LSH false positives); recall at τ follows d02's
    * measured exact-recall regime (16 bands × 2 rows). */
  def fuzzyContaminationOf(train: DataFrame, bench: DataFrame,
      rowsPerBand: Int = 2): DataFrame = {
    val tb = bandedSigs(train, rowsPerBand)
      .select(col("doc_id").as("a"), col("band"), col("bv"))
    val bb = bandedSigs(bench, rowsPerBand)
      .select(col("doc_id").as("b"), col("band"), col("bv"))
    val cand = tb.join(broadcast(bb), Seq("band", "bv"))
      .select("a", "b").distinct()
    cand
      .join(train.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
      .join(broadcast(bench.select(col("doc_id").as("b"), col("sh").as("shb"))), "b")
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jr",
        col("common") * 1.0 / (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jr") >= 0.8)
      .select(col("a").as("doc_id"), col("b").as("bench_id"),
        round(col("jr"), 4).as("j"))
  }

  def fuzzyDecontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val docs = Tables(s, dir, "documents")
    val bench = hashedShingledOf(docs.filter(col("doc_id") % 10 === 7))
    val train = hashedShingledOf(docs.filter(col("doc_id") % 10 =!= 7))
    fuzzyContaminationOf(train, bench).orderBy("doc_id", "bench_id")
  }

  /** One large-star round (Kiveris et al., "Connected Components in
    * MapReduce and Beyond"): every node's strictly-larger neighbors are
    * rewired to the minimum of its closed neighborhood. Expressed as one
    * groupBy-min + one equi-join — no neighborhood materialization, so a
    * high-degree hub never concentrates in one task's memory. */
  private def largeStar(e: DataFrame): DataFrame = {
    val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = bidir.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    bidir.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
    // NO trailing distinct (round 20, guide §2.4): each round runs
    // largeStar→smallStar, and smallStar ends in a distinct — duplicate
    // edges surviving this stage only widen smallStar's (tiny) agg/join
    // inputs, while the removed exchange+aggregate was a full pass over
    // the edge set EVERY round. Set semantics at round end unchanged.
  }

  /** One small-star round: orient each edge large→small, then every
    * node's smaller neighbors — and the node itself — rewire to its
    * minimum neighbor. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v")).filter(col("u") =!= col("v"))
    val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
    dir.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Connected components over an undirected pair table (a, b) →
    * (id, comp) where comp is the component's minimum member id.
    *
    * Alternating large-star/small-star rounds converge in O(log n) —
    * each round at least halves star heights, so a 4096-node chain
    * closes in ~12 rounds where plain min-label propagation needs 4096
    * (locked by the planted-chain spec). Every round's edge set is
    * `localCheckpoint`ed: the logical plan stays one round deep instead
    * of growing per iteration (the planner-time hazard at a high round
    * cap), and the checkpoint doubles as the materialization the
    * convergence signature reads. Convergence = fixpoint of the edge
    * set, detected by an exact (count, endpoint-xor, xxhash-xor)
    * signature (xor, not sum: overflow-free under ANSI arithmetic) —
    * one driver-side agg per round, the unavoidable convergence
    * round-trip. A graph still moving at `maxRounds` THROWS rather than
    * returning silently split components.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    // Convergence signature rides the CHECKPOINT pass (round 21, guide
    // §2.4/§5): `observe` attaches the (count, xor, xor, xor) aggregates
    // as accumulator-backed observed metrics on the frame being
    // localCheckpoint'ed, so the one materialization job per round also
    // yields the signature — the separate driver-side `agg().collect()`
    // job per round (~0.1-0.15 s of pure job overhead each, 2 jobs/round
    // → 1) is gone. Same aggregates, same values: the fixpoint test is
    // unchanged.
    def observed(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (df.observe(obs, count(lit(1)).as("n"), bit_xor(col("u")).as("xu"),
        bit_xor(col("v")).as("xv"),
        bit_xor(xxhash64(col("u"), col("v"))).as("xh")), obs)
    }
    def sigOf(obs: org.apache.spark.sql.Observation): Seq[Any] = {
      val m = obs.get
      Seq(m("n"), m("xu"), m("xv"), m("xh"))
    }
    val (e0, obs0) = observed(pairs.select(col("a").as("u"), col("b").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    var e = e0.localCheckpoint()
    // Dataset.unpersist only clears cacheManager entries, not the RDD a
    // localCheckpoint persisted — free that RDD directly via the
    // LogicalRDD leaf. Eviction is what bounds block-manager residency at
    // two edge-set copies instead of one per round (up to maxRounds).
    def freeCheckpoint(df: DataFrame): Unit =
      df.queryExecution.analyzed.collectLeaves().foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    var cur = sigOf(obs0)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // eager localCheckpoint: `next` is materialized here, so the
      // previous round's blocks are dead the moment it returns — and the
      // observed metrics are final the moment the materialization job
      // completes (obs.get below only awaits the listener callback)
      val (nextO, obs) = observed(smallStar(largeStar(e)))
      val next = nextO.localCheckpoint()
      freeCheckpoint(e)
      val ns = sigOf(obs)
      converged = ns == cur
      e = next
      cur = ns
      round += 1
      // per-round edge count: the one operational signal of a dedup run
      // at scale — a count that stops shrinking early means a star-forest
      // fixpoint is near; a count still moving at maxRounds means the
      // graph is deeper than budgeted
      log.info(s"connectedComponents round $round: ${ns.head} edges" +
        (if (converged) " (converged)" else ""))
    }
    if (!converged) {
      log.error(s"connectedComponents did NOT converge in $maxRounds rounds")
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds — " +
          "component structure deeper than the round budget; raise maxRounds")
    }
    log.info(s"connectedComponents converged in $round rounds")
    // fixpoint is a star forest: every edge is (member, component min);
    // minima label themselves
    e.select(col("u").as("id"), col("v").as("comp"))
      .union(e.select(col("v").as("id"), col("v").as("comp")))
      .distinct()
  }

  /** Canonical selection — the step after near-dup detection in a
    * training-data pipeline: group duplicate pairs into clusters
    * (connected components) and keep ONE representative per cluster, the
    * highest-quality member.
    *
    * Pipeline composition: `pairs` is whatever a detector (d01–d05)
    * produced — at scale a PERSISTED pair table consumed as-is, never
    * re-derived inside the component loop. The representative is argmax
    * by the `quality` score (tie-broken by min doc_id); the component
    * label converges to the min member id, which the oracle reproduces
    * via a recursive-CTE closure.
    */
  def canonicalOf(pairs: DataFrame, quality: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val labels = connectedComponents(pairs, maxRounds)
    val w = Window.partitionBy(col("comp")).orderBy(col("score").desc, col("id"))
    labels
      .join(quality, labels("id") === quality("doc_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("comp"))
      .agg(max(when(col("rn") === 1, col("id"))).as("keep_doc"),
        count(lit(1)).as("n_members"))
      .orderBy(col("comp"))
  }

  /** d06 query face: exact-Jaccard pairs (d01) composed with the t02
    * quality score for representative selection. The detector runs
    * exactly once — [[connectedComponents]]' own eager initial
    * localCheckpoint materializes the pair table (and frees it with the
    * round loop); a second checkpoint here would leak a never-freed
    * copy in the block manager. */
  def canonical(s: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccard(s, dir).select(col("a"), col("b"))
    canonicalOf(pairs, TextOps.quality(s, dir).select(col("doc_id"), col("score")))
  }

  /** 64-bit SimHash with 13-block pigeonhole blocking (12×5 bits +
    * 1×4 bits — any pair within hamming ≤ 12 shares a block), hamming
    * ≤ 12 pre-filter, then exact Jaccard verification. The simhash
    * itself is the codegen'd [[graft.functions.SimHash64]] expression —
    * the interpreted HOF formulation took ~21 ms/doc and dominated the
    * whole pipeline. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    // MATERIALIZE the shingle table once (round 14): without it the
    // candidate self-join's two sides AND the verify join's two sides
    // each re-run the whole text→shingle→hash pipeline — four corpus
    // passes for one logical computation. localCheckpoint stores the
    // hashed-shingle table executor-local (memory-and-disk, the
    // standard compute-signatures-once materialization of a SimHash
    // pipeline); every downstream join reads the stored table instead.
    val sh = shingled(s, dir).localCheckpoint()
    // gram-less docs share one degenerate simhash (every block equal,
    // hamming 0) — the same quadratic short-doc hazard as MinHash
    // banding; they can never clear the Jaccard verify, so skip them
    val sim = sh.filter(size(col("sh")) > 0)
      .withColumn("sim", expr("graft_simhash(sh)"))
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

  /** Benchmark decontamination (d07): flag training documents that share
    * any 5-word shingle with the evaluation/benchmark set — the standard
    * train/eval overlap scrub in an LLM data pipeline. Here the
    * benchmark split is `doc_id % 10 == 7` (an eval holdout riding in
    * the same table); in production it would be a separate small table.
    *
    * Scale shape (the part that matters at 100 TB): the benchmark n-gram
    * set is the DISTINCT shingles of the eval suite — megabytes, not
    * corpus-sized — so it is `broadcast()` and the training corpus joins
    * against it map-side. The corpus side is never shuffled on the gram:
    * the only corpus-wide movement is the final per-doc count of hits,
    * which aggregates the (tiny) matched subset. A shuffle join on grams
    * here would move the whole exploded corpus; the broadcast shape is
    * locked by PlanAuditSpec. 5-gram width: long enough to be rare in
    * clean text (30-word synthetic vocab ⇒ 24M possible 5-grams), short
    * enough to catch paraphrase-free contamination.
    */
  /** Per-doc distinct 5-word shingles, exploded to (doc_id, g) rows. */
  def gramsOf(docs: DataFrame): DataFrame =
    // un-spread in round 21 with [[shingledOf]] (same wide-payload
    // exchange mechanism; driver read d07 0.80x with the spread)
    docs.selectExpr("doc_id",
        "graft_shingles_n(split(lower(text), ' '), 5) AS gs")
      .select(col("doc_id"), explode(col("gs")).as("g"))

  /** Pure contamination check of `docs` against a benchmark gram set —
    * stream-capable: the corpus side is a stateless explode + map-side
    * broadcast join, so the same plan runs over `readStream` documents
    * against a static benchmark table (the per-doc count then runs as a
    * streaming aggregation; see TextStreamSpec). */
  def contaminationOf(docs: DataFrame, benchGrams: DataFrame): DataFrame =
    gramsOf(docs)
      .join(broadcast(benchGrams), "g")
      // shingles are distinct within a doc, so plain count == distinct
      // shared-gram count (no count-distinct shuffle needed)
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))

  /** Projection-shaped keep/drop face of decontamination — the stream
    * filter: the benchmark gram set is collected ONCE (eval-suite-sized,
    * the same bound d07's broadcast relies on) and shipped as a Spark
    * broadcast variable whose hash set every executor builds once; the
    * per-doc verdict is then a pure projection probing that set O(1) per
    * gram. No per-doc aggregation and no anti-join means the identical
    * plan runs over `readStream` documents in append mode (TextStreamSpec
    * proves batch ≡ stream AND ≡ the batch anti-join formulation).
    *
    * Why not built-ins: `arrays_overlap`/`array_contains` against the
    * gram set as an ARRAY column rebuild the probe set per ROW —
    * O(docs × |bench|), a scale cliff the broadcast-join batch path
    * (`contaminationOf`) never pays. A shared once-built hash table needs
    * either a join (not stream-safe as a per-doc anti) or a broadcast
    * variable probe; this is the latter, the same pattern as Spark's own
    * dynamic-partition-pruning subquery broadcast.
    *
    * EAGER CONTRACT (like Similarity.annIvfOver): collects the benchmark
    * grams at construction time. */
  def decontaminationKeepOf(docs: DataFrame, benchGrams: DataFrame): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(
      benchGrams.select("g").collect().map(_.getString(0)).toSet)
    // null/empty gram sets KEEP the doc — zero grams means zero overlap,
    // matching the batch anti-join (a gram-less doc never appears on the
    // contaminated side), so stream ≡ batch holds on null-text corpora too
    val cleanUdf = udf((gs: Seq[String]) =>
      gs == null || !gs.exists(bc.value.contains))
    docs.withColumn("keep_decon",
      cleanUdf(expr("graft_shingles_n(split(lower(text), ' '), 5)")))
  }

  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val docs = Tables(s, dir, "documents")
    val bench = gramsOf(docs.filter(col("doc_id") % 10 === 7))
      .select("g").distinct()
    contaminationOf(docs.filter(col("doc_id") % 10 =!= 7), bench)
      .orderBy("doc_id")
  }

  /** Exact SUBSTRING dedup (SURVEY §2B E34): remove from every document
    * each token span covered by a `k`-gram that occurs in more than
    * `maxDf` documents — the scale-shaped re-expression of
    * suffix-array duplicated-substring removal (the public "dedup makes
    * LMs better" recipe): a corpus-wide suffix array is
    * single-machine-bound, while k-gram coverage marking is pure
    * dataflow. d01–d07 decide which DOCUMENTS are duplicates; this is
    * the span-level face that scrubs repeated boilerplate/licensing
    * blocks out of otherwise-unique documents.
    *
    * Shape at 100 TB: grams carry xxhash64 images (8-byte shuffle keys,
    * the d01 trick); the df aggregation is two map-combinable groupBys
    * ((g, doc) dedup, then count) — never a distinct-agg buffer; only
    * HOT gram occurrences survive the df join, so coverage explode and
    * the anti-join are proportional to marked spans, not the corpus;
    * reassembly is one shuffle on doc_id with per-doc bounded state.
    * Documents whose every token is covered drop out entirely (both
    * engines agree: an all-boilerplate doc IS the duplicate). */
  def substringDedupOf(docs: DataFrame, k: Int = 5, maxDf: Int = 1,
      materialize: Boolean = false): DataFrame = {
    // `materialize` folds the repeated passes into stored ones (round
    // 15, the same caller-controlled lever as [[ngramJaccardOf]]):
    // without it the gram table is exploded+hashed TWICE (df
    // aggregation, coverage join) and the text split THREE times
    // (grams ×2, reassembly) — at full-corpus scale one stored pass
    // wins, on small survivor sets the store costs more than it saves
    // un-spread in round 21 with [[shingledOf]] (the token spread ships
    // the full tokenized text through the exchange — same hazard; the
    // driver read d08 flat with it, so nothing is lost by removal)
    val toks0 = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
    val toks = if (materialize) toks0.localCheckpoint() else toks0
    val grams0 = toks.filter(size(col("t")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(t) - ${k - 1}), " +
          s"i -> struct(i AS i, xxhash64(concat_ws(' ', slice(t, i, $k))) AS g))")).as("e"))
      .select(col("doc_id"), col("e.i").as("i"), col("e.g").as("g"))
    val grams = if (materialize) grams0.localCheckpoint() else grams0
    val hot = grams.select("g", "doc_id").distinct()
      .groupBy("g").count().filter(col("count") > maxDf).select("g")
    val covered = grams.join(hot, "g")
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (k - 1))).as("pos"))
      .distinct()
    val positioned = toks
      .select(col("doc_id"), size(col("t")).as("n_tok"),
        posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("n_tok"), (col("p0") + 1).as("pos"), col("tok"))
    positioned.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), " +
          "x -> x.tok), ' ')").as("clean_text"),
        count(lit(1)).as("n_kept"),
        (max(col("n_tok")) - count(lit(1))).cast("long").as("n_removed"))
  }

  def substringDedup(s: SparkSession, dir: String): DataFrame =
    substringDedupOf(Tables(s, dir, "documents"), materialize = true)
      .orderBy("doc_id")
}
