package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2B E20).
  *
  * - [[cosineTopK]]: brute-force exact cosine top-k for one query vector —
  *   the correctness baseline. Single broadcast of the query, one scan.
  * - [[embedNearDup]]: all-pairs cosine ≥ τ — exact, via cross join with
  *   precomputed norms. The exactness baseline for embedding near-dup.
  * - [[annIvf]]: the scale path — IVF: centroid per stored cluster
  *   (`label` is the inverted-file key), queries probe the top-`nprobe`
  *   centroid lists and exact-rerank only those lists. At 100 TB only
  *   the probed partitions are touched; centroids are broadcast.
  *
  * Dot products use codegen-friendly zip_with/aggregate over
  * array<double>; fold order is left-to-right in both Spark and the
  * oracle, and rounding to 4dp absorbs last-bit float noise.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    embOf(s, Tables(s, dir, "embeddings"))

  /** Normalize a raw embeddings frame (vec_id, label, embedding) into the
    * operator-internal shape (vec_id, label, v: array<double>, nrm). */
  private def embOf(s: SparkSession, raw: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    raw
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
  }

  /** Codegen'd dot product (graft.functions.DotProduct) — the interpreted
    * zip_with/aggregate route dominates all-pairs similarity cost. */
  private def dot(a: String, b: String) = expr(s"graft_dot($a, $b)")

  /** Exact top-5 cosine neighbors of vec_id = 0 (excluding self). */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"), col("nrm").as("qn"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("craw", dot("v", "qv") / (col("nrm") * col("qn")))
      .orderBy(col("craw").desc, col("vec_id"))
      .limit(5)
      .select(col("vec_id"), round(col("craw"), 4).as("c"))
  }

  /** Batch kNN join (s03): exact top-3 cosine neighbors for EVERY vector
    * in a query SET (here vec_id % 50 == 0 — the retrieval-workload face
    * of [[cosineTopK]]'s single query). The query side is bounded and
    * broadcast, so the corpus is scanned once with the per-(query,
    * vector) score computed map-side; the per-query top-k then rides
    * Spark's rank-pushdown — WindowGroupLimit prunes each partition to
    * its local top-3 per query BEFORE the shuffle, so the exchange
    * carries O(partitions × queries × k) rows, not the corpus×queries
    * cross product (plan-locked). At 100 TB with a bounded query set
    * this is the exact-batch-retrieval shape; unbounded query sets
    * switch to [[annIvf]]'s pruned probes. */
  def knnJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("craw").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("craw", dot("v", "qv") / (col("nrm") * col("qn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("rn").cast("int").as("rn"),
        col("vec_id"), round(col("craw"), 4).as("c"))
      .orderBy("qid", "rn")
  }

  /** Exact all-pairs near-duplicates: cosine ≥ 0.46, a < b.
    *
    * Blocked self-join: rows hash into `B` blocks, a tiny broadcast
    * drives the B·(B+1)/2 block pairs, and the pair stream materializes
    * through two EQUI-joins — so the O(n²) compute (irreducible for an
    * exact threshold over dense vectors) spreads evenly over B²/2
    * shuffle-partition-sized tasks with ~2n/B vectors of memory each,
    * instead of the broadcast-nested-loop a `a < b` theta join plans.
    * At cluster scale `B` scales with parallelism (tasks = B²/2);
    * replication factor of the input is (B+1)/2.
    */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    // tasks = B·(B+1)/2 ≈ defaultParallelism, so the quadratic compute
    // spreads over exactly the cluster's slots: B = 8 on local[32],
    // ~127 on a 1000-executor × 8-core cluster (floor 2 keeps the
    // bi < bj dedup meaningful on toy sessions)
    val B = math.max(2,
      math.ceil(math.sqrt(2.0 * s.sparkContext.defaultParallelism)).toInt)
    import s.implicits._
    val e = emb(s, dir).withColumn("blk", pmod(hash(col("vec_id")), lit(B)))
    val blockPairs = (for { i <- 0 until B; j <- i until B } yield (i, j))
      .toDF("bi", "bj")
    val a = e.select(col("vec_id").as("a"), col("v").as("va"),
      col("nrm").as("na"), col("blk").as("ba"))
    val b = e.select(col("vec_id").as("b"), col("v").as("vb"),
      col("nrm").as("nb"), col("blk").as("bb"))
    a.join(broadcast(blockPairs), col("ba") === col("bi"))
      .join(b, col("bb") === col("bj"))
      // diagonal blocks order internally; off-diagonal blocks meet exactly
      // once via (bi < bj), so each unordered pair is evaluated once
      .filter(col("bi") < col("bj") || col("a") < col("b"))
      .withColumn("craw", dot("va", "vb") / (col("na") * col("nb")))
      .filter(col("craw") >= 0.46)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), round(col("craw"), 4).as("c"))
      .orderBy("a", "b")
  }

  /** SRP-LSH candidate pairs: signed-random-projection signatures
    * (`graft_srp`, nbits = bands·rowsPerBand), banded like MinHash-LSH —
    * pairs colliding on any band's `rowsPerBand` sign bits become
    * candidates. One equi-shuffle on (band, bandValue); pair generation
    * and bucket telemetry via [[Banding.bucketedPairs]] (observation
    * `graft_lsh_srp`); exact verification is the caller's. `df` must
    * carry (id, v).
    */
  def srpCandidates(df: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val nbits = bands * rowsPerBand
    require(nbits % 64 == 0, s"bands*rowsPerBand must pack into longs, got $nbits")
    // bands must not straddle signature words for the single-shift extract
    require(64 % rowsPerBand == 0, s"rowsPerBand must divide 64, got $rowsPerBand")
    // (1L << 64) wraps to 1L in JVM shift semantics — a full-word band
    // needs the all-ones mask spelled out or every bv collapses to 0
    val mask = if (rowsPerBand == 64) -1L else (1L << rowsPerBand) - 1
    val banded = df
      .withColumn("sig", expr(s"graft_srp(v, $nbits)"))
      .select(col("id"), posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}), k ->
           | shiftright(element_at(sig, CAST(k * $rowsPerBand DIV 64 AS INT) + 1),
           |            CAST(k * $rowsPerBand % 64 AS INT))
           |  & ${mask}L)""".stripMargin)).as(Seq("band", "bv")))
    Banding.bucketedPairs(banded, "graft_lsh_srp", maxBucket = 0L)
  }

  /** SRP-LSH embedding near-dup: same verified output as [[embedNearDup]]
    * (cosine ≥ 0.46, a < b) via hyperplane-LSH candidates + exact verify —
    * the d02 shape (band equi-join, candidates-only verification) applied
    * to embeddings.
    *
    * Parameter honesty (measured on this corpus): τ = 0.46 sits INSIDE a
    * continuous cosine distribution — the closest non-pair is at 0.4592
    * and the weakest true pair at 0.4603, so there is no duplicate-
    * structure gap. At the boundary, P[sign bit collides] = 1−θ/π ≈ 0.652
    * vs ≈ 0.5 background, and recall-guaranteed banding (4 rows × 96
    * bands ⇒ per-pair miss ≈ 5e-9 at c = 0.46) necessarily admits most of
    * the bulk as candidates: this corpus is the operator's worst case, and
    * the exact verify stage carries the run. On a corpus with real
    * duplicate structure (near-dups at c ≥ 0.9 over background) the same
    * operator at 8 rows × 16 bands prunes >90% of pairs while holding
    * recall — demonstrated with planted duplicates in SimilaritySpec and
    * at 10×/20× scale in ScaleSmoke. That regime — candidates tracking
    * true duplicates, not corpus size — is the 100 TB path.
    */
  def srpNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cand = srpCandidates(e.select(col("vec_id").as("id"), col("v")),
      bands = 96, rowsPerBand = 4)
    cand
      .join(e.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na")), "a")
      .join(e.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb")), "b")
      .withColumn("craw", dot("va", "vb") / (col("na") * col("nb")))
      .filter(col("craw") >= 0.46)
      .select(col("a"), col("b"), round(col("craw"), 4).as("c"))
      .orderBy("a", "b")
  }

  /** IVF coarse quantizer: per-`label` mean vectors, trained on a
    * bounded deterministic sample (Murmur3 hash of vec_id — stable
    * run-to-run, a scan-side filter, no shuffle beyond the tiny agg).
    * At 100 TB this runs ONCE offline and persists as a catalog table
    * (nlists × dim doubles — always broadcast-sized); `samplePct` bounds
    * the training pass so even the one-time fit never needs the corpus.
    * Output: (c_label, cv: array<double>, cn: norm). */
  def trainCentroids(embNorm: DataFrame, samplePct: Int): DataFrame = {
    // A label whose every row missed the sample would get no centroid, so
    // its list would never be probed and its members would silently fall
    // out of ANN reach — a recall cliff for small/skewed clusters. Those
    // labels train on ALL their rows instead. Round 21 (guide §2.6 — the
    // old shape ran three corpus passes: sampled aggregation, distinct
    // labels, broadcast-filtered rescue aggregation): ONE pass computes
    // the per-(label, dim) sums over the sampled rows AND over all rows;
    // a label with any sampled row takes the sampled mean (the null-
    // skipping sum/count over `when(sampled, x)` aggregates exactly the
    // sampled rows, in the same scan order the filtered pass used), an
    // unsampled label takes the all-rows mean (exactly the rescue pass's
    // aggregate). Training remains a bounded one-time fit — at scale it
    // runs offline and persists (see [[annIvfOver]]'s `centroids`).
    val sampled = pmod(hash(col("vec_id")), lit(100)) < samplePct
    embNorm
      .select(col("label"), sampled.as("s"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(
        sum(when(col("s"), col("x"))).as("sx_s"),
        count(when(col("s"), col("x"))).as("n_s"),
        sum(col("x")).as("sx_a"),
        count(col("x")).as("n_a"))
      .select(col("label"), col("i"),
        when(col("n_s") > 0, col("sx_s") / col("n_s"))
          .otherwise(col("sx_a") / col("n_a")).as("cx"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("pairs"))
      .selectExpr("label AS c_label", "transform(pairs, p -> p.cx) AS cv")
      .withColumn("cn", expr("sqrt(aggregate(cv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"))
  }

  /** IVF ANN over any embeddings source: coordinator-planned probes +
    * one label-pruned scan.
    *
    * The inverted file is the stored `label` clustering. Probe planning
    * is METADATA work: queries × centroids is (|Q| · nlists) rows, so the
    * ranked probe table is collected to the driver — the same move as a
    * table format pruning manifests at plan time — and re-enters the plan
    * as a broadcast local relation. The one data-sized scan is the probe
    * join, filtered to `label IN (probed lists)`: that predicate reaches
    * the scan (PushedFilters on a flat layout; PartitionFilters — i.e.
    * directory pruning — on a label-partitioned layout, the 100 TB shape
    * proven in PartitionedWriteSpec). Nothing is cached; probe cost
    * tracks the probed lists, not the corpus.
    *
    * `loadRaw` must yield (vec_id, label, embedding) — called once for
    * the query lookup, once for training (when `centroids` is None,
    * sampled), once for the probe scan; each gets its own pushed filters.
    *
    * EAGER CONTRACT: this method runs Spark jobs at CONSTRUCTION time
    * (centroid training when `centroids` is None, plus the probe-planning
    * collect) — like a table format reading manifests at plan time, not
    * like a lazy DataFrame transform. Callers timing it must time the
    * call, not just the returned frame's action (Bench does: its timed
    * region opens before the query function is invoked).
    */
  def annIvfOver(s: SparkSession, loadRaw: () => DataFrame,
      queryFilter: org.apache.spark.sql.Column, k: Int, nprobe: Int,
      samplePct: Int = 50, centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(trainCentroids(embOf(s, loadRaw()), samplePct))
    val queries = embOf(s, loadRaw()).filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    // nprobe on this synthetic corpus must be high: labels are isotropic
    // w.r.t. cosine geometry (measured recall ≈ nprobe/nlists). On
    // genuinely clustered data the same structure is sublinear at high
    // recall.
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("cs", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", expr(
        s"row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, c_label)"))
      .filter(col("rk") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"), col("c_label"))
    // |Q|·nprobe rows with the query vectors — metadata-sized by
    // construction (a query batch, not the corpus); collected once so the
    // final plan holds ONE scan of the store, not a re-derivation
    val planned = probes.collect()
    val local = s.createDataFrame(
      java.util.Arrays.asList(planned: _*), probes.schema)
    val probedLabels = planned.map(_.getAs[Any]("c_label")).distinct.toSeq
    val scan = embOf(s, loadRaw())
      .filter(col("label").isin(probedLabels: _*))
    broadcast(local)
      .join(scan, col("c_label") === col("label") && col("vec_id") =!= col("q_id"))
      .withColumn("craw", dot("qv", "v") / (col("qn") * col("nrm")))
      .withColumn("rk", expr(
        s"row_number() OVER (PARTITION BY q_id ORDER BY craw DESC, vec_id)"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id").as("nbr"), round(col("craw"), 4).as("c"))
      .orderBy("q_id", "nbr")
  }

  /** IVF approximate top-3 neighbors for queries vec_id < 10 over the
    * testdata embeddings table. Inherits [[annIvfOver]]'s eager contract:
    * calling this runs the training and probe-planning jobs before any
    * action on the returned frame. */
  def annIvf(s: SparkSession, dir: String): DataFrame =
    annIvfOver(s, () => Tables(s, dir, "embeddings"),
      queryFilter = col("vec_id") < 10, k = 3, nprobe = 7)

  /** s02 query face: the DRIVER-CHECKABLE recall gate over [[annIvf]].
    *
    * An approximate operator has no row-for-row SQL oracle, but it can
    * still be gated deterministically: every ingredient of the IVF path
    * is seed-free and hash-deterministic (Murmur3 training sample,
    * row_number ties broken by id), so its recall@3 against the exact
    * brute-force top-3 — computed here in the same job — is a CONSTANT
    * per dataset (measured 0.73/0.80/0.83 at sf0.001/0.01/0.1). The
    * query emits one row (n_queries, k, recall_ok = recall ≥ 0.6) whose
    * expected value the oracle can state from the data + literals; a
    * regression anywhere in training/probing/rerank drops hits toward
    * zero and flips the boolean → hash mismatch → driver flags it. The
    * 0.6 bar sits under the measured floor (0.73) but far above a broken
    * probe (≈0). nprobe = 7 of 10 lists: this synthetic corpus's labels
    * are isotropic w.r.t. cosine (recall ≈ nprobe/nlists); clustered
    * real data reaches high recall at sublinear nprobe. */
  def annIvfGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ann = annIvf(s, dir).select(col("q_id"), col("nbr"))
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("craw").desc, col("vec_id"))
    val bf = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("craw", dot("v", "qv") / (col("nrm") * col("qn")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("q_id"), col("vec_id").as("nbr"))
    val hits = ann.join(bf, Seq("q_id", "nbr"))
      .agg(count(lit(1)).cast("double").as("hits"))
    q.agg(count(lit(1)).as("n_queries"))
      .crossJoin(hits)
      .select(col("n_queries"), lit(3).as("k"),
        (col("hits") / (col("n_queries") * 3) >= 0.6).as("recall_ok"))
  }
}
