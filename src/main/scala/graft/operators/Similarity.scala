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

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables(s, dir, "embeddings")
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

  /** Exact all-pairs near-duplicates: cosine ≥ 0.46, a < b. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val a = e.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .withColumn("craw", dot("va", "vb") / (col("na") * col("nb")))
      .filter(col("craw") >= 0.46)
      .select(col("a"), col("b"), round(col("craw"), 4).as("c"))
      .orderBy("a", "b")
  }

  /** IVF approximate top-3 neighbors for query vectors vec_id < 10.
    *
    * Inverted file = the stored `label` clusters; centroids are the
    * per-cluster mean vectors (computed once, broadcast — at scale this
    * is the trained coarse quantizer). Each query ranks centroids by
    * cosine, probes the best `nprobe`=3 lists, exact-reranks members.
    * Approximate by construction ⇒ verified by recall test, not oracle.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).cache()
    val cents = e
      .select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(avg("x").as("cx"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("pairs"))
      .selectExpr("label AS c_label", "transform(pairs, p -> p.cx) AS cv")
      .withColumn("cn", expr("sqrt(aggregate(cv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    // nprobe = 7: this synthetic corpus's labels are isotropic w.r.t.
    // cosine geometry (measured recall ≈ nprobe/nlists), so a high probe
    // count is needed for recall; on genuinely clustered data the same
    // structure gives sublinear cost at high recall.
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("cs", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, c_label)"))
      .filter(col("rk") <= 7)
      .select(col("q_id"), col("qv"), col("qn"), col("c_label"))
    probes
      .join(e, col("c_label") === col("label") && col("vec_id") =!= col("q_id"))
      .withColumn("craw", dot("qv", "v") / (col("qn") * col("nrm")))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY craw DESC, vec_id)"))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("vec_id").as("nbr"), round(col("craw"), 4).as("c"))
      .orderBy("q_id", "nbr")
  }
}
