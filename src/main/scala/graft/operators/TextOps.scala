package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (SURVEY §2B E21):
  * language-ID, quality scoring, tokenizer-style token counting, and
  * document fingerprinting. All are built from codegen-friendly built-in
  * expressions (split / filter / aggregate HOFs) — no UDFs — so they scale
  * to a 100 TB `documents` table as embarrassingly-parallel map work with
  * filters/pruning pushed to the parquet scan.
  *
  * Each operator is a pure transformation over a frame with
  * (doc_id, text) — the `*Of` forms — so the same plans run over a batch
  * table or a Structured Streaming source unchanged (stateless
  * projections need no watermark; verified in TextStreamSpec). The
  * `(SparkSession, dir)` faces add the table load and the presentation
  * order for the oracle gate.
  */
object TextOps {

  private val En = "'the','a','of','and','to'"
  private val De = "'der','die','das','und','ist'"
  private val Es = "'el','la','los','y','es'"
  private val Fr = "'le','les','et','est','dans'"
  private val Zh = "'的','是','了'"

  /** Language-ID: count stopword-marker hits per language; argmax with
    * fixed precedence en>de>es>fr>zh so ties are deterministic. */
  def langIdOf(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", "split(lower(text), ' ') AS t")
      .selectExpr("doc_id",
        s"CAST(size(filter(t, x -> x IN ($En))) AS BIGINT) AS en_hits",
        s"CAST(size(filter(t, x -> x IN ($De))) AS BIGINT) AS de_hits",
        s"CAST(size(filter(t, x -> x IN ($Es))) AS BIGINT) AS es_hits",
        s"CAST(size(filter(t, x -> x IN ($Fr))) AS BIGINT) AS fr_hits",
        s"CAST(size(filter(t, x -> x IN ($Zh))) AS BIGINT) AS zh_hits")
      .selectExpr("doc_id", "en_hits", "de_hits", "es_hits", "fr_hits", "zh_hits",
        """CASE
          | WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
          | WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
          | WHEN es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
          | WHEN fr_hits >= zh_hits THEN 'fr'
          | ELSE 'zh' END AS pred""".stripMargin)

  def langId(s: SparkSession, dir: String): DataFrame =
    langIdOf(Tables(s, dir, "documents")).orderBy("doc_id")

  /** Quality scoring: token count, avg token length, punctuation count,
    * stopword ratio, and a composite score in [0,1]. */
  def qualityOf(docs: DataFrame): DataFrame =
    // un-spread in round 21 with the dedup shingle front (ships full
    // text; was measured neutral warm, and t02 feeds p01/d06 whose cold
    // driver runs regressed — same wide-payload exchange hazard)
    docs
      .selectExpr("doc_id", "text", "split(lower(text), ' ') AS t")
      .selectExpr("doc_id",
        "CAST(size(t) AS BIGINT) AS n_tokens",
        "CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_ns",
        "CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '')) AS BIGINT) AS n_punct",
        s"CAST(size(filter(t, x -> x IN ($En))) AS BIGINT) AS n_stop")
      // CAST(... AS DOUBLE) after round-to-4dp keeps the output
      // representation-proof vs the DOUBLE-typed oracle (DECIMAL '0.2800'
      // vs DOUBLE '0.28' hash-differ despite numeric equality).
      .selectExpr("doc_id", "n_tokens", "n_chars_ns", "n_punct", "n_stop",
        "CAST(round(n_chars_ns * 1.0 / n_tokens, 4) AS DOUBLE) AS avg_tok_len",
        "CAST(round(n_stop * 1.0 / n_tokens, 4) AS DOUBLE) AS stop_ratio",
        "CAST(round(least(1.0, n_tokens / 100.0) * (1.0 - n_stop * 1.0 / n_tokens), 4) AS DOUBLE) AS score")

  def quality(s: SparkSession, dir: String): DataFrame =
    qualityOf(Tables(s, dir, "documents")).orderBy("doc_id")

  /** t03's BPE-ish pre-tokenizer count as a reusable column: alnum runs +
    * single non-alnum-non-space symbols, the shape of a byte-pair
    * pre-tokenizer's word split. Shared by t03 and t06 so the token
    * definition cannot drift between them (both oracles assume it). */
  private[operators] def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  def tokenCountOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), bpeTokenCount(col("text")).as("n_bpe"))

  def tokenCount(s: SparkSession, dir: String): DataFrame =
    tokenCountOf(Tables(s, dir, "documents")).orderBy("doc_id")

  /** Document fingerprint: polynomial rolling hash (base 31, mod 1e9+7)
    * over the character stream — an order-sensitive content hash usable
    * for exact-dup detection via groupBy(fp). */
  def fingerprintOf(docs: DataFrame): DataFrame =
    graft.Spread.ifNarrow(docs).selectExpr("doc_id",
      """aggregate(filter(split(text, ''), c -> c <> ''),
        | CAST(0 AS BIGINT),
        | (acc, c) -> (acc * 31 + ascii(c)) % 1000000007) AS fp""".stripMargin)

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    fingerprintOf(Tables(s, dir, "documents")).orderBy("doc_id")

  /** Deterministic stratified sampling — the data-mixing step of a
    * training corpus: each stratum (language) keeps a configured
    * percentage of its documents, selected by a Knuth multiplicative
    * hash of the key, NOT `rand()` — so the sample is reproducible
    * run-to-run, independent of partitioning/task order, cheap (no
    * shuffle, a scan-side filter), and exactly re-computable by any
    * engine (the oracle evaluates the same integer arithmetic). At
    * 100 TB this composes with partition pruning: the filter rides the
    * scan of each stratum's partitions. */
  /** Knuth multiplicative key hash in exact BIGINT arithmetic, masked to
    * 31 bits BEFORE the multiply: max intermediate (2^31−1)·2654435761
    * ≈ 5.7e18 stays inside a signed 64-bit long, so the same integer
    * expression evaluates overflow-free in Spark (ANSI), DuckDB, or any
    * other engine at any id range — bucket in [0, mod), stable. Shared
    * by t05 (sampling) and t06 (shard assignment) so the portable-hash
    * definition cannot drift between them (both oracles assume it). */
  private[operators] def knuthBucket(key: Column, mod: Long): Column =
    pmod(pmod(pmod(key, lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L)), lit(mod))

  def stratifiedSampleOf(docs: DataFrame, pctByLang: Map[String, Int],
      defaultPct: Int): DataFrame = {
    // typed when()/lit() chain — lang keys are VALUES, never SQL text, so
    // a stratum key containing a quote cannot break the expression
    val pct = pctByLang.foldLeft(lit(defaultPct)) { case (acc, (l, p)) =>
      when(col("lang") === lit(l), lit(p)).otherwise(acc)
    }
    val bucket = knuthBucket(col("doc_id"), 100L)
    docs.select(col("doc_id"), col("lang"),
      bucket.as("bucket"), pct.as("pct"))
      .filter(col("bucket") < col("pct"))
      .select(col("doc_id"), col("lang"))
  }

  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratifiedSampleOf(Tables(s, dir, "documents"),
      Map("en" -> 25, "zh" -> 75), defaultPct = 50).orderBy("doc_id")

  /** Deterministic sequence packing for training-data export (t06):
    * concat-and-chunk — documents are deterministically sharded, laid
    * end-to-end within their shard in doc_id order, and the token stream
    * is cut every `budget` tokens. Each doc's placement is fully
    * described by (shard, bin, off): it starts `off` tokens into context
    * window `bin` of its shard — the standard pretraining packing, made
    * reproducible (same placement on any engine, any run, any partition
    * count).
    *
    * Scale shape: the shard is the parallelism unit — the ONLY window is
    * per-shard, so the sort is shard-local and the stage scales with the
    * shard count. Pick `shards` so a shard is executor-sized (thousands
    * at 100 TB, 8 in the test query); no global sort, no driver state.
    * Sharding reuses t05's overflow-free Knuth multiplicative hash, and
    * token counts are t03's BPE-ish pre-tokenizer count, so both are
    * engine-portable integer arithmetic. */
  def packSequencesOf(docs: DataFrame, shards: Int, budget: Long): DataFrame = {
    val before = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), bpeTokenCount(col("text")).as("n_tok"))
      .withColumn("shard", knuthBucket(col("doc_id"), shards.toLong))
      .withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(before), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tok"), col("start_tok"),
        expr(s"start_tok div $budget").as("bin"),
        expr(s"start_tok % $budget").as("off"))
  }

  def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequencesOf(Tables(s, dir, "documents"), shards = 8, budget = 512L)
      .orderBy("doc_id")

  /** Intra-document repetition stats (t07) — the duplicate-n-gram
    * fraction family of quality filters from the Gopher data pipeline
    * (Rae et al. 2021, §A1.1): rep_n = 1 − distinct_ngrams/total_ngrams
    * for word n-grams, and a keep/drop verdict at the customary
    * thresholds. Pure per-row projection (shuffle-free, stream-capable
    * like every `*Of` here); the distinct count rides the codegen'd
    * `graft_shingles_n`. Fractions are exact integer ratios, so the
    * keep verdict is engine-portable with no float-boundary hazard. */
  /** rep_n SQL template over the token array `t` — ONE definition for
    * both the batch scorer and the stream filter, so the Gopher
    * verdict cannot drift between the two faces. */
  private def repSql(n: Int): String =
    s"""(CASE WHEN size(t) >= $n
       | THEN CAST(size(t) - $n + 1 - size(graft_shingles_n(t, $n)) AS DOUBLE)
       |      / CAST(size(t) - $n + 1 AS DOUBLE)
       | ELSE CAST(0.0 AS DOUBLE) END)""".stripMargin

  def repetitionOf(docs: DataFrame): DataFrame = {
    def rep(n: Int): String = repSql(n)
    docs.selectExpr("doc_id", "split(lower(text), ' ') AS t")
      .selectExpr("doc_id", s"${rep(2)} AS rep2_raw", s"${rep(3)} AS rep3_raw")
      .selectExpr("doc_id",
        "ROUND(rep2_raw, 4) AS rep2", "ROUND(rep3_raw, 4) AS rep3",
        "rep2_raw <= 0.2 AND rep3_raw <= 0.1 AS keep")
  }

  def repetition(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    repetitionOf(Tables(s, dir, "documents")).orderBy("doc_id")
  }

  /** Corpus vocabulary stats (t08): document frequency of every token —
    * the vocab-building / stopword-discovery pass of a text pipeline.
    * Distinct-per-doc explode → count, then top-k with a total order.
    * Scale shape: map-side partial counts on the token hash, and the
    * top-k is TakeOrdered (per-partition heads merged on the driver),
    * never a global sort of the vocabulary. */
  def vocabOf(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(k)

  def vocab(s: SparkSession, dir: String): DataFrame =
    vocabOf(Tables(s, dir, "documents"), k = 50)

  /** Corpus-conditional bigram LM quality score (t09) — the CCNet-style
    * "how typical of the corpus is this document" signal (Wenzek et al.
    * 2020 use a wiki-trained KenLM; with no external model shippable
    * offline, the corpus is its own LM):
    *
    *   score(doc) = avg over the doc's bigrams of
    *                ln((c(w1,w2) + 1) / (c(w1) + V))
    *
    * with corpus-wide bigram/unigram occurrence counts and add-one
    * smoothing over the unigram vocabulary V. Boilerplate scores high,
    * word-salad scores low — the standard perplexity-bucket input for
    * quality-stratified sampling ([[stratifiedSampleOf]]).
    *
    * Scale shape: two map-combinable groupBys build the count tables
    * (never a distinct-agg buffer), the doc's exploded bigrams reach
    * them by shuffle equi-join — NO broadcast assumption; at 100 TB the
    * bigram table is itself large — and one doc_id shuffle reassembles.
    * V rides a broadcast single-row cross join.
    *
    * Engine-portability of the float math: every count is an integer
    * both engines agree on; the only float steps are ln() and the
    * per-doc mean, and the mean is an ORDERED left fold over the
    * bigrams in position order (`sort_array` + `aggregate` here,
    * `list(... ORDER BY i)` + `list_reduce` in the DuckDB oracle), so
    * both engines add the same doubles in the same sequence —
    * bit-identical, not just close. Docs with <2 tokens score NULL. */
  def lmScoreOf(docs: DataFrame): DataFrame = {
    val tk = docs.selectExpr("doc_id", "split(lower(text), ' ') AS t")
    val uni = tk.selectExpr("explode(t) AS w")
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = tk.selectExpr("doc_id",
      """explode(CASE WHEN size(t) >= 2
        | THEN transform(sequence(0, size(t) - 2),
        |        i -> struct(i AS i, t[i] AS w1, concat(t[i], ' ', t[i + 1]) AS bg))
        | ELSE array() END) AS b""".stripMargin)
      .selectExpr("doc_id", "b.i AS i", "b.w1 AS w1", "b.bg AS bg")
    val bc = bi.groupBy("bg").agg(count(lit(1)).as("c12"))
    val scored = bi.join(bc, "bg")
      .join(uni, col("w1") === col("w"))
      .crossJoin(broadcast(vocab))
      .selectExpr("doc_id", "i", "ln((c12 + 1) / (c1 + v)) AS lnp")
    val perDoc = scored.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("i"), col("lnp")))).as("l"))
      .selectExpr("doc_id",
        "ROUND(aggregate(l, CAST(0.0 AS DOUBLE), (a, x) -> a + x.lnp) / size(l), 4) AS lm_score")
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select("doc_id", "lm_score")
  }

  def lmScore(s: SparkSession, dir: String): DataFrame =
    lmScoreOf(Tables(s, dir, "documents")).orderBy("doc_id")

  /** The keep/drop verdict of [[repetitionOf]] as a PASS-THROUGH column —
    * the stream-filter face: a streaming ingest can gate rows on it
    * without joining the stream to its own projection (stream–stream
    * joins need watermarks; this is projections only). */
  def repetitionKeepOf(docs: DataFrame): DataFrame = {
    def rep(n: Int): String = repSql(n)
    docs
      .withColumn("t", split(lower(col("text")), " "))
      .withColumn("keep", expr(s"${rep(2)} <= 0.2 AND ${rep(3)} <= 0.1"))
      .drop("t")
  }
}
