package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks among the approximate and exact operators at sf0.001. */
class OperatorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("asofJoin: equal-ts right row matches; no prior right row -> null") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 50L), (2L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 100L), (1L, 60L), (1L, 120L)).toDF("k", "rts")
    val got = AsOf.asofJoin(left, right, "k", "ts", "rts")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSeq
    assert(got == Seq(
      (1L, 50L, None),          // no view at or before 50
      (1L, 100L, Some(100L)),   // equal timestamp matches
      (2L, 10L, None)))         // key with no right rows at all
  }

  test("asofJoin tolerance nulls matches staler than the window") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "ts")
    val right = Seq((1L, 95L)).toDF("k", "rts")
    val got = AsOf.asofJoin(left, right, "k", "ts", "rts", Some(lit(10L)))
      .orderBy("ts")
      .collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSeq
    // 100-95=5 <= 10 matches; 200-95=105 > 10 is out of tolerance
    assert(got == Seq((100L, Some(95L)), (200L, None)))
  }

  test("stream prefix ≡ batch survivors on null/short-text docs (gram-less docs survive)") {
    // a null or <5-word text yields no 5-grams: the batch anti-join keeps
    // it (never on the contaminated side) and the stream probe must too
    graft.functions.VectorFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      (1L, "common shared phrase one two three four five six seven", "en"),
      (7L, "common shared phrase one two three four five six seven", "en"), // eval split
      (2L, null.asInstanceOf[String], "en"),
      (4L, "tiny", "en"),
      (6L, "totally different words nothing overlapping here at all ok", "en"))
      .toDF("doc_id", "text", "lang")
    val bench = Dedup.gramsOf(docs.filter(col("doc_id") % 10 === 7))
      .select("g").distinct()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val batch = rowsOf(graft.operators.Pipeline.survivorsOf(docs))
    val stream = rowsOf(graft.operators.Pipeline.streamPrefixOf(
      docs.filter(col("doc_id") % 10 =!= 7), bench))
    assert(stream == batch)
    assert(batch.contains(2L) && batch.contains(4L)) // gram-less docs kept
    assert(!batch.contains(1L)) // contaminated doc dropped by both
  }

  test("lmScore matches the hand-computed bigram log-probs; <2 tokens -> null") {
    import spark.implicits._
    // corpus: "a b a", "a b", "x" -> unigram counts a:3 b:2 x:1 (V=3),
    // bigram counts "a b":2, "b a":1
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextOps.lmScoreOf(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    // d1: (ln((2+1)/(3+3)) + ln((1+1)/(2+3))) / 2 ; d2: ln(3/6) ; d3: null
    val d1 = BigDecimal((math.log(3.0 / 6) + math.log(2.0 / 5)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d2 = BigDecimal(math.log(3.0 / 6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((1L, Some(d1)), (2L, Some(d2)), (3L, None)))
  }

  test("minhash-LSH and simhash find exactly the exact-Jaccard pairs") {
    val exact = rows(Dedup.ngramJaccard(spark, dir))
    val lsh = rows(Dedup.minhashLsh(spark, dir))
    val sim = rows(Dedup.simhash(spark, dir))
    assert(exact.nonEmpty) // corpus has planted near-dups
    assert(lsh == exact)
    assert(sim == exact)
  }

  test("IVF ANN achieves >= 0.7 recall@3 vs brute force") {
    import org.apache.spark.sql.functions._
    val ann = Similarity.annIvf(spark, dir)
      .select("q_id", "nbr").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force top-3 per query vector (vec_id < 10)
    val e = graft.Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .withColumn("nrm", expr("sqrt(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val truth = q.crossJoin(e).filter(col("vec_id") =!= col("q_id"))
      .withColumn("c", expr(
        "aggregate(zip_with(qv, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
        / (col("qn") * col("nrm")))
      .withColumn("rk", expr("row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id)"))
      .filter(col("rk") <= 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann intersect truth).size.toDouble / truth.size
    assert(recall >= 0.7, s"recall@3 was $recall")
  }

  test("SRP-LSH (d05) reproduces the exact embedding near-dup pairs (d04)") {
    assert(rows(Similarity.srpNearDup(spark, dir)) ==
      rows(Similarity.embedNearDup(spark, dir)))
  }

  test("SRP-LSH prunes a planted-duplicate corpus while recalling every planted pair") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val a = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / n)
    }
    // 1000 background vectors (pairwise cosine ~ N(0, 1/64)) + 50 planted
    // near-dups at cosine ≈ 0.995 — the regime the operator is FOR, unlike
    // the continuous-at-threshold gate corpus (see srpNearDup scaladoc).
    val base = (0 until 1000).map(i => (i.toLong, unit().toSeq))
    val planted = (0 until 50).map { i =>
      val v = base(i)._2.toArray
      val g = unit()
      (1000L + i, v.zip(g).map { case (x, y) => x + 0.1 * y }.toSeq)
    }
    val df = (base ++ planted).toDF("id", "v")
    val cand = Similarity.srpCandidates(df, bands = 8, rowsPerBand = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 50).map(i => (i.toLong, 1000L + i)).toSet
    assert(expected.subsetOf(cand), s"missed ${expected -- cand}")
    val totalPairs = 1050L * 1049 / 2
    // high-sim banding (16 rows × 8 bands) admits <1% of the corpus pairs
    assert(cand.size < totalPairs / 100,
      s"candidates ${cand.size} not sparse vs $totalPairs pairs")
  }

  test("connectedComponents closes a 4096-node chain in O(log n) rounds") {
    import spark.implicits._
    // Diameter 4095: min-label propagation needs ~4096 rounds; the
    // large-star/small-star alternation must close it within 16.
    val chain = (0L until 4095L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Dedup.connectedComponents(chain, maxRounds = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comp.length == 4096)
    assert(comp.forall(_._2 == 0L), "every chain member labels to the min id 0")
  }

  test("connectedComponents labels by min member across components") {
    import spark.implicits._
    val edges = Seq((3L, 1L), (2L, 3L), (11L, 10L), (5L, 5L)).toDF("a", "b")
    val comp = Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // self-loop (5,5) contributes no edge and no vertex
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents surfaces rounds-to-converge on the engine log channel") {
    import spark.implicits._
    // the R22 dual-channel contract extends to the dedup operators: with
    // EngineLogFile attached, a component run leaves its per-round edge
    // counts and the convergence line in catalog_migration.log — the one
    // operational signal a 100 TB dedup job must surface
    val logFile = java.nio.file.Files.createTempFile("graft-cc-log", ".log")
    val detach = graft.catalog.EngineLogFile.attach(logFile)
    try {
      val edges = Seq((3L, 1L), (2L, 3L), (11L, 10L)).toDF("a", "b")
      Dedup.connectedComponents(edges).collect()
    } finally detach()
    val text = java.nio.file.Files.readString(logFile)
    assert("""connectedComponents round 1: \d+ edges""".r
      .findFirstIn(text).isDefined, text)
    assert("""connectedComponents converged in \d+ rounds""".r
      .findFirstIn(text).isDefined, text)
    java.nio.file.Files.deleteIfExists(logFile)
  }

  test("connectedComponents runs one action per round (signature rides the checkpoint)") {
    import spark.implicits._
    // round 21: the convergence signature is observed on the checkpoint
    // materialization pass instead of a separate agg().collect() action —
    // a component run must cost exactly 1 SQL execution (the initial
    // checkpoint) + 1 per round, not 2 + 2/round. (Job counts are the
    // wrong metric here: under AQE one action materializes each shuffle
    // stage as its own job.)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          counter.incrementAndGet(); ()
        case _ => ()
      }
    }
    val logFile = java.nio.file.Files.createTempFile("graft-cc-jobs", ".log")
    val detach = graft.catalog.EngineLogFile.attach(logFile)
    spark.sparkContext.addSparkListener(listener)
    try {
      val edges = Seq((3L, 1L), (2L, 3L), (11L, 10L)).toDF("a", "b")
      Dedup.connectedComponents(edges) // eager loop; no action on the result
      // listener bus is async: wait for the execution count to go quiet
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline && counter.get != last) {
        last = counter.get
        Thread.sleep(200)
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      detach()
    }
    val logText = java.nio.file.Files.readString(logFile)
    val rounds = """converged in (\d+) rounds""".r
      .findFirstMatchIn(logText)
      .getOrElse(fail(s"no convergence line in the engine log; got:\n$logText"))
      .group(1).toInt
    assert(counter.get == rounds + 1,
      s"expected 1 SQL execution per round + the initial checkpoint; " +
        s"got ${counter.get} executions for $rounds rounds")
    java.nio.file.Files.deleteIfExists(logFile)
  }

  test("connectedComponents converges immediately on an empty edge set") {
    import spark.implicits._
    // self-loops contribute no edges: the initial checkpoint materializes
    // an EMPTY frame, and the observed convergence signature must still
    // arrive (count 0, null xors) instead of blocking — the round-21
    // observe-fold's empty-input edge
    val edges = Seq((5L, 5L), (9L, 9L)).toDF("a", "b")
    assert(Dedup.connectedComponents(edges).collect().isEmpty)
  }

  test("connectedComponents throws instead of returning split components") {
    import spark.implicits._
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxRounds = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("fingerprint is order-sensitive content identity") {
    val fps = TextOps.fingerprint(spark, dir).collect().map(_.getLong(1))
    // no exact duplicate docs in the corpus → all fingerprints distinct
    assert(fps.toSet.size == fps.length)
  }

  test("driver entry point (p01 flagship) holds the pipeline's composition invariants") {
    val out = graft.SparkEntry.entry(spark).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0))
    // eval split never leaks into training output
    assert(ids.forall(_ % 10 != 7))
    // output ⊆ the filtered survivor set (stage wiring, not just rows>0)
    graft.functions.VectorFunctions.register(spark)
    val survivors = graft.operators.Pipeline
      .survivorsOf(graft.Tables(spark, dir, "documents"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(survivors))
    // packing invariant: within a shard, start_tok is the running sum of
    // n_tok in doc_id order, starting at 0
    for ((_, rows) <- out.groupBy(_.getLong(1))) {
      var cum = 0L
      for (r <- rows.sortBy(_.getLong(0))) {
        assert(r.getLong(3) == cum, r)        // start_tok
        assert(r.getLong(4) == cum / 512, r)  // bin
        assert(r.getLong(5) == cum % 512, r)  // off
        cum += r.getLong(2)                   // n_tok
      }
    }
  }

  test("repetition filter drops a pathological doc and keeps clean text") {
    // the testdata corpus is clean (max rep3 ≈ 0.08 < the 0.1 Gopher
    // threshold — t07's oracle verifies the fractions), so the DROP side
    // of the verdict is exercised here with constructed docs
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val docs = Seq(
      (1L, "spam " * 40 + "spam"),                       // one 1-gram looped
      (2L, "buy now " * 25 + "buy"),                     // 2-gram looped
      (3L, "each word here appears exactly once today")  // clean
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(!out(1L)._3 && out(1L)._1 > 0.9, out(1L))   // rep2 ≈ 1
    assert(!out(2L)._3 && out(2L)._2 > 0.9, out(2L))   // rep3 ≈ 1
    assert(out(3L)._3 && out(3L)._1 == 0.0 && out(3L)._2 == 0.0, out(3L))
  }

  test("minhash-LSH telemetry reports candidates and bucket stats via observe") {
    graft.Telemetry.clear()
    val out = rows(Dedup.minhashLsh(spark, dir))
    val m = graft.Telemetry.await("graft_lsh_d02")
      .getOrElse(fail("no graft_lsh_d02 observation recorded"))
    val candidates = m("candidates").asInstanceOf[Long]
    val maxBucket = m("max_bucket").asInstanceOf[Long]
    assert(candidates >= out.size,
      s"candidates ($candidates) must bound verified pairs (${out.size})")
    assert(maxBucket >= 2)
    assert(m("suppressed_buckets").asInstanceOf[Long] == 0L) // no cap set
  }

  test("minhash-LSH rowsPerBand knob stays exact-recall on the gated corpus") {
    graft.Telemetry.clear()
    val base = rows(Dedup.minhashLsh(spark, dir))
    val baseCand = graft.Telemetry.await("graft_lsh_d02").get("candidates").asInstanceOf[Long]
    spark.conf.set("spark.graft.lsh.rowsPerBand", "4")
    graft.Telemetry.clear()
    try {
      val tighter = rows(Dedup.minhashLsh(spark, dir))
      val tightCand = graft.Telemetry.await("graft_lsh_d02").get("candidates").asInstanceOf[Long]
      // 8 bands x 4 rows: same verified pairs on the planted corpus
      // (duplicates are J >> 0.8), strictly fewer-or-equal candidates
      assert(tighter == base)
      assert(tightCand <= baseCand, s"$tightCand > $baseCand")
    } finally spark.conf.unset("spark.graft.lsh.rowsPerBand")
  }

  test("minhash-LSH maxBucket cap suppresses hot buckets loudly, not silently") {
    spark.conf.set("spark.graft.lsh.maxBucket", "2")
    graft.Telemetry.clear()
    try {
      Dedup.minhashLsh(spark, dir).collect()
      val m = graft.Telemetry.await("graft_lsh_d02").get
      assert(m("suppressed_buckets").asInstanceOf[Long] > 0L,
        "cap of 2 on the planted corpus must suppress at least one bucket")
    } finally spark.conf.unset("spark.graft.lsh.maxBucket")
  }

  test("minhash-LSH rejects a rowsPerBand that does not divide the signature") {
    spark.conf.set("spark.graft.lsh.rowsPerBand", "5")
    try intercept[IllegalArgumentException](Dedup.minhashLsh(spark, dir))
    finally spark.conf.unset("spark.graft.lsh.rowsPerBand")
  }

  test("substring dedup scrubs shared spans, drops all-boilerplate docs, keeps short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),   // shares "a b c d e" with doc 2
      (2L, "x y a b c d e z"),
      (3L, "p q r s t"),         // exact 5-token duplicate of doc 4:
      (4L, "p q r s t"),         //   every position covered → both drop
      (5L, "u v")                // shorter than k: no grams, kept whole
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedupOf(docs, k = 5, maxDf = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "f g h", 3L, 5L),     // positions 1-5 covered
      (2L, "x y z", 3L, 5L),     // positions 3-7 covered
      (5L, "u v", 2L, 0L)))
  }
}
