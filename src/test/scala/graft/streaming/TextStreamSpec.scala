package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.TestSpark
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The text-analysis operators (E21) are pure projections, so the same
  * plans must run over a Structured Streaming source unchanged — the
  * streaming face of a training-data pipeline ingesting documents
  * continuously. Verified by batch-equivalence after full file replay.
  */
class TextStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-docstream")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def batchDocs: DataFrame = graft.Tables(spark, sfDir, "documents")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private def replay(xform: DataFrame => DataFrame, sink: String): DataFrame = {
    val stream = spark.readStream
      .schema(batchDocs.schema)
      .parquet(streamDir)
    val q = xform(stream).writeStream
      .format("memory").queryName(sink).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sink)
  }

  test("language-ID over a document stream equals the batch result") {
    val got = rows(replay(TextOps.langIdOf, "t_langid_stream"))
    assert(got == rows(TextOps.langIdOf(batchDocs)))
    assert(got.nonEmpty)
  }

  test("quality scoring over a document stream equals the batch result") {
    val got = rows(replay(TextOps.qualityOf, "t_quality_stream"))
    assert(got == rows(TextOps.qualityOf(batchDocs)))
  }

  test("decontamination over a document stream equals the batch result") {
    // the corpus side of d07 is a stateless explode + broadcast join, so
    // it streams unchanged; the per-doc hit count becomes a streaming
    // aggregation (complete mode — contaminated-doc counts are revised
    // as grams arrive)
    graft.functions.VectorFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    val bench = graft.operators.Dedup
      .gramsOf(batchDocs.filter(col("doc_id") % 10 === 7))
      .select("g").distinct()
    val stream = spark.readStream.schema(batchDocs.schema).parquet(streamDir)
    val q = graft.operators.Dedup
      .contaminationOf(stream.filter(col("doc_id") % 10 =!= 7), bench)
      .writeStream.format("memory").queryName("t_decon_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = rows(spark.table("t_decon_stream"))
    assert(got == rows(graft.operators.Dedup.contaminationOf(
      batchDocs.filter(col("doc_id") % 10 =!= 7), bench)))
    assert(got.nonEmpty)
  }

  test("composed streaming ingest: eval-drop → repetition gate → exact dedup across redelivery") {
    // at-least-once delivery: the same documents file lands TWICE in the
    // stream dir. The composed ingest (eval-split drop → repetition
    // verdict gate → content-fingerprint stateful dedup) must emit each
    // surviving doc exactly once — equal to the batch chain over a
    // single copy.
    graft.functions.VectorFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    val dir2 = Files.createTempDirectory("graft-docstream2")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      dir2.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      dir2.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    def ingest(d: DataFrame): DataFrame =
      TextOps.fingerprintOf(
        TextOps.repetitionKeepOf(d.filter(col("doc_id") % 10 =!= 7))
          .filter(col("keep")))
        .dropDuplicates("fp")
    val stream = spark.readStream.schema(batchDocs.schema).parquet(dir2.toString)
    val q = ingest(stream).writeStream
      .format("memory").queryName("t_ingest_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = rows(spark.table("t_ingest_stream"))
    assert(got == rows(ingest(batchDocs)))
    assert(got.nonEmpty)
  }

  test("p01's composed prefix (repetition gate → decontamination) streams unchanged") {
    // the pipeline's prefix gates over a document stream against the
    // static benchmark gram set: projections + a broadcast set probe,
    // append mode, no state. Two equivalences close the loop: stream
    // output == batch output of the same composition (stream-safety),
    // and that composition == the broadcast-hash-join anti formulation
    // batch p01 consumes via survivorsOf (exactness of the stream
    // re-expression).
    graft.functions.VectorFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    val bench = graft.operators.Dedup
      .gramsOf(batchDocs.filter(col("doc_id") % 10 === 7))
      .select("g").distinct()
    def prefix(d: DataFrame): DataFrame =
      graft.operators.Pipeline.streamPrefixOf(d.filter(col("doc_id") % 10 =!= 7), bench)
    val batch = rows(prefix(batchDocs))
    val got = rows(replay(prefix, "t_prefix_stream"))
    assert(got == batch)
    assert(batch == rows(graft.operators.Pipeline.survivorsOf(batchDocs)))
    // both gates actually fire: survivors are a strict subset of training
    assert(got.nonEmpty &&
      got.size < batchDocs.filter(col("doc_id") % 10 =!= 7).count())
  }

  test("fingerprint + token count compose in one streaming pipeline") {
    val got = rows(replay(
      d => TextOps.fingerprintOf(d).join(TextOps.tokenCountOf(d), "doc_id"),
      "t_fp_stream"))
    assert(got == rows(
      TextOps.fingerprintOf(batchDocs).join(TextOps.tokenCountOf(batchDocs), "doc_id")))
  }
}
