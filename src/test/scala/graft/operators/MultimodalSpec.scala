package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // image rows carry REAL 16×12 grayscale PNGs; audio/video carry opaque
  // NON-decodable bytes here (so they exercise the fail-soft stub path —
  // real WAV decode has its own tests below)
  private def items = {
    import spark.implicits._
    implicit val s = spark
    (0 until 50).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val content =
        if (kind == "image")
          Multimodal.encodeGrayPng(16, 12, (x, y) => (i * 17 + x * 5 + y * 11) % 256)
        else Array.fill[Byte](64 + i)((i * 7).toByte)
      Multimodal.MediaItem(i.toLong, kind, content,
        if (kind == "image") 16 else 640, if (kind == "image") 12 else 480,
        if (kind == "video") 10000L else 0L)
    }.toDS()
  }

  test("PNG encode/decode round-trips the raster exactly") {
    val bytes = Multimodal.encodeGrayPng(9, 7, (x, y) => (x * 29 + y * 31) % 256)
    val Some((w, h, px)) = Multimodal.decodeGray(bytes)
    assert((w, h) == (9, 7))
    for (y <- 0 until 7; x <- 0 until 9)
      assert(px(y * 9 + x) == (x * 29 + y * 31) % 256)
  }

  test("area-average resize preserves the mean and block structure") {
    val px = Array.tabulate(16 * 12)(i => (i * 13) % 256)
    val rs = Multimodal.areaAverageGray(px, 16, 12, 4, 4)
    // integral 4×3 blocks: output mean == input mean exactly
    assert(math.abs(rs.sum / rs.length - px.map(_.toDouble).sum / px.length) < 1e-9)
    // top-left output pixel == mean of the top-left 4×3 source block
    val blk = for (y <- 0 until 3; x <- 0 until 4) yield px(y * 16 + x).toDouble
    assert(math.abs(rs(0) - blk.sum / blk.size) < 1e-9)
  }

  test("resize really resamples images (decoded dims + values), passes others through") {
    implicit val s = spark
    val out = Multimodal.resize(items, 8, 6).collect()
    val images = out.filter(_.kind == "image")
    assert(images.nonEmpty)
    for (m <- images) {
      assert(m.width == 8 && m.height == 6)
      val Some((w, h, px)) = Multimodal.decodeGray(m.content)
      assert((w, h) == (8, 6))
      // resampled top-left pixel = rounded mean of the source 2×2 block
      val i = m.media_id.toInt
      val blk = for (y <- 0 until 2; x <- 0 until 2)
        yield ((i * 17 + x * 5 + y * 11) % 256).toDouble
      assert(px(0) == math.round(blk.sum / 4).toInt)
    }
    val others = out.filter(_.kind != "image")
    assert(others.forall(m => m.width == 640 && m.height == 480))
    // deterministic: same input -> same bytes
    val again = Multimodal.resize(items, 8, 6).collect()
      .filter(_.kind == "image").map(_.content.toSeq)
    assert(images.map(_.content.toSeq).toSeq == again.toSeq)
  }

  test("feature extraction: real image grid, stub for audio/video, batch shape") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(items, dim = 16, partitions = Some(4))
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(f => f.features.forall(x => x >= 0f && x < 1f)))
    // image features are the 4×4 area-averaged luminance grid / 256
    for (f <- rows.filter(_.kind == "image")) {
      val i = f.media_id.toInt
      val px = Array.tabulate(12 * 16) { j =>
        val (x, y) = (j % 16, j / 16); (i * 17 + x * 5 + y * 11) % 256
      }
      val want = Multimodal.areaAverageGray(px, 16, 12, 4, 4).map(v => (v / 256.0).toFloat)
      assert(f.features.toSeq == want.toSeq)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(items, dim = 16).collect()
    assert(rows.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
    // different content → different features
    val byId = rows.map(r => r.media_id -> r.features.toSeq).toMap
    assert(byId(0L) != byId(1L))
  }

  test("GIF video encode/decode round-trips every frame exactly") {
    val bytes = Multimodal.encodeGifVideo(9, 7, 4,
      (f, x, y) => (f * 41 + x * 29 + y * 31) % 256)
    val Some((w, h, frames)) = Multimodal.decodeGifFrames(bytes)
    assert((w, h, frames.length) == (9, 7, 4))
    for (f <- 0 until 4)
      assert(frames(f).toSeq == (for (y <- 0 until 7; x <- 0 until 9)
        yield (f * 41 + x * 29 + y * 31) % 256).toSeq,
        s"frame $f")
    // corrupt bytes and mixed-dimension inputs fail soft
    assert(Multimodal.decodeGifFrames(Array.fill[Byte](32)(7)).isEmpty)
  }

  test("video features are the real temporal luminance envelope of decoded frames") {
    import spark.implicits._
    implicit val s = spark
    val vids = (0 until 6).map { i =>
      Multimodal.MediaItem(i.toLong, "video",
        Multimodal.encodeGifVideo(8, 8, 3 + i % 3,
          (f, x, y) => (i * 23 + f * 19 + x * 3 + y * 5) % 256),
        8, 8, 1000L)
    }.toDS()
    val feats = Multimodal.extractFeatures(vids, dim = 4).collect().sortBy(_.media_id)
    for (fr <- feats) {
      val i = fr.media_id.toInt
      val n = 3 + i % 3
      val means = Array.tabulate(n) { f =>
        (for (y <- 0 until 8; x <- 0 until 8)
          yield (i * 23 + f * 19 + x * 3 + y * 5) % 256).sum / 64.0
      }
      assert(fr.features.toSeq == Multimodal.luminanceEnvelope(means, 4).toSeq, s"id $i")
      // distinct from the stub: real features reflect frame content
      assert(fr.features.exists(_ > 0f))
    }
  }

  test("undecodable image bytes fail soft (stub features, resize passthrough)") {
    import spark.implicits._
    implicit val s = spark
    val corrupt = Seq(Multimodal.MediaItem(99L, "image",
      Array.fill[Byte](32)(42), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(corrupt, dim = 16).collect().head
    assert(f.features.toSeq == Multimodal.fakeDecode(Array.fill[Byte](32)(42), 16).toSeq)
    val r = Multimodal.resize(corrupt, 8, 8).collect().head
    assert(r.content.toSeq == Array.fill[Byte](32)(42).toSeq && r.width == 0)
  }

  test("WAV encode/decode round-trips PCM16 samples exactly") {
    val samples = Array.tabulate(1234)(i => ((i * 997) % 65536) - 32768)
    val clamped = samples.map(s => math.max(-32768, math.min(32767, s)))
    val bytes = Multimodal.encodeWavPcm16(8000f, samples)
    val Some((sr, back)) = Multimodal.decodePcm16(bytes)
    assert(sr == 8000f)
    assert(back.toSeq == clamped.toSeq)
  }

  test("audio features are the real RMS envelope of decoded samples") {
    import spark.implicits._
    implicit val s = spark
    val samples = Array.tabulate(4000)(i => (((i * 37) % 2001) - 1000))
    val wav = Seq(Multimodal.MediaItem(7L, "audio",
      Multimodal.encodeWavPcm16(8000f, samples), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(wav, dim = 16).collect().head
    val want = Multimodal.rmsEnvelope(samples, 16)
    assert(f.features.toSeq == want.toSeq)
    // and it is NOT the stub: real decode happened
    assert(f.features.toSeq !=
      Multimodal.fakeDecode(Multimodal.encodeWavPcm16(8000f, samples), 16).toSeq)
    // envelope of a known-amplitude waveform is in the expected range:
    // uniform samples in [-1000, 1000] ⇒ segment RMS ≈ 577/32768
    assert(f.features.forall(v => v > 0.01f && v < 0.02f))
  }

  test("frame sampling explodes every-N-ms frame indices for videos only") {
    implicit val s = spark
    val frames = Multimodal.sampleFrames(items, everyMs = 1000L)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // videos are ids where i % 3 == 2, each 10000ms → 10 frames at 1s
    assert(counts.keySet == (0 until 50).filter(_ % 3 == 2).map(_.toLong).toSet)
    assert(counts.values.forall(_ == 10L))
  }

  test("feature table plugs into similarity search (norms > 0)") {
    implicit val s = spark
    val ft = Multimodal.featureTable(Multimodal.extractFeatures(items))
    assert(ft.columns.toSet == Set("media_id", "kind", "n_bytes", "v", "nrm"))
    assert(ft.filter(org.apache.spark.sql.functions.col("nrm") <= 0).count() == 0)
  }

  test("cross-modal dedup: duplicate images surface through SRP-LSH over features") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val s = spark
    graft.functions.VectorFunctions.register(spark)
    // two byte-identical images planted under different ids in a corpus
    // of distinct images → identical feature vectors → cosine 1
    val dup = Multimodal.encodeGrayPng(16, 12, (x, y) => (x * 3 + y * 7) % 256)
    val corpus = (0 until 40).map { i =>
      val content =
        if (i == 7 || i == 23) dup
        else Multimodal.encodeGrayPng(16, 12, (x, y) => (i * 23 + x * 5 + y * 11) % 256)
      Multimodal.MediaItem(i.toLong, "image", content, 16, 12, 0L)
    }.toDS()
    val ft = Multimodal.featureTable(Multimodal.extractFeatures(corpus))
      .select(col("media_id").as("id"), col("v"))
    val cand = graft.operators.Similarity.srpCandidates(ft, bands = 8, rowsPerBand = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((7L, 23L)), s"planted duplicate pair not found in $cand")
  }
}
