package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def items = {
    import spark.implicits._
    implicit val s = spark
    (0 until 50).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      Multimodal.MediaItem(i.toLong, kind,
        Array.fill[Byte](64 + i)((i * 7).toByte), 640, 480,
        if (kind == "video") 10000L else 0L)
    }.toDS()
  }

  test("resize retargets image dims deterministically, passes others through") {
    implicit val s = spark
    val out = Multimodal.resize(items, 64, 64).collect()
    val images = out.filter(_.kind == "image")
    assert(images.nonEmpty)
    assert(images.forall(m => m.width == 64 && m.height == 64))
    assert(images.forall(_.content.length == 64 * 64 / 64))
    val others = out.filter(_.kind != "image")
    assert(others.forall(m => m.width == 640 && m.height == 480))
    // deterministic: same input -> same bytes
    val again = Multimodal.resize(items, 64, 64).collect()
      .filter(_.kind == "image").map(_.content.toSeq)
    assert(images.map(_.content.toSeq).toSeq == again.toSeq)
  }

  test("feature extraction: schema, determinism, batch shape") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(items, dim = 16, partitions = Some(4))
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(f => f.features.forall(x => x >= 0f && x < 1f)))
    // deterministic across runs (stub decode is content-hash based)
    val again = Multimodal.extractFeatures(items, dim = 16).collect()
    assert(rows.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
    // identical bytes → identical features; different bytes → different
    val byId = rows.map(r => r.media_id -> r.features.toSeq).toMap
    assert(byId(0L) != byId(1L))
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
}
