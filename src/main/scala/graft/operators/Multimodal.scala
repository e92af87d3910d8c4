package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video ride along as opaque `binary` columns with typed metadata, and
  * per-item compute (decode → feature-extract) runs as partition-wise
  * batch work so heavyweight decoder state is initialized once per
  * partition — the Scala analogue of `mapInPandas` batching.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (`fakeDecode`):
  * no image/audio libraries exist in this container. Everything around it
  * — schema, partitioning, batch shape, feature layout — is real and
  * tested, so swapping in a JNI/ONNX decoder touches one function.
  */
object Multimodal {

  final case class MediaItem(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  /** STUB — stands in for a real decoder (libjpeg / ffmpeg / ONNX
    * encoder). Deterministic: features derive from a rolling hash of the
    * content bytes, so tests are stable and the pipeline is replayable. */
  private[operators] def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
    var d = 0
    while (d < dim) {
      val mixed = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL + d
      out(d) = ((mixed % 1000L).toInt.abs / 1000.0f)
      d += 1
    }
    out
  }

  /** Decode + feature-extract, batched per partition. Repartitions by
    * media_id first so decoder work spreads evenly even when input files
    * are skewed (one giant video parquet vs many small image files). */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 16,
      partitions: Option[Int] = None)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val parted = partitions.map(items.repartition(_, col("media_id"))).getOrElse(items)
    parted.mapPartitions { it =>
      // per-partition init goes here in a real decoder (load model once)
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          fakeDecode(m.content, dim))
      }
    }
  }

  /** STUB resize — stands in for a real image scaler. Deterministic:
    * output bytes derive from the input hash + target dims, output
    * length scales with the target pixel count, so size accounting and
    * downstream batching behave like a real resize. */
  private[operators] def fakeResize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(1, (w * h) / 64)
    val out = new Array[Byte](n)
    var x = 1125899906842597L
    var i = 0
    while (i < content.length) { x = 31 * x + (content(i) & 0xff); i += 1 }
    var d = 0
    while (d < n) {
      x = x * 6364136223846793005L + 1442695040888963407L + w + h
      out(d) = (x >>> 56).toByte
      d += 1
    }
    out
  }

  /** Resize images to target dimensions, batched per partition like
    * [[extractFeatures]]; non-image rows pass through untouched. */
  def resize(items: Dataset[MediaItem], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    items.mapPartitions { it =>
      // per-partition init goes here in a real scaler
      it.map {
        case m if m.kind == "image" =>
          m.copy(content = fakeResize(m.content, targetW, targetH),
            width = targetW, height = targetH)
        case m => m
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * index (every `everyMs` of duration) — pure plan-side explode, the
    * actual frame decode would happen in [[extractFeatures]] downstream. */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Long)(
      implicit spark: SparkSession): DataFrame =
    items.toDF()
      .filter(col("kind") === "video" && col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))

  /** Cosine-ready feature table: features as array<float> plus L2 norm —
    * joins [[Similarity]]'s ANN path for cross-modal near-dup search. */
  def featureTable(feats: Dataset[MediaFeatures]): DataFrame =
    feats.toDF()
      .withColumn("v", expr("transform(features, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr("sqrt(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"))
      .drop("features")
}
