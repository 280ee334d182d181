package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes + typed metadata. In the crawl pipeline
  * these come from the media spans of the interleaved docs table; in the
  * sandbox the bytes are deterministic fakes (no image/audio libs in this
  * container — the DECODE step is stubbed; the Spark-side plumbing —
  * schema, batching, partitioning — is real and tested).
  */
final case class MediaAsset(media_id: String, doc_id: String, kind: String, bytes: Array[Byte])
final case class MediaFeatures(
    media_id: String, doc_id: String, kind: String,
    width: Int, height: Int, format: String, n_frames: Int,
    feature: Seq[Float])

/** Multimodal column plumbing for the training-data pipeline: treat
  * image/audio/video as opaque binary columns; decode / feature-extract /
  * frame-sample run batch-at-a-time inside mapPartitions (the Scala
  * analogue of mapInPandas — one decoder instantiation per partition, rows
  * streamed through it).
  */
object Multimodal {

  /** Derive a media table from the span docs: one row per media span, with
    * deterministic fake bytes derived from the media_ref (STUB for the
    * fetch-the-asset stage).
    */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        explode(expr("filter(spans, s -> s.kind = 'media')")).as("m"))
      .select(col("doc_id"), col("m.media_ref").as("media_ref"))
      .as[(String, String)]
      .map { case (docId, ref) =>
        MediaAsset(ref, docId, kindOf(ref), fakeBytes(ref))
      }
  }

  def kindOf(ref: String): String =
    if (ref.endsWith(".jpg") || ref.endsWith(".png")) "image"
    else if (ref.endsWith(".mp4")) "video"
    else if (ref.endsWith(".mp3") || ref.endsWith(".wav")) "audio"
    else "binary"

  /** Deterministic fake payload (stands in for the fetched asset bytes). */
  def fakeBytes(ref: String): Array[Byte] = {
    val h = graft.core.UrlCanon.hash64(ref)
    Array.tabulate(64)(i => ((graft.fixtures.Fixtures.mix(h, i.toLong) % 256).toByte))
  }

  /** ===== STUBBED DECODE =====
    * A real deployment would decode image/audio bytes here (e.g. JavaCV /
    * TwelveMonkeys readers); this container has no codec libs, so the
    * decode is a deterministic fake that PRESERVES the real contract:
    * (bytes → width/height/format/frames + a fixed-width float feature
    * vector). Everything downstream (schema, batching, joins) is real.
    */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    val h = graft.core.UrlCanon.hash64(a.media_id)
    def b(tag: Long, n: Int) = graft.fixtures.Fixtures.bounded(graft.fixtures.Fixtures.mix(h, tag), n)
    MediaFeatures(
      a.media_id, a.doc_id, a.kind,
      width = 64 + b(1L, 1920),
      height = 64 + b(2L, 1080),
      format = if (a.kind == "image") "jpeg" else a.kind,
      n_frames = if (a.kind == "video") 1 + b(3L, 300) else 1,
      feature = Array.tabulate(16)(i =>
        (graft.fixtures.Fixtures.mix(h, 10L + i) % 1000).toFloat / 1000f).toSeq)
  }

  /** Batch feature extraction: mapPartitions so a real decoder would be
    * constructed once per partition (the mapInPandas batching shape);
    * repartition by doc hash first so giant docs' assets spread evenly.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaAsset],
      partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.repartition(partitions, col("doc_id"))
      .mapPartitions { it =>
        // real impl: val decoder = Decoder.open() — once per partition
        it.map(decodeStub)
      }
  }

  /** Frame sampling for video assets: every `stride`-th frame index up to
    * n_frames (plumbing for a video training pipeline).
    */
  def sampleFrames(features: DataFrame, stride: Int = 30): DataFrame =
    features.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("doc_id"), col("frame_idx"))
}
