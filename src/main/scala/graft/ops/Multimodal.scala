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

  /** Deterministic asset payload. Image and audio refs get REAL encoded
    * media — a binary PPM (P6) and a PCM16 mono RIFF/WAVE respectively,
    * both pure-JVM formats needing no codec libraries — so the decode
    * stage downstream parses actual bytes instead of pretending to.
    * Video/binary refs keep an opaque deterministic payload (there is no
    * comparably trivial video container; that decode stays stubbed).
    */
  def fakeBytes(ref: String): Array[Byte] = kindOf(ref) match {
    case "image" => ppmBytes(ref)
    case "audio" => wavBytes(ref)
    case _ =>
      val h = graft.core.UrlCanon.hash64(ref)
      Array.tabulate(64)(i => ((graft.fixtures.Fixtures.mix(h, i.toLong) % 256).toByte))
  }

  /** Deterministic binary PPM (P6, maxval 255): header + raw RGB rows. */
  def ppmBytes(ref: String): Array[Byte] = {
    val h = graft.core.UrlCanon.hash64(ref)
    val w = 8 + graft.fixtures.Fixtures.bounded(graft.fixtures.Fixtures.mix(h, 101L), 24)
    val ht = 6 + graft.fixtures.Fixtures.bounded(graft.fixtures.Fixtures.mix(h, 102L), 18)
    val header = s"P6\n$w $ht\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val px = Array.tabulate(w * ht * 3)(i =>
      graft.fixtures.Fixtures.bounded(graft.fixtures.Fixtures.mix(h, 1000L + i), 256).toByte)
    header ++ px
  }

  /** Deterministic PCM16 mono RIFF/WAVE at 8 kHz. */
  def wavBytes(ref: String): Array[Byte] = {
    val h = graft.core.UrlCanon.hash64(ref)
    val n = 64 + graft.fixtures.Fixtures.bounded(graft.fixtures.Fixtures.mix(h, 103L), 192)
    val rate = 8000
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(s: String) = bb.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ascii("RIFF"); bb.putInt(36 + 2 * n); ascii("WAVE")
    ascii("fmt "); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(rate)
    bb.putInt(rate * 2) // byte rate
    bb.putShort(2)      // block align
    bb.putShort(16)     // bits per sample
    ascii("data"); bb.putInt(2 * n)
    var i = 0
    while (i < n) {
      bb.putShort((graft.fixtures.Fixtures.bounded(
        graft.fixtures.Fixtures.mix(h, 2000L + i), 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** Minimal binary-PPM (P6, maxval 255) parser: pure JVM, handles `#`
    * comments and arbitrary whitespace in the header. Returns
    * (width, height, raw RGB bytes).
    */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var i = 2
    def skipWs(): Unit = {
      var going = true
      while (going && i < bytes.length) bytes(i) match {
        case ' ' | '\t' | '\r' | '\n' => i += 1
        case '#' => while (i < bytes.length && bytes(i) != '\n') i += 1
        case _ => going = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9', "bad PPM header")
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = int(); val h = int(); val maxv = int()
    require(maxv == 255, s"unsupported PPM maxval $maxv")
    i += 1 // exactly one whitespace byte separates the header from the raster
    require(bytes.length - i >= w * h * 3, "truncated PPM raster")
    (w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3))
  }

  /** Minimal RIFF/WAVE parser for PCM16 mono: walks the chunk list (so
    * extra chunks are tolerated). Returns (sampleRate, samples).
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    def tag(off: Int) = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var rate = -1; var bits = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(off); val size = bb.getInt(off + 4)
      if (id == "fmt ") {
        channels = bb.getShort(off + 10); rate = bb.getInt(off + 12)
        bits = bb.getShort(off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(bits == 16 && channels == 1, s"unsupported WAV layout ($channels ch, $bits bit)")
    require(dataOff > 0 && dataOff + dataLen <= bytes.length, "truncated WAV data")
    val n = dataLen / 2
    (rate, Array.tabulate(n)(j => bb.getShort(dataOff + 2 * j)))
  }

  /** REAL decode for the two pure-JVM formats, stub for the rest.
    *
    * Image (PPM) and audio (WAV) assets are actually parsed — dimensions
    * and sample counts come from the bytes, and the 16-dim feature vector
    * is computed from the decoded raster/samples:
    *   image → [meanR, meanG, meanB, 13-bin luminance histogram] (all in
    *           [0,1]; width/height from the PPM header; format "ppm")
    *   audio → [RMS of 16 equal time segments] (normalized by 2^15;
    *           width = sample rate, height = sample count, format "wav")
    * Features are NON-NEGATIVE by construction — q38's milli-scaling
    * rounds identically in Spark SQL (HALF_UP) and Math.round only for
    * values ≥ 0.
    *
    * Video keeps the deterministic stub: there is no comparably trivial
    * pure-JVM video container, and this container has no codec libs (the
    * honest boundary — the mapPartitions batching, schema and joins
    * downstream are identical for both paths).
    */
  def decode(a: MediaAsset): MediaFeatures = a.kind match {
    case "image" =>
      val (w, h, px) = decodePpm(a.bytes)
      val n = w * h
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Int](13)
      var i = 0
      while (i < n) {
        val r = px(3 * i) & 0xff; val g = px(3 * i + 1) & 0xff; val b = px(3 * i + 2) & 0xff
        sr += r; sg += g; sb += b
        val lum = (r * 299 + g * 587 + b * 114) / 1000 // 0..255
        hist(math.min(12, lum * 13 / 256)) += 1
        i += 1
      }
      val feat = Array(
        (sr.toDouble / (255.0 * n)).toFloat,
        (sg.toDouble / (255.0 * n)).toFloat,
        (sb.toDouble / (255.0 * n)).toFloat) ++
        hist.map(c => (c.toDouble / n).toFloat)
      MediaFeatures(a.media_id, a.doc_id, a.kind, w, h, "ppm", 1, feat.toSeq)
    case "audio" =>
      val (rate, samples) = decodeWav(a.bytes)
      val n = samples.length
      val feat = Array.tabulate(16) { s =>
        val from = s * n / 16; val until = (s + 1) * n / 16
        var acc = 0.0; var j = from
        while (j < until) { val v = samples(j).toDouble; acc += v * v; j += 1 }
        val seg = math.max(1, until - from)
        (math.sqrt(acc / seg) / 32768.0).toFloat
      }
      MediaFeatures(a.media_id, a.doc_id, a.kind, rate, n, "wav", 1, feat.toSeq)
    case _ => decodeStub(a)
  }

  /** ===== STUBBED DECODE (video/binary only since the PPM/WAV decoders
    * landed) =====
    * A real deployment would decode video bytes here (e.g. JavaCV); this
    * container has no codec libs, so the decode is a deterministic fake
    * that PRESERVES the real contract: (bytes → width/height/format/frames
    * + a fixed-width float feature vector). Everything downstream (schema,
    * batching, joins) is real.
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
        // a heavier decoder would be constructed here, once per partition
        it.map(decode)
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
