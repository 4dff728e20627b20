package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.PageGen

/** Multimodal column support: image/audio/video as opaque BINARY
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing is REAL and tested: schemas, partition-local
  * batched processing (the JVM analog of `mapInPandas` batch shape —
  * rows are processed in fixed-size chunks so a vectorized kernel could
  * be dropped in per batch), explode fan-out for frame sampling.
  * The codecs are STUBS by necessity (no image/audio libraries ship in
  * this sandbox): a deterministic container format ("GIMG"/"GAUD"
  * magic + binary header) stands in for JPEG/WAV, and the feature
  * extractor is a byte-histogram projection standing in for a vision
  * model. Swap `decode*`/`embed` bodies for real codecs on a cluster
  * with the native libs; every signature and every Spark plan stays
  * the same. Mirrors the role of the reference's page-image pipeline
  * (pdf→images at /root/reference/ocrworker/engines/paddle.py:149-154,
  * crops at /root/reference/ocrworker/signature_extractor.py:149-311).
  */
object MediaOps {

  val ImageMagic = 0x47494d47 // "GIMG"
  val AudioMagic = 0x47415544 // "GAUD"
  val BatchSize = 64          // mapInPandas-style chunk size

  final case class MediaMeta(kind: String, width: Int, height: Int,
                             channels: Int, sampleRate: Int, nSamples: Int,
                             ok: Boolean)
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  // ---- container codec (stub format; header layout is the contract) ---

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  def encodeImage(width: Int, height: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + payload.length)
    writeInt(out, ImageMagic); writeInt(out, width); writeInt(out, height)
    out.write(channels); out.write(payload)
    out.toByteArray
  }

  def encodeAudio(sampleRate: Int, nSamples: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(12 + payload.length)
    writeInt(out, AudioMagic); writeInt(out, sampleRate); writeInt(out, nSamples)
    out.write(payload)
    out.toByteArray
  }

  /** Decode header → typed metadata. STUB for a real image/audio decode
    * (no codec libs in this sandbox); total — bad bytes → ok=false. */
  def decodeMeta(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 12) return MediaMeta("unknown", 0, 0, 0, 0, 0, ok = false)
    readInt(bytes, 0) match {
      case ImageMagic if bytes.length >= 13 =>
        MediaMeta("image", readInt(bytes, 4), readInt(bytes, 8), bytes(12) & 0xff, 0, 0, ok = true)
      case AudioMagic =>
        MediaMeta("audio", 0, 0, 0, readInt(bytes, 4), readInt(bytes, 8), ok = true)
      case _ => MediaMeta("unknown", 0, 0, 0, 0, 0, ok = false)
    }
  }

  /** Header length by kind: image = magic+w+h+channels (13), audio =
    * magic+rate+samples (12). */
  def headerLen(kind: String): Int = if (kind == "audio") 12 else 13

  /** Deterministic 16-dim "embedding": normalized byte histogram of the
    * payload — the stand-in for a vision/audio model forward pass. */
  def embed(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (bytes == null) return hist
    val m = decodeMeta(bytes)
    val off = headerLen(m.kind)
    if (!m.ok || bytes.length <= off) return hist
    var i = off
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = (bytes.length - off).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  /** Stub resize: halve dimensions, subsample payload 2:1 (keeps the
    * container contract so decodeMeta(resize(x)) parses). */
  def resizeHalf(bytes: Array[Byte]): Array[Byte] = {
    val m = decodeMeta(bytes)
    if (!m.ok || m.kind != "image") return bytes
    val payload = bytes.drop(13)
    val sub = Array.tabulate(payload.length / 2)(i => payload(i * 2))
    encodeImage(m.width / 2, m.height / 2, m.channels, sub)
  }

  /** Frame sampling: treat an image payload as stacked frames of
    * frameBytes each; emit every strideth frame (UDTF fan-out shape). */
  def sampleFrames(bytes: Array[Byte], frameBytes: Int, stride: Int): Seq[(Int, Array[Byte])] = {
    val m = decodeMeta(bytes)
    if (!m.ok) return Nil
    val payload = bytes.drop(headerLen(m.kind))
    val nFrames = payload.length / frameBytes
    (0 until nFrames by stride).map { f =>
      (f, java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
    }
  }

  // ---- Spark surface (real plumbing) -----------------------------------

  /** Batched partition-local processing — the JVM mirror of mapInPandas:
    * the iterator is consumed in fixed-size chunks, each chunk processed
    * as one array (drop-in point for a vectorized kernel/JNI call). */
  def withFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // one "kernel call" per batch
          batch.map { case (id, b) =>
            val m = decodeMeta(b)
            (id, m.kind, m.width, m.height, m.channels, m.sampleRate, m.nSamples, m.ok, embed(b))
          }
        }
      }
      .toDF("media_id", "kind", "width", "height", "channels",
        "sample_rate", "n_samples", "decode_ok", "embedding")
  }

  /** Frame-sample fan-out: one output row per sampled frame. */
  def explodeFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        sampleFrames(b, frameBytes, stride).map { case (f, fb) => (id, f, fb.length, fb) }
      }
      .toDF("media_id", "frame_no", "frame_bytes", "frame")
  }

  // ---- deterministic media table (generator) ---------------------------

  def genMedia(spark: SparkSession, rows: Long, seed: Long = PageGen.DefaultSeed): DataFrame = {
    import spark.implicits._
    spark.range(0, rows, 1, math.max(1, spark.sparkContext.defaultParallelism))
      .map { i =>
        val rng = new PageGen.Rng(seed ^ (i * 0x9e3779b97f4a7c15L) ^ 0x33cc55aa77L)
        val isImage = rng.nextInt(10) < 7
        val payload = Array.tabulate(256 + rng.nextInt(2048))(_ => (rng.nextInt(256) - 128).toByte)
        val bytes =
          if (isImage) encodeImage(64 + rng.nextInt(1024), 64 + rng.nextInt(1024),
            1 + rng.nextInt(3), payload)
          else if (rng.nextInt(10) == 0) payload // corrupt row → decode_ok=false
          else encodeAudio(8000 * (1 + rng.nextInt(6)), payload.length, payload)
        MediaRow(i, if (isImage) "image" else "audio", bytes)
      }
      .toDF()
  }
}
