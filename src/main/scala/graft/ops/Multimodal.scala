package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video ride as
  * opaque `binary` columns with typed metadata; decode / resize /
  * frame-sample / feature-extract run as batched per-partition transforms
  * (the Scala analog of `mapInPandas`).
  *
  * The decode boundary is REAL for the self-describing formats
  * [[MediaCodecs]] implements from their public specs — PGM/PPM/BMP images,
  * WAV-PCM16 audio, and Y4M (YUV4MPEG2) uncompressed video — via
  * [[normalize]], which decodes any supported container into the internal
  * `GFT0` tensor container that resize / frame-sample / embed operate on.
  * Compressed formats (jpeg/png/mp4-class) have no codecs in this
  * environment by declared design; they are represented by the
  * deterministic GFT0 fake, so that plumbing (schema, binary handling,
  * batched UDFs, frame explode, embedding hand-off to [[Ann]]) stays fully
  * exercised.
  */
object Multimodal {

  val Magic = 0x47465430 // "GFT0"

  final case class MediaMeta(modality: String, width: Int, height: Int, frames: Int, payloadBytes: Int)

  /** Deterministic fake container encoder (test/data-gen side). */
  def encodeFake(modality: String, width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
    val payload = new Array[Byte](width * height * frames)
    var x = seed * 0x9e3779b97f4a7c15L + 1
    var i = 0
    while (i < payload.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      payload(i) = (x & 0xff).toByte
      i += 1
    }
    val buf = ByteBuffer.allocate(20 + payload.length)
    buf.putInt(Magic).putInt(modCode(modality)).putInt(width).putInt(height).putInt(frames)
    buf.put(payload)
    buf.array()
  }

  private def modCode(m: String): Int = m match {
    case "image" => 1; case "audio" => 2; case "video" => 3; case _ => 0
  }
  private def modName(c: Int): String = c match {
    case 1 => "image"; case 2 => "audio"; case 3 => "video"; case _ => "unknown"
  }

  /** Header parse — the "decode" boundary a real codec would replace. */
  def parseHeader(blob: Array[Byte]): Option[MediaMeta] = {
    if (blob == null || blob.length < 20) return None
    val buf = ByteBuffer.wrap(blob)
    if (buf.getInt() != Magic) return None
    val m = modName(buf.getInt())
    val (w, h, f) = (buf.getInt(), buf.getInt(), buf.getInt())
    Some(MediaMeta(m, w, h, f, blob.length - 20))
  }

  /** Decode ANY supported container into the internal GFT0 tensor container
    * (the uniform representation downstream resize/sample/embed operate on):
    * REAL codecs for PGM/PPM/BMP images, WAV-PCM16 audio (width = sample
    * count, height = 1, 8-bit downsample), and Y4M uncompressed video
    * (luma planes → frames); GFT0 passes through unchanged; unrecognized
    * bytes (jpeg/png/mp4-class) → null, filterable upstream.
    */
  def normalize(blob: Array[Byte]): Array[Byte] = {
    if (blob == null) return null
    if (parseHeader(blob).isDefined) return blob
    MediaCodecs.decodeY4m(blob) match {
      case Some((w, h, yPlanes)) => // real VIDEO decode (uncompressed Y4M)
        val out = ByteBuffer.allocate(20 + yPlanes.length * w * h)
        out.putInt(Magic).putInt(modCode("video")).putInt(w).putInt(h).putInt(yPlanes.length)
        yPlanes.foreach(out.put)
        return out.array()
      case None =>
    }
    MediaCodecs.decodePgm(blob)
      .orElse(MediaCodecs.decodePpm(blob))
      .orElse(MediaCodecs.decodeBmp(blob)) match {
      case Some(r) =>
        val out = ByteBuffer.allocate(20 + r.pixels.length)
        out.putInt(Magic).putInt(modCode("image")).putInt(r.width).putInt(r.height).putInt(1)
        out.put(r.pixels)
        out.array()
      case None =>
        MediaCodecs.decodeWav(blob) match {
          case Some((_, mono)) =>
            val bytes = mono.map(s => ((s >> 8) & 0xff).toByte)
            val out = ByteBuffer.allocate(20 + bytes.length)
            out.putInt(Magic).putInt(modCode("audio")).putInt(bytes.length).putInt(1).putInt(1)
            out.put(bytes)
            out.array()
          case None => null
        }
    }
  }

  def normalizeCol(blobCol: String) =
    udf((b: Array[Byte]) => normalize(b)).apply(col(blobCol))

  /** Typed metadata extraction as a batched column transform (recognizes
    * both the internal container and the real formats via [[normalize]]).
    */
  def withMeta(df: DataFrame, blobCol: String): DataFrame = {
    val metaUdf = udf((blob: Array[Byte]) => parseHeader(normalize(blob)))
    df.withColumn("meta", metaUdf(col(blobCol)))
  }

  /** Nearest-neighbor resize over the fake grayscale payload: real
    * algorithm, fake pixels. Returns a re-encoded container.
    */
  def resize(blob: Array[Byte], newW: Int, newH: Int): Array[Byte] =
    parseHeader(blob) match {
      case None => null
      case Some(MediaMeta(m, w, h, frames, _)) =>
        val out = ByteBuffer.allocate(20 + newW * newH * frames)
        out.putInt(Magic).putInt(modCode(m)).putInt(newW).putInt(newH).putInt(frames)
        var f = 0
        while (f < frames) {
          val base = 20 + f * w * h
          var y = 0
          while (y < newH) {
            val sy = y.toLong * h / newH
            var x = 0
            while (x < newW) {
              val sx = x.toLong * w / newW
              out.put(blob(base + (sy * w + sx).toInt))
              x += 1
            }
            y += 1
          }
          f += 1
        }
        out.array()
    }

  def resizeCol(blobCol: String, w: Int, h: Int) =
    udf((b: Array[Byte]) => resize(b, w, h)).apply(col(blobCol))

  /** Sample every `stride`-th frame of a fake video into standalone
    * single-frame containers (explodable array column).
    */
  def sampleFrames(blob: Array[Byte], stride: Int): Seq[Array[Byte]] =
    parseHeader(blob) match {
      case None => Seq.empty
      case Some(MediaMeta(m, w, h, frames, _)) =>
        (0 until frames by stride).map { f =>
          val out = ByteBuffer.allocate(20 + w * h)
          out.putInt(Magic).putInt(modCode(m)).putInt(w).putInt(h).putInt(1)
          out.put(blob, 20 + f * w * h, w * h)
          out.array()
        }
    }

  def sampleFramesCol(blobCol: String, stride: Int) =
    udf((b: Array[Byte]) => sampleFrames(b, stride)).apply(col(blobCol))

  /** Deterministic pseudo-embedding of the payload (stub feature
    * extractor): per-dimension byte-histogram projections, L2-normalized —
    * hands off directly to [[Ann.topkBrute]]/[[Ann.topkLsh]].
    */
  def embed(blob: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    if (blob != null && blob.length > 20) {
      var i = 20
      while (i < blob.length) {
        val v = blob(i) & 0xff
        acc(v % dim) += (if (((v >> 4) & 1) == 1) 1.0 else -1.0)
        i += 1
      }
    }
    val norm = math.sqrt(acc.map(a => a * a).sum).max(1e-9)
    acc.map(a => (a / norm).toFloat)
  }

  def embedCol(blobCol: String, dim: Int) =
    udf((b: Array[Byte]) => embed(b, dim)).apply(col(blobCol))
}
