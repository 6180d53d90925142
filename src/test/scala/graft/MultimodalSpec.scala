package graft

import graft.ops.{Ann, MediaCodecs, Multimodal}
import graft.ops.MediaCodecs.Raster

/** Multimodal binary-column plumbing: schema, batched decode/resize/frame
  * sampling, embedding hand-off to ANN. The decode boundary is REAL for
  * PGM/PPM/BMP/WAV (library-free formats implemented from spec in
  * MediaCodecs); compressed formats remain the declared GFT0 stub.
  */
class MultimodalSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  lazy val media = {
    val s = spark
    import s.implicits._
    (0L until 20L).map { i =>
      val modality = if (i % 3 == 0) "video" else "image"
      val frames = if (modality == "video") 4 else 1
      (i, modality, Multimodal.encodeFake(modality, 16, 8, frames, seed = i))
    }.toDF("id", "modality", "blob")
  }

  test("metadata extraction over binary column") {
    val m = Multimodal.withMeta(media, "blob")
      .select("id", "meta.modality", "meta.width", "meta.height", "meta.frames")
      .collect()
    assert(m.length === 20)
    m.foreach { r =>
      assert(r.getInt(2) === 16 && r.getInt(3) === 8)
      assert(r.getInt(4) === (if (r.getString(1) == "video") 4 else 1))
    }
    // corrupt blob -> null meta, no crash
    val s = spark
    import s.implicits._
    val bad = Seq((99L, Array[Byte](1, 2, 3))).toDF("id", "blob")
    assert(Multimodal.withMeta(bad, "blob").filter(col("meta").isNull).count() === 1)
  }

  test("resize re-encodes dims and payload size") {
    val r = media.withColumn("small", Multimodal.resizeCol("blob", 4, 2))
      .select("small").collect()
    r.foreach { row =>
      val meta = Multimodal.parseHeader(row.getAs[Array[Byte]](0)).get
      assert(meta.width === 4 && meta.height === 2)
      assert(meta.payloadBytes === 4 * 2 * meta.frames)
    }
  }

  test("frame sampling explodes videos into single-frame containers") {
    val frames = media.filter(col("modality") === "video")
      .select(col("id"), explode(Multimodal.sampleFramesCol("blob", 2)).as("frame"))
    val rows = frames.collect()
    assert(rows.length === 7 * 2) // 7 videos, frames 0 and 2
    rows.foreach { r =>
      val meta = Multimodal.parseHeader(r.getAs[Array[Byte]]("frame")).get
      assert(meta.frames === 1 && meta.width === 16)
    }
  }

  test("PGM codec: header with comments, raw pixels decode exactly") {
    val pix = Array.tabulate(8)(i => (i * 30).toByte)
    val pgm = "P5\n# a comment\n4 2\n255\n".getBytes("US-ASCII") ++ pix
    val r = MediaCodecs.decodePgm(pgm).get
    assert(r.width === 4 && r.height === 2)
    assert(r.pixels.toSeq === pix.toSeq)
    // encoder roundtrip
    assert(MediaCodecs.decodePgm(MediaCodecs.encodePgm(r)).get.pixels.toSeq === pix.toSeq)
    // truncated payload rejected
    assert(MediaCodecs.decodePgm(pgm.dropRight(1)) === None)
  }

  test("PPM codec: gray RGB decodes to the same luma value") {
    val body = Array.fill(6)(Array[Byte](100.toByte, 100.toByte, 100.toByte)).flatten
    val ppm = "P6\n3 2\n255\n".getBytes("US-ASCII") ++ body
    val r = MediaCodecs.decodePpm(ppm).get
    assert(r.width === 3 && r.height === 2)
    assert(r.pixels.forall(p => (p & 0xff) === 100))
  }

  test("BMP codec: 24-bit bottom-up rows, padding, BGR order") {
    // 3x2 gradient encoded through our spec-writer, decoded back
    val bmp = MediaCodecs.encodeBmp24(Raster(3, 2, null), (x, y) => {
      val v = 40 * (y * 3 + x); (v, v, v)
    })
    val r = MediaCodecs.decodeBmp(bmp).get
    assert(r.width === 3 && r.height === 2)
    assert(r.pixels.map(_ & 0xff).toSeq === Seq(0, 40, 80, 120, 160, 200))
    assert(MediaCodecs.decodeBmp("notabmp".getBytes) === None)
  }

  test("WAV codec: PCM16 stereo averages to mono, rate preserved") {
    val samples = Array[Short](100, 200, -100, -200, 1000, 3000)
    val wav = MediaCodecs.encodeWav(8000, 2, samples)
    val (rate, mono) = MediaCodecs.decodeWav(wav).get
    assert(rate === 8000)
    assert(mono.toSeq === Seq[Short](150, -150, 2000))
  }

  test("normalize: real formats decode into the internal container end-to-end") {
    val s = spark
    import s.implicits._
    val pgm = MediaCodecs.encodePgm(Raster(4, 2, Array.tabulate(8)(i => (i * 30).toByte)))
    val bmp = MediaCodecs.encodeBmp24(Raster(3, 2, null), (x, y) => { val v = 10 * (x + y); (v, v, v) })
    val wav = MediaCodecs.encodeWav(8000, 1, Array.tabulate(16)(i => (i * 1000).toShort))
    val gft = Multimodal.encodeFake("image", 16, 8, 1, seed = 7L)
    val jpegish = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) // no codec → null
    val df = Seq((0L, pgm), (1L, bmp), (2L, wav), (3L, gft), (4L, jpegish)).toDF("id", "blob")
    val norm = df.withColumn("t", Multimodal.normalizeCol("blob"))
    assert(norm.filter(col("t").isNull).select("id").collect().map(_.getLong(0)).toSeq === Seq(4L))
    val metas = Multimodal.withMeta(norm.filter(col("t").isNotNull), "t")
      .select("id", "meta.modality", "meta.width", "meta.height").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(metas(0L) === (("image", 4, 2)))
    assert(metas(1L) === (("image", 3, 2)))
    assert(metas(2L) === (("audio", 16, 1)))
    assert(metas(3L) === (("image", 16, 8)))
    // decoded real image flows through resize + embed like any container
    val resized = Multimodal.resize(Multimodal.normalize(pgm), 2, 1)
    val meta = Multimodal.parseHeader(resized).get
    assert(meta.width === 2 && meta.height === 1)
    assert(Multimodal.embed(Multimodal.normalize(bmp), 8).length === 8)
  }

  test("codecs reject malformed bytes with None — no crash, no hang") {
    // PGM with overflowing dims (46341² > Int.MaxValue)
    val hugePgm = "P5\n46341 46341\n255\n".getBytes("US-ASCII") ++ Array.fill(8)(0.toByte)
    assert(MediaCodecs.decodePgm(hugePgm) === None)
    // BMP with wrap-around row math
    val hugeBmp = MediaCodecs.encodeBmp24(Raster(2, 2, null), (_, _) => (0, 0, 0))
    val patched = hugeBmp.clone()
    // width := 40000, height := 40000 (little-endian at 18/22)
    def putLe32(at: Int, v: Int): Unit = {
      patched(at) = (v & 0xff).toByte; patched(at + 1) = ((v >> 8) & 0xff).toByte
      patched(at + 2) = ((v >> 16) & 0xff).toByte; patched(at + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(18, 40000); putLe32(22, 40000)
    assert(MediaCodecs.decodeBmp(patched) === None)
    // WAV with a 0xFFFFFFF8 chunk length (would loop forever unguarded)
    val evilWav = MediaCodecs.encodeWav(8000, 1, Array[Short](1, 2, 3)).clone()
    putLe32Into(evilWav, 16, 0xfffffff8)
    assert(MediaCodecs.decodeWav(evilWav) === None)
    // and all of them flow through normalize as null, not exceptions
    assert(Multimodal.normalize(hugePgm) === null)
    assert(Multimodal.normalize(patched) === null)
  }

  private def putLe32Into(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = (v & 0xff).toByte; b(at + 1) = ((v >> 8) & 0xff).toByte
    b(at + 2) = ((v >> 16) & 0xff).toByte; b(at + 3) = ((v >> 24) & 0xff).toByte
  }

  test("Y4M codec: real uncompressed video decodes, samples, and resizes end-to-end") {
    // 3 frames of 4x2 luma with distinct per-frame content
    val frames = Seq.tabulate(3)(f => Array.tabulate(8)(i => (f * 50 + i).toByte))
    // Cmono (no chroma) and C420 (chroma skipped) must yield identical luma
    for (cs <- Seq("Cmono", "C420jpeg", "C422", "C444")) {
      val y4m = MediaCodecs.encodeY4m(4, 2, frames, cs)
      val Some((w, h, ys)) = MediaCodecs.decodeY4m(y4m)
      assert((w, h, ys.length) === ((4, 2, 3)), s"colourspace $cs")
      assert(ys.zip(frames).forall { case (a, b) => a.sameElements(b) }, s"colourspace $cs")
    }
    // flows through normalize as a real VIDEO container
    val blob = Multimodal.normalize(MediaCodecs.encodeY4m(4, 2, frames, "C420jpeg"))
    assert(Multimodal.parseHeader(blob) ===
      Some(Multimodal.MediaMeta("video", 4, 2, 3, 24)))
    // frame sampling over REAL video: stride 2 keeps frames 0 and 2
    val sampled = Multimodal.sampleFrames(blob, 2)
    assert(sampled.length === 2)
    assert(sampled.forall(s => Multimodal.parseHeader(s).exists(m => m.frames == 1)))
    assert(sampled(1).drop(20).sameElements(frames(2)))
    // resize halves width on every frame
    val rz = Multimodal.resize(blob, 2, 2)
    assert(Multimodal.parseHeader(rz) === Some(Multimodal.MediaMeta("video", 2, 2, 3, 12)))
    // malformed: truncated payload, bad magic, unknown colourspace -> None/null
    val good = MediaCodecs.encodeY4m(4, 2, frames, "Cmono")
    assert(MediaCodecs.decodeY4m(good.dropRight(3)) === None)
    assert(MediaCodecs.decodeY4m("YUV4MPEG3 W4 H2\nFRAME\n".getBytes) === None)
    assert(MediaCodecs.decodeY4m("YUV4MPEG2 W4 H2 C310\nFRAME\n".getBytes) === None)
    // absurd header dims (w*h would overflow Int) -> None, not a crash
    assert(MediaCodecs.decodeY4m("YUV4MPEG2 W100000 H100000 Cmono\nFRAME\n".getBytes) === None)
    assert(Multimodal.normalize(good.dropRight(3)) === null)
  }

  test("stub embeddings feed the ANN operators") {
    val emb = media.select(col("id"), Multimodal.embedCol("blob", 8).as("embedding"))
    val q = Multimodal.embed(Multimodal.encodeFake("image", 16, 8, 1, seed = 1L), 8).toSeq
    val top = Ann.topkBrute(emb, "id", "embedding", q, 3).collect()
    assert(top.length === 3)
    assert(top(0).getLong(0) === 1L) // identical blob -> cosine 1 with itself
    assert(math.abs(top(0).getDouble(1) - 1.0) < 1e-6)
  }
}
