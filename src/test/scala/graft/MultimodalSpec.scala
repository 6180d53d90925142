package graft

import graft.ops.{Ann, Multimodal}

/** Multimodal binary-column plumbing: schema, batched decode/resize/frame
  * sampling, embedding hand-off to ANN — on the deterministic fake
  * container (real codecs are stubbed by design).
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

  test("stub embeddings feed the ANN operators") {
    val emb = media.select(col("id"), Multimodal.embedCol("blob", 8).as("embedding"))
    val q = Multimodal.embed(Multimodal.encodeFake("image", 16, 8, 1, seed = 1L), 8).toSeq
    val top = Ann.topkBrute(emb, "id", "embedding", q, 3).collect()
    assert(top.length === 3)
    assert(top(0).getLong(0) === 1L) // identical blob -> cosine 1 with itself
    assert(math.abs(top(0).getDouble(1) - 1.0) < 1e-6)
  }
}
