package graft

import graft.ops.{Ann, Dedup, TextOps}

/** Unit behaviors of the training-data ops (the engine↔DuckDB parity is
  * covered by the Verify/check_oracle gate; these pin semantics).
  */
class OpsSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog in a field"),
      (1L, "the quick brown fox jumps over the lazy dog in a field"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy cat in a field"), // near dup of 0
      (3L, "der hund und die katze sind nicht ein tier mit den"),
      (4L, "completely different words about spark engines and indexes")
    ).toDF("id", "text")
  }

  test("token count and shingles") {
    val r = docs.select(TextOps.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(r(0) === 12)
    val sh = docs.filter(col("id") === 0)
      .select(TextOps.shingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(sh.length === 10)
    assert(sh.head === "the quick brown" && sh.last === "in a field")
  }

  test("language id picks stopword-dominant language") {
    val r = docs.select(col("id"), TextOps.languageId(col("text"))).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(0L) === "en")
    assert(r(3L) === "de")
  }

  test("exact dedup groups") {
    val g = Dedup.exactGroups(docs, "id", "text").collect()
    assert(g.length === 1)
    assert(g(0).getAs[Seq[Long]]("ids") === Seq(0L, 1L))
  }

  test("minhash-LSH finds exact and near dups; jaccard values correct") {
    val sh = docs.select(col("id"), TextOps.shingles(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minhash(col("sh"), 8))
    val cand = Dedup.lshCandidates(sh, "id", "sig", bands = 4)
    val jac = Dedup.jaccard(cand, sh, "id", "sh").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((0L, 1L)) === 1.0) // exact dup always collides
    // near dup (1 token changed out of 12): if LSH surfaced it, jaccard is 7/13
    jac.get((0L, 2L)).foreach(j => assert(math.abs(j - 7.0 / 13.0) < 1e-12))
    assert(!jac.contains((0L, 4L)) && !jac.contains((3L, 4L))) // dissimilar never collide
  }

  test("simhash: identical docs equal; dissimilar docs differ") {
    val r = docs.select(col("id"), Dedup.simhash(TextOps.tokens(col("text")), 16))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) === r(1L))
    assert(r(0L) !== r(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(r(0L), r(2L)) < ham(r(0L), r(4L))) // near dup closer than random
  }

  test("ann: brute-force top-k order and self-similarity") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Ann.topkBrute(emb, "vec_id", "embedding", Seq(1.0f, 0.0f, 0.0f), 3).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    assert(math.abs(top(0).getDouble(1) - 1.0) < 1e-12)
    // LSH bucket: hyperplane [1,0,0] separates 3 from {0,1}
    val lsh = Ann.topkLsh(emb, "vec_id", "embedding", Seq(1.0f, 0.0f, 0.0f),
      Seq(Seq(1.0f, 0.0f, 0.0f)), 10).collect().map(_.getLong(0))
    assert(lsh.toSeq === Seq(0L, 1L)) // doc2 dot=0 -> other bucket, doc3 negative
  }
}
