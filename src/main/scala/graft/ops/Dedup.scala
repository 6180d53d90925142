package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. Exact dedup is a
  * hash-groupBy; near-dup uses MinHash + LSH banding (shingle → minhash →
  * band → bucket join) so candidate generation is a shuffle on band keys,
  * never an all-pairs product. The hash is md5 (available and bit-identical
  * in both Spark and DuckDB) so every stage is oracle-checkable; swap
  * `xxhash64` in for production speed — the structure is hash-agnostic.
  */
object Dedup {

  /** Exact-duplicate groups by content hash: (hash, cnt, ids). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("cnt") > 1)

  /** MinHash signature of length `numHashes` (must be a multiple of 4):
    * shingle hash family h_{4v+j} = hex chunk j (8 chars = 32 bits) of
    * md5(v ":" shingle); signature element i = lexicographic min over
    * shingles. One compiled pass, 2 md5 calls per shingle at the default 8
    * hashes — the equivalent nested higher-order-function expression is
    * interpreted (no codegen) and ~20× slower. Deterministic and
    * reproducible in SQL via substring(md5(..), j*8+1, 8).
    */
  def minhash(shingles: Column, numHashes: Int): Column = {
    require(numHashes % 4 == 0, "numHashes must be a multiple of 4 (md5 chunking)")
    val variants = numHashes / 4
    val f = udf((sh: Seq[String]) => {
      if (sh == null) null
      else {
        val digest = java.security.MessageDigest.getInstance("MD5")
        val hexTable = "0123456789abcdef".toCharArray
        val mins = Array.fill(numHashes)(null: String)
        val hexBuf = new Array[Char](32)
        sh.foreach { s =>
          var v = 0
          while (v < variants) {
            digest.reset()
            val bytes = digest.digest(s"$v:$s".getBytes("UTF-8"))
            var b = 0
            while (b < 16) {
              hexBuf(b * 2) = hexTable((bytes(b) >> 4) & 0xf)
              hexBuf(b * 2 + 1) = hexTable(bytes(b) & 0xf)
              b += 1
            }
            var j = 0
            while (j < 4) {
              val i = v * 4 + j
              val chunk = new String(hexBuf, j * 8, 8)
              if (mins(i) == null || chunk < mins(i)) mins(i) = chunk
              j += 1
            }
            v += 1
          }
        }
        if (mins(0) == null) Seq.empty[String] else mins.toSeq
      }
    })
    f(shingles)
  }

  /** LSH banding: explode the signature into (bandId, bandKey) rows; docs
    * sharing any band bucket become candidate pairs via a self-equi-join on
    * the band key (a plain shuffle join — broadcast-able when buckets are
    * small, AQE-skew-splittable when a bucket is hot).
    */
  def lshCandidates(df: DataFrame, idCol: String, sigCol: String, bands: Int): DataFrame = {
    val banded = df.filter(size(col(sigCol)) > 0).select(col(idCol).as("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            concat_ws("|", slice(col(sigCol), b * (size(col(sigCol)) / bands) + 1,
              (size(col(sigCol)) / bands))).as("key")))).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: join shingle sets back and
    * compute |∩|/|∪| over distinct shingles.
    */
  def jaccard(candidates: DataFrame, withShingles: DataFrame, idCol: String,
      shinglesCol: String): DataFrame = {
    val s = withShingles.select(col(idCol).as("jid"),
      array_distinct(col(shinglesCol)).as("sh"))
    candidates
      .join(s.withColumnRenamed("jid", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(s.withColumnRenamed("jid", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
  }

  /** SimHash (bitwise majority of per-token hash bits): md5's first
    * `bits/4` hex chars give the bit source; bit b of the result is 1 when
    * more tokens have bit b set than not. Single compiled pass, ONE md5 per
    * token occurrence (the expression form re-hashed per bit). Default 16
    * bits keeps the oracle SQL tractable; production would widen to 64.
    */
  def simhash(toks: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 32 && bits % 4 == 0)
    val hexDigits = bits / 4
    val f = udf((ts: Seq[String]) => {
      val votes = new Array[Int](bits)
      if (ts != null) {
        val digest = java.security.MessageDigest.getInstance("MD5")
        ts.foreach { t =>
          digest.reset()
          val bs = digest.digest(t.getBytes("UTF-8"))
          var h = 0L
          var i = 0
          while (i < hexDigits) { // first hexDigits hex chars = high nibbles first
            val nib = if (i % 2 == 0) (bs(i / 2) >> 4) & 0xf else bs(i / 2) & 0xf
            h = (h << 4) | nib
            i += 1
          }
          var b = 0
          while (b < bits) {
            votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      (0 until bits).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    })
    f(toks)
  }
}
