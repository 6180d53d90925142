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

  /** MinHash signature: for seed i in 1..numHashes, the lexicographic min of
    * md5(i ++ ":" ++ shingle). Array column of length numHashes.
    */
  def minhash(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      i => array_min(transform(shingles, s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH banding: explode the signature into (bandId, bandKey) rows; docs
    * sharing any band bucket become candidate pairs via a self-equi-join on
    * the band key (a plain shuffle join — broadcast-able when buckets are
    * small, AQE-skew-splittable when a bucket is hot).
    */
  def lshCandidates(df: DataFrame, idCol: String, sigCol: String, bands: Int): DataFrame = {
    val rowsPerBand = expr(s"size($sigCol)").cast("int") / bands
    val banded = df.select(col(idCol).as("id"),
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
    * more tokens have bit b set than not. Default 16 bits keeps the oracle
    * SQL tractable; production would widen to 64 via xxhash64.
    */
  def simhash(toks: Column, bits: Int = 16): Column = {
    val hexDigits = bits / 4
    val h = (t: Column) => conv(substring(md5(t), 1, hexDigits), 16, 10).cast("long")
    (0 until bits).map { b =>
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc + when(shiftright(h(t), b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }
}
