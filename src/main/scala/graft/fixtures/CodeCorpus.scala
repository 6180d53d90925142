package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic source-code corpus per FIXTURES.md §1 /
  * BASELINE.json input_hint: (repo, path, commit, lang, content).
  *
  * Seeded per row index (not per partition), so content is identical at any
  * parallelism level — required for the two-parallelism scaling benchmark and
  * for docId determinism tests. Vocabulary is Zipf-ish with deliberate hot
  * terms (`def`, `class`, `import`, `return`, `the`) to exercise the salted
  * posting build, plus planted marker phrases for phrase-query golds.
  */
object CodeCorpus {
  val Langs: Array[String] = Array("scala", "java", "py", "go", "rs")
  val Keywords: Array[String] = Array(
    "def", "class", "import", "return", "val", "var", "if", "else", "for",
    "while", "match", "case", "new", "this", "the", "static", "public", "fn")
  val IdentStems: Array[String] = Array(
    "parse", "build", "merge", "scan", "index", "query", "score", "token",
    "block", "posting", "shard", "batch", "stream", "buffer", "codec", "hash")

  def content(rowId: Long): String = {
    val rnd = new java.util.Random(rowId * 0x9e3779b97f4a7c15L + 42L)
    val nTokens = 60 + rnd.nextInt(120)
    val sb = new StringBuilder(nTokens * 8)
    var i = 0
    while (i < nTokens) {
      val r = rnd.nextInt(100)
      val tok =
        if (r < 45) Keywords(zipf(rnd, Keywords.length)) // hot head
        else if (r < 75) {
          val a = IdentStems(rnd.nextInt(IdentStems.length))
          val b = IdentStems(rnd.nextInt(IdentStems.length))
          if (rnd.nextBoolean()) s"${a}_$b" else a + b.capitalize // snake & camel
        } else if (r < 90) IdentStems(rnd.nextInt(IdentStems.length)) + rnd.nextInt(50)
        else "x" + rnd.nextInt(1000)
      sb.append(tok)
      sb.append(if (rnd.nextInt(10) == 0) ";\n" else " ")
      i += 1
    }
    if (rowId % 10 == 0) sb.append("we the people ")
    if (rowId % 7 == 0) sb.append("block max wand ")
    sb.toString
  }

  /** Zipf-ish rank pick: heavy head, long tail. */
  private def zipf(rnd: java.util.Random, n: Int): Int = {
    val u = rnd.nextDouble()
    math.min(n - 1, (n * u * u * u).toInt)
  }

  def generate(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    spark.range(0, n, 1, parts).map { id =>
      val repo = s"org${id % 97}/repo${id % 1003}"
      val lang = Langs((id % Langs.length).toInt)
      val path = f"src/pkg${id % 31}/File$id%08d.$lang"
      val commit = f"${(id * 0x517cc1b727220a95L) & 0xffffffffL}%08x"
      (repo, path, commit, lang, content(id))
    }.toDF("repo", "path", "commit", "lang", "content")
  }
}
