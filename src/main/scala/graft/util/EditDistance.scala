package graft.util

/** Restricted Damerau-Levenshtein (optimal string alignment): a transposition
  * of two ADJACENT characters counts as ONE edit. This is the distance
  * Lucene's fuzzy machinery observes — FuzzyQuery defaults to
  * transpositions=true and DirectSpellChecker ranks with
  * LuceneLevenshteinDistance ("as in transposition counts as 1") — so
  * 'sprak'~1 matches 'spark' here, where plain Levenshtein (distance 2)
  * would miss it. Reference behavior: /root/reference/lupyne/engine/
  * queries.py:116-119 (fuzzy), indexers.py:147-160 (suggest).
  */
object EditDistance {

  /** OSA distance between `a` and `b`. O(|a|·|b|) time, O(|b|) space
    * (three rolling rows).
    */
  def damerau(a: String, b: String): Int = {
    if (a == b) return 0
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev2 = new Array[Int](m + 1) // row i-2
    var prev = new Array[Int](m + 1)  // row i-1
    var cur = new Array[Int](m + 1)   // row i
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = i
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bj = b.charAt(j - 1)
        val cost = if (ai == bj) 0 else 1
        var d = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 && ai == b.charAt(j - 2) && a.charAt(i - 2) == bj)
          d = math.min(d, prev2(j - 2) + cost)
        cur(j) = d
        j += 1
      }
      val t = prev2; prev2 = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
