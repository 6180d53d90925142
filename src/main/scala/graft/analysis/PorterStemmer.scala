package graft.analysis

/** The classic Porter stemming algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", Program 14(3), 1980 — public algorithm), implemented
  * from the published rule tables. Used as an optional analyzer stage for
  * parity with the reference's stemming test
  * (/root/reference/tests/test_engine.py:33-53: "searches" → "search").
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w); w = step5(w)
    w
  }

  private def isVowel(w: String, i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m of the stem: number of VC sequences. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1
      if (i < n) m += 1
      while (i < n && !isVowel(w, i)) i += 1
    }
    m
  }

  private def containsVowel(w: String): Boolean = w.indices.exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w(w.length - 1) == w(w.length - 2) && !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w(n - 1))
  }

  private def replace(w: String, suffix: String, to: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (measure(stem) > minM) Some(stem + to) else Some(w)
    } else None

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def applyFirst(w: String, rules: Seq[(String, String)]): String =
    rules.collectFirst {
      case (suf, to) if w.endsWith(suf) => (suf, to)
    } match {
      case Some((suf, to)) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > 0) stem + to else w
      case None => w
    }

  private def step2(w: String): String = applyFirst(w, step2Rules)
  private def step3(w: String): String = applyFirst(w, step3Rules)

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String =
    step4Suffixes.collectFirst {
      case suf if w.endsWith(suf) => suf
    } match {
      case Some("ion") =>
        val stem = w.dropRight(3)
        if (measure(stem) > 1 && stem.nonEmpty && (stem.last == 's' || stem.last == 't')) stem else w
      case Some(suf) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > 1) stem else w
      case None => w
    }

  private def step5(w: String): String = {
    var v = w
    if (v.endsWith("e")) {
      val stem = v.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) v = stem
    }
    if (endsDoubleConsonant(v) && v.endsWith("l") && measure(v.dropRight(1)) > 1)
      v = v.dropRight(1)
    v
  }
}

/** Analyzer wrapper: standard word extraction + lowercase + Porter stem. */
object StemmingAnalyzer extends Analyzer {
  val name = "porter"
  private val base = Analyzers.standard
  override def tokens(text: String): IndexedSeq[Token] =
    base.tokens(text).map(t => t.copy(term = PorterStemmer.stem(t.term)))
}
