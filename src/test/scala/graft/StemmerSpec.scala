package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzers, PorterStemmer}

/** Porter algorithm behavior on canonical examples from the published
  * paper, plus the reference's analyzer gold (test_engine.py:33-53).
  */
class StemmerSpec extends AnyFunSuite {

  val golds = Map(
    "caresses" -> "caress", "flies" -> "fli", "dies" -> "di", "mules" -> "mule",
    "denied" -> "deni", "agreed" -> "agre", "motoring" -> "motor",
    "hopping" -> "hop", "falling" -> "fall", "hissing" -> "hiss",
    "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "digitizer" -> "digit", "operator" -> "oper", "feudalism" -> "feudal",
    "hopefulness" -> "hope", "goodness" -> "good", "allowance" -> "allow",
    "inference" -> "infer", "adjustable" -> "adjust", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "effective" -> "effect", "probate" -> "probat", "rate" -> "rate",
    "cats" -> "cat", "roll" -> "roll",
    // the reference's pinned case
    "searches" -> "search", "search" -> "search")

  test("canonical Porter examples") {
    golds.foreach { case (in, out) =>
      assert(PorterStemmer.stem(in) === out, s"stem($in)")
    }
  }

  test("stemming analyzer composes with standard tokenization") {
    val terms = Analyzers.byName("porter").terms("He searches searching Searched!")
    assert(terms.toSeq === Seq("he", "search", "search", "search"))
  }
}
