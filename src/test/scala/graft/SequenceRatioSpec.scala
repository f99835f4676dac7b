package graft

import graft.expressions.SequenceRatio
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity with Python difflib.SequenceMatcher.ratio() — the
  * similarity the reference's fuzzy device resolution relies on
  * (reference gs_ready.py:341-353).
  */
class SequenceRatioSpec extends AnyFunSuite {

  val goldens: Seq[(String, String, Double)] = Seq(
    ("lamar blvd/justin ln", "lamar/justin", 0.75),
    ("burnet rd/braker ln", "burnet/braker", 0.8125),
    ("speedway/dean keeton st", "speedway/dean keeton", 0.9302325581395349),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("", "", 1.0),
    ("a", "", 0.0),
    ("congress ave/oltorf st", "s congress ave/w oltorf st", 0.9166666666666666),
    ("guadalupe st/24th st", "24th st/guadalupe st", 0.6))

  test("matches difflib golden ratios") {
    goldens.foreach { case (a, b, expected) =>
      assert(math.abs(SequenceRatio.ratio(a, b) - expected) < 1e-12,
        s"ratio('$a','$b')")
    }
  }

  test("matches difflib on 200 fuzzed street-name pairs (golden resource)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/seqratio_golden.csv"))
    try {
      src.getLines().foreach { line =>
        // fields contain no quotes/commas beyond the two separators
        val Array(a, b, exp) = line.split(",", 3)
        assert(math.abs(SequenceRatio.ratio(a, b) - exp.toDouble) < 1e-12,
          s"ratio('$a','$b')")
      }
    } finally src.close()
  }

  test("symmetric on equal-length inputs and bounded") {
    val samples = Seq("abcdef" -> "abdcfe", "xy" -> "yx", "aaa" -> "aba")
    samples.foreach { case (a, b) =>
      val r = SequenceRatio.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0)
    }
  }
}
