package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class SentenceSpec extends AnyFunSuite {

  test("basic boundaries on . ! ? with uppercase/digit continuation") {
    assert(TextOps.splitSentences("One here. Two there! Three now? Four.") ==
      Seq("One here.", "Two there!", "Three now?", "Four."))
    assert(TextOps.splitSentences("Built in 1999. 2000 followed.") ==
      Seq("Built in 1999.", "2000 followed."))
  }

  test("lowercase continuation is not a boundary") {
    assert(TextOps.splitSentences("He got 3.5 points. it was fine. Then more.") ==
      Seq("He got 3.5 points. it was fine.", "Then more."))
  }

  test("abbreviations and initials do not split") {
    assert(TextOps.splitSentences("Dr. Smith met Mrs. Jones. They spoke.") ==
      Seq("Dr. Smith met Mrs. Jones.", "They spoke."))
    assert(TextOps.splitSentences("John F. Kennedy spoke. Crowds cheered.") ==
      Seq("John F. Kennedy spoke.", "Crowds cheered."))
    assert(TextOps.splitSentences("See fig. 3 for details. Then continue.") ==
      // 'fig.' guard holds even before a digit
      Seq("See fig. 3 for details.", "Then continue."))
  }

  test("closing quotes attach to the left sentence") {
    assert(TextOps.splitSentences("He said 'Stop!' Then he left.") ==
      Seq("He said 'Stop!'", "Then he left."))
    assert(TextOps.splitSentences("(Really?) Yes.") == Seq("(Really?)", "Yes."))
  }

  test("multi-mark runs always split; totality on edge shapes") {
    assert(TextOps.splitSentences("What?! Next one.") == Seq("What?!", "Next one."))
    assert(TextOps.splitSentences("Ends mid. E") == Seq("Ends mid.", "E"))
    assert(TextOps.splitSentences("no terminator at all") == Seq("no terminator at all"))
    assert(TextOps.splitSentences("") == Seq.empty)
    assert(TextOps.splitSentences(null) == Seq.empty)
    assert(TextOps.splitSentences("   ") == Seq.empty)
  }
}
