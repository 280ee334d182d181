package graft

import graft.analysis.Relevance
import graft.fixtures.Fixtures
import org.scalatest.funsuite.AnyFunSuite

/** P3 parity: pinned vectors computed with CPython running the reference's
  * exact RelevanceFilter.calculate_score
  * (/root/reference/crawler/utils/relevance_filter.py:30-93), plus the
  * reference property suite's invariants
  * (tests/test_relevance_filter_property.py:35,110).
  */
class RelevanceSpec extends AnyFunSuite {

  test("score matches CPython-pinned vectors") {
    assert(Relevance.score("lostark is great fun lostark", Seq("lostark"), "lostark review") == 1.0)
    assert(Relevance.score("nothing relevant here", Seq("lostark"), "title text") == 0.0)
    assert(math.abs(Relevance.score("7knights patch notes", Seq("7knights"), "") - 0.4272727272727273) < 1e-15)
    assert(Relevance.score("버그 있는 게임 버그", Seq("버그"), "버그 리포트") == 1.0)
    assert(Relevance.score("", Seq.empty, "") == 0.0)
    assert(math.abs(Relevance.score("text", Seq("kw1", "kw2"), "kw1 here") - 0.32727272727272727) < 1e-15)
  }

  test("score always in [0,1]; keyword-present monotonicity (500 cases)") {
    (0 until 500).foreach { i =>
      val h = Fixtures.mix(7L, i.toLong)
      val kw = Fixtures.Keywords(Fixtures.bounded(h, 3))
      val title = Fixtures.words(h, 4, 1L)
      val body = Fixtures.words(h, 10, 2L)
      val s0 = Relevance.score(body, Seq(kw), title)
      assert(s0 >= 0.0 && s0 <= 1.0)
      // adding the keyword to the title can only raise the score
      val s1 = Relevance.score(body, Seq(kw), kw + " " + title)
      assert(s1 >= s0)
    }
  }

  test("non-overlapping occurrence count (Python re.findall semantics)") {
    assert(Relevance.countOccurrences("aaaa", "aa") == 2)
    assert(Relevance.countOccurrences("aaa", "aa") == 1)
    assert(Relevance.countOccurrences("abcabc", "abc") == 2)
    assert(Relevance.countOccurrences("", "a") == 0)
    assert(Relevance.countOccurrences("a", "") == 0)
  }
}
