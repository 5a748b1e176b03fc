package graft

import graft.kernels.AhoCorasick
import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick automaton vs a brute-force indexOf sweep — including the
  * shapes the one-pass walk gets wrong when failure/output links are
  * mis-merged: patterns that are substrings of other patterns, patterns
  * sharing prefixes, self-overlapping occurrences, and matches that end
  * at the same position.
  */
class AhoCorasickSpec extends AnyFunSuite {

  private def brute(patterns: Array[String], text: String): Array[Long] =
    patterns.map { p =>
      var i = text.indexOf(p)
      var n = 0L
      while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) } // overlaps counted
      n
    }

  private def check(patterns: Array[String], text: String): Unit = {
    val ac = new AhoCorasick(patterns)
    assert(ac.countAll(text).toSeq === brute(patterns, text).toSeq,
      s"patterns=${patterns.mkString("[", ",", "]")} text=$text")
  }

  test("the classic he/she/his/hers dictionary on 'ushers'") {
    val ac = new AhoCorasick(Array("he", "she", "his", "hers"))
    assert(ac.countAll("ushers").toSeq === Seq(1L, 1L, 0L, 1L))
  }

  test("self-overlapping occurrences are all counted") {
    check(Array("aa"), "aaaa")          // 3, not 2
    check(Array("aba"), "ababababa")    // 4 overlapping
    check(Array("aa", "aaa"), "aaaaa")  // nested + overlapping together
  }

  test("pattern that is a substring of another is reported independently") {
    check(Array("scan", "table scan"), "a table scan then a scan")
    check(Array("a", "ab", "abc", "bc"), "abcabc")
  }

  test("empty text, no-hit text, pattern == text, unicode") {
    check(Array("xy", "z"), "")
    check(Array("xy", "z"), "qqqq")
    check(Array("whole"), "whole")
    check(Array("naïve", "ïv"), "a naïve naïve ïv")
  }

  test("randomized cross-check over a small alphabet (seeded)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab"
    def randStr(len: Int): String =
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 200).foreach { _ =>
      val patterns = Array.fill(1 + rnd.nextInt(5))(randStr(1 + rnd.nextInt(4))).distinct
      check(patterns, randStr(rnd.nextInt(60)))
    }
  }

  test("long text walk stays linear-ish (smoke: 1M chars, dense hits)") {
    val ac = new AhoCorasick(Array("ab", "aba", "b"))
    val text = "ab" * 500000
    val t0 = System.nanoTime()
    val c = ac.countAll(text)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(c.toSeq === Seq(500000L, 499999L, 500000L))
    assert(ms < 5000, s"1M-char walk took ${ms}ms")
  }
}
