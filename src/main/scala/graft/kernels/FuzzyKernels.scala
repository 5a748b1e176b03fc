package graft.kernels

import java.util.Locale
import java.util.regex.Pattern
import scala.collection.mutable

/** Exact port of the reference's fuzzy-match scoring (fuzzywuzzy →
  * difflib.SequenceMatcher; endpoint_upload.py:215,223,508,641,648):
  * `ratio` and `token_sort_ratio` with CPython-identical results —
  * including the b2j autojunk heuristic and the half-even rounding of
  * `int(round(100*r))`. Verified against stdlib difflib ground truth
  * (FuzzyKernelsSpec).
  */
object FuzzyKernels {

  /** difflib.SequenceMatcher.get_matching_blocks total match size M for
    * (a, b) with isjunk=None, autojunk=True.
    */
  private def totalMatchSize(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    // b2j with autojunk: elements occurring > n/100+1 times are dropped
    // from the index when n >= 200 (difflib's heuristic)
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < lb) {
      b2j.getOrElseUpdate(b.charAt(i), mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    if (lb >= 200) {
      val ntest = lb / 100 + 1
      b2j.filterInPlace((_, idxs) => idxs.length <= ntest)
    }

    // find_longest_match(alo, ahi, blo, bhi) — bjunk empty (isjunk=None)
    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var ii = alo
      while (ii < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a.charAt(ii)) match {
          case Some(idxs) =>
            var p = 0
            var stop = false
            while (p < idxs.length && !stop) {
              val j = idxs(p)
              if (j < blo) p += 1
              else if (j >= bhi) stop = true
              else {
                val k = j2len.getOrElse(j - 1, 0) + 1
                newj2len(j) = k
                if (k > bestsize) { besti = ii - k + 1; bestj = j - k + 1; bestsize = k }
                p += 1
              }
            }
          case None => ()
        }
        j2len = newj2len
        ii += 1
      }
      // extend with equal elements on both sides (junk sets empty, but the
      // autojunk-popular chars missing from b2j can still extend here —
      // mirrors difflib exactly)
      while (besti > alo && bestj > blo && a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      (besti, bestj, bestsize)
    }

    // get_matching_blocks queue recursion; only the size sum is needed
    var total = 0
    val queue = mutable.Stack((0, la, 0, lb))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (bi, bj, k) = findLongestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        total += k
        if (alo < bi && blo < bj) queue.push((alo, bi, blo, bj))
        if (bi + k < ahi && bj + k < bhi) queue.push((bi + k, ahi, bj + k, bhi))
      }
    }
    total
  }

  /** fuzz.ratio == int(round(100 * SequenceMatcher.ratio())) — Python's
    * round is half-even; Math.rint matches.
    */
  def ratio(a: String, b: String): Int = {
    val denom = a.length + b.length
    val r = if (denom == 0) 1.0 else 2.0 * totalMatchSize(a, b) / denom
    Math.rint(100.0 * r).toInt
  }

  private val NonWord = Pattern.compile("\\W", Pattern.UNICODE_CHARACTER_CLASS)

  /** fuzzywuzzy full_process: non-word chars → space, lowercase, strip. */
  def fullProcess(s: String): String =
    NonWord.matcher(s).replaceAll(" ").toLowerCase(Locale.ROOT).strip()

  /** fuzz.token_sort_ratio: full-process both sides, whitespace tokens
    * sorted and re-joined, then ratio.
    */
  def tokenSortRatio(a: String, b: String): Int = {
    def prep(s: String): String =
      fullProcess(s).split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")
    ratio(prep(a), prep(b))
  }
}
