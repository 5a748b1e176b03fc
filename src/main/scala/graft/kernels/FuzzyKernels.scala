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

  /** fuzzywuzzy utils.asciidammit under Python 3: bad_chars is exactly
    * chr(128)..chr(255), so ONLY code points U+0080–U+00FF are dropped
    * (Latin-1 accents like é vanish); all other Unicode — Arabic, CJK —
    * passes through untouched and survives `\W` as word characters.
    * "force ASCII" is a misnomer in the original; we mirror it exactly.
    */
  def asciiDammit(s: String): String = {
    var i = 0
    while (i < s.length && !(s.charAt(i) >= 0x80 && s.charAt(i) <= 0xFF)) i += 1
    if (i == s.length) s
    else s.filterNot(c => c >= 0x80 && c <= 0xFF)
  }

  /** fuzzywuzzy full_process: non-word chars → space, lowercase, strip. */
  def fullProcess(s: String): String =
    NonWord.matcher(s).replaceAll(" ").toLowerCase(Locale.ROOT).strip()

  /** fuzz.token_sort_ratio with the library's default force_ascii=True:
    * asciidammit, then full-process both sides, whitespace tokens sorted
    * and re-joined, then ratio.
    */
  def tokenSortRatio(a: String, b: String): Int = {
    def prep(s: String): String =
      fullProcess(asciiDammit(s)).split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")
    ratio(prep(a), prep(b))
  }

  // ------------------------------------------- dropdown decision core

  /** process.extractOne(query, choices, scorer=token_sort_ratio):
    * first-wins max. Returns (choice, score); None on empty choices.
    */
  def extractOne(query: String, choices: Seq[String]): Option[(String, Int)] =
    if (choices.isEmpty) None
    else {
      var best = choices.head
      var bestScore = tokenSortRatio(query, choices.head)
      choices.tail.foreach { c =>
        val s = tokenSortRatio(query, c)
        if (s > bestScore) { best = c; bestScore = s }
      }
      Some((best, bestScore))
    }

  /** Option cleaning for carrier dropdowns (endpoint_upload.py:197-207):
    * `A-B-C-D` → `C-D`, `A-B` → `B`, else unchanged.
    */
  def cleanOptionCarrier(option: String): String = {
    val parts = option.split("-", -1)
    if (parts.length >= 3) parts.drop(2).mkString("-").strip()
    else if (parts.length == 2) parts(1).strip()
    else option
  }

  /** Generic option cleaning (endpoint_upload.py:209): separators →
    * spaces.
    */
  def cleanOptionGeneric(option: String): String =
    option.replace("-", " ").replace(",", " ")
      .replace("(", " ").replace(")", " ").strip()

  /** The chunk-ladder match decision (endpoint_upload.py:211-235): best
    * chunk score (strictly-greater wins), accept at >= 60 with a
    * double-check of the full key input at >= 50 (original overrides only
    * when it beats the chunk score and misses 50). Returns the ORIGINAL
    * (uncleaned) option, or None when no chunk reaches 60.
    */
  def bestDropdownMatch(
      chunks: Seq[String], keyInput: String,
      availableOptions: Seq[String], carrierStyle: Boolean): Option[String] = {
    val cleaned =
      if (carrierStyle) availableOptions.map(cleanOptionCarrier)
      else availableOptions.map(cleanOptionGeneric)
    if (cleaned.isEmpty) return None
    var bestMatchCleaned: String = null
    var bestScore = 0
    chunks.foreach { chunk =>
      extractOne(chunk, cleaned).foreach { case (m, s) =>
        if (s > bestScore) { bestMatchCleaned = m; bestScore = s }
      }
    }
    if (bestScore >= 60) {
      val (origMatch, origScore) = extractOne(keyInput, cleaned).get
      val pick =
        if (origScore >= 50) bestMatchCleaned
        else if (origScore > bestScore) origMatch
        else bestMatchCleaned
      Some(availableOptions(cleaned.indexOf(pick)))
    } else None
  }

  /** Word-vote modality matcher (select_or_type_modality,
    * endpoint_upload.py:496-517): per option, count input words with any
    * option word at fuzz.ratio >= 90; argmax (first-wins). Option key =
    * text before the first '-', punctuation → spaces, whitespace
    * collapsed. Returns (option, voteCount).
    */
  def wordVoteBest(inputWords: Seq[String], options: Seq[String]): Option[(String, Int)] = {
    // python dict keyed by cleaned name: later duplicates overwrite
    val cleanedPairs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    options.foreach { option =>
      val name = option.split("-", -1)(0).strip()
      val cleaned = name.replace("(", " ").replace(")", " ")
        .replace(".", " ").replace(",", " ").strip()
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      cleanedPairs(cleaned) = option
    }
    if (cleanedPairs.isEmpty) return None
    var best: (String, Int) = null
    cleanedPairs.foreach { case (cleanedOpt, fullOpt) =>
      val optWords = cleanedOpt.split(" ").filter(_.nonEmpty)
      var matches = 0
      inputWords.foreach { iw =>
        if (optWords.exists(ow =>
          ratio(iw.toLowerCase(Locale.ROOT), ow.toLowerCase(Locale.ROOT)) >= 90))
          matches += 1
      }
      if (best == null || matches > best._2) best = (fullOpt, matches)
    }
    Some(best)
  }
}
