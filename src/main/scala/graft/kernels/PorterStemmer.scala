package graft.kernels

/** The Porter stemming algorithm — M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980 — implemented from the published rule
  * lists (original revision, not Porter2). The standard IR normalizer: a
  * retrieval stack stems both the corpus and the query so "relational"
  * matches "relate". Pure function, zero allocation beyond the result.
  *
  * Rule mechanics per the paper: within a step the LONGEST matching
  * suffix is selected first and only then its condition is tested — a
  * failed condition does NOT fall through to a shorter suffix.
  */
object PorterStemmer {

  def stem(word0: String): String = {
    if (word0.length <= 2) return word0
    // the algorithm is defined over lowercase letters; uppercase vowels
    // would otherwise classify as consonants and stem inconsistently
    // Locale.ROOT: default-locale lowercasing would stem the same token
    // differently across executors (e.g. Turkish dotless-i)
    val word =
      if (word0.exists(c => c >= 'A' && c <= 'Z'))
        word0.toLowerCase(java.util.Locale.ROOT)
      else word0
    var w = word
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    w = step5b(w)
    w
  }

  /** Consonant per the paper: not a,e,i,o,u and not y-preceded-by-a-
    * consonant (so TOY = cvc, SYZYGY = cvcvcv).
    */
  private def isCons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** The measure m of [C](VC)^m[V]. */
  private def measure(s: String): Int = {
    var i = 0
    val n = s.length
    var m = 0
    while (i < n && isCons(s, i)) i += 1 // leading [C]
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1 // V run
      if (i < n) { // C run after a V run -> one VC
        m += 1
        while (i < n && isCons(s, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (!isCons(s, i)) return true; i += 1 }
    false
  }

  /** *d — ends with a double consonant. */
  private def endsDoubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o — ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: String): Boolean = {
    val n = s.length
    if (n < 3) return false
    val last = s.charAt(n - 1)
    isCons(s, n - 3) && !isCons(s, n - 2) && isCons(s, n - 1) &&
      last != 'w' && last != 'x' && last != 'y'
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      return if (measure(stem) > 0) w.dropRight(1) else w
    }
    val stripped =
      if (w.endsWith("ed") && hasVowel(w.dropRight(2))) w.dropRight(2)
      else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) w.dropRight(3)
      else return w
    // cleanup after a successful ed/ing removal
    if (stripped.endsWith("at") || stripped.endsWith("bl") || stripped.endsWith("iz"))
      stripped + "e"
    else if (endsDoubleC(stripped) && !"lsz".contains(stripped.last))
      stripped.dropRight(1)
    else if (measure(stripped) == 1 && endsCvc(stripped))
      stripped + "e"
    else stripped
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  // rule lists pre-sorted by descending suffix length: two distinct
  // suffixes of equal length can never both match, so `find` over the
  // sorted list IS longest-match — no per-word filter/sort allocation
  private val Step2: Seq[(String, String)] = sortRules(Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"))

  private val Step3: Seq[(String, String)] = sortRules(Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> ""))

  private def sortRules(rules: Seq[(String, String)]): Seq[(String, String)] =
    rules.sortBy(-_._1.length)

  /** Longest matching suffix wins; its (m > bound) condition is then
    * tested with no fall-through.
    */
  private def replaceLongest(w: String, rules: Seq[(String, String)], mBound: Int): String = {
    val hit = rules.find(r => w.endsWith(r._1))
    hit match {
      case Some((suf, rep)) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > mBound) stem + rep else w
      case None => w
    }
  }

  private def step2(w: String): String = replaceLongest(w, Step2, 0)
  private def step3(w: String): String = replaceLongest(w, Step3, 0)

  private val Step4: Seq[String] = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    .sortBy(-_.length)

  private def step4(w: String): String = {
    val hit = Step4.find(w.endsWith)
    hit match {
      case Some(suf) =>
        val stem = w.dropRight(suf.length)
        val ok = measure(stem) > 1 &&
          (suf != "ion" || (stem.nonEmpty && (stem.last == 's' || stem.last == 't')))
        if (ok) stem else w
      case None => w
    }
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private def step5b(w: String): String =
    if (measure(w) > 1 && endsDoubleC(w) && w.last == 'l') w.dropRight(1) else w
}
