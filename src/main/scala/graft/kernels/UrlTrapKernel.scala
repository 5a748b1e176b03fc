package graft.kernels

import java.util.Locale

/** Crawl-trap URL detection — the frontier gate that keeps a crawler
  * out of infinite URL spaces (public crawler heuristics; e.g. the
  * classic Heritrix path-repetition and query-budget rules):
  *
  *  - repeated path segment: one segment ≥3 times in the path
  *    (calendar/cycle traps like /a/b/a/b/a/b/)
  *  - excessive depth: > 8 path segments
  *  - query budget: > 5 parameters
  *  - session-id params: known names (phpsessid/jsessionid/sessionid/
  *    sid) or a ≥32-char pure-hex value — URLs that are unique per
  *    visit and would explode the frontier
  *
  * Pure parsing, zero allocation-heavy regex on the hot path.
  */
object UrlTrapKernel {

  final case class Verdict(
      repeatedSeg: Boolean, tooDeep: Boolean, manyParams: Boolean,
      sessionParam: Boolean) {
    def isTrap: Boolean = repeatedSeg || tooDeep || manyParams || sessionParam
  }

  private val SessionNames = Set("phpsessid", "jsessionid", "sessionid", "sid")

  private def isHex(s: String): Boolean =
    s.length >= 32 && s.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))

  def classify(url: String): Verdict = {
    if (url == null) return Verdict(false, false, false, false)
    // path starts after the authority, ends at ?/#
    val schemeEnd = url.indexOf("://")
    val pathStart = {
      val from = if (schemeEnd >= 0) schemeEnd + 3 else 0
      val p = url.indexOf('/', from)
      if (p < 0) url.length else p
    }
    val hash = url.indexOf('#')
    // a '?' after '#' is fragment content, not a query string
    val qMark = {
      val q = url.indexOf('?')
      if (q >= 0 && hash >= 0 && q > hash) -1 else q
    }
    val pathEnd = {
      val cands = Seq(qMark, hash).filter(_ >= 0)
      if (cands.isEmpty) url.length else cands.min
    }
    val path = if (pathStart < pathEnd) url.substring(pathStart, pathEnd) else ""
    val segs = path.split("/").filter(_.nonEmpty)
    val counts = new java.util.HashMap[String, Integer]()
    var repeated = false
    segs.foreach { s =>
      val c = counts.merge(s, 1, (a, b) => a + b)
      if (c >= 3) repeated = true
    }
    val tooDeep = segs.length > 8
    var nParams = 0
    var session = false
    if (qMark >= 0) {
      val qEnd = if (hash >= 0 && hash > qMark) hash else url.length
      val query = url.substring(qMark + 1, qEnd)
      query.split("&").foreach { kv =>
        if (kv.nonEmpty) {
          nParams += 1
          val eq = kv.indexOf('=')
          val k = (if (eq >= 0) kv.substring(0, eq) else kv).toLowerCase(Locale.ROOT)
          val v = if (eq >= 0) kv.substring(eq + 1) else ""
          if (SessionNames.contains(k) || isHex(v)) session = true
        }
      }
    }
    Verdict(repeated, tooDeep, nParams > 5, session)
  }
}
