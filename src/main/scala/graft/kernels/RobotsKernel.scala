package graft.kernels

import scala.collection.mutable.ArrayBuffer

/** robots.txt evaluation per RFC 9309 (public spec) — the fetch-side
  * gate of a crawl pipeline (the page-side `<meta robots>` gate lives in
  * [[LinkKernel]]).
  *
  * Implemented semantics:
  *   - line syntax: `field: value`, `#` comments, CR/LF tolerant,
  *     case-insensitive field names; unknown fields (crawl-delay,
  *     sitemap, ...) are ignored but do NOT break a group;
  *   - group selection: the group(s) whose user-agent token is the
  *     longest case-insensitive substring of our product token win;
  *     `*` groups apply only when no named group matches. Multiple
  *     groups for the same agent merge (RFC 9309 §2.2.1);
  *   - rule matching: byte-prefix match with `*` (any sequence) and a
  *     trailing `$` (end anchor), evaluated by a BitSet DP — linear in
  *     |pattern|x|path|, so hostile many-star patterns can't blow up a
  *     task (kernel totality, same stance as the HTML tokenizer);
  *   - precedence: longest matched pattern wins; tie goes to allow
  *     (RFC 9309 §2.2.2 "least restrictive"); no match = allow;
  *     `Disallow:` with an empty value contributes no rule.
  */
object RobotsKernel {

  /** One parsed rule: allow/disallow + raw pattern (specificity =
    * pattern length in characters, per the RFC's octet count).
    */
  final case class Rule(allow: Boolean, pattern: String)

  /** Compiled ruleset for one agent: only the rules of the winning
    * group(s), ready for [[isAllowed]].
    */
  final case class RuleSet(rules: Vector[Rule])

  /** Empty ruleset = everything allowed (no robots.txt / fetch error
    * 4xx, per RFC 9309 §2.3.1.3).
    */
  val AllowAll: RuleSet = RuleSet(Vector.empty)

  /** Prefix glob match: does `pattern` (with `*` / trailing `$`) match
    * a prefix of `path`? BitSet DP over reachable path positions.
    */
  def matches(pattern: String, path: String): Boolean = {
    val n = path.length
    var reach = new java.util.BitSet(n + 1)
    reach.set(0)
    var pi = 0
    while (pi < pattern.length) {
      val pc = pattern.charAt(pi)
      if (pc == '$' && pi == pattern.length - 1) return reach.get(n)
      val next = new java.util.BitSet(n + 1)
      if (pc == '*') {
        val min = reach.nextSetBit(0)
        if (min < 0) return false
        next.set(min, n + 1)
      } else {
        var s = reach.nextSetBit(0)
        while (s >= 0) {
          if (s < n && path.charAt(s) == pc) next.set(s + 1)
          s = reach.nextSetBit(s + 1)
        }
      }
      reach = next
      if (reach.isEmpty) return false
      pi += 1
    }
    true // pattern consumed → prefix matched
  }

  /** Longest-match verdict for `path` under `rules`; no match = allow,
    * equal-length allow/disallow = allow.
    */
  def isAllowed(rules: RuleSet, path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.rules.length) {
      val r = rules.rules(i)
      if (r.pattern.length >= bestLen && matches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = r.allow }
        else if (len == bestLen) bestAllow = bestAllow || r.allow
      }
      i += 1
    }
    bestAllow
  }

  /** Parse a robots.txt body and select the rules applying to `agent`
    * (a product token, e.g. "graftbot").
    */
  /** `Sitemap:` directive values, in file order. Per sitemaps.org (and
    * RFC 9309 §2.2.4's treatment of other records) the line is GLOBAL —
    * independent of any user-agent group — so this is a flat scan with
    * the same comment/whitespace rules as parse().
    */
  def sitemaps(robotsTxt: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    robotsTxt.split("\r?\n", -1).foreach { line0 =>
      val hash = line0.indexOf('#')
      val line = (if (hash >= 0) line0.substring(0, hash) else line0).trim
      val ci = line.indexOf(':')
      if (ci > 0 && line.substring(0, ci).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(ci + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result()
  }

  /** Crawl-delay (seconds) from the group that governs `agent` — the
    * same group-selection rules as parse() (best named match, else `*`),
    * since the de-facto directive is group-scoped unlike `Sitemap:`.
    * None when the governing group declares no delay.
    */
  def crawlDelay(robotsTxt: String, agent: String): Option[Int] = {
    val agentLc = agent.toLowerCase
    // group collection mirrors parse(): UA lines accumulate until a body
    // line is seen; the next UA line then starts a new group
    val groups = new ArrayBuffer[(ArrayBuffer[String], Array[Option[Int]])]()
    var curUas: ArrayBuffer[String] = null
    var curDelay: Array[Option[Int]] = null
    var rulesSeen = false
    robotsTxt.split("\r?\n", -1).foreach { line0 =>
      val hash = line0.indexOf('#')
      val line = (if (hash >= 0) line0.substring(0, hash) else line0).trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (curUas == null || rulesSeen) {
              curUas = new ArrayBuffer[String]()
              curDelay = Array(None)
              groups += ((curUas, curDelay))
              rulesSeen = false
            }
            if (value.nonEmpty) curUas += value.toLowerCase
          case "crawl-delay" =>
            if (curDelay != null) {
              rulesSeen = true
              if (curDelay(0).isEmpty)
                try curDelay(0) = Some(value.toInt)
                catch { case _: NumberFormatException => () }
            }
          case _ =>
            if (curUas != null) rulesSeen = true
        }
      }
    }
    // same governing-group selection as parse(); first declared delay
    // among the selected groups wins (a governing group without a delay
    // means NO delay — it shadows `*` like its rules do)
    var bestLen = 0
    groups.foreach { case (uas, _) =>
      uas.foreach { t =>
        if (t != "*" && t.length > bestLen && agentLc.contains(t)) bestLen = t.length
      }
    }
    val selected =
      if (bestLen > 0)
        groups.filter { case (uas, _) =>
          uas.exists(t => t != "*" && t.length == bestLen && agentLc.contains(t))
        }
      else groups.filter { case (uas, _) => uas.contains("*") }
    selected.iterator.flatMap(_._2(0)).nextOption()
  }

  def parse(robotsTxt: String, agent: String): RuleSet = {
    val agentLc = agent.toLowerCase
    // (uaTokens, rules) per group; a group = UA lines + following rules
    val groups = new ArrayBuffer[(ArrayBuffer[String], ArrayBuffer[Rule])]()
    var curUas: ArrayBuffer[String] = null
    var curRules: ArrayBuffer[Rule] = null
    var rulesSeen = false // false while still collecting UA lines of a group
    robotsTxt.split("\r?\n", -1).foreach { line0 =>
      val hash = line0.indexOf('#')
      val line = (if (hash >= 0) line0.substring(0, hash) else line0).trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (curUas == null || rulesSeen) {
              curUas = new ArrayBuffer[String]()
              curRules = new ArrayBuffer[Rule]()
              groups += ((curUas, curRules))
              rulesSeen = false
            }
            if (value.nonEmpty) curUas += value.toLowerCase
          case "allow" | "disallow" =>
            if (curRules != null) {
              rulesSeen = true
              if (value.nonEmpty) curRules += Rule(field == "allow", value)
            }
          case _ =>
            // known-other fields (crawl-delay, sitemap) don't end the
            // UA-collection phase, but they belong to the group body
            if (curRules != null) rulesSeen = true
        }
      }
    }
    // best named match: longest UA token that is a substring of agent
    var bestLen = 0
    groups.foreach { case (uas, _) =>
      uas.foreach { t =>
        if (t != "*" && t.length > bestLen && agentLc.contains(t)) bestLen = t.length
      }
    }
    val picked = Vector.newBuilder[Rule]
    if (bestLen > 0) {
      groups.foreach { case (uas, rs) =>
        if (uas.exists(t => t != "*" && t.length == bestLen && agentLc.contains(t)))
          picked ++= rs
      }
    } else {
      groups.foreach { case (uas, rs) => if (uas.contains("*")) picked ++= rs }
    }
    RuleSet(picked.result())
  }
}
