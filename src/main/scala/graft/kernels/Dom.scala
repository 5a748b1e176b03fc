package graft.kernels

import java.util.regex.Pattern

/** Lightweight immutable array-backed DOM (SURVEY.md §7.1 "DOM builder").
  *
  * Nodes are stored in document order with parent pointers; traversal
  * reconstructs the ancestor stack linearly, so no per-node child lists are
  * allocated (allocation matters at 10^12 pages). Tag-name strings are the
  * tokenizer's lowercase names; `hint` carries the class/id boilerplate
  * signal (readability-style "unlikely candidates" heuristic).
  */
final class Dom(
    val size: Int,
    val kind: Array[Byte], // 0 = element, 1 = text
    val name: Array[String], // element name, null for text
    val hint: Array[Byte], // 0 none, 1 positive, 2 negative
    val parent: Array[Int], // -1 for roots
    val text: Array[String]) // text content, null for elements

object Dom {
  final val Elem: Byte = 0
  final val Text: Byte = 1
  final val HintNone: Byte = 0
  final val HintPos: Byte = 1
  final val HintNeg: Byte = 2

  // readability.js-style class/id vocabularies (public algorithm), tuned
  // down to the boilerplate families our corpus exercises. (?i) instead of
  // a lowercased copy: hint checks run once per element at 10^12 pages,
  // and the String copy + fresh Matcher per call dominate the cost.
  private val Neg = Pattern.compile(
    "(?i)nav|menu|footer|banner|cookie|consent|sidebar|share|social|comment|" +
      "breadcrumb|related|widget|promo|advert|\\bad\\b|\\bads\\b|sponsor|" +
      "masthead|pagination|pager|popup|modal|subscribe|newsletter|skip|" +
      "disclaimer|legal|copyright")
  private val Pos = Pattern.compile(
    "(?i)\\barticle\\b|\\bcontent\\b|\\bmain\\b|\\bpost\\b|\\bentry\\b|" +
      "\\bstory\\b|\\bbody-?text\\b|\\btext-?body\\b|\\bpage-?body\\b")

  def hintOf(classId: String): Byte = {
    if (classId == null || classId.isEmpty) return HintNone
    if (Neg.matcher(classId).find()) HintNeg
    else if (Pos.matcher(classId).find()) HintPos
    else HintNone
  }

  /** Elements whose open implies closing an open `p` (HTML5 tolerance). */
  private val ClosesP: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "blockquote", "pre", "section", "article", "aside", "nav",
    "header", "footer", "main", "form", "hr", "figure", "dl")

  /** Streaming DOM builder: implements the tokenizer sink. Node columns
    * are growable PRIMITIVE arrays — a generic ArrayBuffer[Byte/Int]
    * boxes every element, and at 10^12 pages the per-node boxes dominate
    * young-gen churn.
    */
  final class Builder extends HtmlTokenizer.Sink {
    private var n = 0
    private var kinds = new Array[Byte](64)
    private var names = new Array[String](64)
    private var hints = new Array[Byte](64)
    private var parents = new Array[Int](64)
    private var texts = new Array[String](64)
    // open-element stack: node indices
    private var stack = new Array[Int](32)
    private var stackNames = new Array[String](32)
    private var sp = 0
    // reusable matchers: one Matcher per element-with-class otherwise
    private val negM = Neg.matcher("")
    private val posM = Pos.matcher("")

    private def hintFast(classId: String): Byte =
      if (classId == null || classId.isEmpty) HintNone
      else if (negM.reset(classId).find()) HintNeg
      else if (posM.reset(classId).find()) HintPos
      else HintNone

    private def top: String = if (sp == 0) null else stackNames(sp - 1)
    private def push(idx: Int, nm: String): Unit = {
      if (sp == stack.length) {
        stack = java.util.Arrays.copyOf(stack, sp * 2)
        stackNames = java.util.Arrays.copyOf(stackNames, sp * 2)
      }
      stack(sp) = idx; stackNames(sp) = nm; sp += 1
    }

    private def grow(): Unit = {
      val cap = n * 2
      kinds = java.util.Arrays.copyOf(kinds, cap)
      names = java.util.Arrays.copyOf(names, cap)
      hints = java.util.Arrays.copyOf(hints, cap)
      parents = java.util.Arrays.copyOf(parents, cap)
      texts = java.util.Arrays.copyOf(texts, cap)
    }

    private def addNode(k: Byte, nm: String, h: Byte, t: String): Int = {
      if (n == kinds.length) grow()
      val idx = n
      kinds(idx) = k; names(idx) = nm; hints(idx) = h
      parents(idx) = if (sp == 0) -1 else stack(sp - 1)
      texts(idx) = t
      n += 1
      idx
    }

    override def open(name: String, classId: String, selfClosing: Boolean): Unit = {
      // implied end tags (tolerant parsing)
      if (sp > 0) {
        val t = top
        if (t == "p" && ClosesP.contains(name)) sp -= 1
        else if (t == "li" && name == "li") sp -= 1
        else if ((t == "td" || t == "th") && (name == "td" || name == "th" || name == "tr")) sp -= 1
        else if (t == "tr" && name == "tr") sp -= 1
        else if (t == "option" && name == "option") sp -= 1
        else if (t == "dd" && (name == "dd" || name == "dt")) sp -= 1
        else if (t == "dt" && (name == "dd" || name == "dt")) sp -= 1
      }
      val idx = addNode(Elem, name, hintFast(classId), null)
      if (!selfClosing) push(idx, name)
    }

    override def close(name: String): Unit = {
      // find matching open element; ignore unmatched close tags
      var i = sp - 1
      while (i >= 0 && stackNames(i) != name) i -= 1
      if (i >= 0) sp = i
    }

    override def text(s: String): Unit = {
      if (s.nonEmpty) { addNode(Text, null, HintNone, s); () }
    }

    def result(): Dom =
      new Dom(n, kinds, names, hints, parents, texts)
  }

  def parse(html: String): Dom = {
    val b = new Builder
    HtmlTokenizer.tokenize(html, b)
    b.result()
  }
}
