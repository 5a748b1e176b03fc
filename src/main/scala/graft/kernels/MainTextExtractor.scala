package graft.kernels

import graft.model.Span
import scala.collection.mutable.ArrayBuffer

/** Boilerplate-strip main-content extraction
  * (SURVEY.md §7.1: block segmentation → tag/link-density + text-block
  * scoring → readability-style prune → main text + spans).
  *
  * Algorithm (public boilerpipe/readability family, re-derived):
  *  1. The tokenizer's tolerant-parsed event stream ([[Dom.StreamParser]])
  *     segments text into blocks at block-level element boundaries,
  *     tracking per-block char count, link-char count (chars under an
  *     `<a>` ancestor), tag kind, and class/id hints. Content under
  *     drop-tags (script/style/nav/footer/...) or negative-hint ancestors
  *     never reaches a block. Streaming — no DOM is materialized on this
  *     path (one less array copy + walk per page at 10^12 pages).
  *  2. Blocks classify as content by word-count/link-density rules, with
  *     positive-hint override and a neighbor-expansion pass (short blocks
  *     adjacent to content are kept); headings attach to following content.
  *  3. Kept blocks join with '\n'; each contributes a Span(begin,end,kind).
  *
  * Determinism: pure function of the input string; no locale-dependent ops
  * (byte-identity invariant, BASELINE.json input_hint).
  */
object MainTextExtractor {

  final case class Extracted(text: String, spans: Array[Span])

  /** Subtrees that never contribute content (hard drop). */
  private val DropTags: Set[String] = Set(
    "script", "style", "noscript", "iframe", "svg", "canvas", "object",
    "embed", "form", "button", "select", "option", "textarea", "template",
    "head", "title", "meta", "link", "nav", "header", "footer", "aside",
    "figcaption", "label", "datalist", "audio", "video", "map")

  /** Elements that delimit text blocks. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "pre", "blockquote", "article", "section", "main", "table", "tr",
    "ul", "ol", "dl", "dt", "dd", "figure", "center", "summary",
    "details", "body", "html", "caption", "hr")

  private def kindOf(tag: String): String = tag match {
    case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" => "heading"
    case "li" | "dt" | "dd"                      => "li"
    case "td" | "th" | "caption"                 => "cell"
    case "pre" | "blockquote"                    => "pre"
    case "p"                                     => "p"
    case _                                       => "text"
  }

  private final class Block(val tag: String, val pos: Boolean) {
    val sb = new java.lang.StringBuilder(64)
    var linkChars = 0
    var words = 0
    def chars: Int = sb.length
    def linkDensity: Double = if (chars == 0) 0.0 else linkChars.toDouble / chars
  }

  /** Extract main text from an HTML string. */
  def extract(html: String): Extracted = {
    val seg = new Segmenter
    val parser = new Dom.StreamParser(seg)
    HtmlTokenizer.tokenize(html, parser)
    parser.finish()
    val blocks = seg.result()
    val keep = classify(blocks)
    assemble(blocks, keep)
  }

  // ---------------------------------------------------------------- segment

  /** Streaming block segmenter over the parsed element event stream. */
  private final class Segmenter extends Dom.NodeSink {
    private val blocks = new ArrayBuffer[Block](16)
    private var dropDepth = 0
    private var linkDepth = 0
    private var posDepth = 0
    // block-tag stack as a growable array (a List would cons per block tag)
    private var blockTags = new Array[String](32)
    private var btSp = 0
    private var cur: Block = null
    private var pendingSpace = false

    private var brRun = 0

    private def flush(): Unit = {
      brRun = 0
      if (cur != null && cur.chars > 0) blocks += cur
      cur = null
      pendingSpace = false
    }

    override def enter(nm: String, hint: Byte): Unit = {
      if (hint == Dom.HintNeg || DropTags.contains(nm)) dropDepth += 1
      if (hint == Dom.HintPos) posDepth += 1
      if (nm == "a") linkDepth += 1
      if (nm == "br") {
        // one <br> is a soft break (space); two-plus consecutive <br>
        // with no text between is the classic paragraph separator in
        // crawl-era markup — split the block exactly like a real
        // boilerplate-strip engine does
        pendingSpace = true
        brRun += 1
        if (brRun >= 2) flush()
      }
      if (BlockTags.contains(nm)) {
        flush()
        if (btSp == blockTags.length) blockTags = java.util.Arrays.copyOf(blockTags, btSp * 2)
        blockTags(btSp) = nm; btSp += 1
      }
    }

    override def exit(nm: String, hint: Byte): Unit = {
      if (hint == Dom.HintNeg || DropTags.contains(nm)) dropDepth -= 1
      if (hint == Dom.HintPos) posDepth -= 1
      if (nm == "a") linkDepth -= 1
      if (BlockTags.contains(nm)) {
        flush()
        if (btSp > 0) btSp -= 1
      }
    }

    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == '\f' || c == ' '

    override def text(s: CharSequence): Unit = {
      if (dropDepth != 0) return
      // whitespace-normalized append into the current block; non-ws runs
      // are appended in bulk (StringBuilder sources hit the array-copy
      // fast path) instead of char-at-a-time
      var k = 0
      val len = s.length
      while (k < len) {
        if (isWs(s.charAt(k))) {
          pendingSpace = true
          k += 1
        } else {
          var e = k + 1
          while (e < len && !isWs(s.charAt(e))) e += 1
          if (cur == null) {
            val tag = if (btSp > 0) blockTags(btSp - 1) else "text"
            cur = new Block(tag, posDepth > 0)
            pendingSpace = false
            cur.words = 1
          } else if (pendingSpace) {
            cur.sb.append(' ')
            if (linkDepth > 0) cur.linkChars += 1
            cur.words += 1
            pendingSpace = false
          }
          brRun = 0
          cur.sb.append(s, k, e)
          if (linkDepth > 0) cur.linkChars += e - k
          k = e
        }
      }
    }

    def result(): ArrayBuffer[Block] = { flush(); blocks }
  }

  // --------------------------------------------------------------- classify

  private def classify(blocks: ArrayBuffer[Block]): Array[Boolean] = {
    val n = blocks.length
    val keep = new Array[Boolean](n)
    // pass 1: base rules (word count vs link density; positive hint wins)
    var i = 0
    while (i < n) {
      val b = blocks(i)
      keep(i) =
        if (b.pos) b.chars > 0
        else if (b.linkDensity > 0.4) false
        else b.words >= 10
      i += 1
    }
    // pass 2: neighbor expansion (short low-link blocks next to content)
    var changed = true
    var rounds = 0
    while (changed && rounds < 2) {
      changed = false
      i = 0
      while (i < n) {
        if (!keep(i)) {
          val b = blocks(i)
          if (b.words >= 3 && b.linkDensity <= 0.2 && b.tag != "div" &&
            ((i > 0 && keep(i - 1)) || (i + 1 < n && keep(i + 1)))) {
            keep(i) = true; changed = true
          }
        }
        i += 1
      }
      rounds += 1
    }
    // pass 2.5: link-free list runs (ingredients, steps, spec sheets).
    // Chrome lists are link-dense, so a run of >=3 consecutive 'li'
    // blocks with ZERO link chars, each >=2 words and >=10 words in
    // total, sitting next to kept content (allowing one heading between
    // — "Ingredients" routinely separates the list from the prose) is
    // content even though every item fails the per-block word gate.
    def keptAcrossHeading(p: Int, dir: Int): Boolean = {
      var j = p
      var hops = 0
      while (j >= 0 && j < n && !keep(j) && hops < 1 &&
        kindOf(blocks(j).tag) == "heading") { hops += 1; j += dir }
      j >= 0 && j < n && keep(j)
    }
    i = 0
    while (i < n) {
      if (kindOf(blocks(i).tag) == "li" && !keep(i)) {
        var j = i
        var totalWords = 0
        var linkFree = true
        while (j < n && kindOf(blocks(j).tag) == "li" && !keep(j)) {
          val b = blocks(j)
          if (b.linkChars > 0 || b.words < 2) linkFree = false
          totalWords += b.words
          j += 1
        }
        if (linkFree && j - i >= 3 && totalWords >= 10 &&
          (keptAcrossHeading(i - 1, -1) || keptAcrossHeading(j, 1))) {
          var k = i
          while (k < j) { keep(k) = true; k += 1 }
        }
        i = j
      } else i += 1
    }
    // pass 3: headings attach to following content. The scan may hop over
    // up to two short low-link metadata blocks (a byline, a dateline) —
    // real article headlines are routinely separated from the body by
    // exactly such a block — but stops at anything link-dense (a link
    // list means we're in chrome, not prose) or long-but-rejected.
    i = 0
    while (i < n) {
      val b = blocks(i)
      if (!keep(i) && kindOf(b.tag) == "heading" && b.linkChars == 0 && b.words >= 1) {
        var j = i + 1
        var hops = 0
        while (j < n && !keep(j) && hops < 2 &&
          (blocks(j).chars == 0 ||
            (blocks(j).words < 10 && blocks(j).linkDensity <= 0.4))) {
          if (blocks(j).chars > 0) hops += 1
          j += 1
        }
        if (j < n && keep(j)) keep(i) = true
      }
      i += 1
    }
    keep
  }

  // --------------------------------------------------------------- assemble

  private def assemble(blocks: ArrayBuffer[Block], keep: Array[Boolean]): Extracted = {
    val out = new java.lang.StringBuilder(256)
    val spans = new ArrayBuffer[Span](16)
    var i = 0
    while (i < blocks.length) {
      if (keep(i)) {
        if (out.length > 0) out.append('\n')
        val begin = out.length
        out.append(blocks(i).sb)
        spans += Span(begin, out.length, kindOf(blocks(i).tag))
      }
      i += 1
    }
    Extracted(out.toString, spans.toArray)
  }
}
