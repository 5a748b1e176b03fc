package graft.kernels

/** Structure-preserving HTML → Markdown conversion — the alternative
  * output mode to [[MainTextExtractor]]'s plain text: LLM corpus
  * pipelines keep headings/lists/links/code as lightweight markup
  * because models learn document structure from it. Same single-pass
  * [[HtmlTokenizer]] (attrs mode for hrefs), streaming sink, no DOM.
  *
  * Mapping (CommonMark-compatible output):
  *   h1..h6 → `#`×n; p → paragraph; ul/ol li → `- ` / `N. ` (nested
  *   lists indent 2 spaces per level); a → `[text](resolved-url)`;
  *   b/strong → `**`; i/em → `*`; code → backticks; pre → fenced block
  *   (verbatim text, no collapse); blockquote → `> ` per line; br →
  *   hard break; hr → `---`; script/style/head noise dropped; images,
  *   tables and other structure degrade to their text content (tables
  *   have their own structured extractor, [[TableKernel]]).
  *
  * Whitespace: inline text collapses per block (entity-decoded by the
  * lexer); blocks join with one blank line. Inline markers emit as the
  * source nests them — pathological nesting degrades to visible
  * markers, never dropped text (fidelity over prettiness).
  */
object MarkdownKernel {

  private val Blocks: Set[String] = Set(
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "div", "section", "article",
    "main", "header", "footer", "aside", "figure", "figcaption", "td", "th")

  private final class Sink(pageUrl: String) extends HtmlTokenizer.Sink {
    private val blocks = new scala.collection.mutable.ArrayBuffer[String](16)
    private val inline = new java.lang.StringBuilder(256)
    private var heading = 0 // 1..6 while inside hN
    private var skip = 0 // script/style/head depth
    private var preDepth = 0
    private val preBuf = new java.lang.StringBuilder(0)
    // list state: type ('u'/'o') and per-level counter
    private val listStack = new scala.collection.mutable.ArrayBuffer[(Char, Array[Int])](4)
    private val listLines = new scala.collection.mutable.ArrayBuffer[String](8)
    private var quoteDepth = 0
    private val quoteBlocks = new scala.collection.mutable.ArrayBuffer[String](4)
    private var pendingHref: String = null

    private def collapse(s: String): String = HtmlTokenizer.collapseWs(s)

    private def emitBlock(s: String): Unit =
      if (s.nonEmpty) {
        if (quoteDepth > 0) quoteBlocks += s
        else blocks += s
      }

    private def flushInline(prefix: String): Unit = {
      val t = collapse(inline.toString)
      inline.setLength(0)
      if (t.nonEmpty) emitBlock(prefix + t)
    }

    private def flushListItem(): Unit = {
      val t = collapse(inline.toString)
      inline.setLength(0)
      if (t.nonEmpty && listStack.nonEmpty) {
        val (kind, counter) = listStack(listStack.size - 1)
        val indent = "  " * (listStack.size - 1)
        val marker =
          if (kind == 'o') { counter(0) += 1; s"${counter(0)}. " } else "- "
        listLines += indent + marker + t
      }
    }

    override def open(name: String, classId: String, selfClosing: Boolean): Unit = {
      if (skip > 0) { if (!selfClosing) name match {
        case "script" | "style" | "noscript" | "template" | "title" |
             "textarea" | "xmp" | "noframes" => skip += 1
        case _ => () }
        return
      }
      name match {
        case "script" | "style" | "noscript" | "template" | "title" |
             "textarea" | "xmp" | "noframes" =>
          if (!selfClosing) skip += 1
        // self-closing structural tags get no close event — opening
        // their state would corrupt the rest of the document
        case "pre" if !selfClosing => flushInline(""); preDepth += 1
        case _ if preDepth > 0 => () // structure inside pre stays verbatim text
        case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" if !selfClosing =>
          flushInline(""); heading = name.charAt(1) - '0'
        // inside a list item, pending text becomes the item line BEFORE
        // a nested list opens (or the next un-closed <li> starts)
        case "ul" if !selfClosing =>
          if (listStack.nonEmpty) flushListItem() else flushInline("")
          listStack += (('u', Array(0)))
        case "ol" if !selfClosing =>
          if (listStack.nonEmpty) flushListItem() else flushInline("")
          listStack += (('o', Array(0)))
        case "li" =>
          if (listStack.nonEmpty) flushListItem() else flushInline("")
        case "blockquote" if !selfClosing => flushInline(""); quoteDepth += 1
        case "b" | "strong" => inline.append("**")
        case "i" | "em" => inline.append("*")
        case "code" => inline.append('`')
        case "br" => inline.append('\n') // collapse keeps it as a space
        case "hr" => flushInline(""); emitBlock("---")
        case n if Blocks.contains(n) => flushInline("")
        case _ => ()
      }
    }

    override def close(name: String): Unit = {
      if (skip > 0) { name match {
        case "script" | "style" | "noscript" | "template" | "title" |
             "textarea" | "xmp" | "noframes" => skip -= 1
        case _ => () }
        return
      }
      name match {
        case "pre" =>
          if (preDepth > 0) {
            preDepth -= 1
            if (preDepth == 0) {
              val code = preBuf.toString
              preBuf.setLength(0)
              val trimmed = code.replaceAll("\\A\\n+", "").replaceAll("\\s+\\z", "")
              if (trimmed.nonEmpty) emitBlock("```\n" + trimmed + "\n```")
            }
          }
        case _ if preDepth > 0 => ()
        case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
          // an unmatched </hN> (heading == 0) in crawl tag soup must not
          // promote pending paragraph text to a fabricated H1 — flush it
          // as a plain block instead
          val prefix = if (heading >= 1) "#" * heading + " " else ""
          flushInline(prefix); heading = 0
        case "li" => flushListItem()
        case "ul" | "ol" =>
          flushListItem() // unclosed trailing <li>
          if (listStack.nonEmpty) listStack.remove(listStack.size - 1)
          if (listStack.isEmpty && listLines.nonEmpty) {
            emitBlock(listLines.mkString("\n")); listLines.clear()
          }
        case "blockquote" =>
          flushInline("")
          if (quoteDepth > 0) {
            quoteDepth -= 1
            if (quoteDepth == 0 && quoteBlocks.nonEmpty) {
              val inner = quoteBlocks.mkString("\n\n")
              quoteBlocks.clear()
              blocks += inner.split("\n", -1).map(l =>
                if (l.isEmpty) ">" else "> " + l).mkString("\n")
            }
          }
        case "b" | "strong" => inline.append("**")
        case "i" | "em" => inline.append("*")
        case "code" => inline.append('`')
        case "a" =>
          if (pendingHref != null) {
            inline.append("](").append(pendingHref).append(')')
            pendingHref = null
          }
        case n if Blocks.contains(n) => flushInline("")
        case _ => ()
      }
    }

    override def text(s: CharSequence): Unit =
      if (skip > 0) ()
      else if (preDepth > 0) preBuf.append(s)
      else inline.append(s)

    override def link(href: String, rel: String): Unit =
      if (skip == 0 && preDepth == 0) {
        val resolved = LinkKernel.resolve(pageUrl, href).getOrElse(href)
        inline.append('[')
        pendingHref = resolved
      }

    /** EOF flush: unclosed structure emits like closed structure —
      * truncated crawl pages must not silently lose their tail.
      */
    def result(): String = {
      if (preDepth > 0) {
        preDepth = 0
        val trimmed = preBuf.toString.replaceAll("\\A\\n+", "").replaceAll("\\s+\\z", "")
        preBuf.setLength(0)
        if (trimmed.nonEmpty) emitBlock("```\n" + trimmed + "\n```")
      }
      if (listStack.nonEmpty) { flushListItem(); listStack.clear() }
      if (heading > 0) { flushInline("#" * heading + " "); heading = 0 }
      else flushInline("")
      if (listLines.nonEmpty) { blocks += listLines.mkString("\n"); listLines.clear() }
      if (quoteBlocks.nonEmpty) {
        blocks += quoteBlocks.mkString("\n\n").split("\n", -1)
          .map(l => if (l.isEmpty) ">" else "> " + l).mkString("\n")
        quoteBlocks.clear()
      }
      blocks.mkString("\n\n")
    }
  }

  def convert(html: String, pageUrl: String): String = {
    val sink = new Sink(pageUrl)
    HtmlTokenizer.tokenize(html, sink, attrs = true)
    sink.result()
  }
}
