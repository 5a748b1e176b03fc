package graft

import graft.kernels.{Dom, HtmlTokenizer, MainTextExtractor}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Adversarial edges for the lexer's allocation-lean paths: tag-name
  * interning (known vs unknown tags), in-place attribute matching
  * (case, quoting, valueless, class+id combination), transient
  * CharSequence text runs (raw-text slices).
  */
class TokenizerEdgeSpec extends AnyFunSuite {

  private final class Rec extends HtmlTokenizer.Sink {
    val events = new ArrayBuffer[(String, String)]
    override def open(name: String, classId: String, selfClosing: Boolean): Unit =
      events += (("open:" + name + (if (selfClosing) "/" else ""), classId))
    override def close(name: String): Unit = events += (("close:" + name, ""))
    override def text(s: CharSequence): Unit = events += (("text", s.toString))
  }

  private def lex(html: String): Seq[(String, String)] = {
    val r = new Rec
    HtmlTokenizer.tokenize(html, r)
    r.events.toSeq
  }

  test("unknown tag names survive interning (fallback String path)") {
    val ev = lex("<myweirdtag123>x</myweirdtag123>")
    assert(ev == Seq(("open:myweirdtag123", ""), ("text", "x"), ("close:myweirdtag123", "")))
  }

  test("uppercase tag and attribute names normalize; CLASS/ID matched in place") {
    val ev = lex("""<DIV CLASS="Nav" ID='top'>t</DIV>""")
    assert(ev.head == (("open:div", "Nav top")))
    assert(ev.last == (("close:div", "")))
  }

  test("non-class attributes are skipped without materializing values") {
    val ev = lex("""<a href="http://x/y?q=1" data-foo=bar class=menu>l</a>""")
    assert(ev.head == (("open:a", "menu")))
  }

  test("valueless and slash-separated attributes do not derail the attr loop") {
    val ev = lex("""<input disabled class="f" readonly/>""")
    assert(ev.head == (("open:input/", "f")))
  }

  test("unterminated quoted attribute value consumes to EOF") {
    val ev = lex("""<div class="unclosed""")
    assert(ev == Seq(("open:div", "unclosed")))
  }

  test("raw-text slice arrives as one text run and close fires") {
    val ev = lex("<script>var a = '<div>not a tag</div>';</script>after")
    assert(ev == Seq(
      ("open:script", ""),
      ("text", "var a = '<div>not a tag</div>';"),
      ("close:script", ""),
      ("text", "after")))
  }

  test("interned names are reference-identical across pages (no per-tag garbage)") {
    val r1 = new Rec; HtmlTokenizer.tokenize("<div><p>a</p></div>", r1)
    val r2 = new Rec; HtmlTokenizer.tokenize("<DIV><P>b</P></DIV>", r2)
    val n1 = r1.events.head._1
    val n2 = r2.events.head._1
    assert(n1 == "open:div" && n2 == "open:div")
    // the names delivered to the sink are the same interned instances
    val d1 = { val r = new Rec2; HtmlTokenizer.tokenize("<div>a</div>", r); r.names.head }
    val d2 = { val r = new Rec2; HtmlTokenizer.tokenize("<DiV>b</dIv>", r); r.names.head }
    assert(d1 eq d2)
  }

  private final class Rec2 extends HtmlTokenizer.Sink {
    val names = new ArrayBuffer[String]
    override def open(name: String, classId: String, selfClosing: Boolean): Unit = names += name
    override def close(name: String): Unit = names += name
    override def text(s: CharSequence): Unit = ()
  }

  test("StreamParser implied end tags match the materialized DOM traversal") {
    // unclosed <p> implied-closed by <div>; <li> by next <li>
    val html = "<ul><li>one<li>two</ul><p>para<div>after</div>"
    val dom = Dom.parse(html)
    // count elements: ul, li, li, p, div
    val elems = (0 until dom.size).filter(i => dom.kind(i) == Dom.Elem).map(dom.name(_))
    assert(elems == Seq("ul", "li", "li", "p", "div"))
    // second li's parent is ul (not the first li)
    val liIdx = (0 until dom.size).filter(i => dom.kind(i) == Dom.Elem && dom.name(i) == "li")
    assert(dom.parent(liIdx(1)) == dom.parent(liIdx(0)))
    // div's parent is root (-1), not p
    val divIdx = (0 until dom.size).find(i => dom.kind(i) == Dom.Elem && dom.name(i) == "div").get
    assert(dom.parent(divIdx) == -1)
  }

  test("nbsp entity, numeric U+00A0, and raw U+00A0 all normalize to one space") {
    // regression: the segmenter's whitespace set must include U+00A0 and
    // &nbsp; must decode to U+00A0 (not ASCII space) so all three spellings
    // extract byte-identically
    val tail = "words " * 12
    val a = MainTextExtractor.extract(s"<p>price:&nbsp;100 $tail</p>").text
    val b = MainTextExtractor.extract(s"<p>price:&#160;100 $tail</p>").text
    val c = MainTextExtractor.extract(s"<p>price: 100 $tail</p>").text
    val d = MainTextExtractor.extract(s"<p>price: 100 $tail</p>").text
    assert(a == d && b == d && c == d)
    assert(d.startsWith("price: 100"))
  }

  test("class+id combine in document order for hint classification") {
    val ex = MainTextExtractor.extract(
      "<div id=\"x\" class=\"sidebar\"><p>" + ("drop " * 20) + "</p></div>" +
        "<p>" + ("keep " * 20) + "</p>")
    assert(!ex.text.contains("drop"))
    assert(ex.text.contains("keep"))
  }
}
