package graft

import graft.kernels.MarkdownKernel
import org.scalacheck.Prop
import org.scalatest.funsuite.AnyFunSuite

/** Markdown conversion contracts on hand-written pages the generated
  * corpus can't produce: nested lists, quotes containing multiple
  * blocks, unclosed structure at EOF, head-noise dropping, totality.
  */
class MarkdownKernelSpec extends AnyFunSuite {

  private val url = "http://site.example/a/b.html"
  private def md(html: String): String = MarkdownKernel.convert(html, url)

  test("headings, paragraphs, inline markers, resolved links") {
    assert(md("<h1>Title</h1><p>Text with <strong>bold</strong> and <em>it</em>.</p>") ===
      "# Title\n\nText with **bold** and *it*.")
    assert(md("""<p>See <a href="x.html">here</a> now</p>""") ===
      "See [here](http://site.example/a/x.html) now")
    assert(md("<h3>  Deep \n header  </h3>") === "### Deep header")
  }

  test("nested lists indent two spaces per level; ordered counters per level") {
    val html =
      """<ul><li>one</li><li>two<ul><li>two-a</li><li>two-b</li></ul></li><li>three</li></ul>"""
    assert(md(html) === "- one\n- two\n  - two-a\n  - two-b\n- three")
    assert(md("<ol><li>a</li><li>b<ol><li>b1</li></ol></li></ol>") ===
      "1. a\n2. b\n  1. b1")
  }

  test("fenced code keeps verbatim text; blockquote prefixes every block") {
    assert(md("<pre><code>x = 1\n  y = 2</code></pre>") === "```\nx = 1\n  y = 2\n```")
    assert(md("<blockquote><p>first</p><p>second</p></blockquote>") ===
      "> first\n>\n> second")
  }

  test("head noise and raw-text containers drop; hr and br behave") {
    assert(md("<title>nope</title><script>var a;</script><p>kept</p>") === "kept")
    assert(md("<textarea>nope</textarea><p>kept</p>") === "kept")
    assert(md("<p>a</p><hr><p>b</p>") === "a\n\n---\n\nb")
    assert(md("<p>line one<br>line two</p>") === "line one line two")
  }

  test("unclosed structure at EOF flushes instead of vanishing") {
    assert(md("<ul><li>only item") === "- only item")
    assert(md("<blockquote><p>trailing quote") === "> trailing quote")
    assert(md("<pre>dangling code") === "```\ndangling code\n```")
    assert(md("<h2>dangling header") === "## dangling header")
  }

  test("entities decode; tables degrade to cell text") {
    assert(md("<p>a &amp; b &lt;c&gt;</p>") === "a & b <c>")
    assert(md("<table><tr><td>c1</td><td>c2</td></tr></table>") === "c1\n\nc2")
  }

  test("unmatched </hN> close flushes pending text as a plain block, not a fabricated H1") {
    // stray heading closes in crawl tag soup must not promote paragraph
    // text to a heading
    assert(md("<p>ordinary paragraph</h2> text</p>") === "ordinary paragraph\n\ntext")
    assert(md("plain text</h1>") === "plain text")
  }

  test("self-closing structural tags cannot wedge open state") {
    assert(md("<p>hello</p><pre/><p>world</p>") === "hello\n\nworld")
    assert(md("<p>a</p><blockquote/><p>b</p>") === "a\n\nb")
    assert(md("<ul/><p>after</p>") === "after")
    assert(md("<h2/>plain text") === "plain text")
  }

  test("property: conversion is total on arbitrary strings") {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll { (s: String) => md(s); true })
    assert(res.passed, res.toString)
  }
}
