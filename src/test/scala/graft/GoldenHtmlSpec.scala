package graft

import graft.kernels.MainTextExtractor
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** External golden corpus: hand-written realistic pages (blog, news
  * article, docs page, Arabic/RTL news, legacy table layout) with FROZEN
  * expected text — pages the repo's own generator (PagesGen) did NOT
  * shape, so the north-rule kernel is graded against layouts it never
  * co-evolved with. Any kernel change that alters extraction on these
  * fails here; if the change is an intentional improvement, re-freeze
  * the .expected.txt after reviewing the diff by hand.
  *
  * Review notes baked into the frozen outputs: headlines kept (including
  * across a byline block), nav/aside/footer/related-link chrome and
  * link-dense table cells dropped, entities decoded (mdash, ndash, euro,
  * curly quotes), Arabic text byte-identical, pre/code blocks kept.
  */
class GoldenHtmlSpec extends AnyFunSuite {

  private val dir: Path = Paths.get("src/test/resources/goldens")

  private val cases: Seq[Path] = Files.list(dir).iterator().asScala
    .filter(_.toString.endsWith(".html")).toSeq.sortBy(_.toString)

  test("golden corpus present") {
    assert(cases.size >= 5, s"expected >=5 golden pages, found ${cases.size}")
  }

  cases.foreach { p =>
    val name = p.getFileName.toString
    test(s"golden: $name extracts frozen text byte-identically") {
      val html = new String(Files.readAllBytes(p), UTF_8)
      val expected = new String(Files.readAllBytes(
        p.resolveSibling(name.stripSuffix(".html") + ".expected.txt")), UTF_8)
      val got = MainTextExtractor.extract(html).text
      assert(got === expected)
    }
  }

  test("golden: legacy_win1252.html.bin (raw cp1252 BYTES) decodes + extracts frozen text") {
    // the one golden stored as raw bytes: a 2003-era French table-layout
    // page encoded windows-1252 and declared via http-equiv — it must go
    // through the charset sniff (HtmlCharset), not a UTF-8 assumption,
    // to recover œ/€/—/’ byte-identically
    val bytes = Files.readAllBytes(dir.resolve("legacy_win1252.html.bin"))
    val expected = new String(
      Files.readAllBytes(dir.resolve("legacy_win1252.expected.txt")), UTF_8)
    val got = MainTextExtractor.extract(graft.kernels.HtmlCharset.decode(bytes)).text
    assert(got === expected)
    assert(got.contains("œufs") && got.contains("€") && got.contains("—"))
  }

  test("golden sanity: chrome strings never leak into extractions") {
    // spot phrases that exist ONLY in boilerplate regions of the fixtures
    val leaked = Seq("Popular posts", "Related coverage", "Archive",
      "Printed from", "Docs home", "Copyright notice", "الرئيسية",
      "Hot this week", "Forum rules", "works best with JavaScript",
      "do not render", "not content", "Rate this recipe", "More like this")
    cases.foreach { p =>
      val text = MainTextExtractor.extract(
        new String(Files.readAllBytes(p), UTF_8)).text
      leaked.foreach(s => assert(!text.contains(s), s"'$s' leaked in $p"))
    }
  }

  // Markdown mode is structure-preserving BY DESIGN (it keeps nav/footer
  // — boilerplate stripping is MainTextExtractor's job), so its goldens
  // freeze the full structural rendering: heading levels, list markers,
  // resolved link targets, fenced code, inline bold/italic.
  Seq("blog_post", "docs_page").foreach { name =>
    test(s"golden markdown: $name converts to frozen markdown byte-identically") {
      val html = new String(Files.readAllBytes(dir.resolve(s"$name.html")), UTF_8)
      val expected = new String(
        Files.readAllBytes(dir.resolve(s"$name.expected.md")), UTF_8)
      val md = graft.kernels.MarkdownKernel.convert(
        html, s"http://golden.example/$name.html")
      assert(md === expected, s"markdown drift on $name — review and re-freeze if intended")
    }
  }
}
