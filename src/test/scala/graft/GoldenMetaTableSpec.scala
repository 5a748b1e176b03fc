package graft

import graft.kernels.{MetaKernel, TableKernel}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Frozen head-metadata and table harvest from a hand-written realistic
  * review page (goldens/product_compare.html — NOT generator-shaped):
  * title across source lines with &mdash;/&amp;, OpenGraph via
  * property=, root-relative canonical plus decoy alternate/stylesheet
  * links, and a specs table full of legal tag soup (omitted </td> and
  * </tr>, &nbsp; in cells, a nested badge table inside a data cell).
  */
class GoldenMetaTableSpec extends AnyFunSuite {

  private val html = new String(Files.readAllBytes(
    Paths.get("src/test/resources/goldens/product_compare.html")), UTF_8)
  private val pageUrl =
    "https://techweigh.example/reviews/laptop-showdown-2024?ref=rss"
  private val emDash = new String(Character.toChars(0x2014))

  test("golden: product_compare head metadata frozen") {
    val m = MetaKernel.extract(html, pageUrl)
    assert(m.title === s"Laptop Showdown 2024 $emDash Budget & Pro Picks | TechWeigh")
    assert(m.description === "We benchmarked 3 laptops & ranked them by value.")
    assert(m.ogTitle === s"Laptop Showdown 2024 $emDash Budget & Pro Picks")
    assert(m.canonical === "https://techweigh.example/reviews/laptop-showdown-2024")
  }

  test("golden: product_compare specs table frozen (tag soup + nested badge)") {
    val cells = TableKernel.extract(html)
    val grid = cells.map(c => (c.row, c.col, c.text, c.header))
    assert(grid === Vector(
      (0, 0, "Model", true), (0, 1, "Price", true), (0, 2, "Battery (hrs)", true),
      (1, 0, "Aero 14", false), (1, 1, "$999", false), (1, 2, "11.5", false),
      (2, 0, "ProBook X", false), (2, 1, "$1,499", false), (2, 2, "9", false),
      (3, 0, "Budget&Go", false), (3, 1, "$549", false), (3, 2, "13", false)))
    // the nested badge table's text must appear in NO harvested cell
    assert(!cells.exists(_.text.contains("Editor's choice")))
  }
}
