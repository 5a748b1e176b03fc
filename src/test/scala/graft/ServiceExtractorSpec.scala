package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.kernels.{ScalarKernels, ServiceExtractor}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden tests for the service-extraction ladder against the REFERENCE'S
  * OWN committed fixtures: the port must reproduce test_services.json
  * byte-for-value from the same markdown input the reference's
  * test_extraction.py consumed (outputs/w_f_abbasia_page_1.md family).
  * Jackson (on the Spark classpath) does the JSON comparison.
  */
class ServiceExtractorSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val RefDir = "/root/reference"

  private def toJava(v: Any): Any = v match {
    case m: scala.collection.Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => jm.put(k.toString, toJava(x)) }
      jm
    case s: Seq[_] => s.map(toJava).asJava
    case other => other
  }

  private def servicesJson(services: List[ServiceExtractor.Service]) =
    mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
      java.util.Map.of("services", services.map(toJava).asJava))

  test("golden: extractServices reproduces the reference's test_services.json") {
    val goldenPath = Paths.get(s"$RefDir/test_services.json")
    assume(Files.exists(goldenPath), "reference fixtures not present")
    val golden = mapper.readTree(Files.readAllBytes(goldenPath))
    // the input the reference's test_extraction.py ran on — the
    // w_f_abbasia_page_1.md fixture family; every copy must parse to the
    // same golden (they carry the same service block)
    val candidates = Seq(
      s"$RefDir/outputs/2025-03-20/w_f_abbasia_page_1.md",
      s"$RefDir/outputs/2025-03-15/w_f_abbasia_page_1.md")
      .filter(p => Files.exists(Paths.get(p)))
    assume(candidates.nonEmpty, "no fixture md present")
    candidates.foreach { p =>
      val lines = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
        .split("\n", -1).toIndexedSeq
      val got = servicesJson(ServiceExtractor.extractServices(lines))
      assert(got == golden, s"mismatch for $p:\n$got\nvs golden:\n$golden")
    }
  }

  test("cleanLine parses python-repr list lines without eval") {
    assert(ServiceExtractor.cleanLine("['UCAF', '2.0']") === "UCAF 2.0")
    assert(ServiceExtractor.cleanLine("['(90911-00-00)', 'Duplex', 'ultrasound', 'of']") ===
      "(90911-00-00) Duplex ultrasound of")
    assert(ServiceExtractor.cleanLine("['it\\'s', 'ok']") === "it's ok")
    assert(ServiceExtractor.cleanLine("plain text ") === "plain text")
    assert(ServiceExtractor.cleanLine("") === "")
    // malformed bracket line falls back to manual cleanup (the unpaired
    // quote survives, commas become spaces — python-verified behavior)
    assert(ServiceExtractor.cleanLine("['a', 'b]") === "a  'b")
  }

  test("vertical parser: headers-then-cells layout") {
    val lines = IndexedSeq(
      "['(Code)', 'Service']", "['Type']", "['Req.Qty']", "['Req.Cost']",
      "['Gross', 'Amount']", "['App.Qty']", "['App.Cost']", "['App.Gross']",
      "['Note']",
      "['(123-00-01)', 'CT', 'scan']", "['Imaging']", "['1']", "['345.5']",
      "['600']", "['1']", "['345.5']", "['345.5']", "['urgent']")
    val rows = ServiceExtractor.extractSimpleServices(lines)
    assert(rows.length === 1)
    val r = rows.head
    assert(r("code") === "123-00-01")
    assert(r("description") === "ct scan") // clean_token lowercases cells
    assert(r("type") === "imaging")
    assert(r("reqQty") === java.lang.Double.valueOf(1.0))
    assert(r("note") === "urgent")
    // incomplete final row is dropped
    val rows2 = ServiceExtractor.extractSimpleServices(lines ++ IndexedSeq("['(9-0-1)', 'x']"))
    assert(rows2.length === 1)
  }

  test("legacy parser: sectioned layout with additional codes + numerics") {
    val lines = IndexedSeq(
      "(90911-00-00) Duplex ultrasound", "(14013) Scrotum Doppler",
      "Imaging", "1", "345", "600", "Approved")
    val rows = ServiceExtractor.extractServiceFormat(lines)
    assert(rows.length === 1)
    val r = rows.head
    assert(r("code") === "90911-00-00")
    assert(r("additionalCodes") === List("14013"))
    assert(r("type") === "Imaging")
    assert(r("reqQty") === java.lang.Double.valueOf(1.0))
    assert(r("reqCost") === java.lang.Double.valueOf(345.0))
    assert(r("grossAmount") === java.lang.Double.valueOf(600.0))
    assert(r("status") === "Approved")
    assert(r("description") === "Duplex ultrasound Scrotum Doppler")
  }

  test("section windowing: start at header or code, stop at end markers") {
    val lines = IndexedSeq("a", "b", "(Code) Service", "x", "y",
      "I hereby certify", "z")
    val w = ServiceExtractor.findServiceTableSection(lines)
    assert(w === IndexedSeq("a", "b", "(Code) Service", "x", "y"))
    // no table → whole doc
    assert(ServiceExtractor.findServiceTableSection(IndexedSeq("p", "q")) ===
      IndexedSeq("p", "q"))
  }

  test("scored classifier: format2 indicators beat format1, middle-window fallback") {
    val f2Lines = IndexedSeq("Code", "Non Standard Code", "Description/Service",
      "Type", "Total Quantity", "Cost", "Approved Quantity", "Approved Cost",
      "Status", "83600", "CON0002", "Consult", "Services", "1", "100", "1",
      "100", "partial")
    val (win, fmt) = ServiceExtractor.findServiceTableSectionScored(f2Lines)
    assert(fmt === "format2")
    assert(win.nonEmpty)
    // 11 lines with no indicators → middle window, format1 default
    val blank = IndexedSeq.tabulate(11)(i => s"x$i")
    val (w2, f2) = ServiceExtractor.findServiceTableSectionScored(blank)
    assert(f2 === "format1" && w2.nonEmpty)
  }

  test("format2 parser: positional assignment matches the reference exactly (python-verified)") {
    // Ground truth obtained by running the reference's
    // extract_service_format2 on this exact input. Faithful quirks:
    // headers stop at Type (only code/description/type lines collect, so
    // header_found stays False and parsing starts at line 0); the ordered
    // header_mapping checks 'code' FIRST, so the "Non Standard Code"
    // header maps to 'code' and overwrites the real code — the
    // nonStandardCode field is unreachable in this parser; numeric lines
    // at fieldIndex 0 start bogus extra rows.
    val lines = IndexedSeq("Code", "Non Standard Code", "Description/Service",
      "Type", "Total Quantity", "Cost", "Approved Quantity", "Approved Cost",
      "Status",
      "83600", "CON0002", "Consultation visit", "Services", "1", "100.5",
      "1", "100.5", "partial")
    val rows = ServiceExtractor.extractServiceFormat2(lines)
    assert(rows.length === 2)
    assert(rows(0).toMap === Map("code" -> "CON0002",
      "description" -> "Consultation visit", "type" -> "Services"))
    assert(rows(1).toMap === Map("code" -> "partial",
      "description" -> "1", "type" -> "100.5"))
  }

  test("V2 ladder: format classification routes to the right parser, cross-fallback works") {
    // a format1-looking section parsed by the legacy parser
    val f1Lines = IndexedSeq("(Code) Service", "Req. Qty",
      "(90911-00-00) Duplex ultrasound", "(14013) Scrotum", "Imaging", "1",
      "345")
    val (rows, method) = ServiceExtractor.extractLadderV2(f1Lines)
    assert(method === "format1")
    assert(rows.head("code") === "90911-00-00")
  }

  test("format_key_values: colon insertion, PHARMACY, ' & ' split, tf lowercase") {
    assert(ScalarKernels.formatKeyValues("[Name Ali & Age 7]") === "[Name: Ali\nAge: 7]")
    assert(ScalarKernels.formatKeyValues("[PHARMACY- X]") === "[PHARMACY: X]")
    assert(ScalarKernels.formatKeyValues("[Refill TRUE]") === "[Refill true]")
    assert(ScalarKernels.formatKeyValues("Name Ali") === "Name Ali") // non-bracket untouched
    assert(ScalarKernels.formatKeyValues("[Status: ok]") === "[Status: ok]") // colon kept
  }
}
