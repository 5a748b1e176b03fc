package graft

import graft.kernels.PdfTextExtractor
import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite

/** The object-graph notch of the PDF kernel: page order must come from
  * the catalog's page TREE, not from stream file order, and per-font
  * /Encoding (WinAnsi + /Differences) must decode bytes that Latin-1
  * would get wrong. Fixtures are built as raw bytes so object layout is
  * fully controlled.
  */
class PdfObjectGraphSpec extends AnyFunSuite {

  private def pdf(objs: String*): Array[Byte] =
    ("%PDF-1.4\n" + objs.mkString("\n") + "\ntrailer << /Root 1 0 R >>\n%%EOF\n")
      .getBytes(ISO_8859_1)

  test("page order follows the page tree even when streams are file-reversed") {
    // page TWO's content stream appears FIRST in the file; Kids order says
    // page one first. File-order scanning would emit "second" before "first".
    val bytes = pdf(
      "6 0 obj << /Length 44 >> stream\nBT /F1 12 Tf 72 720 Td (second page) Tj ET\nendstream endobj",
      "5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj",
      "4 0 obj << /Length 43 >> stream\nBT /F1 12 Tf 72 720 Td (first page) Tj ET\nendstream endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj",
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("first page", "second page"))
    assert(r.unsupported === 0)
  }

  test("WinAnsiEncoding decodes 0x80-0x9F where Latin-1 has control chars") {
    // \200=euro \227=emdash \222=rsquo \234=oe under WinAnsi
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj",
      "4 0 obj << /Length 60 >> stream\n" +
        "BT /F1 12 Tf 72 720 Td (Caf\\351 \\200 15 \\227 p\\222tit \\234uvre) Tj ET\n" +
        "endstream endobj",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /WinAnsiEncoding >> endobj")
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("Café € 15 — p’tit œuvre"))
    assert(r.unsupported === 0)
  }

  test("/Differences override remaps codes on top of the base encoding") {
    // 65->eacute 66->adieresis (consecutive), 200->Euro; other codes keep
    // the WinAnsi base
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F2 5 0 R >> >> >> endobj",
      "4 0 obj << /Length 48 >> stream\n" +
        "BT /F2 12 Tf 72 720 Td (AB ok \\310) Tj ET\n" +
        "endstream endobj",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding 6 0 R >> endobj",
      "6 0 obj << /BaseEncoding /WinAnsiEncoding " +
        "/Differences [65 /eacute /adieresis 200 /Euro] >> endobj")
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("éä ok €"))
  }

  test("multiple fonts on one page switch tables at each Tf") {
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /FW 5 0 R /FL 6 0 R >> >> >> endobj",
      // same byte 0x97: WinAnsi font gives emdash; unencoded font keeps Latin-1
      "4 0 obj << /Length 90 >> stream\n" +
        "BT /FW 12 Tf 72 720 Td (a\\227b) Tj /FL 12 Tf 0 -20 Td (x\\351y) Tj ET\n" +
        "endstream endobj",
      "5 0 obj << /Type /Font /Encoding /WinAnsiEncoding >> endobj",
      "6 0 obj << /Type /Font >> endobj")
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.head.text === "a—b\nxéy")
  }

  test("/Contents array concatenates streams of one page") {
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj",
      "4 0 obj << /Length 40 >> stream\nBT /F1 12 Tf 72 720 Td (part one) Tj\nendstream endobj",
      "5 0 obj << /Length 30 >> stream\n0 -20 Td (part two) Tj ET\nendstream endobj")
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.head.text === "part one\npart two")
    assert(r.pages.length === 1)
  }

  test("unsupported filters still count honestly under the page tree") {
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
      "4 0 obj << /Length 10 /Filter /DCTDecode >> stream\nÿØjpegdata\nendstream endobj",
      "5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj",
      "6 0 obj << /Length 40 >> stream\nBT /F1 12 Tf 72 720 Td (readable) Tj ET\nendstream endobj")
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("readable"))
    assert(r.unsupported === 1)
  }

  test("TJ kern adjustments beyond the word-gap threshold become spaces") {
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
      "4 0 obj << /Length 70 >> stream\n" +
        "BT /F1 12 Tf 72 720 Td [(Hel) -50 (lo) -250 (kerned) -900 (world)] TJ ET\n" +
        "endstream endobj")
    val r = PdfTextExtractor.extract(bytes)
    // -50 is letter kerning (joined); -250 and -900 are word gaps
    assert(r.pages.head.text === "Hello kerned world")
  }

  test("Type0 font with ToUnicode CMap decodes 2-byte hex strings") {
    // codes: 0001->H 0002->é 0003->l 0004->o 0005->space (bfchar),
    // 0010..0012 -> A,B,C (bfrange)
    val cmap = "/CIDInit /ProcSet findresource begin\n" +
      "beginbfchar\n<0001> <0048>\n<0002> <00E9>\n<0003> <006C>\n<0004> <006F>\n<0005> <0020>\nendbfchar\n" +
      "beginbfrange\n<0010> <0012> <0041>\nendbfrange\nend"
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /FC 5 0 R >> >> >> endobj",
      // Héllo ABC via 2-byte codes
      "4 0 obj << /Length 70 >> stream\n" +
        "BT /FC 12 Tf 72 720 Td <000100020003000300040005001000110012> Tj ET\n" +
        "endstream endobj",
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Noto " +
        "/Encoding /Identity-H /ToUnicode 6 0 R >> endobj",
      s"6 0 obj << /Length ${cmap.length} >> stream\n$cmap\nendstream endobj")
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("Héllo ABC"))
    assert(r.unsupported === 0)
  }

  test("catalog and page tree inside an /ObjStm expand and drive page order") {
    // PDF 1.5 shape: structural objects live inside a compressed object
    // stream; only the content streams are direct objects
    val members = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      5 -> "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
    val bodies = members.map(_._2 + "\n")
    val offsets = bodies.scanLeft(0)(_ + _.length).init
    val header = members.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = header + bodies.mkString
    val bytes = ("%PDF-1.5\n" +
      s"7 0 obj << /Type /ObjStm /N 4 /First ${header.length} /Length ${payload.length} >> stream\n" +
      payload + "\nendstream endobj\n" +
      "6 0 obj << /Length 44 >> stream\nBT /F1 12 Tf 72 720 Td (second page) Tj ET\nendstream endobj\n" +
      "4 0 obj << /Length 43 >> stream\nBT /F1 12 Tf 72 720 Td (first page) Tj ET\nendstream endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF\n").getBytes(ISO_8859_1)
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("first page", "second page"))
    assert(r.unsupported === 0)
  }

  test("a truncated /ObjStm still counts as unsupported") {
    val bytes = ("%PDF-1.5\n" +
      "7 0 obj << /Type /ObjStm /N 4 /First 9999 /Length 4 >> stream\nxxxx\nendstream endobj\n" +
      "4 0 obj << /Length 40 >> stream\nBT /F1 12 Tf 72 720 Td (loose) Tj ET\nendstream endobj\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF\n").getBytes(ISO_8859_1)
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("loose"))
    assert(r.unsupported === 1)
  }

  test("fonts inherit /Resources from the /Pages node (/Parent walk)") {
    // page objects declare NO resources; the WinAnsi font lives on /Pages
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
      "4 0 obj << /Length 48 >> stream\n" +
        "BT /F1 12 Tf 72 720 Td (\\200100 \\227 ok) Tj ET\n" +
        "endstream endobj",
      "5 0 obj << /Type /Font /Encoding /WinAnsiEncoding >> endobj")
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("\u20ac100 \u2014 ok"))
  }

  test("TJ kern space cannot break 2-byte CID alignment") {
    val cmap = "beginbfchar\n<0001> <0041>\n<0002> <0042>\nendbfchar"
    val bytes = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /FC 5 0 R >> >> >> endobj",
      "4 0 obj << /Length 60 >> stream\n" +
        "BT /FC 12 Tf 72 720 Td [<0001> -250 <0002>] TJ ET\n" +
        "endstream endobj",
      "5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
        "/ToUnicode 6 0 R >> endobj",
      s"6 0 obj << /Length ${cmap.length} >> stream\n$cmap\nendstream endobj")
    val r = PdfTextExtractor.extract(bytes)
    // the kern space lands BETWEEN decoded CIDs, not inside the byte stream
    assert(r.pages.map(_.text).toSeq === Seq("A B"))
  }

  test("no catalog falls back to file-order scanning") {
    val bytes = ("%PDF-1.4\n" +
      "9 0 obj << /Length 40 >> stream\nBT /F1 12 Tf 72 720 Td (orphan) Tj ET\nendstream endobj\n" +
      "%%EOF\n").getBytes(ISO_8859_1)
    val r = PdfTextExtractor.extract(bytes)
    assert(r.pages.map(_.text).toSeq === Seq("orphan"))
  }

  test("docInfo: literal escapes, UTF-16BE author, D: date normalization") {
    val bytes = graft.gen.PagesGen.pdfBytesInfo(Seq(Seq("x")),
      "A (nested) \\ title", "Łukasz Müller", "20230506123045", utf16Author = true)
    val i = PdfTextExtractor.docInfo(bytes)
    assert(i.title === "A (nested) \\ title")
    assert(i.author === "Łukasz Müller")
    assert(i.creationDate === "2023-05-06T12:30:45")
  }

  test("docInfo: partial dates default per spec; missing /Info is empty") {
    val b = graft.gen.PagesGen.pdfBytesInfo(Seq(Seq("x")), "t", "a", "2024", utf16Author = false)
    assert(PdfTextExtractor.docInfo(b).creationDate === "2024-01-01T00:00:00")
    val b2 = graft.gen.PagesGen.pdfBytesInfo(Seq(Seq("x")), "t", "a", "202407", utf16Author = false)
    assert(PdfTextExtractor.docInfo(b2).creationDate === "2024-07-01T00:00:00")
    val plain = graft.gen.PagesGen.pdfBytes(Seq(Seq("x")), compress = false)
    assert(PdfTextExtractor.docInfo(plain) === PdfTextExtractor.DocInfo("", "", ""))
  }

  test("docInfo: the LAST /Info trailer governs incrementally-updated files") {
    val base = new String(graft.gen.PagesGen.pdfBytesInfo(Seq(Seq("x")),
      "old title", "a", "2020", utf16Author = false), ISO_8859_1)
    val updated = base +
      "7 0 obj << /Title (new title) /Author (b) /CreationDate (D:2021) >> endobj\n" +
      "trailer << /Root 1 0 R /Info 7 0 R >>\n%%EOF\n"
    val i = PdfTextExtractor.docInfo(updated.getBytes(ISO_8859_1))
    assert(i.title === "new title")
    assert(i.creationDate === "2021-01-01T00:00:00")
  }
}
