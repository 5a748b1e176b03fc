package graft

import graft.gen.PagesGen
import graft.kernels.PdfTextExtractor
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Roundtrip properties of the PDF wrap/extract paths over generated
  * word sequences: whatever text goes in through any generator variant
  * (plain, Flate, scrambled object order, WinAnsi bytes, Type0/CID with
  * ToUnicode CMap) must come back byte-identically. Pure kernels — no
  * SparkSession.
  */
class PdfPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, n: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: $res")
  }

  // words of printable ASCII incl. the PDF string metachars ( ) \
  private val asciiWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('(', ')', '\\', '.', ',', '-', '#')))
      .map(_.mkString)
  // words over Latin-1 letters (byte-transparent in the default encoding)
  private val latin1Word: Gen[String] =
    Gen.nonEmptyListOf(Gen.choose('À', 'ÿ')).map(_.mkString)
  // words over BMP scripts the CID path must carry (Arabic, Greek, CJK)
  private val bmpWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose('ء', 'غ'), // Arabic
      Gen.choose('α', 'ω'), // Greek
      Gen.choose('一', '亀'), // CJK
      Gen.alphaNumChar)).map(_.mkString)

  private def line(word: Gen[String]): Gen[String] =
    Gen.chooseNum(1, 8).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))

  test("property: plain/Flate/scrambled PDFs roundtrip ASCII text exactly") {
    check("pdf-roundtrip", Prop.forAll(line(asciiWord), Gen.oneOf(0, 1, 2)) { (s, mode) =>
      val bytes = mode match {
        case 0 => PagesGen.pdfBytes(Seq(Seq(s)), compress = false)
        case 1 => PagesGen.pdfBytes(Seq(Seq(s)), compress = true)
        case _ => PagesGen.pdfBytesAdv(Seq(Seq(s)), compress = false,
          winAnsi = false, scramble = true)
      }
      val r = PdfTextExtractor.extract(bytes)
      r.pages.length == 1 && r.pages.head.text == s && r.unsupported == 0
    })
  }

  test("property: Latin-1 text survives the default byte-transparent path") {
    check("pdf-latin1", Prop.forAll(line(latin1Word)) { s =>
      PdfTextExtractor.extract(
        PagesGen.pdfBytes(Seq(Seq(s)), compress = false)).pages.head.text == s
    })
  }

  test("property: WinAnsi-encoded text roundtrips through /Encoding") {
    // restrict to cp1252-encodable chars: ASCII words + the 0x80-0x9F glyphs
    val winWord = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('€', '—', '’', 'œ', '†', '‰'))).map(_.mkString)
    check("pdf-winansi", Prop.forAll(line(winWord)) { s =>
      PdfTextExtractor.extract(PagesGen.pdfBytesAdv(Seq(Seq(s)),
        compress = false, winAnsi = true, scramble = false)).pages.head.text == s
    })
  }

  test("property: CID/Identity-H roundtrips any BMP script via its CMap") {
    check("pdf-cid", Prop.forAll(line(bmpWord)) { s =>
      PdfTextExtractor.extract(
        PagesGen.pdfBytesCid(Seq(Seq(s)))).pages.head.text == s
    })
  }

  test("property: multi-page documents keep page-tree order under scrambling") {
    val pagesGen = Gen.chooseNum(2, 5).flatMap(k => Gen.listOfN(k, line(asciiWord)))
    check("pdf-multipage", Prop.forAll(pagesGen) { pages =>
      val bytes = PagesGen.pdfBytesAdv(pages.map(Seq(_)), compress = false,
        winAnsi = false, scramble = true)
      PdfTextExtractor.extract(bytes).pages.map(_.text).toList == pages
    })
  }

  test("property: extractor is total on arbitrary byte garbage") {
    check("pdf-total", Prop.forAll { (b: Array[Byte]) =>
      val r = PdfTextExtractor.extract(b)
      r.pages != null && r.unsupported >= 0
    }, n = 300)
  }
}
