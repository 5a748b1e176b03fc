package graft

import graft.kernels.HtmlCharset
import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.{UTF_16BE, UTF_16LE, UTF_8}
import org.scalatest.funsuite.AnyFunSuite

class HtmlCharsetSpec extends AnyFunSuite {

  private val W = Charset.forName("windows-1252")

  test("BOM wins over any declaration and is stripped") {
    val body = "<meta charset=\"iso-8859-1\"><p>héllo €</p>"
    val utf8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ body.getBytes(UTF_8)
    assert(HtmlCharset.decode(utf8) === body)
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ body.getBytes(UTF_16LE)
    assert(HtmlCharset.decode(le) === body)
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ body.getBytes(UTF_16BE)
    assert(HtmlCharset.decode(be) === body)
  }

  test("meta charset declaration decodes windows-1252 glyph bytes") {
    val s = "<html><head><meta charset=\"windows-1252\"></head><body>€ — œ</body></html>"
    assert(HtmlCharset.decode(s.getBytes(W)) === s)
  }

  test("http-equiv form and ISO-8859-1 label resolve to windows-1252 per WHATWG") {
    val s = "<head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-1\"></head>€™«»"
    assert(HtmlCharset.decode(s.getBytes(W)) === s)
    assert(HtmlCharset.forLabel("latin1").get === W)
    assert(HtmlCharset.forLabel("US-ASCII").get === W)
  }

  test("undeclared valid UTF-8 decodes as UTF-8") {
    val s = "<html><body>نص تجريبي — héllo</body></html>"
    assert(HtmlCharset.decode(s.getBytes(UTF_8)) === s)
  }

  test("undeclared non-UTF-8 bytes fall back to windows-1252") {
    val s = "<html><body>café €</body></html>" // é=0xE9, €=0x80: invalid UTF-8
    assert(HtmlCharset.decode(s.getBytes(W)) === s)
  }

  test("meta-declared utf-16 is defanged to UTF-8 (WHATWG confusion rule)") {
    assert(HtmlCharset.forLabel("utf-16").get === UTF_8)
  }

  test("unknown labels fall through to content sniffing") {
    assert(HtmlCharset.forLabel("not-a-charset").isEmpty)
    val s = "<meta charset=\"not-a-charset\"><p>plain ascii</p>"
    assert(HtmlCharset.decode(s.getBytes(UTF_8)) === s)
  }

  test("declaration beyond the first 1024 bytes is ignored") {
    val pad = "<!-- " + ("x" * 1100) + " -->"
    val s = pad + "<meta charset=\"windows-1252\">ascii only"
    assert(HtmlCharset.sniffDeclared(s.getBytes(UTF_8)).isEmpty)
  }
}
