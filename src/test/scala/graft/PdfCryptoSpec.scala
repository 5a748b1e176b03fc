package graft

import graft.gen.PagesGen
import graft.kernels.{PdfCrypto, PdfTextExtractor}
import org.scalatest.funsuite.AnyFunSuite

/** Standard-security-handler decryption (ISO 32000 §7.6): empty-user-
  * password files decrypt transparently across all four public handler
  * generations; genuinely password-protected files stay honestly
  * unsupported. Generator and extractor implement the algorithms
  * independently enough that a round trip exercises both directions of
  * the key schedule.
  */
class PdfCryptoSpec extends AnyFunSuite {

  private val lines = Seq("alpha bravo charlie delta", "echo foxtrot golf",
    "hotel india juliet kilo lima")
  private val pages = Seq(lines.take(2), lines.drop(2))

  private def roundTrip(mode: String, seed: Long): Unit = {
    val pdf = PagesGen.pdfBytesEncrypted(pages, mode, seed)
    val r = PdfTextExtractor.extract(pdf)
    assert(r.unsupported === 0, s"mode=$mode seed=$seed")
    assert(r.pages.map(_.text).mkString("\n") ===
      pages.map(_.mkString("\n")).mkString("\n"), s"mode=$mode seed=$seed")
  }

  for (mode <- Seq("rc4-40", "rc4-128", "aes128", "aes256"))
    test(s"$mode empty-user-password file decrypts byte-identically") {
      // several seeds: IVs/salts/ciphertext vary, incl. payloads whose
      // ciphertext ends in CR/LF bytes (the /Length-honoring span path)
      (0L until 24L).foreach(roundTrip(mode, _))
    }

  test("password-protected file is counted unsupported, not garbled") {
    for (mode <- Seq("rc4-128", "aes128", "aes256")) {
      val pdf = PagesGen.pdfBytesEncrypted(pages, mode, seed = 7,
        userPw = "secret".getBytes("UTF-8"))
      val r = PdfTextExtractor.extract(pdf)
      assert(r.pages.isEmpty, mode)
      assert(r.unsupported > 0, mode)
    }
  }

  test("rc4 is a self-inverse stream cipher") {
    val key = Array[Byte](1, 2, 3, 4, 5)
    val data = (0 until 257).map(_.toByte).toArray
    assert(PdfCrypto.rc4(key, PdfCrypto.rc4(key, data)).toSeq === data.toSeq)
  }

  test("hash2B matches its own fixpoint shape (32 bytes, deterministic)") {
    val a = PdfCrypto.hash2B(Array.emptyByteArray, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), Array.emptyByteArray)
    val b = PdfCrypto.hash2B(Array.emptyByteArray, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), Array.emptyByteArray)
    assert(a.length === 32)
    assert(a.toSeq === b.toSeq)
  }
}
