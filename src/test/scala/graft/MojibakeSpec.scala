package graft

import graft.kernels.MojibakeKernel
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Mojibake repair contracts beyond the oracle-gated generated shapes:
  * inversion of 1 and 2 encode rounds, byte-identity on clean text,
  * idempotence, and totality on arbitrary strings.
  */
class MojibakeSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: $res")
  }

  // Strings mixing ASCII, win1252-mappable accents, and chars OUTSIDE
  // win1252 (CJK/Cyrillic/№). The "№ " anchor makes the clean form
  // unambiguous: a string consisting ONLY of win1252-mappable chars that
  // happens to be byte-valid UTF-8 is indistinguishable from mojibake
  // (ftfy's inherent ambiguity), so the property pins the unambiguous
  // class and the fixed-vector test below pins the classic signatures.
  private val mixed: Gen[String] =
    Gen.listOf(Gen.frequency(
      (3, Gen.alphaNumChar),
      (2, Gen.oneOf("éüñçß“”—…№密码漢字эюя한국".toSeq)),
      (1, Gen.oneOf(" .,!?\t\n".toSeq)))).map(cs => "№ " + cs.mkString)

  test("property: repair inverts one and two rounds of mojibake") {
    check("invert-1", Prop.forAll(mixed) { s =>
      MojibakeKernel.repair(MojibakeKernel.encodeOnce(s)) == s
    })
    check("invert-2", Prop.forAll(mixed) { s =>
      MojibakeKernel.repair(
        MojibakeKernel.encodeOnce(MojibakeKernel.encodeOnce(s))) == s
    })
  }

  test("clean text passes through byte-identical") {
    val cleans = Seq(
      "plain ascii only",
      "accented résumé naïve",  // win1252-mappable but not byte-valid UTF-8
      "中文 text with CJK — outside win1252 entirely",
      "№ and 한국어 mixed with ascii",
      "")
    cleans.foreach(s => assert(MojibakeKernel.repair(s) === s))
  }

  test("classic signatures repair") {
    assert(MojibakeKernel.repair("cafÃ©") === "café")
    assert(MojibakeKernel.repair("â€œquotedâ€") === "“quoted”")
    assert(MojibakeKernel.repair("naÃ¯ve â€” ok") === "naïve — ok")
  }

  test("property: repair is idempotent on its own output") {
    check("idempotent", Prop.forAll(mixed) { s =>
      val once = MojibakeKernel.repair(MojibakeKernel.encodeOnce(s))
      MojibakeKernel.repair(once) == once
    })
  }

  test("property: arbitrary unicode never throws") {
    check("total", Prop.forAll { (s: String) =>
      MojibakeKernel.repair(s); true
    })
  }
}
