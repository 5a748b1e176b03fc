package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.PunycodeKernel

/** RFC 3492 §7.1 sample vectors (Arabic, Japanese incl. mixed-case
  * basic part, Russian), hostname-level decoding, skeleton/homograph
  * semantics, and totality under garbage (crawl input is hostile).
  */
class PunycodeKernelSpec extends AnyFunSuite {

  test("RFC 3492 sample strings decode exactly") {
    // (A) Arabic (Egyptian)
    assert(PunycodeKernel.decode("egbpdaj6bu4bxfgehfvwxn").get ===
      "ليهمابتكلموشعربي؟")
    // (J) Japanese: sono supiido de
    assert(PunycodeKernel.decode("d9juau41awczczp").get ===
      "そのスピードで")
    // (P) Japanese with Latin basic part preserved mid-string
    assert(PunycodeKernel.decode("de-jg4avhby1noc0d").get ===
      "パフィーdeルンバ")
    // (H) Russian (Cyrillic)
    assert(PunycodeKernel.decode("b1abfaaepdrnnbgefbadotcwatmq2g4l").get ===
      "почемужеони" +
        "неговорятпо" +
        "русски")
    // delta digits are case-insensitive per the RFC; the basic part is
    // case-PRESERVED (hostToUnicode lowercases labels before decoding)
    assert(PunycodeKernel.decode("MNCHEN-3YA").get === "MüNCHEN")
  }

  test("hostToUnicode decodes xn-- labels only; bad labels keep ASCII form") {
    assert(PunycodeKernel.hostToUnicode("xn--mnchen-3ya.example") === "münchen.example")
    assert(PunycodeKernel.hostToUnicode("www.plain.example") === "www.plain.example")
    assert(PunycodeKernel.hostToUnicode("XN--CAF-DMA.example") === "café.example")
    // malformed: non-digit char in the encoded tail
    assert(PunycodeKernel.hostToUnicode("xn--caf-d_a.example") === "xn--caf-d_a.example")
    // non-ASCII in the basic part is illegal
    assert(PunycodeKernel.decode("café-dma").isEmpty)
  }

  test("homograph skeleton flags whole-script and mixed spoofs, not honest IDNs") {
    assert(PunycodeKernel.skeleton("аррӏе") === "apple")
    assert(PunycodeKernel.homographRisk("аррӏе")) // аррӏе
    assert(PunycodeKernel.homographRisk("pаypal")) // mixed-script
    assert(!PunycodeKernel.homographRisk("münchen")) // ü is not a spoof
    assert(!PunycodeKernel.homographRisk("россия")) // россия: и/я unmapped
    assert(!PunycodeKernel.homographRisk("plain"))
  }

  test("decoder is total on garbage and guards overflow") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val len = rnd.nextInt(24)
      val s = new String(Array.fill(len)((rnd.nextInt(96) + 32).toChar))
      PunycodeKernel.decode(s) // must never throw
      PunycodeKernel.hostToUnicode(s + ".example")
    }
    // overflow-shaped inputs: huge variable-length integers
    assert(PunycodeKernel.decode("99999999999").isEmpty ||
      PunycodeKernel.decode("99999999999").nonEmpty) // no throw is the contract
    assert(PunycodeKernel.decode("zzzzzzzzzzzzzzzzzzzz").isEmpty)
    // truncated integer (ends mid-sequence)
    assert(PunycodeKernel.decode("a-z").isEmpty ||
      PunycodeKernel.decode("a-z").nonEmpty)
  }

  test("totality fuzz: random xn-- labels decode to Some or None, never throw") {
    // r4 ask #8: the doc promises malformed ACE labels return None
    // rather than throwing; fuzz STRUCTURED xn-- shapes (the earlier
    // fuzz used printable garbage): punycode-alphabet bodies, random
    // hyphen placement, mixed case, and extreme delta tails.
    val rnd = new scala.util.Random(20260819L)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    (1 to 5000).foreach { i =>
      val bodyLen = rnd.nextInt(20)
      val sb = new StringBuilder
      (0 until bodyLen).foreach { _ =>
        val c = alpha(rnd.nextInt(alpha.length))
        sb.append(if (rnd.nextBoolean()) c.toUpper else c)
        if (rnd.nextInt(5) == 0) sb.append('-')
      }
      val label = sb.toString
      val out = PunycodeKernel.decode(label) // Some or None; a throw fails the test
      out.foreach { s =>
        // structural sanity on successful decodes (exactness is covered
        // by the RFC fixtures): every basic code point before the last
        // delimiter must survive into the output, case-folded
        assert(s != null) // Some("") is valid: empty deltas over empty basic
        val basic = label.lastIndexOf('-') match {
          case -1 => ""
          case ix => label.substring(0, ix)
        }
        basic.filter(_ != '-').foreach { c =>
          assert(s.toLowerCase.indexOf(c.toLower) >= 0,
            s"basic char $c of <$label> lost in decode <$s>")
        }
      }
      PunycodeKernel.hostToUnicode(s"xn--$label.example") // must not throw either
    }
    // extreme delta tails (overflow guards)
    Seq("a-" + "9" * 30, "-" + "z" * 40, "ab--" + "m" * 25).foreach { l =>
      PunycodeKernel.decode(l)
      PunycodeKernel.hostToUnicode(s"xn--$l.example")
    }
  }
}
