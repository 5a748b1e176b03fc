package graft

import graft.kernels.UnicodeKernel
import org.scalatest.funsuite.AnyFunSuite

/** dedupKey contracts: the normalizations that make visually-identical
  * web pages collide under one hash key.
  */
class UnicodeKeySpec extends AnyFunSuite {

  test("fullwidth, ligature, NBSP, compatibility forms fold (NFKC)") {
    assert(UnicodeKernel.dedupKey("Ｈｅｌｌｏ") === "hello")
    assert(UnicodeKernel.dedupKey("ﬁle ﬂow") === "file flow")
    assert(UnicodeKernel.dedupKey("a b") === "a b") // NBSP
    assert(UnicodeKernel.dedupKey("№ ½") === "no 1⁄2")
  }

  test("invisible format chars drop: ZWSP/ZWJ/ZWNJ/BOM/soft hyphen") {
    assert(UnicodeKernel.dedupKey("a​b‍c‌d﻿e­f") === "abcdef")
  }

  test("full case fold picks up multi-char folds") {
    assert(UnicodeKernel.dedupKey("STRASSE Straße") === "strasse strasse")
    assert(UnicodeKernel.dedupKey("MiXeD Case") === "mixed case")
  }

  test("whitespace runs collapse; ends trim") {
    assert(UnicodeKernel.dedupKey("  a \t\n b　 c  ") === "a b c")
    assert(UnicodeKernel.dedupKey("") === "")
    assert(UnicodeKernel.dedupKey(" \t ") === "")
  }

  test("identical-looking variants collide; different text does not") {
    val a = UnicodeKernel.dedupKey("The ﬁnal Straße​ price")
    val b = UnicodeKernel.dedupKey("THE FINAL STRASSE PRICE")
    assert(a === b)
    assert(UnicodeKernel.dedupKey("different words") !== a)
  }

  test("scriptMix: homoglyph words flag, pure-script words do not") {
    val m = UnicodeKernel.scriptMix("pay with pаypal now") // Cyrillic а
    assert(m.mixedWords === 1L)
    assert(m.nCyrillic === 1L && m.nLatin === 15L)
    val clean = UnicodeKernel.scriptMix("привет world λόγος")
    assert(clean.mixedWords === 0L)
    assert(clean.nCyrillic === 6L && clean.nLatin === 5L && clean.nGreek === 5L)
    // digits/punct are not letters; CJK letters count but don't flag the trio
    val cjk = UnicodeKernel.scriptMix("abc123 漢字!")
    assert(cjk.nLetters === 5L && cjk.nLatin === 3L && cjk.mixedWords === 0L)
    // trailing word without whitespace still evaluated
    assert(UnicodeKernel.scriptMix("pаypal").mixedWords === 1L)
  }
}
