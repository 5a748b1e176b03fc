package graft.kernels

import java.text.Normalizer

/** Unicode normalization kernel backing the `nfc` Catalyst expression.
  *
  * Web text mixes precomposed and decomposed forms (NFC vs NFD) for the
  * same rendered string; the reference never faced this (Azure OCR
  * returns NFC, azure_ocr.py:129-137) but a crawl pipeline must
  * canonicalize before hashing/dedup or byte-identity silently fails on
  * visually identical pages. Fast path: scan for any code point that can
  * participate in composition (the vast majority of web text is pure
  * ASCII or already-NFC Latin-1) and return the input object unchanged —
  * `Normalizer.isNormalized` does exactly this scan without allocating.
  */
object UnicodeKernel {

  /** NFC-normalize; returns the same instance when already normalized. */
  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  /** Canonical dedup key (the CCNet/Gopher-style normalization applied
    * before hashing so visually-identical pages collide):
    * NFKC (folds fullwidth forms, ligatures, NBSP, compatibility digits)
    * → drop format chars (Cf: ZWSP/ZWJ/ZWNJ/BOM/soft-hyphen — invisible
    * dedup-breakers) → collapse whitespace runs to single spaces + trim
    * → full case fold via upper∘lower (the string-level round trip picks
    * up multi-char folds like ß→ss that a plain toLowerCase misses).
    * Deterministic, allocation-light, pure JVM.
    */
  def dedupKey(s: String): String = {
    val n =
      if (Normalizer.isNormalized(s, Normalizer.Form.NFKC)) s
      else Normalizer.normalize(s, Normalizer.Form.NFKC)
    val sb = new java.lang.StringBuilder(n.length)
    var prevSpace = true // swallows leading whitespace
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (Character.getType(c) == Character.FORMAT) ()
      else if (Character.isWhitespace(c)) {
        if (!prevSpace) { sb.append(' '); prevSpace = true }
      } else { sb.append(c); prevSpace = false }
      i += 1
    }
    // trailing trim
    if (sb.length > 0 && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    sb.toString.toUpperCase(java.util.Locale.ROOT).toLowerCase(java.util.Locale.ROOT)
  }

  final case class ScriptMix(
      nLetters: Long, nLatin: Long, nCyrillic: Long, nGreek: Long,
      mixedWords: Long)

  /** Per-document script profile + mixed-script word count — the
    * homoglyph-spoofing signal ("pаypal" with a Cyrillic а) and the
    * script-mix spam gate a multilingual corpus runs alongside language
    * ID. A word counts as mixed when its LETTERS span ≥2 of
    * {Latin, Cyrillic, Greek} (the confusable trio); COMMON/INHERITED
    * marks are ignored per UTS #39's skeleton logic.
    */
  def scriptMix(s: String): ScriptMix = {
    var letters = 0L; var latin = 0L; var cyr = 0L; var greek = 0L
    var mixed = 0L
    var wordScripts = 0 // bitmask: 1=latin 2=cyrillic 4=greek
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isWhitespace(cp)) {
        if (Integer.bitCount(wordScripts) >= 2) mixed += 1
        wordScripts = 0
      } else if (Character.isLetter(cp)) {
        letters += 1
        Character.UnicodeScript.of(cp) match {
          case Character.UnicodeScript.LATIN => latin += 1; wordScripts |= 1
          case Character.UnicodeScript.CYRILLIC => cyr += 1; wordScripts |= 2
          case Character.UnicodeScript.GREEK => greek += 1; wordScripts |= 4
          case _ => ()
        }
      }
      i += Character.charCount(cp)
    }
    if (Integer.bitCount(wordScripts) >= 2) mixed += 1
    ScriptMix(letters, latin, cyr, greek, mixed)
  }
}
