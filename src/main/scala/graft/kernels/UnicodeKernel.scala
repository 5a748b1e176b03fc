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
}
