package graft.kernels

/** Mojibake (double-encoded UTF-8) detection and repair — the ftfy-style
  * fix every crawl corpus needs: pages whose UTF-8 bytes were decoded as
  * windows-1252 somewhere upstream and re-encoded, turning "café" into
  * "cafÃ©". Public-knowledge algorithm (ftfy's fix_encoding core idea):
  * re-encode the TEXT through windows-1252 (latin-1 fallback for the
  * five undefined bytes, per WHATWG), strictly decode as UTF-8, and
  * accept only when the round trip succeeds AND strictly shrinks the
  * string — a legitimate page fails one of the two tests and passes
  * through byte-identical. Up to 3 rounds undoes doubly-encoded text.
  *
  * Pure JVM, zero Spark imports — runs in `mapPartitions`/codegen'd maps
  * with no driver involvement; O(n) per round over the string.
  */
object MojibakeKernel {

  /** byte (0..255) → char: windows-1252, with the five undefined bytes
    * (0x81 0x8D 0x8F 0x90 0x9D) falling back to their latin-1 code
    * point, per the WHATWG encoding standard's index.
    */
  private val decodeTable: Array[Char] = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    val t = new Array[Char](256)
    var b = 0
    while (b < 256) {
      val s = new String(Array(b.toByte), cs)
      t(b) = if (s.length == 1 && s.charAt(0) != '�') s.charAt(0) else b.toChar
      b += 1
    }
    t
  }

  /** inverse: char → byte+1 (0 = unmappable); the combined table is
    * injective so the inverse is well-defined.
    */
  private val encodeTable: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer](512)
    var b = 0
    while (b < 256) { m.put(decodeTable(b), b + 1); b += 1 }
    m
  }

  /** Simulate one round of mojibake: UTF-8 bytes of `s`, each decoded as
    * windows-1252/latin-1. (Fixture builder + property tests; the repair
    * path never calls this.)
    */
  def encodeOnce(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(decodeTable(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  private def tryDecodeRound(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = encodeTable.get(s.charAt(i))
      if (b == null) return null // char outside win1252 → not mojibake
      bytes(i) = (b - 1).toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Undo up to `maxRounds` rounds of mojibake; byte-identical
    * passthrough for text that is not double-encoded.
    */
  def repair(s: String, maxRounds: Int = 3): String = {
    var cur = s
    var r = 0
    while (r < maxRounds) {
      val cand = tryDecodeRound(cur)
      // multi-byte sequences always shrink; an equal-length "fix" is
      // pure ASCII (identity) — stop either way
      if (cand == null || cand.length >= cur.length) return cur
      cur = cand
      r += 1
    }
    cur
  }
}
