package graft.kernels

import java.security.MessageDigest
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 64-bit SimHash over a document's distinct space-separated
  * words (Charikar/Manku near-dup fingerprint).
  *
  * Exactly the same math as the composed-builtins version it replaces
  * (md5 of the word's UTF-8 bytes; bit j of the fingerprint = majority
  * over distinct words of bit j, MSB-first, of the md5's first 8 bytes —
  * which IS "hex digit (j-1)/4+1, bit 3-((j-1)%4)"), so the DuckDB
  * oracle is unchanged. The builtin pipeline re-scanned the word-hash
  * array 64 times with one `filter` per bit; this kernel hashes each
  * distinct word once and accumulates all 64 counters in one pass.
  *
  * Tokenization parity: Spark's `split(text, ' ')` keeps empty tokens
  * (java regex split with limit -1) — so does this.
  */
object SimHashKernel {

  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 64-char '0'/'1' fingerprint string (same shape the banded queries
    * slice into 16-bit band keys). Static forwarder — callable from
    * Janino-generated code.
    */
  def simhash64(text: UTF8String): UTF8String = {
    val words = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](math.max(16, words.length * 2))
    val counts = new Array[Int](64)
    val md = Md5.get()
    var n = 0
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (seen.add(w)) {
        n += 1
        md.reset()
        val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          counts(j) += ((v >>> (63 - j)) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (counts(j) * 2 > n) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
