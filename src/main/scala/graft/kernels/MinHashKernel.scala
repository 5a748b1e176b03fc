package graft.kernels

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash LSH band keys over a document's 3-word shingles.
  *
  * Exactly the math of the composed-builtins pipeline it replaces
  * (K=8 signatures, signature i = min over shingles of md5(shingle +
  * "#i"); band b = hex(h(2b+1)) || hex(h(2b+2))): lowercase-hex md5
  * strings order identically to their unsigned bytes (both hex ranges
  * are monotonic in the nibble), so tracking 16-byte minima and
  * hex-encoding at the end gives byte-identical band keys and leaves
  * the DuckDB oracle untouched. The builtin version materialized the
  * shingle array, then 8 salted md5-hex arrays, then 8 array_min scans;
  * this kernel walks the shingles once, computing each salted digest
  * straight into a running minimum.
  *
  * Tokenization parity: `split(text, ' ')` with empty tokens preserved;
  * docs with <3 words use the whole text as the single shingle.
  */
object MinHashKernel {

  final val K = 8
  final val Bands = 4

  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".getBytes(UTF_8)

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** The `Bands` LSH band-key strings for one document (band b = 32-char
    * hex of min-md5 salt 2b+1 followed by salt 2b+2). Static forwarder —
    * callable from Janino-generated code.
    */
  def minhashBands(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val mins = Array.ofDim[Array[Byte]](K)
    val md = Md5.get()
    val nShingles = if (words.length >= 3) words.length - 2 else 1
    var s = 0
    while (s < nShingles) {
      val shingle =
        if (words.length >= 3) words(s) + " " + words(s + 1) + " " + words(s + 2)
        else text.toString
      var i = 0
      while (i < K) {
        md.reset()
        md.update(shingle.getBytes(UTF_8))
        md.update('#'.toByte)
        md.update(('1' + i).toByte)
        val d = md.digest()
        if (mins(i) == null || lessThan(d, mins(i))) mins(i) = d
        i += 1
      }
      s += 1
    }
    val bands = new Array[Any](Bands)
    var b = 0
    while (b < Bands) {
      val out = new Array[Byte](64)
      var half = 0
      while (half < 2) {
        val digest = mins(2 * b + half)
        var i = 0
        while (i < 16) {
          out(half * 32 + 2 * i) = HexDigits((digest(i) & 0xf0) >>> 4)
          out(half * 32 + 2 * i + 1) = HexDigits(digest(i) & 0x0f)
          i += 1
        }
        half += 1
      }
      bands(b) = UTF8String.fromBytes(out)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bands)
  }
}
