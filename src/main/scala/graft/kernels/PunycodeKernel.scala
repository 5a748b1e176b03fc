package graft.kernels

/** RFC 3492 Punycode decoding + a UTS #39-style confusable skeleton —
  * the IDN half of crawl URL hygiene. Crawl tables carry hostnames in
  * ASCII-compatible encoding (`xn--` labels); a corpus/frontier wants
  * them (a) decoded for per-language routing and (b) screened for
  * homograph spoofs. The canonical attack is NOT mixed-script (browsers
  * block that): it is a WHOLE-script confusable like `xn--80ak6aa92e`
  * ("аррӏе" — all Cyrillic, renders as "apple"), so the gate here maps
  * each character through a Cyrillic→Latin confusable table and flags a
  * label whose skeleton (i) differs from the label and (ii) collapses
  * to pure ASCII — i.e. every non-Latin character was a Latin
  * look-alike. Decoder parameters are RFC 3492 §5 verbatim
  * (base 36, tmin 1, tmax 26, skew 38, damp 700, bias 72, n 128), with
  * the overflow guards of §6.4; malformed labels decode to None and the
  * caller keeps the ASCII form (crawl data is hostile — a bad label
  * must never throw).
  */
object PunycodeKernel {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  /** Decode one Punycode label (WITHOUT the `xn--` prefix). None on any
    * malformation: bad digit, truncated variable-length integer,
    * arithmetic overflow, or a code point outside Unicode/surrogates.
    */
  def decode(input: String): Option[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]
    val lastDelim = input.lastIndexOf('-')
    var pos = 0
    if (lastDelim >= 0) {
      var j = 0
      while (j < lastDelim) {
        val c = input.charAt(j)
        if (c >= 0x80) return None // basic part must be ASCII
        out += c.toInt
        j += 1
      }
      pos = lastDelim + 1
    }
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (pos < input.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= input.length) return None // truncated integer
        val c = input.charAt(pos); pos += 1
        val digit =
          if (c >= 'a' && c <= 'z') c - 'a'
          else if (c >= 'A' && c <= 'Z') c - 'A'
          else if (c >= '0' && c <= '9') c - '0' + 26
          else return None
        if (digit > (Int.MaxValue - i) / w) return None // overflow
        i += digit * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return None // overflow
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(i - oldi, out.length + 1, oldi == 0)
      if (i / (out.length + 1) > Int.MaxValue - n) return None // overflow
      n += i / (out.length + 1)
      i %= out.length + 1
      if (n < 0x80 || n > 0x10FFFF || (n >= 0xD800 && n <= 0xDFFF)) return None
      out.insert(i, n)
      i += 1
    }
    val sb = new java.lang.StringBuilder(out.length + 4)
    out.foreach(sb.appendCodePoint)
    Some(sb.toString)
  }

  /** Decode a dotted hostname: `xn--` labels (case-insensitive) decode,
    * everything else passes through; a label that fails to decode keeps
    * its ASCII form.
    */
  def hostToUnicode(host: String): String =
    host.split('.').map { label =>
      val lower = label.toLowerCase(java.util.Locale.ROOT)
      if (lower.startsWith("xn--"))
        decode(lower.substring(4)).getOrElse(label)
      else label
    }.mkString(".")

  /** Cyrillic→Latin confusable pairs (the UTS #39 confusables that are
    * pixel-identical in common fonts — the practical homograph set).
    */
  private val Confusables: Map[Int, Char] = Map(
    0x430 -> 'a', 0x435 -> 'e', 0x43e -> 'o', 0x440 -> 'p', 0x441 -> 'c',
    0x443 -> 'y', 0x445 -> 'x', 0x4cf -> 'l', 0x456 -> 'i', 0x455 -> 's',
    0x458 -> 'j', 0x4bb -> 'h', 0x501 -> 'd', 0x51b -> 'q', 0x51d -> 'w')

  /** Map every confusable through the table; untouched otherwise. */
  def skeleton(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      Confusables.get(cp) match {
        case Some(latin) => sb.append(latin)
        case None        => sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Whole-script (or mixed) confusable: some character mapped AND the
    * skeleton is pure ASCII — the label renders as a Latin word.
    */
  def homographRisk(label: String): Boolean = {
    val sk = skeleton(label)
    sk != label && sk.forall(_ < 0x80)
  }
}
