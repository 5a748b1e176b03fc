package graft.gen

/** Deterministic media binaries for the multimodal oracle queries: every
  * pixel/sample is a closed-form function of (doc_id, position), so the
  * DuckDB oracle can compute the expected decode output WITHOUT parsing
  * bytes — the Spark side must parse the real container to agree.
  */
object MediaGen {

  def bmpWidth(d: Long): Int = (8 + d % 9).toInt
  def bmpHeight(d: Long): Int = (5 + d % 7).toInt
  def red(d: Long, x: Int, y: Int): Int = ((x * 7 + y * 13 + d) % 256).toInt
  def green(d: Long, x: Int, y: Int): Int = ((x * 3 + y * 5 + 2 * d) % 256).toInt
  def blue(d: Long, x: Int, y: Int): Int = ((x * 11 + y * 2 + 3 * d) % 256).toInt

  /** 24bpp bottom-up BMP with standard 4-byte row padding. */
  def bmpBytes(d: Long): Array[Byte] = {
    val w = bmpWidth(d)
    val h = bmpHeight(d)
    val stride = (w * 3 + 3) & ~3
    val dataSize = stride * h
    val out = new Array[Byte](54 + dataSize)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + dataSize); put32(10, 54)
    put32(14, 40); put32(18, w); put32(22, h) // positive height = bottom-up
    put16(26, 1); put16(28, 24); put32(30, 0); put32(34, dataSize)
    var y = 0
    while (y < h) {
      val ro = 54 + (h - 1 - y) * stride // bottom-up: top row last
      var x = 0
      while (x < w) {
        out(ro + x * 3) = blue(d, x, y).toByte // BGR order
        out(ro + x * 3 + 1) = green(d, x, y).toByte
        out(ro + x * 3 + 2) = red(d, x, y).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  def wavRate(d: Long): Int = (8000 + 100 * (d % 5)).toInt
  def wavSampleCount(d: Long): Int = (50 + d % 100).toInt
  def wavSample(d: Long, i: Int): Int = ((i * 31 + d * 17) % 2048).toInt - 1024

  /** PCM 16-bit mono WAV with a LIST chunk between fmt and data (real
    * encoders emit metadata chunks there — the parser must chunk-walk).
    */
  def wavBytes(d: Long): Array[Byte] = {
    val n = wavSampleCount(d)
    val rate = wavRate(d)
    val listPayload = "INFOIART".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dataSize = n * 2
    val riffSize = 4 + (8 + 16) + (8 + listPayload.length) + (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def putStr(s: String): Unit = { s.foreach { c => out(p) = c.toByte; p += 1 } }
    def put16(v: Int): Unit = { out(p) = v.toByte; out(p + 1) = (v >> 8).toByte; p += 2 }
    def put32(v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
      out(p + 2) = (v >> 16).toByte; out(p + 3) = (v >> 24).toByte; p += 4
    }
    putStr("RIFF"); put32(riffSize); putStr("WAVE")
    putStr("fmt "); put32(16)
    put16(1); put16(1); put32(rate); put32(rate * 2); put16(2); put16(16)
    putStr("LIST"); put32(listPayload.length)
    listPayload.foreach { b => out(p) = b; p += 1 }
    putStr("data"); put32(dataSize)
    var i = 0
    while (i < n) { put16(wavSample(d, i) & 0xffff); i += 1 }
    out
  }
}
