package graft.kernels

/** REAL pure-JVM media decoders for the multimodal pipeline — no codec
  * libraries exist in this container, but uncompressed containers need
  * none: BMP (BITMAPINFOHEADER, 24bpp, bottom-up, 4-byte row padding,
  * BGR order) and WAV (RIFF/WAVE, PCM 16-bit LE). These replace the
  * former deterministic stub for the formats a JVM can parse from bare
  * bytes; formats that genuinely need a codec (JPEG/PNG/MP4) still go
  * through the stub seam and say so.
  *
  * Decode failures return None — the caller surfaces an error column,
  * never a task failure (same poison-pill stance as ExtractKernel).
  */
object MediaKernel {

  final case class BmpImage(width: Int, height: Int,
      /** row-major top-down, 3 ints (r, g, b) per pixel */ px: Array[Int])
  final case class WavAudio(sampleRate: Int, samples: Array[Short])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  /** Parse an uncompressed 24bpp BMP. Supports the common
    * BITMAPINFOHEADER shape; top-down (negative height) too.
    */
  def decodeBmp(bytes: Array[Byte]): Option[BmpImage] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = u32(bytes, 10).toInt
    val headerSize = i32(bytes, 14)
    if (headerSize < 40) return None
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = u32(bytes, 30)
    if (width <= 0 || height == 0 || planes != 1 || bpp != 24 || compression != 0L)
      return None
    if (width.toLong * height > 64L * 1024 * 1024) return None // sanity cap
    val stride = (width * 3 + 3) & ~3
    if (dataOffset.toLong + stride.toLong * height > bytes.length) return None
    val px = new Array[Int](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val ro = dataOffset + srcRow * stride
      var x = 0
      while (x < width) {
        val o = ro + x * 3
        val p = (y * width + x) * 3
        px(p) = bytes(o + 2) & 0xff     // R (stored BGR)
        px(p + 1) = bytes(o + 1) & 0xff // G
        px(p + 2) = bytes(o) & 0xff     // B
        x += 1
      }
      y += 1
    }
    Some(BmpImage(width, height, px))
  }

  /** Nearest-neighbor resize to (ow, oh): output pixel (i, j) samples the
    * source at (i*w/ow, j*h/oh) — pure integer math, so oracles can
    * reproduce it in closed form.
    */
  def resizeNearest(img: BmpImage, ow: Int, oh: Int): BmpImage = {
    val out = new Array[Int](ow * oh * 3)
    var j = 0
    while (j < oh) {
      val sy = j * img.height / oh
      var i = 0
      while (i < ow) {
        val sx = i * img.width / ow
        val s = (sy * img.width + sx) * 3
        val d = (j * ow + i) * 3
        out(d) = img.px(s); out(d + 1) = img.px(s + 1); out(d + 2) = img.px(s + 2)
        i += 1
      }
      j += 1
    }
    BmpImage(ow, oh, out)
  }

  /** Parse a PCM 16-bit LE mono/stereo WAV (RIFF chunk walk — fmt may be
    * followed by LIST/fact chunks before data, as real encoders emit).
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes == null || bytes.length < 44) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F') return None
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    var pos = 12
    var sampleRate = -1
    var bits = -1
    var fmt = -1
    var channels = -1
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length && data.isEmpty) {
      val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(bytes, pos + 4).toInt
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          fmt = u16(bytes, pos + 8)
          channels = u16(bytes, pos + 10)
          sampleRate = u32(bytes, pos + 12).toInt
          bits = u16(bytes, pos + 22)
        case "data" => data = Some((pos + 8, size))
        case _ => () // skip LIST/fact/cue...
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    val (off, size) = data.getOrElse(return None)
    if (fmt != 1 || bits != 16 || channels < 1 || sampleRate <= 0) return None
    val n = size / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((bytes(off + 2 * i) & 0xff) | (bytes(off + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Some(WavAudio(sampleRate, samples))
  }
}
