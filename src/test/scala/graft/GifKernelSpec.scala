package graft

import graft.gen.MediaGen
import graft.kernels.GifKernel
import org.scalatest.funsuite.AnyFunSuite

/** GIF decode: exact palette-pixel recovery through real LZW compression
  * (LSB-first, width growth, clear handling), interlacing, extension
  * skipping; honest None on malformed input.
  */
class GifKernelSpec extends AnyFunSuite {

  test("fixtures decode to closed-form pixels (plain + interlaced, 4/8/16 colors)") {
    (0L until 60L).foreach { d =>
      val img = GifKernel.decode(MediaGen.gifBytes(d))
        .getOrElse(fail(s"decode failed for d=$d"))
      assert(img.width === MediaGen.gifWidth(d), s"d=$d")
      assert(img.height === MediaGen.gifHeight(d), s"d=$d")
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val i = MediaGen.gifIndex(d, x, y)
          val o = (y * img.width + x) * 3
          assert((img.px(o), img.px(o + 1), img.px(o + 2)) ===
            ((MediaGen.gifPalR(d, i), MediaGen.gifPalG(d, i), MediaGen.gifPalB(d, i))),
            s"d=$d pixel ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("LZW dictionary path: long repetitive image compresses and round-trips") {
    // 64x64 with long runs → dictionary strings actually used (the
    // compressed stream must be much smaller than raw indices)
    val w = 64; val h = 64
    val px = Array.tabulate(w * h)(k => if ((k / 17) % 2 == 0) 1 else 2)
    val lzw = MediaGen.gifLzwEncode(px, 2)
    assert(lzw.length < w * h / 4, s"no compression happened: ${lzw.length}")
    // wrap into a minimal gif by reusing the builder path at a doc with
    // matching palette bits, then splice — simpler: decode via a
    // hand-rolled container
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes); u16(w); u16(h); out.write(0x80 | 1); out.write(0); out.write(0)
    (0 until 4).foreach { i => out.write(i * 10); out.write(i * 20); out.write(i * 30) }
    out.write(0x2c); u16(0); u16(0); u16(w); u16(h); out.write(0)
    out.write(2)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0); out.write(0x3b)
    val img = GifKernel.decode(out.toByteArray).getOrElse(fail("decode failed"))
    (0 until w * h).foreach { k =>
      assert(img.px(3 * k) === px(k) * 10, s"pixel $k")
    }
  }

  test("malformed inputs are honest Nones") {
    assert(GifKernel.decode("GIF89a".getBytes).isEmpty)
    assert(GifKernel.decode("notagif-at-all".getBytes).isEmpty)
    val full = MediaGen.gifBytes(3)
    assert(GifKernel.decode(java.util.Arrays.copyOfRange(full, 0, full.length / 2)).isEmpty)
    // truncate inside the color table
    assert(GifKernel.decode(java.util.Arrays.copyOfRange(full, 0, 14)).isEmpty)
  }
}
