package graft

import graft.gen.MediaGen
import graft.kernels.JpegKernel
import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG decode: exact pixel recovery on the DC-exact fixture
  * family (4:4:4 and 4:2:0, restart markers, byte stuffing), AC
  * coefficient placement through the zigzag/run-length path, and honest
  * None on unsupported/garbage inputs.
  */
class JpegKernelSpec extends AnyFunSuite {

  private def expectedRgb(d: Long, x: Int, y: Int): (Int, Int, Int) = {
    val bx = x / 8; val by = y / 8
    val (cx, cy) = if (MediaGen.jpegIs420(d)) (x / 16, y / 16) else (bx, by)
    JpegKernel.ycbcrToRgb(
      MediaGen.jpegY(d, bx, by), MediaGen.jpegCb(d, cx, cy), MediaGen.jpegCr(d, cx, cy))
  }

  test("DC-exact fixtures decode to closed-form pixels (4:4:4 + 4:2:0)") {
    (0L until 40L).foreach { d =>
      val img = JpegKernel.decode(MediaGen.jpegBytes(d))
        .getOrElse(fail(s"decode failed for d=$d"))
      assert(img.width === MediaGen.jpegWidth(d), s"d=$d")
      assert(img.height === MediaGen.jpegHeight(d), s"d=$d")
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val (r, g, b) = expectedRgb(d, x, y)
          val o = (y * img.width + x) * 3
          assert((img.px(o), img.px(o + 1), img.px(o + 2)) === ((r, g, b)),
            s"d=$d pixel ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  /** Hand-built grayscale 8x8 with DC plus one AC coefficient encoded
    * with run=2 (zigzag position 3 = natural (v=2, u=0)): the decoded
    * block must vary down rows but be constant across columns — wrong
    * zigzag placement, run handling, or dequant breaks this shape.
    */
  test("AC coefficient lands at the zigzag position (grayscale scan)") {
    val out = new java.io.ByteArrayOutputStream(256)
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)
    m(0xdb); u16(2 + 65); out.write(0); (0 until 64).foreach(_ => out.write(8))
    m(0xc0); u16(8 + 3); out.write(8); u16(8); u16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    val dhtLen = 2 + (17 + MediaGen.JpegDcVals.length) + (17 + MediaGen.JpegAcVals.length)
    m(0xc4); u16(dhtLen)
    out.write(0x00); MediaGen.JpegDcBits.foreach(out.write); MediaGen.JpegDcVals.foreach(out.write)
    out.write(0x10); MediaGen.JpegAcBits.foreach(out.write); MediaGen.JpegAcVals.foreach(out.write)
    m(0xda); u16(6 + 2); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val bits = new MediaGen.JpegBits(out)
    // DC = 0 (category 0)
    val (c0, l0) = MediaGen.dcCode(0)
    bits.put(c0, l0)
    // AC: run=2, size=3, value 5 → zigzag index k=3, natural 16 (v=2,u=0)
    val sym = (2 << 4) | 3
    bits.put(MediaGen.JpegAcVals.indexOf(sym), 16)
    bits.put(5, 3)
    bits.put(0, 16) // EOB
    bits.flush()
    m(0xd9)
    val img = JpegKernel.decode(out.toByteArray).getOrElse(fail("decode failed"))
    assert(img.width === 8 && img.height === 8)
    val rows = (0 until 8).map(y => (0 until 8).map(x => img.px((y * 8 + x) * 3)))
    // grayscale: all three channels equal
    assert((0 until 64).forall(i => img.px(3 * i) == img.px(3 * i + 1) &&
      img.px(3 * i) == img.px(3 * i + 2)))
    // basis (v=2,u=0): constant across x, non-constant down y, and the
    // block is NOT flat (the AC coefficient took effect)
    assert(rows.forall(r => r.distinct.size == 1), "rows must be x-constant")
    assert(rows.map(_.head).distinct.size > 1, "column profile must vary")
    // symmetric basis: cos((2y+1)*2π/16) gives row pairs (0,7),(1,6)... with
    // mirror symmetry around the center
    assert(rows.map(_.head) === rows.map(_.head).reverse)
  }

  test("garbage, truncation and progressive SOF are honest Nones") {
    assert(JpegKernel.decode("not a jpeg".getBytes).isEmpty)
    assert(JpegKernel.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    val full = MediaGen.jpegBytes(4)
    assert(JpegKernel.decode(java.util.Arrays.copyOfRange(full, 0, full.length / 2)).isEmpty)
    // flip SOF0 to SOF2 (progressive): honest unsupported
    val prog = full.clone()
    var i = 0
    var flipped = false
    while (i + 1 < prog.length && !flipped) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; flipped = true
      }
      i += 1
    }
    assert(flipped)
    assert(JpegKernel.decode(prog).isEmpty)
  }

  test("fixtures are deterministic byte-for-byte") {
    (0L until 8L).foreach { d =>
      assert(MediaGen.jpegBytes(d).toSeq === MediaGen.jpegBytes(d).toSeq)
    }
  }
}
