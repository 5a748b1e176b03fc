package graft

import graft.gen.MediaGen
import graft.kernels.MediaKernel
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM BMP/WAV decoders against generated containers and malformed
  * input (the real-decode tier of the multimodal pipeline).
  */
class MediaKernelSpec extends AnyFunSuite {

  test("BMP round-trip: every pixel recovered through padding + bottom-up + BGR") {
    (0L until 25L).foreach { d =>
      val img = MediaKernel.decodeBmp(MediaGen.bmpBytes(d)).get
      assert(img.width === MediaGen.bmpWidth(d))
      assert(img.height === MediaGen.bmpHeight(d))
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val p = (y * img.width + x) * 3
          assert(img.px(p) === MediaGen.red(d, x, y), s"d=$d R($x,$y)")
          assert(img.px(p + 1) === MediaGen.green(d, x, y), s"d=$d G($x,$y)")
          assert(img.px(p + 2) === MediaGen.blue(d, x, y), s"d=$d B($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("top-down BMP (negative height) decodes to the same image") {
    val d = 7L
    val bu = MediaGen.bmpBytes(d)
    val img1 = MediaKernel.decodeBmp(bu).get
    // flip to top-down: negate height, reverse row order
    val w = MediaGen.bmpWidth(d); val h = MediaGen.bmpHeight(d)
    val stride = (w * 3 + 3) & ~3
    val td = bu.clone()
    val nh = -h
    td(22) = nh.toByte; td(23) = (nh >> 8).toByte
    td(24) = (nh >> 16).toByte; td(25) = (nh >> 24).toByte
    (0 until h).foreach { r =>
      System.arraycopy(bu, 54 + (h - 1 - r) * stride, td, 54 + r * stride, stride)
    }
    val img2 = MediaKernel.decodeBmp(td).get
    assert(img1.px.toSeq === img2.px.toSeq)
  }

  test("nearest-neighbor resize uses integer source sampling") {
    val d = 3L
    val img = MediaKernel.decodeBmp(MediaGen.bmpBytes(d)).get
    val small = MediaKernel.resizeNearest(img, 4, 4)
    (0 until 4).foreach { j =>
      (0 until 4).foreach { i =>
        val sx = i * img.width / 4
        val sy = j * img.height / 4
        assert(small.px((j * 4 + i) * 3) === MediaGen.red(d, sx, sy))
      }
    }
  }

  test("WAV round-trip: chunk walk skips LIST, samples sign-exact") {
    (0L until 25L).foreach { d =>
      val au = MediaKernel.decodeWav(MediaGen.wavBytes(d)).get
      assert(au.sampleRate === MediaGen.wavRate(d))
      assert(au.samples.length === MediaGen.wavSampleCount(d))
      au.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s.toInt === MediaGen.wavSample(d, i), s"d=$d i=$i")
      }
    }
  }

  test("PNG round-trip: all 5 row filters, RGB and RGBA, split IDAT, tEXt skipped") {
    (0L until 25L).foreach { d =>
      val img = MediaKernel.decodePng(MediaGen.pngBytes(d)).get
      assert(img.width === MediaGen.bmpWidth(d))
      assert(img.height === MediaGen.bmpHeight(d))
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val p = (y * img.width + x) * 3
          assert(img.px(p) === MediaGen.red(d, x, y), s"d=$d R($x,$y)")
          assert(img.px(p + 1) === MediaGen.green(d, x, y), s"d=$d G($x,$y)")
          assert(img.px(p + 2) === MediaGen.blue(d, x, y), s"d=$d B($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("PNG malformed input returns None") {
    assert(MediaKernel.decodePng(null).isEmpty)
    assert(MediaKernel.decodePng(new Array[Byte](100)).isEmpty)
    val good = MediaGen.pngBytes(4L)
    assert(MediaKernel.decodePng(good.take(60)).isEmpty)
    // corrupt bytes anywhere in the zlib payload: decode may fail (None)
    // but must never throw — poison-pill totality
    val bad = good.clone()
    (8 until bad.length by 7).foreach(i => bad(i) = (bad(i) ^ 0x5a).toByte)
    MediaKernel.decodePng(bad) // must not throw — poison-pill totality
  }

  test("hostile header fields (2^31-range offsets/lengths) return None, never throw") {
    // BMP with dataOffset 0x90000000: must fail the Long bounds check,
    // not wrap negative and index backwards
    val bmp = MediaGen.bmpBytes(3L).clone()
    bmp(10) = 0x00; bmp(11) = 0x00; bmp(12) = 0x00; bmp(13) = 0x90.toByte
    assert(MediaKernel.decodeBmp(bmp).isEmpty)
    // PNG chunk length 0x7FFFFFF4: pos + 12 + len must not wrap
    val png = MediaGen.pngBytes(3L).clone()
    png(8) = 0x7f; png(9) = 0xff.toByte; png(10) = 0xff.toByte; png(11) = 0xf4.toByte
    assert(MediaKernel.decodePng(png).isEmpty)
    // WAV data size near u32 max
    val wav = MediaGen.wavBytes(3L).clone()
    val dataOff = wav.indexOfSlice("data".getBytes)
    wav(dataOff + 4) = 0xfc.toByte; wav(dataOff + 5) = 0xff.toByte
    wav(dataOff + 6) = 0xff.toByte; wav(dataOff + 7) = 0xff.toByte
    assert(MediaKernel.decodeWav(wav).isEmpty)
  }

  test("malformed containers return None, never throw") {
    assert(MediaKernel.decodeBmp(null).isEmpty)
    assert(MediaKernel.decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaKernel.decodeBmp("BMgarbage".getBytes ++ new Array[Byte](64)).isEmpty)
    val truncated = MediaGen.bmpBytes(5L).take(60)
    assert(MediaKernel.decodeBmp(truncated).isEmpty)
    assert(MediaKernel.decodeWav(null).isEmpty)
    assert(MediaKernel.decodeWav("RIFFxxxxWAVE".getBytes ++ new Array[Byte](40)).isEmpty)
    val wavTrunc = MediaGen.wavBytes(5L).take(50)
    assert(MediaKernel.decodeWav(wavTrunc).isEmpty)
  }
}
