package graft

import graft.gen.PagesGen
import graft.kernels.WarcKernel
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** WARC/1.0 record splitting (ISO 28500): response + resource payload
  * recovery across HTTP body modes, gzip member concatenation, and
  * honest error rows on malformed tails.
  */
class WarcKernelSpec extends AnyFunSuite {

  private val Ts = new Timestamp(1735689600000L)

  private def entries(n: Int): Seq[(String, Timestamp, Array[Byte])] =
    (0 until n).map(i =>
      (s"doc://w/$i", Ts, s"payload body number $i with some filler text".getBytes(UTF_8)))

  test("plain WARC round-trips all modes (plain/chunked/gzip-CE/deflate-CE/resource)") {
    val es = entries(10)
    val pages = WarcKernel.split(PagesGen.warcBytes(es, gzipMembers = false)).toSeq
    assert(pages.forall(_.error == null))
    assert(pages.map(_.url) === es.map(_._1))
    assert(pages.map(p => new String(p.body, UTF_8)) ===
      es.map(e => new String(e._3, UTF_8)))
    // mode coverage: i%5==4 resource, else response
    assert(pages.map(_.recType) ===
      (0 until 10).map(i => if (i % 5 == 4) "resource" else "response"))
    assert(pages.forall(_.ts == Ts))
  }

  test(".warc.gz (per-record gzip members) round-trips identically") {
    val es = entries(7)
    val pages = WarcKernel.split(PagesGen.warcBytes(es, gzipMembers = true)).toSeq
    assert(pages.forall(_.error == null))
    assert(pages.map(p => new String(p.body, UTF_8)) ===
      es.map(e => new String(e._3, UTF_8)))
  }

  test("writeConversion round-trips through split: multibyte, empty, gzip") {
    val acute = new String(Character.toChars(0xE9))
    val texts = Seq(
      s"caf$acute au lait — 8 bits per char it is not", // bytes != chars
      "", // empty payload: Content-Length 0
      "plain ascii line")
    val in = texts.zipWithIndex.map { case (t, i) =>
      (s"http://w$i.example/p$i", new java.sql.Timestamp(1736208000000L + i), t)
    }
    val bytes = WarcKernel.writeConversion(in.iterator)
    val pages = WarcKernel.split(bytes).toVector
    assert(pages.size === 3 && pages.forall(_.error == null))
    assert(pages.map(_.recType).distinct === Vector("conversion"))
    assert(pages.map(p => new String(p.body, java.nio.charset.StandardCharsets.UTF_8)) === texts)
    assert(pages.map(_.url) === in.map(_._1))
    assert(pages.map(_.ts) === in.map(_._2))
    // same buffer as a gzip member (.wet.gz layout) reads identically
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    val gzPages = WarcKernel.split(bos.toByteArray).toVector
    assert(gzPages.map(p => new String(p.body, java.nio.charset.StandardCharsets.UTF_8)) === texts)
    // every record carries the MANDATORY WARC-Record-ID, deterministically
    val raw = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    assert("WARC-Record-ID: <urn:uuid:[0-9a-f-]{36}>".r.findAllIn(raw).size === 3)
    assert(java.util.Arrays.equals(bytes, WarcKernel.writeConversion(in.iterator)))
  }

  test("writeConversion round-trips non-ASCII target URIs (UTF-8 headers)") {
    val acute = new String(Character.toChars(0xE9))
    val cjk = new String(Character.toChars(0x4E2D))
    val url = s"http://caf$acute.example/$cjk/p1"
    val bytes = WarcKernel.writeConversion(
      Iterator((url, new java.sql.Timestamp(1736208000000L), "body text")))
    val pages = WarcKernel.split(bytes).toVector
    assert(pages.size === 1 && pages.head.error == null)
    assert(pages.head.url === url)
  }

  test("truncated tail yields an honest error row, keeping prior records") {
    val full = PagesGen.warcBytes(entries(6), gzipMembers = false)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 40)
    val pages = WarcKernel.split(cut).toSeq
    assert(pages.nonEmpty)
    assert(pages.last.error != null)
    assert(pages.init.forall(_.error == null))
  }

  test("garbage input is a single error row, not an exception") {
    val pages = WarcKernel.split("this is not a warc".getBytes(UTF_8)).toSeq
    assert(pages.map(_.error) === Seq("warc_bad_magic"))
    val pages2 = WarcKernel.split(Array[Byte](0x1f.toByte, 0x8b.toByte, 1, 2)).toSeq
    assert(pages2.map(_.error) === Seq("warc_gzip_corrupt"))
  }

  test("bad chunk framing is an error for that record only") {
    val body = "AAAA"
    val http = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\n" + body
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u://x\r\n" +
      s"WARC-Date: 2025-01-01T00:00:00Z\r\nContent-Length: ${http.length}\r\n\r\n" +
      http + "\r\n\r\n").getBytes(UTF_8)
    val pages = WarcKernel.split(rec).toSeq
    assert(pages.length === 1)
    assert(pages.head.error === "http_bad_chunking")
    assert(pages.head.url === "u://x")
  }

  test("angle-bracketed target URIs are unwrapped") {
    val es = entries(5) // entry 4 is a resource record with <uri> form
    val pages = WarcKernel.split(PagesGen.warcBytes(es, gzipMembers = false)).toSeq
    assert(pages(4).recType === "resource")
    assert(pages(4).url === "doc://w/4")
  }
}
