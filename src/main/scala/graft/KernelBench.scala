package graft

import graft.gen.PagesGen
import graft.kernels.{Dom, HtmlTokenizer, MainTextExtractor}
import java.nio.charset.StandardCharsets.UTF_8

/** Single-threaded kernel microbenchmark (no Spark): isolates per-stage
  * cost — tokenize, DOM build, full extract — so optimization targets the
  * real hot spot. Usage: runMain graft.KernelBench [nDocs]
  */
object KernelBench {

  private object NullSink extends HtmlTokenizer.Sink {
    var n = 0
    override def open(name: String, classId: String, selfClosing: Boolean): Unit = n += 1
    override def close(name: String): Unit = n += 1
    override def text(s: CharSequence): Unit = n += s.length
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val pages = (0 until nDocs).map { i =>
      val gp = PagesGen.genPage(i.toLong, seed = 42L, hosts = 200)
      if (gp.kind == "html") new String(gp.row.html, UTF_8) else null
    }.filter(_ != null).toArray
    val totalChars = pages.map(_.length.toLong).sum

    def bench(label: String)(f: String => Unit): Unit = {
      (0 until 2).foreach(_ => pages.foreach(f)) // warmup
      val best = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        pages.foreach(f)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"KBENCH $label%-12s ${pages.length / best}%9.0f docs/s  " +
        f"${totalChars / best / 1e6}%7.1f Mchar/s  (${best * 1e6 / pages.length}%6.1f us/doc)")
    }

    bench("tokenize")(h => HtmlTokenizer.tokenize(h, NullSink))
    bench("dom")(h => { Dom.parse(h); () })
    bench("extract")(h => { MainTextExtractor.extract(h); () })

    // PDF stage: per-doc cost of the content-stream path (incl. Flate)
    val pdfs = (0 until nDocs).map { i =>
      val gp = PagesGen.genPage(i.toLong, seed = 42L, hosts = 200)
      if (gp.kind == "pdf") gp.row.html else null
    }.filter(_ != null).toArray
    val pdfBytes = pdfs.map(_.length.toLong).sum
    def benchPdf(label: String)(f: Array[Byte] => Unit): Unit = {
      (0 until 2).foreach(_ => pdfs.foreach(f))
      val best = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        pdfs.foreach(f)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"KBENCH $label%-12s ${pdfs.length / best}%9.0f docs/s  " +
        f"${pdfBytes / best / 1e6}%7.1f MB/s  (${best * 1e6 / pdfs.length}%6.1f us/doc)")
    }
    benchPdf("pdf")(b => { graft.kernels.PdfTextExtractor.extract(b); () })

    // multi-threaded extract: aggregate docs/s with T raw JVM threads
    // (no Spark) — isolates allocation/GC-bandwidth scaling of the kernel
    Seq(1, 8, 32).foreach { t =>
      val per = pages.grouped((pages.length + t - 1) / t).toArray
      def pass(): Double = {
        val t0 = System.nanoTime()
        val threads = per.map { chunk =>
          val th = new Thread(() => chunk.foreach(h => { MainTextExtractor.extract(h); () }))
          th.start(); th
        }
        threads.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warmup
      val best = (0 until 3).map(_ => pass()).min
      println(f"KBENCH mt$t%-10d ${pages.length / best}%9.0f docs/s  " +
        f"(${pages.length / best / t}%8.0f per thread)")
    }
  }
}
