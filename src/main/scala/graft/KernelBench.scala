package graft

import graft.gen.PagesGen
import graft.kernels.{Dom, HtmlTokenizer, MainTextExtractor, PdfTextExtractor}
import java.nio.charset.StandardCharsets.UTF_8

/** Kernel microbenchmark (no Spark): isolates per-stage cost — tokenize,
  * DOM build, full extract, PDF path — plus a raw multi-threaded extract
  * stage that measures allocation/GC-bandwidth scaling of the kernel.
  * Usage: runMain graft.KernelBench [nDocs]
  */
object KernelBench {

  private object NullSink extends HtmlTokenizer.Sink {
    var n = 0
    override def open(name: String, classId: String, selfClosing: Boolean): Unit = n += 1
    override def close(name: String): Unit = n += 1
    override def text(s: CharSequence): Unit = n += s.length
  }

  /** Warmup ×2, best of 3 timed passes over `docs`; prints docs/s,
    * unit-volume/s, us/doc. No-op when the doc set is empty.
    */
  private def bench[A](label: String, docs: Array[A], volume: Long, volumeUnit: String)(
      f: A => Unit): Unit = {
    if (docs.isEmpty) { println(s"KBENCH $label skipped (0 docs)"); return }
    (0 until 2).foreach(_ => docs.foreach(f)) // warmup
    val best = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      docs.foreach(f)
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"KBENCH $label%-12s ${docs.length / best}%9.0f docs/s  " +
      f"${volume / best / 1e6}%7.1f $volumeUnit%s/s  (${best * 1e6 / docs.length}%6.1f us/doc)")
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    // one generation pass feeds both the html and pdf stages
    val gen = (0 until nDocs).map(i => PagesGen.genPage(i.toLong, seed = 42L, hosts = 200))
    val pages = gen.collect { case gp if gp.kind == "html" => new String(gp.row.html, UTF_8) }.toArray
    val pdfs = gen.collect { case gp if gp.kind == "pdf" => gp.row.html }.toArray
    val totalChars = pages.map(_.length.toLong).sum
    val pdfBytes = pdfs.map(_.length.toLong).sum

    bench("tokenize", pages, totalChars, "Mchar")(h => HtmlTokenizer.tokenize(h, NullSink))
    bench("dom", pages, totalChars, "Mchar")(h => { Dom.parse(h); () })
    bench("extract", pages, totalChars, "Mchar")(h => { MainTextExtractor.extract(h); () })
    bench("pdf", pdfs, pdfBytes, "MB")(b => { PdfTextExtractor.extract(b); () })
    // metadata-tier kernels share the tokenizer pass; their cost must
    // stay in the same order as extract or the head-field tier doubles
    // the corpus scan budget
    bench("meta", pages, totalChars, "Mchar")(h =>
      { graft.kernels.MetaKernel.extract(h, "http://h.example/p"); () })
    bench("table", pages, totalChars, "Mchar")(h =>
      { graft.kernels.TableKernel.extract(h); () })
    bench("markdown", pages, totalChars, "Mchar")(h =>
      { graft.kernels.MarkdownKernel.convert(h, "http://h.example/p"); () })
    bench("article", pages, totalChars, "Mchar")(h =>
      { graft.kernels.ArticleKernel.extract(h, "http://h.example/p"); () })
    bench("mojibake", pages, totalChars, "Mchar")(h =>
      { graft.kernels.MojibakeKernel.repair(h); () })
    bench("dedupkey", pages, totalChars, "Mchar")(h =>
      { graft.kernels.UnicodeKernel.dedupKey(h); () })

    // multi-threaded extract: aggregate docs/s with T raw JVM threads
    // (no Spark) — isolates allocation/GC-bandwidth scaling of the kernel
    if (pages.nonEmpty) Seq(1, 8, 32).foreach { t =>
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
