package graft.pipeline

import graft.kernels.ExtractKernel
import graft.model.{ExtractedDoc, ExtractedPage, PageRow, Span}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Spark wiring of the extraction kernel (SURVEY.md §7.1 `pipeline`).
  *
  * Plan shape (EP1 restated, SURVEY §3). Two placements of the explicit
  * url-hash exchange:
  * {{{
  *   pre-shuffle (postShuffle=false):     post-shuffle (postShuffle=true):
  *     scan(pages)                          scan(pages)
  *       └─ repartition(P, xxhash64(url))     └─ mapPartitions(kernel)  -- narrow
  *       └─ mapPartitions(kernel)             └─ repartition(P, xxhash64(url))
  * }}}
  * Both satisfy the north rule's explicit url-hash repartitioning (the
  * output lands co-partitioned by url either way); they differ in WHAT
  * crosses the wire. Pre-shuffle moves the raw `html` bytes — at crawl
  * scale that is the whole 100 TB through the exchange — and buys
  * row-level CPU balance into the kernel. Post-shuffle keeps the kernel
  * narrow on scan splits and exchanges only the extracted text
  * (typically 5-10x smaller); kernel-time imbalance between splits is
  * absorbed by task-per-core oversubscription, not by pre-balancing
  * rows. Measured at local[8]/300k docs, interleaved min-of-5: 142k
  * docs/s pre vs 149k post (178k with no exchange at all —
  * `repartition = 0`, the right call when the source is already
  * bucketed by url). The local gap is small because a single-JVM
  * shuffle is tmpfs-speed; on a real cluster the exchange is
  * network-bound and scales with bytes moved, which is where shipping
  * text instead of html pays. Post-shuffle is the default production
  * shape; pre-shuffle remains for sources with pathological per-split
  * skew (one parquet file of giant PDFs).
  *
  * The reference processed pages serially per request (api.py:217-228);
  * here every executor core runs the kernel on its partition's rows with
  * a single exchange end-to-end.
  */
object ExtractPipeline {

  /** Job configuration.
    * @param repartition  target partitions for the url-hash exchange;
    *                     0 = keep scan partitioning (narrow, no shuffle) —
    *                     right when the source is already well-bucketed.
    * @param maxBytes     poison-pill cap: larger blobs become error rows
    *                     (bounds kernel memory; SURVEY §4.3 spill row).
    * @param hostSalt     0/1 = partition by url hash (uniform — the
    *                     default; unique urls carry no skew). >1 =
    *                     partition by (host, salt) instead: rows stay
    *                     host-grouped (per-host downstream state /
    *                     politeness) but a giant host spreads over
    *                     `hostSalt` buckets instead of hot-spotting one
    *                     reducer (SURVEY §4.3 skew salting).
    */
  /** @param postShuffle  place the url-hash exchange AFTER the kernel
    *                      (shuffles extracted text instead of raw html —
    *                      see the plan-shape comparison above). Only
    *                      meaningful with repartition > 0.
    */
  final case class Conf(repartition: Int = 0, maxBytes: Int = 64 << 20,
      hostSalt: Int = 0, postShuffle: Boolean = true)

  /** Task-side counters (lineage/metrics, BASELINE.json north rule). */
  final class Metrics(spark: SparkSession) extends Serializable {
    val docsOk: LongAccumulator = spark.sparkContext.longAccumulator("graft.docs_ok")
    val docsFailed: LongAccumulator = spark.sparkContext.longAccumulator("graft.docs_failed")
    val pagesOut: LongAccumulator = spark.sparkContext.longAccumulator("graft.pages_out")
    val bytesIn: LongAccumulator = spark.sparkContext.longAccumulator("graft.bytes_in")
  }

  /** Merge a document's extracted pages (already local — all pages of a
    * url come from its single input row): texts join with '\n' in page
    * order, spans re-offset into the concatenation. Mirrors the combined
    * `{page_count, pages:[...]}` JSON of the reference (api.py:261-269).
    */
  def mergePages(row: PageRow, pages: Seq[ExtractedPage]): ExtractedDoc = {
    if (pages.length == 1) {
      // fast path for the dominant single-page case: no text re-copy, no
      // span re-offset — cuts per-doc allocation in the hot loop
      val p = pages.head
      return ExtractedDoc(row.url, row.warc_ts, p.doc_kind, 1, p.text,
        p.spans, p.text.length, row.lang, p.error)
    }
    val sorted = pages.sortBy(_.page_no)
    val sb = new java.lang.StringBuilder(256)
    val spans = Seq.newBuilder[Span]
    sorted.foreach { p =>
      if (sb.length > 0) sb.append('\n')
      val off = sb.length
      sb.append(p.text)
      p.spans.foreach(s => spans += Span(s.begin + off, s.end + off, s.kind))
    }
    val err = sorted.iterator.map(_.error).find(_ != null).orNull
    val kind = sorted.headOption.map(_.doc_kind).getOrElse(ExtractKernel.KindEmpty)
    val text = sb.toString
    ExtractedDoc(row.url, row.warc_ts, kind, sorted.length, text, spans.result(),
      text.length, row.lang, err)
  }

  /** Extract one document (all pages) with the size cap applied. */
  def extractDoc(row: PageRow, maxBytes: Int, m: Metrics): ExtractedDoc = {
    val size = if (row.html == null) 0 else row.html.length
    if (m != null) m.bytesIn.add(size.toLong)
    val doc =
      if (size > maxBytes)
        ExtractedDoc(row.url, row.warc_ts, ExtractKernel.sniff(row.html), 0, "",
          Seq.empty, 0, row.lang, s"too_large:$size")
      else {
        val pages = ExtractKernel.extractPages(row).toVector
        mergePages(row, pages)
      }
    if (m != null) {
      if (doc.error == null) m.docsOk.add(1L) else m.docsFailed.add(1L)
      m.pagesOut.add(doc.page_count.toLong)
    }
    doc
  }

  /** The explicit url-hash exchange, applicable to any plan with a `url`
    * column (raw pages pre-kernel or extracted docs post-kernel).
    */
  private def keyedBy[T](ds: Dataset[T], conf: Conf): Dataset[T] =
    if (conf.repartition > 0 && conf.hostSalt > 1)
      // host-grouped with skew salt: tuple-hash of (host, salt bucket)
      ds.repartition(conf.repartition,
        regexp_extract(col("url"), "^https?://([^/]+)", 1),
        pmod(xxhash64(col("url")), lit(conf.hostSalt)))
    else if (conf.repartition > 0)
      // explicit url-hash exchange (north rule): aligns output
      // partitioning with the natural key and spreads host runs
      ds.repartition(conf.repartition, xxhash64(col("url")))
    else ds

  /** pages(url, warc_ts, html, text, lang) → Dataset[ExtractedDoc]. */
  def extract(spark: SparkSession, pages: DataFrame, conf: Conf = Conf(),
      metrics: Metrics = null): Dataset[ExtractedDoc] = {
    import spark.implicits._
    val maxBytes = conf.maxBytes
    val input = if (conf.postShuffle) pages else keyedBy(pages.toDF(), conf)
    val docs = input
      .select("url", "warc_ts", "html", "text", "lang")
      .as[PageRow]
      .mapPartitions { it => it.map(r => extractDoc(r, maxBytes, metrics)) }
    if (conf.postShuffle) keyedBy(docs, conf) else docs
  }

  /** Expression-only fast path: text extraction as a codegen'd projection
    * (`extract_main_text`), no Dataset encoder round-trip — measured ~38%
    * faster than the typed path at local[32] (297k vs 215k docs/s on the
    * 1.2M-doc corpus). Emits (url, warc_ts, lang, text, n_chars) only:
    * consumers needing spans, page counts, or the error string use
    * [[extract]]. text=null is the single failure shape here — oversized
    * blobs, failed PDFs, and kernel faults (the expression catches
    * per-row, mirroring the typed path's poison-pill isolation) all map
    * to null. Crawl-provided `text` surfaces ONLY for rows with no html
    * bytes (the passthrough branch), never as a fallback for failed
    * extraction — same branch the typed path takes.
    */
  def extractText(spark: SparkSession, pages: DataFrame, conf: Conf = Conf()): DataFrame = {
    graft.functions.ExtractMainText.register(spark) // idempotent
    val htmlLen = coalesce(length(col("html")), lit(0))
    val input = if (conf.postShuffle) pages else keyedBy(pages, conf)
    val out = input
      .select(
        col("url"), col("warc_ts"), col("lang"),
        when(htmlLen === 0, when(col("text") =!= "", col("text")))
          .otherwise(when(htmlLen <= conf.maxBytes,
            call_function("extract_main_text", col("html"))))
          .as("text"))
      .withColumn("n_chars", coalesce(length(col("text")), lit(0)))
    if (conf.postShuffle) keyedBy(out, conf) else out
  }

  /** Relational page→doc rollup for the general case where pages of one
    * document arrive as separate rows (reference multi-page combined JSON,
    * api.py:261-269). Order-correct via sort_array on page_no — never
    * relies on collect_list arrival order (SURVEY §7.4 hard part #5).
    */
  def rollupPages(pages: DataFrame): DataFrame = {
    pages
      .groupBy(col("url"))
      .agg(
        count(lit(1)).cast("int").as("page_count"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("page_no"), col("text")))),
            p => p.getField("text")),
          "\n").as("text"),
        min(col("warc_ts")).as("warc_ts"))
  }
}
