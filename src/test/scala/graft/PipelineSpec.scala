package graft

import graft.gen.PagesGen
import graft.model.{ExtractedPage, PageRow}
import graft.pipeline.{ExtractJob, ExtractPipeline, Ledger}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def corpusDf(n: Int) =
    PagesGen.corpus(n, seed = 42L).map(_.row).toDS().toDF()

  test("extract pipeline: byte-identical text for every corpus url") {
    val corpus = PagesGen.corpus(300, seed = 42L)
    val metrics = new ExtractPipeline.Metrics(spark)
    val out = ExtractPipeline
      .extract(spark, corpus.map(_.row).toDS().toDF(),
        ExtractPipeline.Conf(repartition = 8), metrics)
      .collect()
      .map(d => d.url -> d).toMap
    assert(out.size == corpus.size)
    corpus.foreach { gp =>
      val d = out(gp.row.url)
      assert(d.error == null, s"${gp.row.url}: ${d.error}")
      assert(d.text == gp.expected, s"${gp.kind} ${gp.row.url}")
      assert(d.n_chars == d.text.length)
      // span invariants over the merged doc
      var last = 0
      d.spans.foreach { s =>
        assert(s.begin >= last && s.end <= d.text.length && s.begin <= s.end)
        last = s.end
      }
    }
    assert(metrics.docsOk.value == corpus.size)
    assert(metrics.docsFailed.value == 0)
  }

  test("expression fast path matches the typed pipeline's text per url (null = failure shape)") {
    val corpus = PagesGen.corpus(300, seed = 42L)
    val df = corpus.map(_.row).toDS().toDF()
    val fast = ExtractPipeline.extractText(spark, df, ExtractPipeline.Conf(repartition = 4))
      .collect().map(r => r.getAs[String]("url") -> Option(r.getAs[String]("text"))).toMap
    assert(fast.size == corpus.size)
    corpus.foreach { gp =>
      // exact shape: empty rows → null, everything else → the golden text
      val expected = if (gp.kind == "empty") None else Some(gp.expected)
      assert(fast(gp.row.url) == expected, s"${gp.kind} ${gp.row.url}")
    }
  }

  test("fast path does NOT surface crawl text for failed (non-empty-html) extraction") {
    // a failed PDF with crawl-provided text must stay null on the fast
    // path (the typed path marks it error='pdf_empty'), and a no-html row
    // must surface the crawl text (passthrough branch)
    val rows = Seq(
      PageRow("https://x.example/badpdf", new java.sql.Timestamp(0),
        "%PDF-1.4 no streams here".getBytes, "crawl text A", "en"),
      PageRow("https://x.example/pass", new java.sql.Timestamp(0),
        Array.emptyByteArray, "crawl text B", "en"))
    val out = ExtractPipeline.extractText(spark, rows.toDS().toDF())
      .collect().map(r => r.getAs[String]("url") -> Option(r.getAs[String]("text"))).toMap
    assert(out("https://x.example/badpdf").isEmpty)
    assert(out("https://x.example/pass").contains("crawl text B"))
  }

  test("host salt spreads a giant host over multiple partitions, result unchanged") {
    // one pathological host owning every row (the skew case salting exists for)
    val rows = (0 until 200).map { i =>
      val gp = PagesGen.genPage(i.toLong, seed = 9L, hosts = 1)
      gp.row.copy(url = s"https://giant.example/p/$i")
    }
    val df = rows.toDS().toDF()
    val salted = ExtractPipeline.extract(spark, df,
      ExtractPipeline.Conf(repartition = 8, hostSalt = 4))
    val nParts = salted.mapPartitions(it => Iterator.single(if (it.hasNext) 1 else 0))
      .collect().sum
    assert(nParts >= 2, s"giant host stayed on $nParts partition(s)")
    // salting only moves rows; extraction output is identical
    val a = salted.collect().map(d => d.url -> d.text).toMap
    val b = ExtractPipeline.extract(spark, df, ExtractPipeline.Conf(repartition = 8))
      .collect().map(d => d.url -> d.text).toMap
    assert(a == b)
  }

  test("poison pill: oversized + garbage rows isolate as error rows") {
    val rows = Seq(
      PageRow("u://big", new java.sql.Timestamp(0), Array.fill[Byte](2048)('x'), "", "en"),
      PageRow("u://garbage-pdf", new java.sql.Timestamp(0), "%PDF-1.4 garbage".getBytes, "", "en"))
    val out = ExtractPipeline
      .extract(spark, rows.toDS().toDF(), ExtractPipeline.Conf(maxBytes = 1024))
      .collect().map(d => d.url -> d).toMap
    assert(out("u://big").error.startsWith("too_large:"))
    assert(out("u://garbage-pdf").error != null) // no streams found
    assert(out.values.forall(_.text == ""))
  }

  test("relational rollupPages: page order by page_no, not arrival order") {
    val pages = Seq(
      ExtractedPage("u://d", 1, new java.sql.Timestamp(0), "pdf", "second", Seq(), null),
      ExtractedPage("u://d", 0, new java.sql.Timestamp(0), "pdf", "first", Seq(), null),
      ExtractedPage("u://d", 2, new java.sql.Timestamp(0), "pdf", "third", Seq(), null))
    val df = ExtractPipeline.rollupPages(pages.toDS().toDF())
    val r = df.collect().head
    assert(r.getAs[Int]("page_count") == 3)
    assert(r.getAs[String]("text") == "first\nsecond\nthird")
  }

  test("extract job: day-partitioned write + ledger commit + resume skips committed days") {
    val outDir = tmpDir("graft-out")
    val ledgerDir = tmpDir("graft-ledger")
    val pages = corpusDf(200).cache()

    val r1 = ExtractJob.run(spark, pages, outDir, ledgerDir,
      ExtractPipeline.Conf(repartition = 4))
    assert(r1.daysProcessed.nonEmpty)
    assert(r1.docsOk + r1.docsFailed == 200)
    val full = spark.read.parquet(outDir).orderBy("url").collect()
    assert(full.length == 200)

    val committed1 = Ledger.committed(ledgerDir)
    assert(committed1.size == r1.daysProcessed.size)
    assert(committed1.values.map(_.rows).sum == 200)

    // rerun with everything committed: nothing recomputed
    val r2 = ExtractJob.run(spark, pages, outDir, ledgerDir,
      ExtractPipeline.Conf(repartition = 4))
    assert(r2.daysProcessed.isEmpty)
    assert(r2.docsOk == 0 && r2.docsFailed == 0) // kernel never ran

    // kill-and-restart: drop half the ledger, delete those day dirs
    val days = committed1.keys.toSeq.sorted
    val dropped = days.take(days.size / 2)
    dropped.foreach { d =>
      Ledger.drop(ledgerDir, d)
      val dir = new java.io.File(s"$outDir/$d")
      if (dir.isDirectory) dir.listFiles().foreach(_.delete())
      dir.delete()
    }
    val r3 = ExtractJob.run(spark, pages, outDir, ledgerDir,
      ExtractPipeline.Conf(repartition = 4))
    assert(r3.daysProcessed.map(s => s"p_day=${s.day}").toSet == dropped.toSet)
    // only uncommitted days were recomputed
    val droppedRows = committed1.filter(e => dropped.contains(e._1)).values.map(_.rows).sum
    assert(r3.docsOk + r3.docsFailed == droppedRows)

    // final table identical to an uninterrupted run
    val after = spark.read.parquet(outDir).orderBy("url").collect()
    assert(after.length == 200)
    assert(after.map(_.getAs[String]("url")).sameElements(full.map(_.getAs[String]("url"))))
    assert(after.map(_.getAs[String]("text")).sameElements(full.map(_.getAs[String]("text"))))
    pages.unpersist()
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }

  test("multimodal: binary plumbing with stubbed decoder") {
    import graft.ops.MultimodalOps
    val media = Seq(
      MultimodalOps.MediaRow(1L, Array[Byte](1, 2, 3, 4)),
      MultimodalOps.MediaRow(2L, Array.emptyByteArray)).toDS()
    val out = MultimodalOps.decodeAll(spark, media).collect().map(m => m.media_id -> m).toMap
    assert(out(1L).byte_len == 4 && out(1L).features.sum == 4f)
    assert(out(2L).byte_len == 0)
  }
}
