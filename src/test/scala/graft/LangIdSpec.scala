package graft

import graft.ops.TextOps

/** Real-language fixtures for the 20-language marker LID and the linear
  * repetition gate (r2 verdict items 7 + 8).
  */
class LangIdSpec extends SparkTestBase {

  // one natural sample per language, built to hit its own stopword
  // profile hardest (da/no differ only in 'med' vs 'jeg' — exactly the
  // real-world ambiguity of that pair)
  private val samples: Seq[(String, String)] = Seq(
    "en" -> "the cat and the dog were in the house that was built for them with care",
    "fr" -> "le chat est dans la maison que vous avez pour les amis pas loin des arbres",
    "es" -> "el perro y los gatos como una familia pero con cuidado para todos más o menos",
    "de" -> "der hund und die katze sind nicht von dem haus mit der tür auf ein dach ist gut",
    "it" -> "il cane che corre per la strada con gli amici sono della città più belli anche questo giorno",
    "pt" -> "os cães e uma casa não ficam com tempo para sair por ali mas são bons e foi bom",
    "nl" -> "de hond en het huis zijn niet van een man met plannen voor later naar huis dat klopt",
    "sv" -> "och det var en dag som är bra på landet av alla för oss med glädje",
    "da" -> "og det var en god dag at gå til byen er fint som altid på torvet ikke sandt med dig",
    "no" -> "og det var en fin dag at jeg går til byen er bra som alltid på torget ikke sant",
    "fi" -> "ja se on hyvä päivä ei hän ollut että oli mutta niin kuin aina",
    "pl" -> "nie wiem czy to jest dobre na pewno że się uda do domu jak zwykle ale po co",
    "cs" -> "to je dobrý den se psem na zahradě že si to užijeme ale jako vždy tak už je to co chtěl",
    "ro" -> "și câinele de la oraș vine cu un prieten este bine pentru cei care nu pleacă din casă",
    "hu" -> "az ember és a kutya hogy nem is volt egy nap van de ez jó volt",
    "tr" -> "bu bir köpek ve ev için de ne güzel bir gün ile ama gibi çok iyi da var",
    "id" -> "yang anjing dan rumah di kota itu dengan teman untuk pergi tidak jauh ini dari sana akan baik",
    "ca" -> "els gossos i les cases amb jardí per als amics com una festa dels veïns més això també val",
    "ru" -> "и в доме не было что на столе с утра это как всегда по плану но хорошо",
    "ar" -> "في البيت من الصباح على الطاولة أن هذا التي كان مع الأصدقاء إلى المساء عن الخطة")

  private def writeDocs(name: String, rows: Seq[(Long, String, Long, String, String)]): String = {
    val d = tmpDir(name)
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_chars", "text", "lang")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("20-language marker profiles identify real-language samples") {
    val rows = samples.zipWithIndex.map { case ((lang, text), i) =>
      (i.toLong, "web", text.length.toLong, text, lang)
    }
    val dir = writeDocs("langid", rows)
    val got = TextOps.langId(spark, dir).select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.zipWithIndex.foreach { case ((lang, _), i) =>
      assert(got(i.toLong) === lang, s"sample $i should be $lang")
    }
  }

  test("CJK char profiles identify unsegmented zh/ja/ko samples (ground truth by doc_id%3)") {
    val rows = (0L until 9L).map(i => (i, "web", 10L, "latin filler words", "en"))
    val dir = writeDocs("langid_cjk", rows)
    val got = TextOps.langIdCjk(spark, dir).select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 9L).foreach { i =>
      val want = (i % 3) match { case 0 => "zh"; case 1 => "ja"; case _ => "ko" }
      assert(got(i) === want, s"doc $i")
    }
  }

  test("zero marker hits stays 'und'") {
    val dir = writeDocs("langid_und",
      Seq((0L, "web", 10L, "zzz qqq xxyy", "en")))
    assert(TextOps.langId(spark, dir).select("lang_pred").collect().head.getString(0) === "und")
  }

  test("repetition top-count is linear: 60k distinct bigrams in one row") {
    // the old per-distinct filter scan is O(d²) = 3.6e9 lambda evals for
    // this row (minutes); the sort + run-length fold finishes in seconds
    val n = 60000
    val text = (0 until n).map(i => s"w$i").mkString(" ") + " w0 w1"
    val dir = writeDocs("rep_linear", Seq((0L, "web", text.length.toLong, text, "en")))
    val t0 = System.nanoTime()
    val r = TextOps.repetitionGate(spark, dir)
      .select("n_bigrams", "n_distinct", "top_count").collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.getLong(0) === (n + 1).toLong)
    assert(r.getLong(1) === n.toLong)     // "w0 w1" repeats once
    assert(r.getLong(2) === 2L)           // top bigram "w0 w1" occurs twice
    assert(secs < 60.0, s"repetition gate took $secs s — quadratic regression?")
  }

  test("repetitive doc: top bigram dominates and fails the gate") {
    val text = Array.fill(500)("spam ham").mkString(" ")
    val dir = writeDocs("rep_spam", Seq((0L, "web", text.length.toLong, text, "en")))
    val r = TextOps.repetitionGate(spark, dir)
      .select("top_count", "repetition_ok").collect().head
    assert(r.getLong(0) === 500L)
    assert(!r.getBoolean(1))
  }
}
