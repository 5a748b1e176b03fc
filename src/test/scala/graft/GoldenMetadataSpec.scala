package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** One hand-written realistic magazine page graded across the ENTIRE
  * metadata tier at once — every kernel reads the same bytes the others
  * do, so a tokenizer regression in any attrs-mode event surfaces here
  * even if the per-kernel unit specs still pass. Expectations are
  * hand-derived from the fixture, not frozen from output.
  */
class GoldenMetadataSpec extends AnyFunSuite {

  private val url = "https://meridian.example/rail/night-trains?utm_source=x"
  private lazy val html = new String(
    Files.readAllBytes(Paths.get("src/test/resources/goldens/magazine_article.html")), UTF_8)

  test("head metadata: title entities, description, og:title, canonical") {
    val m = graft.kernels.MetaKernel.extract(html, url)
    assert(m.title === "The Quiet Comeback of Night Trains — Meridian Magazine")
    assert(m.description ===
      "Sleeper services are returning to Europe's rails — and this time the economics might work.")
    assert(m.ogTitle === "The Quiet Comeback of Night Trains")
    assert(m.canonical === "https://meridian.example/rail/night-trains")
  }

  test("article tier: JSON-LD behind decoys, date ladder, pagination") {
    val a = graft.kernels.ArticleKernel.extract(html, url)
    assert(a.headline === "The Quiet Comeback of Night Trains")
    assert(a.author === "Ines Okafor")
    assert(a.datePublished === "2024-11-08T06:30:00+01:00")
    assert(a.pubDate === "2024-11-08" && a.pubSrc === "meta")
    assert(a.nextUrl === "https://meridian.example/rail/night-trains?page=2")
    assert(a.prevUrl === "")
    assert(!a.soft404)
  }

  test("compliance: noai token and TDM reservation both block training") {
    val c = graft.kernels.ComplianceKernel.extract(html, url)
    assert(c.noai && !c.noindex && !c.noimageai)
    assert(c.tdm === "1")
    assert(c.ccCode === "by-nc-4.0")
    assert(c.licenseUrl === "https://creativecommons.org/licenses/by-nc/4.0/")
    assert(!c.allowedTraining)
  }

  test("i18n: declared lang, og:locale, hreflang cluster without the RSS decoy") {
    val i = graft.kernels.I18nKernel.extract(html, url)
    assert(i.htmlLang === "en" && i.htmlLangRaw === "en-GB")
    assert(i.ogLocale === "en_GB")
    assert(i.alternates === List(
      ("de", "https://meridian.example/de/rail/nachtzuege"),
      ("fr", "https://meridian.example/fr/rail/trains-de-nuit"),
      ("x-default", "https://meridian.example/rail/night-trains")))
  }

  test("images: srcset widths parsed, widest variant picked, alt collapsed") {
    val imgs = graft.kernels.ImageKernel.extract(html, url)
    assert(imgs.size === 1)
    val img = imgs.head
    assert(img.url === "https://meridian.example/img/nightjet-platform.jpg")
    assert(img.alt === "A sleeper train waits at a dim platform in Vienna")
    assert(img.nVariants === 2)
    assert(img.bestVariant === "https://meridian.example/img/nightjet-platform-1280.jpg")
  }

  test("no meta refresh; trap gate passes a normal editorial URL") {
    assert(graft.kernels.RefreshKernel.extract(html, url) === None)
    assert(!graft.kernels.UrlTrapKernel.classify(url).isTrap)
  }
}
