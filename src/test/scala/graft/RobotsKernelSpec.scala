package graft

import graft.kernels.RobotsKernel
import graft.kernels.RobotsKernel.{isAllowed, matches, parse, AllowAll}
import org.scalatest.funsuite.AnyFunSuite

class RobotsKernelSpec extends AnyFunSuite {

  test("pattern matching: prefix, wildcard, end anchor") {
    assert(matches("/dir/", "/dir/page.html"))
    assert(!matches("/dir/", "/dirx/page.html"))
    assert(matches("/*.tmp$", "/a/b/x.tmp"))
    assert(!matches("/*.tmp$", "/a/b/x.tmpq"))
    assert(matches("/a*z", "/aXXXz-and-more"))
    assert(matches("/*/c", "/a/b/c"))
    assert(matches("/fish*", "/fishheads"))
    assert(!matches("/fish$", "/fishheads"))
    assert(matches("/fish$", "/fish"))
    // hostile many-star pattern completes (BitSet DP, no backtracking blowup)
    assert(matches("/*a*a*a*a*a*a*a*a*a*a*b", "/" + "a" * 60 + "b"))
    assert(!matches("/*a*a*a*a*a*a*a*a*a*a*b", "/" + "a" * 60 + "c"))
  }

  test("longest match wins; allow wins ties; no match allows") {
    val rs = RobotsKernel.RuleSet(Vector(
      RobotsKernel.Rule(allow = false, "/p/"),
      RobotsKernel.Rule(allow = true, "/p/ok/")))
    assert(!isAllowed(rs, "/p/x.html"))
    assert(isAllowed(rs, "/p/ok/x.html"))
    assert(isAllowed(rs, "/q/x.html"))
    val tie = RobotsKernel.RuleSet(Vector(
      RobotsKernel.Rule(allow = false, "/page"),
      RobotsKernel.Rule(allow = true, "/page")))
    assert(isAllowed(tie, "/page.html"))
    assert(isAllowed(AllowAll, "/anything"))
  }

  test("group selection: named beats *, longest token, merge same-agent groups") {
    val txt =
      """User-agent: otherbot
        |Disallow: /
        |
        |User-agent: graft
        |Disallow: /g/
        |
        |User-agent: graftbot
        |Disallow: /gb/
        |
        |User-agent: *
        |Disallow: /all/
        |
        |User-agent: graftbot
        |Disallow: /gb2/
        |""".stripMargin
    val rs = parse(txt, "graftbot")
    // longest matching token (graftbot > graft) wins; both graftbot groups merge
    assert(rs.rules.map(_.pattern).sorted === Vector("/gb/", "/gb2/"))
    assert(!isAllowed(rs, "/gb/x") && !isAllowed(rs, "/gb2/x"))
    assert(isAllowed(rs, "/all/x") && isAllowed(rs, "/g/x") && isAllowed(rs, "/x"))
    // unknown agent falls to the * group
    val star = parse(txt, "randombot")
    assert(!isAllowed(star, "/all/x") && isAllowed(star, "/gb/x"))
  }

  test("parsing: comments, case-insensitive fields, empty disallow, crawl-delay") {
    val txt =
      """# top comment
        |USER-AGENT: GraftBot  # inline comment
        |DISALLOW: /a/
        |Crawl-delay: 2
        |disallow:
        |allow: /a/ok/
        |""".stripMargin
    val rs = parse(txt, "graftbot")
    assert(rs.rules === Vector(
      RobotsKernel.Rule(allow = false, "/a/"),
      RobotsKernel.Rule(allow = true, "/a/ok/")))
    assert(isAllowed(rs, "/b/x")) // empty disallow contributed nothing
  }

  test("multiple UA lines share one group; rules end UA collection") {
    val txt =
      """User-agent: botA
        |User-agent: graftbot
        |Disallow: /shared/
        |User-agent: botB
        |Disallow: /b/
        |""".stripMargin
    val rs = parse(txt, "graftbot")
    assert(rs.rules.map(_.pattern) === Vector("/shared/"))
    assert(parse(txt, "bota").rules.map(_.pattern) === Vector("/shared/"))
    assert(parse(txt, "botb").rules.map(_.pattern) === Vector("/b/"))
  }

  test("generator fixtures: closed-form verdicts hold on a doc sweep") {
    (0L until 400L).foreach { d =>
      val h = d % 20
      val rs = parse(graft.gen.LinkGen.robotsTxt(h), "graftbot")
      val got = isAllowed(rs, graft.gen.LinkGen.fetchPath(d))
      val want = (d % 5) match {
        case 0 => d % 3 != h % 3
        case 3 => h % 4 != 0
        case _ => true
      }
      assert(got === want, s"doc $d host $h path ${graft.gen.LinkGen.fetchPath(d)}")
    }
  }
}
