package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 9309 robots.txt semantics: the published group-selection and
  * longest-match precedence cases, wildcard/anchor patterns, and the
  * Column compilation agreeing with the driver-side mirror. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def ok(txt: String, agent: String, path: String): Boolean =
    Robots.allows(Robots.policyFor(txt, agent), path)

  test("longest match wins; allow beats disallow on a tie") {
    val txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b\n"
    assert(ok(txt, "bot", "/a/b"))        // 4-octet allow > 3-octet disallow
    assert(ok(txt, "bot", "/a/b/deep"))   // prefix semantics
    assert(!ok(txt, "bot", "/a/c"))       // only the disallow matches
    assert(ok(txt, "bot", "/other"))      // nothing matches -> allow
    val tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert(ok(tie, "bot", "/page"))       // equal octets -> allow wins
  }

  test("* and $ wildcards; $ is an anchor, not an octet") {
    val txt = "User-agent: *\nDisallow: /img/*.png$\n"
    assert(!ok(txt, "bot", "/img/a.png"))
    assert(!ok(txt, "bot", "/img/deep/dir/b.png"))
    assert(ok(txt, "bot", "/img/a.png.html")) // $ anchors the end
    assert(ok(txt, "bot", "/img/a.gif"))
    // specificity of '/*.php$' (7 octets) > '/x' (2): the anchored rule
    // decides /x.php even though both match
    val two = "User-agent: *\nAllow: /x\nDisallow: /*.php$\n"
    assert(!ok(two, "bot", "/x.php"))
    assert(ok(two, "bot", "/x.html"))
  }

  test("exact agent group outranks *, matching is case-insensitive, groups merge") {
    val txt =
      """User-agent: graft
        |Disallow: /private
        |
        |User-agent: *
        |Allow: /
        |
        |User-Agent: GRAFT
        |Disallow: /beta
        |""".stripMargin
    assert(!ok(txt, "Graft", "/private/x"))
    assert(!ok(txt, "graft", "/beta"))     // both exact groups merge
    assert(ok(txt, "graft", "/public"))
    assert(ok(txt, "other", "/private/x")) // * group allows everything
  }

  test("multiple user-agent lines head one group; a new UA after rules starts another") {
    val txt =
      """User-agent: a
        |User-agent: b
        |Disallow: /x
        |User-agent: c
        |Disallow: /y
        |""".stripMargin
    assert(!ok(txt, "a", "/x") && !ok(txt, "b", "/x"))
    assert(ok(txt, "a", "/y") && ok(txt, "b", "/y"))
    assert(!ok(txt, "c", "/y") && ok(txt, "c", "/x"))
  }

  test("empty Disallow is no rule; comments, unknown keys, junk lines ignored") {
    val txt =
      """# welcome crawlers
        |User-agent: * # inline comment
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: https://example.com/sitemap.xml
        |not a rule line
        |""".stripMargin
    assert(ok(txt, "bot", "/anything"))
    assert(Robots.policyFor(txt, "bot").isEmpty)
  }

  test("sitemaps: group-independent records in file order, URL colon intact") {
    val txt =
      """Sitemap: https://example.com/sitemap.xml
        |User-agent: *
        |Disallow: /x
        |SITEMAP: https://example.com/news.xml
        |Sitemap:
        |""".stripMargin
    assert(Robots.sitemaps(txt) ==
      Seq("https://example.com/sitemap.xml", "https://example.com/news.xml"))
    // sitemap lines never leak into the rule groups
    assert(Robots.policyFor(txt, "bot").map(_.pattern) == Seq("/x"))
  }

  test("no matching group and no * group means crawl allowed") {
    val txt = "User-agent: othercrawler\nDisallow: /\n"
    assert(ok(txt, "graft", "/x"))
    assert(!ok(txt, "othercrawler", "/x"))
  }

  test("allowsColumn agrees with the driver-side mirror on every case") {
    val txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b\nDisallow: /*9$\nDisallow: /img/*.png$\n"
    val rules = Robots.policyFor(txt, "bot")
    val paths = Seq("/a/b", "/a/c", "/a/b9", "/item/19", "/item/10",
      "/img/x.png", "/img/x.png.html", "", "/")
    val got = paths.toDF("path")
      .select(col("path"), Robots.allowsColumn(rules, col("path")).as("ok"))
      .as[(String, Boolean)].collect().toMap
    paths.foreach { p =>
      assert(got(p) == Robots.allows(rules, p), s"disagree on '$p'")
    }
    // and the chain stays a pure projection: no exchange in the plan
    val plan = paths.toDF("path")
      .select(Robots.allowsColumn(rules, col("path")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
