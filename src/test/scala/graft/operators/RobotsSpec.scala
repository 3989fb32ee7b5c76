package graft.operators

import graft.SparkTestBase

/** [[Robots]] — RFC 9309 parse + longest-match evaluation. */
class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private def rulesOf(body: String): Set[(String, Boolean, String)] =
    Robots.parseRules(Seq(("d", body)).toDF("domain", "robots_txt"),
        "domain", "robots_txt")
      .collect().map(r => (r.getString(1), r.getBoolean(2), r.getString(3))).toSet

  private def decide(body: String, paths: Seq[String], agent: String = "graftbot")
      : Map[String, (Boolean, Long)] = {
    val rules = Robots.parseRules(
      Seq(("d", body)).toDF("domain", "robots_txt"), "domain", "robots_txt")
    val urls = paths.zipWithIndex.map { case (p, i) => (i.toLong, "d", p) }
      .toDF("id", "domain", "path")
    Robots.evaluate(urls, rules, agent)
      .collect().map(r => r.getString(2) -> ((r.getBoolean(3), r.getLong(4)))).toMap
  }

  test("parser: groups, multi-agent lines, comments, case, no-op empty Disallow, extensions") {
    val body =
      """# a comment line
        |User-Agent: GraftBot
        |user-agent: otherbot
        |Disallow: /a/   # trailing comment
        |ALLOW: /a/b/
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: https://x.invalid/s.xml
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(rulesOf(body) === Set(
      ("graftbot", false, "/a/"), ("graftbot", true, "/a/b/"),
      ("otherbot", false, "/a/"), ("otherbot", true, "/a/b/"),
      ("*", false, "/")))
  }

  test("a User-agent line after rules starts a NEW group, not an addition to the old one") {
    val body = "User-agent: a\nDisallow: /x/\nUser-agent: b\nDisallow: /y/\n"
    assert(rulesOf(body) === Set(("a", false, "/x/"), ("b", false, "/y/")))
  }

  test("longest match wins; Allow wins exact-length ties; no match = allowed") {
    val body = "User-agent: graftbot\nDisallow: /p/\nAllow: /p/ok/\n" +
      "Disallow: /t12/\nAllow: /t34/\n"
    val got = decide(body, Seq("/p/x", "/p/ok/x", "/free", "/t12/z", "/t34/z"))
    assert(got("/p/x") === ((false, 3L)))
    assert(got("/p/ok/x") === ((true, 6L)))
    assert(got("/free") === ((true, 0L)))
    assert(got("/t12/z") === ((false, 5L)))
    assert(got("/t34/z") === ((true, 5L)))
    // a literal equal-length tie: Allow and Disallow on the same prefix
    val tie = decide("User-agent: graftbot\nDisallow: /p/\nAllow: /q/\n" +
      "Disallow: /b/\nAllow: /b/\n", Seq("/b/x"))
    assert(tie("/b/x") === ((true, 3L)))
  }

  test("an exact product-token group shadows the * group entirely") {
    val body = "User-agent: graftbot\nAllow: /only/\n\nUser-agent: *\nDisallow: /\n"
    val got = decide(body, Seq("/anything", "/only/x"))
    // the * Disallow:/ must NOT apply to graftbot
    assert(got("/anything") === ((true, 0L)))
    assert(got("/only/x") === ((true, 6L)))
    // an agent with no exact group falls back to *
    val other = decide(body, Seq("/anything"), agent = "strangerbot")
    assert(other("/anything") === ((false, 1L)))
  }

  test("RFC wildcards: * spans octets, terminal $ anchors, specials stay literal") {
    assert(Robots.patternRegex("/a/*/c") === "^/a/.*/c.*")
    assert(Robots.patternRegex("/x.php$") === "^/x\\.php$")
    val got = decide(
      "User-agent: graftbot\nDisallow: /*/private/\nDisallow: /exact$\n",
      Seq("/a/private/f", "/b/c/private/", "/exact", "/exact/more", "/private/"))
    assert(got("/a/private/f")._1 === false)
    assert(got("/b/c/private/")._1 === false)
    assert(got("/exact") === ((false, 7L)))
    assert(got("/exact/more")._1 === true)
    // /*/private/ needs at least one segment before /private/
    assert(got("/private/")._1 === true)
  }

  test("specificity is OCTET length (RFC 9309): multi-byte chars count per byte") {
    // Both rules match '/é/x'. Allow '/é/' is 3 chars but 4 UTF-8
    // octets; Disallow '/*/x' is 4 chars = 4 octets. Char-length
    // ranking would DISALLOW (4*2=8 beats 3*2+1=7); octet ranking
    // ties the lengths at 4 and the Allow bit wins (9 > 8). rule_len
    // must also report octets, not codepoints.
    val got = decide(
      "User-agent: graftbot\nDisallow: /*/x\nAllow: /é/\n",
      Seq("/é/x", "/a/x"))
    assert(got("/é/x") === ((true, 4L)))
    assert(got("/a/x") === ((false, 4L))) // only the wildcard matches
  }

  test("a domain with no rules at all allows everything by default") {
    val rules = Robots.parseRules(
      Seq(("other", "User-agent: *\nDisallow: /\n")).toDF("domain", "robots_txt"),
      "domain", "robots_txt")
    val urls = Seq((1L, "unruled", "/x")).toDF("id", "domain", "path")
    val got = Robots.evaluate(urls, rules, "graftbot").collect()
    assert(got.length === 1 && got.head.getBoolean(3) && got.head.getLong(4) === 0L)
  }
}
