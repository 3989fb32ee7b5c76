package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head().getAs[T]("r")

  // Array columns come back as mutable.ArraySeq — getAs[Seq[String]] would
  // ClassCastException on element access; getSeq + toSeq is the safe read.
  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(text).toDF("t").select(c.as("r")).head().getSeq[String](0).toSeq

  test("normText lowers, trims, collapses whitespace") {
    assert(one[String](normText($"t"), "  Hello   WORLD \t x ") == "hello world x")
  }

  test("tokenCountWs: blank is 0, words counted") {
    assert(one[Long](tokenCountWs($"t"), "   ") == 0L)
    assert(one[Long](tokenCountWs($"t"), "a  b c") == 3L)
  }

  test("tokenCountRegex: alpha runs, digit runs, single symbols") {
    // "ab12-cd!" -> ab, 12, -, cd, ! = 5
    assert(one[Long](tokenCountRegex($"t"), "ab12-cd!") == 5L)
  }

  test("wordShingles: n-grams in order; short text yields empty") {
    val sh = oneSeq(wordShingles($"t", 3), "a b c d")
    assert(sh == Seq("a b c", "b c d"))
    assert(oneSeq(wordShingles($"t", 3), "a b") == Seq.empty)
  }

  test("punctRatio and stopwordRatio") {
    assert(one[Double](punctRatio($"t"), "ab!?") == 0.5)
    assert(one[Double](stopwordRatio($"t"), "the cat and dog") == 0.5)
  }

  test("langId picks the language with most markers; und on zero hits") {
    assert(one[String](langId($"t"), "the cat is of the house") == "en")
    assert(one[String](langId($"t"), "der hund und die katze ist") == "de")
    assert(one[String](langId($"t"), "le chat et la maison est") == "fr")
    assert(one[String](langId($"t"), "el perro es una casa los") == "es")
    assert(one[String](langId($"t"), "xyzzy plugh") == "und")
  }

  test("contentFingerprint equals on normalization-equivalent text") {
    val df = Seq(("A  B c", "a b C"), ("abc", "xyz")).toDF("x", "y")
      .select((contentFingerprint($"x") === contentFingerprint($"y")).as("eq"))
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true, false))
  }

  test("qualityScore is in [0,1] and favors clean prose") {
    val clean = one[Double](qualityScore($"t"),
      "the quick brown fox jumps over the lazy dog and runs to the house " * 3)
    val junk = one[Double](qualityScore($"t"), "@@!! ## $$%% ^^&&")
    assert(clean > 0.9 && junk < 0.5 && junk >= 0.0 && clean <= 1.0)
  }

  test("repetitionRatio: duplicate 3-gram fraction, 0 for short/empty text") {
    // "a a a a a": 3 total 3-grams, 1 distinct -> 2/3
    assert(math.abs(one[Double](repetitionRatio($"t"), "a a a a a") - 2.0 / 3) < 1e-9)
    assert(one[Double](repetitionRatio($"t"), "one two three four") == 0.0)
    assert(one[Double](repetitionRatio($"t"), "tiny doc") == 0.0)
    assert(one[Double](repetitionRatio($"t"), "") == 0.0)
  }

  test("scrubPii redacts emails and URLs; URL-embedded userinfo goes with the URL") {
    assert(one[String](scrubPii($"t"), "mail bob.smith+x@corp.io now") == "mail <EMAIL> now")
    assert(one[String](scrubPii($"t"), "see https://a.b/c?d=1 ok") == "see <URL> ok")
    // the @ inside the URL is consumed by the URL scrub, not half-redacted
    assert(one[String](scrubPii($"t"), "go http://u@h.com/p end") == "go <URL> end")
    assert(one[Long](matchCount($"t", emailPattern), "a@b.co and c@d.org") == 2L)
    assert(one[Long](matchCount($"t", urlPattern), "no links here") == 0L)
  }

  test("stripHtml drops script/style whole, strips tags, decodes entities") {
    assert(one[String](stripHtml($"t"),
      "<p>Hello <b>world</b></p>") == "Hello world")
    assert(one[String](stripHtml($"t"),
      "<script>if (a < b) x();</script>after") == "after")
    // scraped HTML is frequently not lowercase — block drop must be (?i)
    assert(one[String](stripHtml($"t"),
      "<SCRIPT>var secret = 1;</SCRIPT>after") == "after")
    assert(one[String](stripHtml($"t"),
      "<Style>p { color: red }</Style>text") == "text")
    assert(one[String](stripHtml($"t"),
      "<style>p { color: red }</style>text") == "text")
    assert(one[String](stripHtml($"t"),
      "A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;!") == "A & B <tag> \"q\" 's' !")
    // &amp;lt; decodes to the LITERAL &lt;, not to < (amp decodes last)
    assert(one[String](stripHtml($"t"), "x &amp;lt; y") == "x &lt; y")
  }

  test("canonicalUrl: case, ports, slashes, fragments, tracking params, param order") {
    def canon(s: String): String = one[String](canonicalUrl($"t"), s)
    // the two URLs a crawler must treat as ONE document
    assert(canon("HTTP://WWW.X.COM:80/a/?utm_source=f&b=2&a=1#top") ==
      "http://www.x.com/a?a=1&b=2")
    assert(canon("http://www.x.com/a?a=1&b=2") == "http://www.x.com/a?a=1&b=2")
    // scheme/host lowercase; PATH case preserved (case-sensitive by RFC)
    assert(canon("HtTpS://WWW.X.com/DOCS/Page") == "https://www.x.com/DOCS/Page")
    // default port strips only for the matching scheme
    assert(canon("https://x.com:443/a") == "https://x.com/a")
    assert(canon("https://x.com:80/a") == "https://x.com:80/a")
    assert(canon("http://x.com:8080/a") == "http://x.com:8080/a")
    // trailing-slash runs collapse; root collapses to bare authority
    assert(canon("http://x.com/docs///") == "http://x.com/docs")
    assert(canon("http://x.com/") == "http://x.com")
    // tracking params go, the rest sort; all-tracking queries vanish
    assert(canon("https://x.com/p?z=9&fbclid=abc&a=1") == "https://x.com/p?a=1&z=9")
    assert(canon("https://x.com/p?gclid=1&ref=tw#frag") == "https://x.com/p")
    // `ref` strips bare or valued, but `refresh` is NOT a tracking param
    assert(canon("https://x.com/p?ref&b=1") == "https://x.com/p?b=1")
    assert(canon("https://x.com/p?refresh=1") == "https://x.com/p?refresh=1")
  }

  test("scriptCounts: per-class character counts over mixed-script text") {
    val mixed = "abc \u0434\u0430\u043d\u043d\u044b\u0435 \u03b4\u03b5\u03b4 \u4e00\u4e8c \u0628\u064a \uac00\uac01"
    val counts = Seq(mixed).toDF("t")
      .select(scriptCounts(org.apache.spark.sql.functions.col("t"))
        .map { case (n, c) => c.as(n) }: _*)
      .head()
    val byName = scriptRanges.map(_._1).zipWithIndex
      .map { case (n, i) => n -> counts.getLong(i) }.toMap
    assert(byName == Map("latin" -> 3L, "cyrillic" -> 6L, "greek" -> 3L,
      "arabic" -> 2L, "cjk" -> 2L, "hangul" -> 2L), s"got $byName")
  }

  test("dominantScript: argmax with first-in-order tie-break, und on none") {
    assert(one[String](dominantScript(org.apache.spark.sql.functions.col("t")),
      "hello \u043c\u0438\u0440") == "latin") // 5 latin > 3 cyrillic
    assert(one[String](dominantScript(org.apache.spark.sql.functions.col("t")),
      "hi \u043f\u0440\u0438\u0432\u0435\u0442") == "cyrillic")
    // tie (2 latin, 2 cyrillic) -> latin, the first class in order
    assert(one[String](dominantScript(org.apache.spark.sql.functions.col("t")),
      "ab \u0434\u0430") == "latin")
    assert(one[String](dominantScript(org.apache.spark.sql.functions.col("t")),
      "1234 !?") == "und")
  }
}
