package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Hand-pinned contracts of the web-preprocessing columns. */
class WebSpec extends SparkTestBase with Matchers {

  private def strip1(s: String): String = {
    val ss = spark
    import ss.implicits._
    Seq(s).toDF("h").select(Web.stripMarkup(col("h"))).head().getString(0)
  }

  test("stripMarkup: element content, tags, comments, entities, whitespace") {
    strip1("<html><body><p>hello <b>world</b></p></body></html>") shouldBe "hello world"
    // script/style CONTENT goes, even with a '<' inside
    strip1("<script>if (1 < 2) alert('x');</script>text") shouldBe "text"
    strip1("<style>p > a { }</style>text") shouldBe "text"
    strip1("before<!-- hidden -->after") shouldBe "before after"
    // entity decode AFTER tag strip: an encoded tag stays literal text
    strip1("&lt;b&gt;not a tag&lt;/b&gt;") shouldBe "<b>not a tag</b>"
    // &amp; decodes last: &amp;lt; is the literal '&lt;', not '<'
    strip1("x &amp;lt; y") shouldBe "x &lt; y"
    strip1("a  b   c") shouldBe "a b c"
    strip1("&#97;&#101;&#111;") shouldBe "aeo"
  }

  test("url parts: host lowercases and drops default ports; domain is last two labels") {
    val ss = spark
    import ss.implicits._
    val rows = Seq(
      "HTTPS://WWW.Example.COM:443/A/B?x=1#f",
      "http://sub.host.example.org:80/",
      "https://example.com:8443/keep-port").toDF("u")
      .select(Web.host(col("u")).as("h"), Web.domain(col("u")).as("d"),
        Web.path(col("u")).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    rows(0) shouldBe (("www.example.com", "example.com", "/A/B"))
    rows(1) shouldBe (("sub.host.example.org", "example.org", "/"))
    // non-default port stays in the authority but never in the domain key
    rows(2) shouldBe (("example.com:8443", "example.com", "/keep-port"))
  }

  test("normalizeUrl: tracking params out, survivors sorted, fragment dropped") {
    val ss = spark
    import ss.implicits._
    def norm(u: String): String =
      Seq(u).toDF("u").select(Web.normalizeUrl(col("u"))).head().getString(0)
    norm("HTTPS://A.Example.COM:443/p?utm_source=x&b=2&a=1&gclid=g#frag") shouldBe
      "https://a.example.com/p?a=1&b=2"
    // no query, no '?'; param order canonicalizes permutations together
    norm("http://h.example.org/x?z=1&a=2") shouldBe norm("http://h.example.org/x?a=2&z=1")
    norm("http://h.example.org/x#only-frag") shouldBe "http://h.example.org/x"
  }

  test("dropBoilerplateLines: per-domain DF >= minDf removes template, keeps content in order") {
    val ss = spark
    import ss.implicits._
    // domain a: HEAD/FOOT in all 3 docs (df=3 => boilerplate at
    // minDf=3); "shared" in only 2 (df=2 => kept). domain b: same
    // HEAD line but df=1 there => kept (DF is per domain).
    val docs = Seq(
      (1L, "a", "HEAD\nbody one\nshared\nFOOT"),
      (2L, "a", "HEAD\nbody two\nshared\nFOOT"),
      (3L, "a", "HEAD\nFOOT\nbody three\nFOOT"), // doubled FOOT: both occurrences go
      (4L, "b", "HEAD\nother body")).toDF("id", "dom", "text")
    val out = Web.dropBoilerplateLines(docs, "id", "dom", "text", minDf = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_lines_removed")))).toMap
    out(1L) shouldBe (("body one\nshared", 4L, 2L))
    out(2L) shouldBe (("body two\nshared", 4L, 2L))
    out(3L) shouldBe (("body three", 4L, 3L))
    out(4L) shouldBe (("HEAD\nother body", 2L, 0L))
  }

  test("learn templates then apply == the one-pass counting operator") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a", "HEAD\nbody one\nFOOT"),
      (2L, "a", "HEAD\nbody two\nFOOT"),
      (3L, "a", "HEAD\nbody three\nFOOT"),
      (4L, "b", "HEAD\nother body")).toDF("id", "dom", "text")
    val templates = Web.boilerplateTemplates(docs, "id", "dom", "text", minDf = 3)
    templates.count() shouldBe 2 // domain a's HEAD + FOOT only
    val applied = Web.dropKnownBoilerplate(docs, "dom", "text", templates)
      .select("id", "clean_text", "n_lines", "n_lines_removed")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val counted = Web.dropBoilerplateLines(docs, "id", "dom", "text", minDf = 3)
      .select("id", "clean_text", "n_lines", "n_lines_removed")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    applied shouldBe counted
  }
}
