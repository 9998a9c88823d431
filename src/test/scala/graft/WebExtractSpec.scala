package graft

import org.apache.spark.sql.Row

import graft.sources.WebExtract

/** The reference web-scrape tool's POST-FETCH extraction contract
  * (`web_scrape_tool.py:137-197`), mirrored over hand-built HTML —
  * the same fixture strategy its own `test_web_scrape_tool.py` uses
  * (mocked fetch, real parsing). */
class WebExtractSpec extends SparkTestBase {

  private val page =
    """<!DOCTYPE html>
      |<html><head>
      |  <title> The &amp; Page </title>
      |  <meta name="description" content="A test page">
      |  <style>body { color: red; }</style>
      |  <script>var x = "<b>not text</b>";</script>
      |</head><body>
      |  <nav><a href="/home">Home</a> menu text</nav>
      |  <header>site header</header>
      |  <article>
      |    <h1>Headline</h1>
      |    <p>First &lt;paragraph&gt; with <b>bold</b> text.</p>
      |    <a href="/rel/path">Relative</a>
      |    <a href="https://other.example/x">Absolute</a>
      |    <a href="#frag">Fragment</a>
      |    <a href="empty.html"></a>
      |  </article>
      |  <footer>copyright</footer>
      |</body></html>""".stripMargin

  test("extract: noise removed, article preferred, entities decoded, " +
      "whitespace collapsed (web_scrape_tool.py:141-171)") {
    val ex = WebExtract.extract(page, "https://site.example/dir/page")
    assert(ex.title === "The & Page")
    assert(ex.description === "A test page")
    // article subtree only: no nav/header/footer/script/style text
    assert(ex.content ===
      "Headline First <paragraph> with bold text. Relative Absolute Fragment")
    assert(ex.length === ex.content.length.toLong)
  }

  test("links: first-50 cap semantics, relative→absolute resolution, " +
      "fragments kept, empty-text anchors dropped, nav links excluded " +
      "with the noise subtree (:186-196)") {
    val ex = WebExtract.extract(page, "https://site.example/dir/page",
      includeLinks = true)
    assert(ex.links === Seq(
      ("Relative", "https://site.example/rel/path"),
      ("Absolute", "https://other.example/x"),
      ("Fragment", "https://site.example/dir/page#frag")))
  }

  test("main-content fallback chain: main → role=main → content " +
      "class → body (:163-169)") {
    def content(html: String): String =
      WebExtract.extract(html).content
    assert(content("<body><main>M</main><p>rest</p></body>") === "M")
    assert(content("<body><div role=\"main\">R</div>x</body>") === "R")
    assert(content(
      "<body><div class=\"wide content\">C</div>x</body>") === "C")
    assert(content("<body>just the body</body>") === "just the body")
  }

  test("truncation: maxLength clamps to 1000..500000 and appends " +
      "'...' (:66,:173-175)") {
    val long = "<body>" + ("word " * 400) + "</body>" // 2000 chars
    val ex = WebExtract.extract(long, maxLength = 10) // clamped to 1000
    assert(ex.content.length === 1003)
    assert(ex.content.endsWith("..."))
  }

  test("tolerant parse: unclosed tags, stray closers, truncated " +
      "markup, null input — never a crash") {
    assert(WebExtract.extract("<body><p>a<p>b</body>").content === "a b")
    assert(WebExtract.extract("</div><body>x</body>").content === "x")
    assert(WebExtract.extract("<body>y<div attr").content === "y")
    assert(WebExtract.extract(null).content === "")
    // numeric entities, hex form
    assert(WebExtract.extract("<body>&#65;&#x42;</body>").content === "AB")
  }

  test("extractPages: per-partition DataFrame tier with typed links") {
    val rows = java.util.Arrays.asList(
      Row(1L, "https://site.example/", page),
      Row(2L, "https://site.example/", null))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("page_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("html",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(rows, schema)
    val out = WebExtract.extractPages(df).orderBy("page_id").collect()
    assert(out(0).getAs[String]("title") === "The & Page")
    assert(out(0).getAs[Seq[Row]]("links").length === 3)
    assert(out(1).getAs[String]("content") === "")
    assert(out(1).getAs[Long]("length") === 0L)
  }
}
