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

  test("astral code points decode as surrogate pairs; invalid code " +
      "points pass through verbatim") {
    val grin = new String(Character.toChars(0x1F600))
    assert(WebExtract.extract("<body>&#128512;</body>").content === grin)
    assert(WebExtract.extract("<body>&#x1F600;</body>").content === grin)
    // lone surrogate / out-of-range: verbatim, never a bogus char
    assert(WebExtract.extract("<body>&#xD800;</body>").content === "&#xD800;")
    assert(WebExtract.extract("<body>&#1114112;</body>").content
      === "&#1114112;")
    // truncation never splits a surrogate pair (code-point slicing)
    val astral = "<body>" + (grin + " ") * 700 + "</body>"
    val ex = WebExtract.extract(astral, maxLength = 10) // clamped to 1000
    assert(ex.content.endsWith("..."))
    val body = ex.content.dropRight(3)
    assert(body.codePointCount(0, body.length) === 1000)
    assert(!Character.isHighSurrogate(body.last)) // pair intact
  }

  test("link cap counts every href-bearing anchor (find_all[:50] " +
      "then empty-text filter → can return <50)") {
    // anchors 1..60; every 3rd has empty text. find_all[:50] keeps
    // anchors 1..50, then the text filter drops the 16 empty ones
    // (3,6,...,48) → 34 links; anchors 51..60 never considered.
    val body = (1 to 60).map { i =>
      if (i % 3 == 0) s"""<a href="/e$i"></a>"""
      else s"""<a href="/l$i">t$i</a>"""
    }.mkString("<body>", " ", "</body>")
    val ex = WebExtract.extract(body, "https://x.example",
      includeLinks = true)
    assert(ex.links.length === 34)
    assert(ex.links.head === ("t1", "https://x.example/l1"))
    assert(ex.links.last === ("t50", "https://x.example/l50"))
    assert(!ex.links.exists(_._1 == "t52")) // past-cap anchor excluded
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
