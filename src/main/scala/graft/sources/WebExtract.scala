package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The EXTRACTION half of the reference's web-scrape connector
  * (`tools/src/aden_tools/tools/web_scrape_tool/web_scrape_tool.py:
  * 137-197` — everything AFTER the fetch), zero-dependency: the fetch
  * itself (Playwright, robots.txt, stealth) is environment I/O and
  * out of engine scope, exactly as the PDF connector's file I/O was —
  * but what the reference does WITH the HTML is a deterministic
  * transformation, and that is reproduced here:
  *
  *  - noise elements removed subtree-wise: script, style, nav,
  *    footer, header, aside, noscript, iframe (`:141-145`,
  *    BeautifulSoup `decompose()`);
  *  - `title` = the <title> text, stripped (`:148`);
  *  - `description` = <meta name="description"> content (`:150-153`);
  *  - main content = FIRST of: <article>, <main>, any element with
  *    role="main", any element whose class list contains one of
  *    content/post/entry/article-body, else <body> (`:163-169`);
  *  - text = subtree text with single-space separators, whitespace
  *    collapsed (`get_text(separator=" ", strip=True)` + `:171`);
  *  - truncation at maxLength with a "..." suffix (`:173-175`,
  *    bounds 1000..500000 per `:66`);
  *  - links = first 50 <a href>, resolved absolute against the base
  *    URL, empty-text anchors dropped (`:186-196`).
  *
  * Parser: a pragmatic tolerant HTML tokenizer → element tree. Void
  * elements self-close; a mismatched closer pops to its nearest open
  * ancestor or is ignored; comments and CDATA skip; the named
  * entities amp/lt/gt/quot/apos/nbsp plus numeric &#NN;/&#xNN;
  * decode (the common-corpus set — BeautifulSoup's full table is a
  * dependency this engine doesn't take; documented limit).
  *
  * Scale shape: one narrow per-row pass, no shuffle — HTML→text runs
  * where the pages live, the same contract as the multimodal decode
  * tier.
  */
object WebExtract {

  private val NoiseTags = Set("script", "style", "nav", "footer",
    "header", "aside", "noscript", "iframe")
  private val VoidTags = Set("br", "img", "meta", "link", "input",
    "hr", "area", "base", "col", "embed", "source", "track", "wbr")
  private val MainClasses =
    Set("content", "post", "entry", "article-body")

  // --- minimal tolerant DOM ---------------------------------------

  sealed private trait Node
  private case class Elem(tag: String, attrs: Map[String, String],
      children: mutable.ArrayBuffer[Node]) extends Node
  private case class Text(s: String) extends Node

  /** Decode the common entity set; unknown entities pass through
    * verbatim (tolerant, like the rest of the parser). */
  private[sources] def decodeEntities(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val name = if (semi > i && semi - i <= 8) s.substring(i + 1, semi)
          else null
        val decoded: String = name match {
          case null => null
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => " "
          case n if n.startsWith("#x") || n.startsWith("#X") =>
            decodeCodePoint(n.drop(2), 16)
          case n if n.startsWith("#") =>
            decodeCodePoint(n.drop(1), 10)
          case _ => null
        }
        if (decoded != null) { out.append(decoded); i = semi + 1 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Numeric entity → String via surrogate-pair-aware toChars, so
    * astral code points (&#128512;) survive; invalid code points
    * (out of range, surrogates) decode to null → passed through
    * verbatim like any unknown entity. */
  private def decodeCodePoint(digits: String, radix: Int): String =
    try {
      val cp = Integer.parseInt(digits, radix)
      if (Character.isValidCodePoint(cp) &&
          Character.getType(cp) != Character.SURROGATE.toInt)
        new String(Character.toChars(cp))
      else null
    } catch { case _: Exception => null }

  private def parseAttrs(s: String): Map[String, String] = {
    val m = mutable.Map.empty[String, String]
    var i = 0
    while (i < s.length) {
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      val nameStart = i
      while (i < s.length && !s.charAt(i).isWhitespace &&
        s.charAt(i) != '=' && s.charAt(i) != '/') i += 1
      val name = s.substring(nameStart, i).toLowerCase
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (name.nonEmpty) {
        if (i < s.length && s.charAt(i) == '=') {
          i += 1
          while (i < s.length && s.charAt(i).isWhitespace) i += 1
          if (i < s.length && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            val end = s.indexOf(q, i + 1)
            val v = if (end < 0) s.substring(i + 1)
              else s.substring(i + 1, end)
            m(name) = decodeEntities(v)
            i = if (end < 0) s.length else end + 1
          } else {
            val vStart = i
            while (i < s.length && !s.charAt(i).isWhitespace) i += 1
            m(name) = decodeEntities(s.substring(vStart, i))
          }
        } else m(name) = ""
      } else i += 1
    }
    m.toMap
  }

  /** Tolerant parse: returns a synthetic root element. */
  private def parse(html: String): Elem = {
    val root = Elem("#root", Map.empty, mutable.ArrayBuffer.empty)
    val stack = mutable.ArrayBuffer[Elem](root)
    // lowercased once: the raw-text (script/style) closer scan would
    // otherwise re-materialize a full lowercase copy per element,
    // O(n·k) on script-heavy pages
    val htmlLower = html.toLowerCase
    var i = 0
    val n = html.length
    def top = stack.last
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) top.children += Text(decodeEntities(html.substring(i)))
        i = n
      } else {
        if (lt > i)
          top.children += Text(decodeEntities(html.substring(i, lt)))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<![CDATA[", lt)) {
          val end = html.indexOf("]]>", lt + 9)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && html.charAt(lt + 1) == '!') {
          val end = html.indexOf('>', lt) // doctype etc.
          i = if (end < 0) n else end + 1
        } else {
          val gt = html.indexOf('>', lt)
          if (gt < 0) { i = n } // truncated tag: drop
          else {
            val inner = html.substring(lt + 1, gt)
            if (inner.startsWith("/")) {
              val tag = inner.drop(1).trim.toLowerCase
              // pop the matching open ancestor and everything above
              // it; ignore a closer with no open ancestor (tolerance)
              val idx = stack.lastIndexWhere(_.tag == tag)
              if (idx > 0) stack.remove(idx, stack.length - idx)
              i = gt + 1
            } else {
              val selfClose = inner.endsWith("/")
              val body = if (selfClose) inner.dropRight(1) else inner
              val sp = body.indexWhere(_.isWhitespace)
              val tag = (if (sp < 0) body else body.substring(0, sp))
                .toLowerCase
              val attrs =
                if (sp < 0) Map.empty[String, String]
                else parseAttrs(body.substring(sp))
              if (tag == "script" || tag == "style") {
                // raw-text elements: children are NOT markup — scan
                // straight to the closing tag
                val closer = s"</$tag"
                val end = htmlLower.indexOf(closer, gt + 1)
                val elem = Elem(tag, attrs, mutable.ArrayBuffer.empty)
                top.children += elem
                if (end < 0) i = n
                else {
                  elem.children +=
                    Text(html.substring(gt + 1, end))
                  val close = html.indexOf('>', end)
                  i = if (close < 0) n else close + 1
                }
              } else {
                val elem = Elem(tag, attrs, mutable.ArrayBuffer.empty)
                top.children += elem
                if (!selfClose && !VoidTags.contains(tag)) stack += elem
                i = gt + 1
              }
            }
          }
        }
      }
    }
    root
  }

  // --- the reference's extraction steps ---------------------------

  private def collectText(e: Elem, sb: StringBuilder): Unit =
    e.children.foreach {
      case Text(s) => sb.append(s).append(' ')
      case c: Elem if !NoiseTags.contains(c.tag) => collectText(c, sb)
      case _ => ()
    }

  private def findFirst(e: Elem, p: Elem => Boolean): Option[Elem] = {
    if (p(e)) return Some(e)
    e.children.foreach {
      case c: Elem if !NoiseTags.contains(c.tag) =>
        val r = findFirst(c, p)
        if (r.isDefined) return r
      case _ => ()
    }
    None
  }

  private def classTokens(e: Elem): Set[String] =
    e.attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSet

  private def collapse(s: String): String =
    s.split("\\s+").filter(_.nonEmpty).mkString(" ")

  case class Extracted(title: String, description: String,
      content: String, length: Long, links: Seq[(String, String)])

  /** One page through the reference's post-fetch pipeline.
    * `maxLength` clamps to the reference's 1000..500000 bounds. */
  def extract(html: String, baseUrl: String = "",
      maxLength: Int = 50000, includeLinks: Boolean = false): Extracted = {
    val bounded = math.max(1000, math.min(maxLength, 500000))
    val root = parse(if (html == null) "" else html)
    val title = findFirst(root, _.tag == "title")
      .map { t => val sb = new StringBuilder; collectText(t, sb)
        collapse(sb.toString) }.getOrElse("")
    val description = findFirst(root, e => e.tag == "meta" &&
        e.attrs.get("name").contains("description"))
      .flatMap(_.attrs.get("content")).getOrElse("")
    val main = findFirst(root, _.tag == "article")
      .orElse(findFirst(root, _.tag == "main"))
      .orElse(findFirst(root, _.attrs.get("role").contains("main")))
      .orElse(findFirst(root,
        e => classTokens(e).intersect(MainClasses).nonEmpty))
      .orElse(findFirst(root, _.tag == "body"))
      .getOrElse(root)
    val sb = new StringBuilder
    collectText(main, sb)
    var text = collapse(sb.toString)
    // Python slicing counts code points, not UTF-16 units: truncate
    // on a code-point boundary so a surrogate pair never splits.
    if (text.codePointCount(0, text.length) > bounded)
      text = text.substring(0, text.offsetByCodePoints(0, bounded)) + "..."
    val links =
      if (!includeLinks) Seq.empty
      else {
        // find_all('a', href=True)[:50] then drop empty-text anchors:
        // EVERY href-bearing anchor counts toward the 50 cap (so the
        // result can have <50 links); stop descending once 50 seen.
        val acc = mutable.ArrayBuffer.empty[(String, String)]
        var seen = 0
        def walk(e: Elem): Unit = e.children.foreach {
          case c: Elem if !NoiseTags.contains(c.tag) && seen < 50 =>
            if (c.tag == "a" && c.attrs.contains("href")) {
              seen += 1
              val tsb = new StringBuilder
              collectText(c, tsb)
              val t = collapse(tsb.toString)
              val href = resolve(baseUrl, c.attrs("href"))
              if (t.nonEmpty && href.nonEmpty) acc += ((t, href))
            }
            walk(c)
          case _ => () // text nodes, noise subtrees, post-cap elements
        }
        walk(root)
        acc.toSeq
      }
    Extracted(title, description, text, text.length.toLong, links)
  }

  /** `urljoin` semantics via java.net.URI; malformed inputs degrade
    * to the raw href (tolerant, never a dead row). */
  private[sources] def resolve(base: String, href: String): String =
    try {
      if (base == null || base.isEmpty) href
      else new java.net.URI(base).resolve(href).toString
    } catch { case _: Exception => href }

  // --- DataFrame tier ---------------------------------------------

  val extractedSchema: StructType = StructType(Seq(
    StructField("page_id", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("description", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("links", ArrayType(StructType(Seq(
      StructField("text", StringType, nullable = false),
      StructField("href", StringType, nullable = false))),
      containsNull = false), nullable = false)))

  /** Per-partition extraction over a `(page_id, url, html)` frame —
    * the same narrow batch-decode plumbing as the multimodal tier. */
  def extractPages(pages: DataFrame, maxLength: Int = 50000,
      includeLinks: Boolean = true): DataFrame = {
    val spark: SparkSession = pages.sparkSession
    val rdd = pages.select("page_id", "url", "html").rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val ex = extract(
            if (r.isNullAt(2)) "" else r.getString(2),
            if (r.isNullAt(1)) "" else r.getString(1),
            maxLength, includeLinks)
          Row(r.getLong(0), ex.title, ex.description, ex.content,
            ex.length, ex.links.map { case (t, h) => Row(t, h) })
        }
    }
    spark.createDataFrame(rdd, extractedSchema)
  }
}
