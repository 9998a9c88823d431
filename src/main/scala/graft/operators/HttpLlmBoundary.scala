package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions

/** HTTP-backed [[Routing.LlmBoundary]] (VERDICT r9 missing #1): one
  * live-client implementation of the three LLM hooks the reference
  * calls a model for — LLM_DECIDE edge traversal (`edge.py:206-274`),
  * the conversation judge (`event_loop_node.py:1839-1931`), and
  * output cleaning (`output_cleaner.py:209+`).
  *
  * Design constraint (the boundary's own contract, Routing.scala):
  * hooks return COLUMNS that compose into the same when-chains and
  * projections the deterministic fallbacks use — a plugged client
  * changes DECISIONS, never plan shapes. So every HTTP call happens
  * DRIVER-SIDE at column-build time, memoized per distinct request:
  *
  *  - [[decideEdge]] asks once per (source, target) edge —
  *    `{"hook":"decide_edge","source":…,"target":…}` →
  *    `{"decision":"traverse"|"block"|"fallback"}`. `traverse`/
  *    `block` bake a literal into the routing chain; `fallback`, a
  *    non-2xx status, a timeout, or an unparseable body all route on
  *    source success — exactly the reference's on-LLM-failure
  *    behavior (`edge.py:271-274`).
  *  - [[judgeVerdict]] fetches the judge POLICY once —
  *    `{"hook":"judge_verdict"}` →
  *    `{"require_no_tool_calls":b,"require_no_missing_keys":b,
  *    "retry_on_nullable_none":b}` — and composes the accept
  *    predicate from it; all-true is bit-for-bit
  *    [[Routing.implicitJudge]], and any transport/parse failure
  *    falls back to it.
  *  - [[cleanOutput]] fetches a cleaning directive once —
  *    `{"hook":"clean_output"}` → `{"strip_prefix_regex":"…"}` — and
  *    strips the matched prefix before the deterministic
  *    balanced-brace extraction; absent/invalid directive (including
  *    a regex Spark rejects) degrades to the plain
  *    [[graft.functions.JsonRepair.extractJson]] fallback.
  *
  * A PER-ROW model call (sending each row's conversation over the
  * wire) is deliberately out: that is the serving tier's
  * mapInPandas/async-executor territory (SURVEY §7.4/§7.5), and it
  * would put a network round-trip inside a query plan. The driver-
  * side resolution here is what keeps g04-class routing identical in
  * shape with and without a live client — the spec asserts exactly
  * that against a recorded-response replay server.
  *
  * Config switch: [[HttpLlmBoundary.fromConf]] reads
  * `spark.graft.llm.endpoint`; unset → [[Routing.LlmBoundary.Fallback]]
  * (the engine analyzes identically with no client plugged).
  */
final class HttpLlmBoundary(
    endpoint: String,
    timeoutMs: Long = 10000L,
    maxRetries: Int = 1) extends Routing.LlmBoundary {

  require(endpoint.nonEmpty, "endpoint must be non-empty")
  require(timeoutMs > 0, s"timeoutMs must be positive, got $timeoutMs")
  require(maxRetries >= 0, s"maxRetries must be >= 0, got $maxRetries")

  // driver-side only; @transient so a boundary captured in a plan's
  // closure never ships a connection pool to executors
  @transient private lazy val client: HttpClient = HttpClient
    .newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .build()

  // request body → response body; one wire call per DISTINCT request
  // for the lifetime of this boundary (an edge chain re-planned per
  // round asks once, not once per round)
  private val memo = TrieMap.empty[String, Option[String]]

  /** POST the request json; Some(body) on 2xx, None on any failure
    * (non-2xx, timeout, connect error) after `maxRetries` retries. */
  private[operators] def call(requestJson: String): Option[String] =
    memo.getOrElseUpdate(requestJson, {
      def once(): Option[String] =
        try {
          val resp = client.send(
            HttpRequest.newBuilder(URI.create(endpoint))
              .timeout(Duration.ofMillis(timeoutMs))
              .header("Content-Type", "application/json")
              .POST(HttpRequest.BodyPublishers.ofString(requestJson,
                UTF_8))
              .build(),
            HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() >= 200 && resp.statusCode() < 300)
            Some(resp.body())
          else None
        } catch { case _: Exception => None }
      Iterator.continually(once()).take(maxRetries + 1)
        .collectFirst { case Some(b) => Some(b) }
        .getOrElse(None)
    })

  /** Minimal flat-JSON field read (the responses are one-level
    * objects); None when the key is absent or the body malformed. */
  private def field(body: String, key: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(key) +
        "\"\\s*:\\s*(\"((?:[^\"\\\\]|\\\\.)*)\"|true|false|null)")
      .matcher(body)
    if (!m.find()) None
    else Option(m.group(2)).map(unescape).orElse(Option(m.group(1)))
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
      .replace("\\n", "\n").replace("\\t", "\t")

  override def decideEdge(source: String, target: String,
      successCol: Column): Column = {
    val req = "{\"hook\":\"decide_edge\",\"source\":" +
      Sessions.jsonEscape(source) + ",\"target\":" +
      Sessions.jsonEscape(target) + "}"
    call(req).flatMap(field(_, "decision")) match {
      case Some("traverse") => lit(true)
      case Some("block") => lit(false)
      // "fallback", unknown decisions, transport/parse failures:
      // route on source success (edge.py:271-274)
      case _ => successCol
    }
  }

  override def judgeVerdict(toolCalls: Column, missingKeys: Column,
      nullableOnlyNoneSet: Column): Column = {
    val resp = call("{\"hook\":\"judge_verdict\"}")
    def flag(k: String): Boolean =
      // absent flag = the implicit judge's behavior for that clause
      resp.flatMap(field(_, k)).forall(_ != "false")
    if (resp.isEmpty)
      Routing.implicitJudge(toolCalls, missingKeys, nullableOnlyNoneSet)
    else {
      val accept = Seq(
        if (flag("require_no_tool_calls")) Some(size(toolCalls) === 0)
        else None,
        if (flag("require_no_missing_keys")) Some(size(missingKeys) === 0)
        else None,
        if (flag("retry_on_nullable_none")) Some(!nullableOnlyNoneSet)
        else None).flatten
        .reduceOption(_ && _).getOrElse(lit(true))
      when(accept, "accept").otherwise("retry")
    }
  }

  override def cleanOutput(raw: Column): Column = {
    val stripped = call("{\"hook\":\"clean_output\"}")
      .flatMap(field(_, "strip_prefix_regex"))
      .filter(_.nonEmpty)
      .flatMap { pat =>
        // validate the pattern HERE: an invalid regex degrades to the
        // deterministic fallback instead of failing the plan at run
        try { java.util.regex.Pattern.compile(pat); Some(pat) }
        catch { case _: Exception => None }
      }
      .map(pat => regexp_replace(raw, "^(?s)(?:" + pat + ")", ""))
      .getOrElse(raw)
    graft.functions.JsonRepair.extractJson(stripped)
  }
}

object HttpLlmBoundary {
  /** Session-conf key naming the decision service endpoint. */
  val EndpointKey = "spark.graft.llm.endpoint"

  /** The config switch: `spark.graft.llm.endpoint` set → a live
    * [[HttpLlmBoundary]]; unset → the deterministic
    * [[Routing.LlmBoundary.Fallback]]. */
  def fromConf(spark: SparkSession): Routing.LlmBoundary =
    spark.conf.getOption(EndpointKey)
      .filter(_.nonEmpty)
      .map(new HttpLlmBoundary(_))
      .getOrElse(Routing.LlmBoundary.Fallback)
}
