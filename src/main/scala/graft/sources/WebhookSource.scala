package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Webhook ingest source (SURVEY §2.1; reference
  * `runtime/webhook_server.py` + `event_bus.py:926-948`).
  *
  * The reference's embedded HTTP server does exactly one thing per
  * request: route-match → HMAC-verify → parse body → publish a
  * `webhook_received` AgentEvent. The Spark-native split puts the
  * HTTP listener outside the engine (any collector appending request
  * envelopes to a drop directory / Kafka topic) and re-expresses the
  * entire decision pipeline as columnar transforms, so ingest scales
  * with partitions and replays deterministically over historical
  * request logs.
  *
  * Request envelope layout (what a collector writes per request):
  * `path, method, headers MAP, query_params MAP, body STRING, ts`.
  *
  * Outcomes mirror `webhook_server.py:105-143`: unknown path → 404,
  * method not registered for the route → 405 (aiohttp router
  * behavior), bad/missing HMAC signature when the route has a secret
  * → 401, else 202 + an event row. Non-JSON bodies become
  * `{"raw_body": ...}` payloads; empty bodies `{}`.
  *
  * HMAC-SHA256 runs entirely in codegen'd builtins: the RFC 2104
  * inner/outer key blocks are precomputed per ROUTE (routes are tiny,
  * driver-side), so the per-request work is
  * `sha2(okey ‖ raw(sha2(ikey ‖ body)))` — two hashes, no UDF.
  */
object WebhookSource {

  /** A registered webhook route (`webhook_server.py:22-29`). */
  final case class WebhookRoute(
      sourceId: String,
      path: String,
      methods: Seq[String],
      secret: Option[String] = None)

  /** RFC 2104 key blocks: key padded to the 64-byte SHA-256 block
    * (pre-hashed if longer), XOR 0x36 / 0x5c. */
  private[sources] def hmacBlocks(secret: String): (Array[Byte], Array[Byte]) = {
    val raw = secret.getBytes(StandardCharsets.UTF_8)
    val key = if (raw.length > 64)
      java.security.MessageDigest.getInstance("SHA-256").digest(raw)
    else raw
    val padded = java.util.Arrays.copyOf(key, 64)
    (padded.map(b => (b ^ 0x36).toByte), padded.map(b => (b ^ 0x5c).toByte))
  }

  /** Routes as a broadcastable frame with precomputed HMAC blocks. */
  def routesDf(spark: SparkSession, routes: Seq[WebhookRoute]): DataFrame = {
    import spark.implicits._
    routes.map { r =>
      val blocks = r.secret.map(hmacBlocks)
      (r.path, r.sourceId, r.methods,
        blocks.map(_._1).orNull, blocks.map(_._2).orNull)
    }.toDF("route_path", "source_id", "route_methods", "ikey", "okey")
  }

  /** Lowercase-hex HMAC-SHA256 of `bodyBin` (already binary) under
    * the route's key blocks. */
  private def hmacHex(bodyBin: Column, ikey: Column, okey: Column): Column =
    sha2(concat(okey, unhex(sha2(concat(ikey, bodyBin), 256))), 256)

  /** Classify every request and build its event payload. Output =
    * request columns + `source_id`, `status` (202/401/404/405) and,
    * for accepted rows, the reference-layout event fields. Batch and
    * streaming frames both work — everything is stateless projection
    * against a broadcast of the (tiny) route table. */
  def ingest(requests: DataFrame, routes: DataFrame): DataFrame = {
    val joined = requests.join(broadcast(routes),
      requests("path") === routes("route_path"), "left")
    // HTTP header names are case-insensitive (and lowercase on the
    // wire under HTTP/2) — match like the reference's CIMultiDict
    // does; header maps are tiny, so the per-row HOF scan is cheap
    val sigHeader = coalesce(
      try_element_at(expr(
        "transform(filter(map_entries(headers), " +
          "e -> lower(e.key) = 'x-hub-signature-256'), e -> e.value)"),
        lit(1)), lit(""))
    // full-string compare: a valid digest with trailing garbage is
    // still a bad signature (webhook_server.py:152-158). The digest
    // input is the RAW request bytes: when the collector recorded a
    // body that does not round-trip UTF-8 it carries `body_b64`
    // alongside (see [[requestSchema]]) and the engine verifies over
    // those exact bytes — re-encoding the lossy string would disagree
    // with the listener on precisely the inputs HMAC protects
    val bodyBin =
      if (requests.columns.contains("body_b64"))
        coalesce(unbase64(col("body_b64")),
          coalesce(col("body"), lit("")).cast("binary"))
      else coalesce(col("body"), lit("")).cast("binary")
    val sigOk = col("ikey").isNull ||
      sigHeader === concat(lit("sha256="),
        hmacHex(bodyBin, col("ikey"), col("okey")))
    val status = when(col("route_path").isNull, lit(404))
      .when(!array_contains(col("route_methods"), col("method")), lit(405))
      .when(!sigOk, lit(401))
      .otherwise(lit(202))
    // json.loads-parseable bodies pass through as the payload JSON
    // text; anything else wraps as raw_body (webhook_server.py:127-131)
    val payload = when(length(trim(coalesce(col("body"), lit("")))) === 0,
        lit("{}"))
      .when(try_parse_json(col("body")).isNotNull, col("body"))
      .otherwise(to_json(map(lit("raw_body"), col("body"))))
    joined
      .withColumn("status", status)
      .withColumn("payload", payload)
  }

  /** Accepted requests as reference-layout events
    * (`event_bus.py:926-948`: type=webhook_received, stream_id=source
    * id, data carrying path/method/headers/payload/query_params) —
    * feed straight into `EventStream.normalizeReferenceEvents`. */
  def events(classified: DataFrame): DataFrame =
    classified.filter(col("status") === 202)
      .select(
        lit("webhook_received").as("type"),
        col("source_id").as("stream_id"),
        lit(null).cast("string").as("node_id"),
        lit(null).cast("string").as("execution_id"),
        map(
          lit("path"), col("path"),
          lit("method"), col("method"),
          lit("headers"), to_json(col("headers")),
          lit("payload"), col("payload"),
          lit("query_params"),
          to_json(coalesce(col("query_params"),
            map().cast("map<string,string>")))).as("data"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
          .as("timestamp"),
        lit(null).cast("string").as("correlation_id"),
        lit(null).cast("string").as("graph_id"))

  /** The request-envelope schema a collector writes. `body_b64` is
    * set ONLY when the raw request bytes do not round-trip UTF-8
    * (binary payloads): `body` stays the lossy string for the payload
    * tier, `body_b64` carries the exact bytes for HMAC re-verification. */
  val requestSchema: String =
    "path STRING, method STRING, headers MAP<STRING,STRING>, " +
      "query_params MAP<STRING,STRING>, body STRING, " +
      "body_b64 STRING, ts TIMESTAMP"

  /** Streaming ingest from a drop directory of request-envelope JSONL. */
  def fromDropDir(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(requestSchema).json(dir)
}
