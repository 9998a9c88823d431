package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.streaming.EventStream.{AgentEvent, Subscription}

/** SSE egress sink (SURVEY §2.1; reference
  * `core/framework/server/sse.py` + `server/routes_events.py`).
  *
  * The reference pushes a per-client filtered event stream over HTTP
  * as server-sent events. The Spark-native split: frame FORMATTING
  * and event FILTERING are columnar (codegen'd, testable, identical
  * in batch replay and live streaming); the socket write is a
  * `foreachBatch` boundary taking any `push` callback, one channel
  * per partition — the same connection-reuse seam as every external
  * egress in the engine.
  *
  * Wire format (`sse.py:53-63`): optional `id:` line, optional
  * `event:` line, `data: <json>` line, blank-line terminator; the
  * keepalive heartbeat is the comment frame `: keepalive\n\n`
  * (`sse.py:66-70`).
  */
object SseSink {

  /** Every EventType the bus defines (`event_bus.py:63-135`) — the
    * validation domain for requested filters, wider than the default
    * client-facing set below. */
  val knownEventTypes: Set[String] = Set(
    "execution_started", "execution_completed", "execution_failed",
    "execution_paused", "execution_resumed", "state_changed",
    "state_conflict", "goal_progress", "goal_achieved",
    "constraint_violation", "stream_started", "stream_stopped",
    "node_loop_started", "node_loop_iteration", "node_loop_completed",
    "node_action_plan", "llm_text_delta", "llm_reasoning_delta",
    "llm_turn_complete", "tool_call_started", "tool_call_completed",
    "client_output_delta", "client_input_requested",
    "node_internal_output", "node_input_blocked", "node_stalled",
    "node_tool_doom_loop", "judge_verdict", "output_key_set",
    "node_retry", "edge_traversed", "context_compacted",
    "webhook_received", "custom", "escalation_requested",
    "worker_escalation_ticket", "queen_intervention_requested",
    "worker_loaded", "credentials_required")

  /** Default client-facing stream filter
    * (`routes_events.py:DEFAULT_EVENT_TYPES`). */
  val defaultEventTypes: Set[String] = Set(
    "client_output_delta", "client_input_requested", "llm_text_delta",
    "tool_call_started", "tool_call_completed", "execution_started",
    "execution_completed", "execution_failed", "execution_paused",
    "node_loop_started", "node_loop_iteration", "node_loop_completed",
    "llm_turn_complete", "node_action_plan", "edge_traversed",
    "goal_progress", "queen_intervention_requested",
    "worker_escalation_ticket", "node_internal_output", "node_stalled",
    "node_retry", "node_tool_doom_loop", "context_compacted",
    "worker_loaded", "credentials_required")

  val keepaliveFrame: String = ": keepalive\n\n"

  /** `?types=a,b` query-param parse with the reference's fallback:
    * empty/unknown-only input → the default set; unknown names are
    * dropped; any KNOWN event type is subscribable, not just the
    * defaults (`routes_events.py:_parse_event_types` validates
    * against the EventType enum). */
  def parseEventTypes(param: Option[String]): Set[String] = {
    val known = param.toSeq
      .flatMap(_.split(","))
      .map(_.trim)
      .filter(knownEventTypes.contains)
    if (known.isEmpty) defaultEventTypes else known.toSet
  }

  /** Events → one SSE frame string per row. The `data:` JSON carries
    * the full event dict (the reference serializes
    * `AgentEvent.to_dict`); `event:` is the event type; `id:` the
    * event's stream sequence when present. */
  def frames(events: DataFrame,
      idCol: Option[String] = None): DataFrame = {
    val idPart = idCol match {
      case Some(c) => when(col(c).isNotNull,
        concat(lit("id: "), col(c).cast("string"), lit("\n")))
        .otherwise(lit(""))
      case None => lit("")
    }
    events.withColumn("frame", concat(
      idPart,
      when(col("eventType").isNotNull,
        concat(lit("event: "), col("eventType"), lit("\n")))
        .otherwise(lit("")),
      lit("data: "),
      to_json(struct(events.columns.filter(_ != "frame").map(col): _*)),
      lit("\n\n")))
  }

  /** Filter to a client's subscription ∩ requested SSE types. */
  def clientView(events: Dataset[AgentEvent], sub: Subscription,
      types: Set[String]): Dataset[AgentEvent] =
    EventStream.subscribe(events, sub)
      .filter(e => types.contains(e.eventType))

  /** Streaming writer: per micro-batch, frames ordered by event time
    * are pushed partition-by-partition through `push` (one channel
    * per partition — SSE clients are driver-of-partition-local,
    * connection reuse at the boundary like every egress). An empty
    * batch emits one keepalive so idle clients stay connected. */
  def writer(events: Dataset[AgentEvent], sub: Subscription,
      types: Set[String], push: Iterator[String] => Unit):
      DataStreamWriter[org.apache.spark.sql.Row] =
    frames(clientView(events, sub, types).toDF(), idCol = None)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one plan execution per batch: probe the iterator instead of
        // an isEmpty pre-job that would run the sort twice
        val it = batch.orderBy(col("ts")).select(col("frame"))
          .toLocalIterator()
        if (!it.hasNext) push(Iterator(keepaliveFrame))
        else it.forEachRemaining(r => push(Iterator(r.getString(0))))
        ()
      }
      .trigger(Trigger.AvailableNow())
}
