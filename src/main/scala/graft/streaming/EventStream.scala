package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Family C — the event bus re-expressed on Structured Streaming
  * (SURVEY §2.9; reference `core/framework/runtime/event_bus.py`).
  *
  *  - typed events with stream/node/execution coordinates
  *    (`event_bus.py:139-168`);
  *  - subscriptions = per-consumer filters over one input stream
  *    (`:170-180,327-350`) — N downstream filtered queries;
  *  - history queries/stats happen on the materialized sink table
  *    (batch queries e01–e12 cover those);
  *  - session state via `flatMapGroupsWithState` replaces the asyncio
  *    shared-state locks (`shared_state.py`): Spark's
  *    single-writer-per-key state model IS the SYNCHRONIZED level;
  *  - the reference has no late-data story (wall-clock at emit);
  *    streaming mode adds watermarks, batch replay is unaffected.
  */
object EventStream {

  case class AgentEvent(
      eventType: String,
      streamId: String,
      nodeId: Option[String],
      executionId: Option[String],
      ts: java.sql.Timestamp,
      data: Map[String, String])

  /** A subscription filter (`event_bus.py:170-180`): event-type set
    * plus optional equality coordinates. Missing = match-all. */
  case class Subscription(
      eventTypes: Set[String] = Set.empty,
      streamId: Option[String] = None,
      nodeId: Option[String] = None,
      executionId: Option[String] = None)

  /** Apply a subscription as a streaming-safe filter. */
  def subscribe(events: Dataset[AgentEvent],
      sub: Subscription): Dataset[AgentEvent] =
    events.filter { e =>
      (sub.eventTypes.isEmpty || sub.eventTypes.contains(e.eventType)) &&
      sub.streamId.forall(_ == e.streamId) &&
      sub.nodeId.forall(n => e.nodeId.contains(n)) &&
      sub.executionId.forall(x => e.executionId.contains(x))
    }

  /** The on-disk field layout of a HIVE_DEBUG_EVENTS line — exactly
    * what `AgentEvent.to_dict` serializes (`event_bus.py:150-162`):
    * snake_case names, ISO-8601 `timestamp` string (Python
    * `datetime.isoformat()`, microsecond precision, usually no zone).
    * `data` values may be nested JSON; Spark's JSON reader captures
    * non-string values as their raw JSON text under
    * `MAP<STRING,STRING>`, matching the tolerant read the analytics
    * queries expect. */
  val referenceEventSchema: String =
    "type STRING, stream_id STRING, node_id STRING, " +
      "execution_id STRING, data MAP<STRING,STRING>, " +
      "timestamp STRING, correlation_id STRING, graph_id STRING"

  /** Rename a reference-layout event frame to the internal contract
    * (`eventType/streamId/nodeId/executionId/ts/data` + the two
    * pass-through correlation coordinates). `try_to_timestamp` keeps
    * the reader tolerant: a malformed timestamp yields a null `ts`,
    * not a dead job. */
  def normalizeReferenceEvents(df: DataFrame): DataFrame =
    df.select(
      col("type").as("eventType"),
      col("stream_id").as("streamId"),
      col("node_id").as("nodeId"),
      col("execution_id").as("executionId"),
      try_to_timestamp(col("timestamp")).as("ts"),
      col("data"),
      col("correlation_id").as("correlationId"),
      col("graph_id").as("graphId"))

  /** JSONL event-log source (the reference's HIVE_DEBUG_EVENTS JSONL,
    * `event_bus.py:28-56`) as a file stream. Parses the reference's
    * own serialization (`AgentEvent.to_dict`, `event_bus.py:150-162`)
    * and renames to the internal contract. */
  def fromJsonl(spark: SparkSession, dir: String): DataFrame =
    normalizeReferenceEvents(
      spark.readStream.schema(referenceEventSchema)
        .option("mode", "DROPMALFORMED") // tolerant, like the batch path
        .json(dir))

  /** Batch flavor of [[fromJsonl]] for compaction / replay analytics;
    * corrupt lines drop instead of failing (`runtime_log_store.py:265-289`
    * tolerance contract). */
  def batchFromJsonl(spark: SparkSession, dir: String): DataFrame =
    normalizeReferenceEvents(
      spark.read.schema(referenceEventSchema)
        .option("mode", "DROPMALFORMED").json(dir))

  /** Tumbling event-time rollup with watermark — the 2-minute health
    * cadence (`monitoring/judge.py:4`) as a windowed aggregation. */
  def windowedTypeCounts(events: DataFrame, window_ : String = "2 minutes",
      watermark: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("eventType"))
      .agg(count(lit(1)).as("n_events"))

  // --- stateful sessionization -----------------------------------

  case class SessionUpdate(
      streamId: String,
      nEvents: Long,
      nErrors: Long,
      lastEventType: String,
      stallStreak: Int,
      stalled: Boolean,
      doomStreak: Int,
      doomLoop: Boolean,
      closed: Boolean)

  // public: the state encoder's generated deserializer must be able to
  // construct it
  case class SessState(nEvents: Long, nErrors: Long,
      lastType: String, streak: Int, lastFp: String, fpStreak: Int)

  /** The reference's turn fingerprint — (tool, canonical args json)
    * with sorted keys (`event_loop_node.py:2117-2126`) — over an
    * [[AgentEvent]]: event type + a canonical JSON rendering of the
    * data map in key order. Quotes/backslashes escape so distinct
    * maps cannot collide (a bare `k=v,`-join would confuse
    * `{"a":"1,b=2"}` with `{"a":"1","b":"2"}`); null data (a corrupt
    * or data-less line) fingerprints as the empty map. */
  def fingerprint(e: AgentEvent): String = {
    def js(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val data = Option(e.data).getOrElse(Map.empty[String, String])
    e.eventType + "|" + data.toSeq.sortBy(_._1)
      .map { case (k, v) => js(k) + ":" + js(Option(v).getOrElse("")) }
      .mkString("{", ",", "}")
  }

  /** Per-stream session state: counts, consecutive-identical-event
    * streak (stall detection threshold 3,
    * `event_loop_node.py:2047-2055,79`), consecutive identical
    * (tool, args) fingerprints (tool doom loop, threshold 3,
    * `event_loop_node.py:2127-2152` — the live flavor of e15),
    * gap-timeout close. One state row per stream key — Spark's state
    * store is the per-key lock. `gapMs <= 0` disables the gap-timeout
    * close (no processing-time timeouts scheduled — deterministic for
    * batch-style tests).
    *
    * State-schema note: [[SessState]] grew `lastFp`/`fpStreak` for the
    * doom-loop streak — a resuming query must start from a FRESH
    * checkpoint directory (Spark's state store rejects the old 4-field
    * layout). */
  def sessionize(events: Dataset[AgentEvent], gapMs: Long)(
      implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    val timeoutKind =
      if (gapMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val zero = SessState(0, 0, "", 0, "", 0)
    def emit(key: String, s: SessState, closed: Boolean) =
      SessionUpdate(key, s.nEvents, s.nErrors, s.lastType,
        s.streak, s.streak >= 3, s.fpStreak, s.fpStreak >= 3, closed)
    events
      .groupByKey(_.streamId)
      .flatMapGroupsWithState[SessState, SessionUpdate](
        OutputMode.Append(), timeoutKind) {
        case (key, it, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.getOption.getOrElse(zero)
            state.remove()
            Iterator(emit(key, s, closed = true))
          } else {
            var s = state.getOption.getOrElse(zero)
            // flatMapGroupsWithState sorts the batch by GROUP KEY only
            // — intra-group order is an arbitrary interleave of input
            // partitions, and streak semantics are order-sensitive. Fold
            // in event-time order (stable sort: same-ts events keep
            // their iterator order).
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val streak =
                if (e.eventType == s.lastType) s.streak + 1 else 1
              val fp = fingerprint(e)
              val fpStreak = if (fp == s.lastFp) s.fpStreak + 1 else 1
              s = SessState(s.nEvents + 1,
                s.nErrors + (if (e.eventType == "error") 1 else 0),
                e.eventType, streak, fp, fpStreak)
            }
            state.update(s)
            if (gapMs > 0) state.setTimeoutDuration(gapMs)
            Iterator(emit(key, s, closed = false))
          }
      }
  }

  /** Injection queue (`event_loop_node.py:1146-1160,2637-2657`):
    * external input merged into a running session between turns. In
    * streaming terms the control channel is just a second source
    * unioned into the keyed stream — the per-key state function sees
    * injected rows in arrival order with no extra machinery
    * (SURVEY §2.9). */
  def withInjections(events: Dataset[AgentEvent],
      control: Dataset[AgentEvent]): Dataset[AgentEvent] =
    events.unionByName(control)

  // --- streaming anomaly detection --------------------------------

  /** e19's verdict row, live: emitted when an hour bucket CLOSES
    * (a later bucket's first event arrives for the type). */
  case class AnomalyUpdate(eventType: String, bucketMs: Long,
      nEvents: Long, nBaseline: Long, baselineSum: Long,
      isSpike: Boolean)

  /** Per-type detector state: the trailing ≤24 CLOSED (bucket, count)
    * pairs plus the currently-filling bucket. Bounded by construction
    * — 25 pairs of longs per event type, however long the stream
    * runs. */
  case class AnomState(ring: Seq[(Long, Long)], curBucket: Long,
      curCount: Long)

  /** Streaming twin of the batch `e19_hourly_anomaly` query: per
    * event type, count events into hour buckets and, when a bucket
    * closes, test it against the trailing 24 OBSERVED buckets with
    * the same exact-integer z algebra —
    *   spike ⇔ n ≥ 6 ∧ (n·c − Σc) > 0 ∧ (n·c − Σc)² > 9·(n·Σc² − (Σc)²)
    * ((c − μ) > 3σ cleared of denominators; no float variance). A
    * bucket closes on ADVANCE — the first event of a later bucket —
    * so the verdict is emitted exactly once per closed bucket; events
    * arriving for an already-closed bucket are dropped (the watermark
    * analog, same lateness contract as `windowedTypeCounts`). The
    * currently-filling bucket never emits — its verdict belongs to
    * the batch query over the ingested store.
    *
    * Scale shape: one state row of ≤25 (long, long) pairs per event
    * TYPE (not per event) — Spark's state store shards by key; the
    * per-batch fold is event-time-ordered for the same reason
    * sessionize's is (intra-group batch order is an arbitrary
    * partition interleave). */
  def anomalies(events: Dataset[AgentEvent])(
      implicit spark: SparkSession): Dataset[AnomalyUpdate] = {
    import spark.implicits._
    val zero = AnomState(Vector.empty, Long.MinValue, 0L)
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[AnomState, AnomalyUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (tpe, it, state: GroupState[AnomState]) =>
          var s = state.getOption.getOrElse(zero)
          val out = scala.collection.mutable.ListBuffer[AnomalyUpdate]()
          def close(): Unit = if (s.curBucket != Long.MinValue) {
            val n = s.ring.size.toLong
            val sc = s.ring.iterator.map(_._2).sum
            // products in BigInt — Σc² and dev² pass 64 bits once
            // hourly counts pass ~1e8 (the batch e19 runs these in
            // DECIMAL(38,0) for the same reason)
            val scc = s.ring.iterator
              .map(p => BigInt(p._2) * p._2).sum
            val dev = BigInt(n) * s.curCount - sc
            out += AnomalyUpdate(tpe, s.curBucket, s.curCount, n, sc,
              n >= 6 && dev > 0 &&
                dev * dev > 9 * (n * scc - BigInt(sc) * sc))
            s = s.copy(
              ring = (s.ring :+ (s.curBucket -> s.curCount)).takeRight(24))
          }
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val b = (e.ts.getTime / 3600000L) * 3600000L
            if (b == s.curBucket) s = s.copy(curCount = s.curCount + 1)
            else if (b > s.curBucket) {
              close()
              s = s.copy(curBucket = b, curCount = 1L)
            } // b < curBucket: late for a closed bucket — dropped
          }
          state.update(s)
          out.iterator
      }
  }

  /** Bounded history ring (`event_bus.py:215,226-227,299`): the
    * newest `maxHistory` events per stream of the materialized history
    * table — retention expressed as a query, so the sink table can be
    * vacuumed with the same predicate. */
  def boundedHistory(history: DataFrame, maxHistory: Int = 1000)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tie-break on every orderable coordinate so retention at the
    // boundary is deterministic across runs (data maps are not
    // orderable; same-(ts,type,node,execution) duplicates remain
    // arbitrary, as in the reference's insertion-ordered ring)
    val w = Window.partitionBy("streamId")
      .orderBy(col("ts").desc, col("eventType"), col("nodeId"),
        col("executionId"))
    history.withColumn("recency", row_number().over(w))
      .filter(col("recency") <= maxHistory)
      .drop("recency")
  }

  /** `wait_for(event, filters, timeout)` (`event_bus.py:1062-1115`) on
    * the history table: poll for the first matching event until the
    * deadline — the app-level polling loop SURVEY §7.4.7 chose over a
    * streaming primitive. Returns the earliest match, or None on
    * timeout. */
  def waitFor(history: () => DataFrame, sub: Subscription,
      timeoutMs: Long, pollMs: Long = 200)(
      implicit spark: SparkSession): Option[AgentEvent] = {
    import spark.implicits._
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var result: Option[AgentEvent] = None
    var done = false
    while (!done) {
      val matches = subscribe(history().as[AgentEvent], sub)
        .orderBy(col("ts"), col("eventType"))
        .limit(1).collect()
      if (matches.nonEmpty) { result = Some(matches.head); done = true }
      else if (System.nanoTime() >= deadline) done = true
      else Thread.sleep(pollMs)
    }
    result
  }

  /** Needs-attention escalation stream: L2-style threshold flags over
    * the live stream (RUNTIME_LOGGING.md:97-106 thresholds on the
    * streaming path; tickets = rows to an `escalations` sink). */
  def attentionStream(updates: Dataset[SessionUpdate])(
      implicit spark: SparkSession): DataFrame = {
    updates.toDF()
      .filter(col("stalled") || col("doomLoop") ||
        col("nErrors") > 3 || col("nEvents") > 20)
      .withColumn("attention_reasons", array_compact(array(
        when(col("stalled"), "stall"),
        when(col("doomLoop"), "doom_loop"),
        when(col("nErrors") > 3, "errors"),
        when(col("nEvents") > 20, "volume"))))
  }
}
