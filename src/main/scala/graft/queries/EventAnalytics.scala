package graft.queries

import graft.{Q, Tables}
import graft.operators.Pin
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Families B/C/D re-expressed on the `events` table — the reference's
  * event-bus history queries (`event_bus.py:1017-1059`), run/decision
  * analytics (`builder/query.py`), and L2/L3 rollup + needs-attention
  * semantics (`runtime_log_schemas.py`, `RUNTIME_LOGGING.md:97-106`).
  *
  * Timestamp parity note: events.ts is nanosecond parquet; Spark reads
  * the FULL ns value (`nanosAsLong`, `Tables.scala`) while DuckDB 1.x
  * reads it µs-TRUNCATED. Never compare raw ts at ns precision against
  * the oracle: all outputs and ordering use epoch milliseconds
  * (`ts div 1000000` / `epoch_ms`) or the unique `event_id`, and range
  * bounds compare at µs (see e13) — the shared exact precisions.
  */
object EventAnalytics {

  private val D12_2 = DecimalType(12, 2)

  // e01 — event-type histogram + per-type stats (event_bus.py:1048-1059)
  val e01 = Q(
    "e01_type_histogram",
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(D12_2)).cast(DoubleType).as("total_value"))
  }

  // e02 — per-user aggregator stats (outcome_aggregator.py:285-295:
  // totals + countDistinct + first/last timestamps)
  val e02 = Q(
    "e02_user_stats",
    """SELECT user_id, COUNT(*) AS n_events,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
      |  MIN(epoch_ms(ts)) AS first_ms, MAX(epoch_ms(ts)) AS last_ms
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("value").cast(D12_2)).cast(DoubleType).as("total_value"),
        min(expr("ts div 1000000")).as("first_ms"),
        max(expr("ts div 1000000")).as("last_ms"))
  }

  // e03 — last-N per key (recent_verdicts tail-N,
  // worker_monitoring_tools.py:152-156)
  val e03 = Q(
    "e03_recent_per_user",
    """SELECT user_id, event_id, event_type,
      |  CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value, recency
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY event_id DESC) AS recency FROM events) t
      |WHERE recency <= 3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    Tables.load(s, dir, "events")
      .withColumn("recency", row_number().over(w))
      .filter(col("recency") <= 3)
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        col("value").cast(D12_2).cast(DoubleType).as("value"),
        col("recency"))
  }

  // e04 — steps since last marker event (steps_since_last_accept,
  // worker_monitoring_tools.py:158-163): running max of marker seq
  val e04 = Q(
    "e04_steps_since_error",
    """WITH s AS (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS seq
      |  FROM events)
      |SELECT user_id, event_id, seq - last_err AS steps_since_error
      |FROM (SELECT user_id, event_id, seq,
      |        MAX(CASE WHEN event_type = 'error' THEN seq END) OVER
      |          (PARTITION BY user_id ORDER BY event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_err
      |      FROM s) t""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "events")
      .withColumn("seq", row_number().over(w))
      .withColumn("last_err",
        max(when(col("event_type") === "error", col("seq"))).over(wRun))
      .select(col("user_id"), col("event_id"),
        (col("seq") - col("last_err")).as("steps_since_error"))
  }

  // e05 — gap-based sessionization (session-window semantics the
  // reference lacks; SURVEY §2.9 tumbling/session windows)
  val e05 = Q(
    "e05_sessionize",
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER
      |           (PARTITION BY user_id ORDER BY event_id) > 1800000
      |         OR LAG(epoch_ms(ts)) OVER
      |           (PARTITION BY user_id ORDER BY event_id) IS NULL
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM events),
      |sess AS (
      |  SELECT user_id, event_id,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM g),
      |per_session AS (
      |  SELECT user_id, session_seq, COUNT(*) AS n
      |  FROM sess GROUP BY user_id, session_seq)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  MAX(n) AS max_session_events,
      |  CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_session_events
      |FROM per_session GROUP BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = Tables.load(s, dir, "events")
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull ||
          col("ms") - col("prev_ms") > 1800000L, 1).otherwise(0))
      .withColumn("session_seq", sum(col("is_new")).over(wRun))
    g.groupBy("user_id", "session_seq").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("n")).as("max_session_events"),
        (sum(col("n")).cast(DoubleType) / count(lit(1)))
          .as("avg_session_events"))
  }

  // e06 — per-type distribution quantiles. Interpolation is spelled
  // out identically on BOTH engines (rank window + conditional
  // aggregate + lo + (hi-lo)·frac) instead of relying on
  // quantile_cont ≡ percentile: the builtins interpolate with
  // different expression orders, and any last-ulp difference survives
  // (or is amplified by) discretization. Every operand here is an
  // exact 2-decimal double, and both engines execute the same IEEE
  // ops in the same order → bit-identical by construction.
  // (n-1) is cast to DOUBLE before the multiply on BOTH engines:
  // DuckDB parses the 0.5/0.9 literal as DECIMAL and would do exact
  // decimal arithmetic where Spark does IEEE double
  private def quantileCte(p: String, tag: String): String =
    s"""MAX(CASE WHEN rn = CAST(floor(CAST(n-1 AS DOUBLE)*$p) AS BIGINT) + 1
       |      THEN CAST(v AS DOUBLE) END) AS lo$tag,
       |  MAX(CASE WHEN rn = least(CAST(floor(CAST(n-1 AS DOUBLE)*$p) AS BIGINT) + 2, n)
       |      THEN CAST(v AS DOUBLE) END) AS hi$tag""".stripMargin

  val e06 = Q(
    "e06_value_quantiles",
    s"""WITH r AS (
      |  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events WHERE value IS NOT NULL),
      |sel AS (
      |  SELECT event_type, n,
      |  ${quantileCte("0.5", "50")},
      |  ${quantileCte("0.9", "90")},
      |  MIN(CAST(v AS DOUBLE)) AS min_value,
      |  MAX(CAST(v AS DOUBLE)) AS max_value
      |  FROM r GROUP BY event_type, n)
      |SELECT event_type,
      |  lo50 + (hi50 - lo50) * (CAST(n-1 AS DOUBLE)*0.5 - floor(CAST(n-1 AS DOUBLE)*0.5)) AS median_value,
      |  lo90 + (hi90 - lo90) * (CAST(n-1 AS DOUBLE)*0.9 - floor(CAST(n-1 AS DOUBLE)*0.9)) AS p90_value,
      |  min_value, max_value
      |FROM sel""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("event_type")
      .orderBy(col("value"), col("event_id"))
    val wn = Window.partitionBy("event_type")
    def idx(p: Double) = (col("n") - 1).cast(DoubleType) * p
    def lohi(p: Double, tag: String) = Seq(
      max(when(col("rn") === floor(idx(p)).cast(LongType) + 1,
        col("v").cast(DoubleType))).as(s"lo$tag"),
      max(when(col("rn") === least(
        floor(idx(p)).cast(LongType) + 2, col("n")),
        col("v").cast(DoubleType))).as(s"hi$tag"))
    def interp(p: Double, tag: String) =
      col(s"lo$tag") + (col(s"hi$tag") - col(s"lo$tag")) *
        (idx(p) - floor(idx(p)))
    val aggs = lohi(0.5, "50") ++ lohi(0.9, "90") ++ Seq(
      min(col("v").cast(DoubleType)).as("min_value"),
      max(col("v").cast(DoubleType)).as("max_value"))
    Tables.load(s, dir, "events")
      // nulls excluded like the percentile builtins would (they also
      // rank at opposite ends of the two engines' default sort order)
      .filter(col("value").isNotNull)
      .withColumn("v", col("value").cast(D12_2))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("event_type", "n")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"),
        interp(0.5, "50").as("median_value"),
        interp(0.9, "90").as("p90_value"),
        col("min_value"), col("max_value"))
  }

  // e07 — stall detection: N consecutive identical values
  // (event_loop_node.py:2047-2055, threshold 3)
  val e07 = Q(
    "e07_stall_detect",
    """SELECT user_id, COUNT(*) AS n_stall_points FROM (
      |  SELECT user_id,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS t1,
      |    LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS t2,
      |    event_type
      |  FROM events) t
      |WHERE event_type = t1 AND event_type = t2
      |GROUP BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.load(s, dir, "events")
      .withColumn("t1", lag(col("event_type"), 1).over(w))
      .withColumn("t2", lag(col("event_type"), 2).over(w))
      .filter(col("event_type") === col("t1") &&
        col("event_type") === col("t2"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_stall_points"))
  }

  // e08 — needs-attention flags with reason list (L2 rollup semantics,
  // RUNTIME_LOGGING.md:97-106: threshold flags + reasons array;
  // reasons emitted as a deterministic comma-joined string)
  val e08 = Q(
    "e08_needs_attention",
    """WITH u AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events, n_errors, total_value,
      |  (n_errors > 3 OR n_events > 20 OR total_value > 2000) AS needs_attention,
      |  concat_ws(',',
      |    CASE WHEN n_errors > 3 THEN 'errors' END,
      |    CASE WHEN n_events > 20 THEN 'volume' END,
      |    CASE WHEN total_value > 2000 THEN 'value' END) AS attention_reasons
      |FROM u""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1).otherwise(0))
          .as("n_errors"),
        sum(col("value").cast(D12_2)).cast(DoubleType).as("total_value"))
      .select(
        col("user_id"), col("n_events"), col("n_errors"), col("total_value"),
        (col("n_errors") > 3 || col("n_events") > 20 ||
          col("total_value") > 2000).as("needs_attention"),
        concat_ws(",",
          when(col("n_errors") > 3, "errors"),
          when(col("n_events") > 20, "volume"),
          when(col("total_value") > 2000, "value")).as("attention_reasons"))
  }

  // e09 — first divergence between two keyed sequences (run
  // comparison zip-join, builder/query.py:469-501): position-join
  // per user pair, min index where the types differ
  val e09 = Q(
    "e09_sequence_divergence",
    """WITH seqs AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM events WHERE user_id < 10)
      |SELECT a.user_id AS user_a, b.user_id AS user_b,
      |  MIN(CASE WHEN a.event_type <> b.event_type THEN a.rn END) AS first_divergence,
      |  COUNT(*) AS compared_steps
      |FROM seqs a JOIN seqs b ON a.rn = b.rn AND a.user_id < b.user_id
      |GROUP BY a.user_id, b.user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val seqs = Tables.load(s, dir, "events")
      .filter(col("user_id") < 10)
      .withColumn("rn", row_number().over(w))
      .select("user_id", "event_type", "rn")
    val a = seqs.select(
      col("user_id").as("user_a"), col("event_type").as("type_a"),
      col("rn"))
    val b = seqs.select(
      col("user_id").as("user_b"), col("event_type").as("type_b"),
      col("rn"))
    a.join(b, Seq("rn"))
      .filter(col("user_a") < col("user_b"))
      .groupBy("user_a", "user_b")
      .agg(
        min(when(col("type_a") =!= col("type_b"), col("rn")))
          .as("first_divergence"),
        count(lit(1)).as("compared_steps"))
  }

  // e10 — JSON payload extraction (AgentEvent.data map payloads,
  // event_bus.py:139-168; from_json/get_json_object path).
  // Parity guards live in ONE place — [[graft.functions.Fns.kExtract]]
  // and its kStr/kInt twins (see the scaladoc: gate + extract collapse
  // into one anchored capture, no JSON parser per row on either
  // engine); b01/b03 share the identical extraction.
  private def kStrSql = graft.functions.Fns.kStrSql
  private def kIntSql = graft.functions.Fns.kIntSql

  val e10 = Q(
    "e10_json_extract",
    s"""SELECT event_type,
      |  CAST(SUM($kIntSql) AS BIGINT) AS sum_k,
      |  MAX($kIntSql) AS max_k,
      |  COUNT(DISTINCT $kStrSql) AS n_distinct_k
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    val k = graft.functions.Fns.kStr
    // materialize the parsed/validated values once per row — inlined
    // into three aggregate expressions the JSON parse + regex would
    // run three times (no CSE across agg expressions).
    // Explicit two-level aggregation instead of countDistinct: the
    // planner's distinct-agg rewrite Expands every row into two
    // projections (doubling the shuffle) because sum/max share the
    // frame; pre-grouping on (event_type, k) collapses to ~|distinct k|
    // rows in one pass, then the distinct count is a plain COUNT —
    // the shape you want when rows ≫ distinct keys, i.e. at scale
    Tables.load(s, dir, "events")
      .select(col("event_type"), k.as("k"), k.cast(LongType).as("k_int"))
      .groupBy("event_type", "k")
      .agg(count(lit(1)).as("cnt"), first(col("k_int")).as("k_int"))
      .groupBy("event_type")
      .agg(
        sum(col("k_int") * col("cnt")).as("sum_k"),
        max(col("k_int")).as("max_k"),
        count(when(col("k").isNotNull, lit(1))).as("n_distinct_k"))
  }

  // e11 — tumbling time buckets (batch analog of the streaming
  // window("ts", "1 hour") rollup, SURVEY §2.9)
  val e11 = Q(
    "e11_hourly_buckets",
    """SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(
        expr("(ts div 3600000000000) * 3600000").as("bucket_ms"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(D12_2)).cast(DoubleType).as("total_value"))
  }

  // e12 — filtered history query: most-recent-first with type filter
  // + limit (event_bus.py:1017-1046)
  val e12 = Q(
    "e12_filtered_history",
    """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
      |FROM events WHERE event_type IN ('error','purchase')
      |ORDER BY event_id DESC LIMIT 50""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("event_type").isin("error", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000").as("ts_ms"))
      .orderBy(col("event_id").desc)
      .limit(50)
  }

  // e13 — range join: events following each error within 5 minutes,
  // per user. The reference has no range operator (SURVEY §2.3 "as-of
  // / range joins: absent"); the scale-correct Spark shape is a BANDED
  // equi-join — bucket both sides by the 5-minute band, join on
  // (user, band ∪ band+1), then apply the residual time predicate —
  // so the shuffle key stays an equi-key at any volume (the oracle's
  // inequality join would degenerate to per-user cross products).
  // Bounds compare at MICROSECOND precision on both sides: DuckDB 1.x
  // reads TIMESTAMP(NANOS) parquet µs-truncated, so a Spark-side ns
  // comparison would diverge whenever two events share a microsecond.
  val e13 = Q(
    "e13_range_join",
    """WITH err AS (SELECT user_id, event_id, ts FROM events
      |             WHERE event_type = 'error')
      |SELECT err.user_id, err.event_id,
      |  COUNT(v.event_id) AS n_next_5min
      |FROM err LEFT JOIN events v
      |  ON v.user_id = err.user_id AND v.ts > err.ts
      |  AND epoch_ms(v.ts) <= epoch_ms(err.ts) + 300000
      |GROUP BY err.user_id, err.event_id""".stripMargin) { (s, dir) =>
    val bandMs = 300000L
    val ev = Tables.load(s, dir, "events")
      .withColumn("us", expr("ts div 1000")) // µs = DuckDB's precision
      .withColumn("ms", expr("ts div 1000000"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("us").as("e_us"),
        col("ms").as("e_ms"))
    val errBanded = err.withColumn("band",
      explode(array(expr(s"e_ms div $bandMs"),
        expr(s"e_ms div $bandMs") + 1)))
    val vBanded = ev.select(col("user_id"), col("event_id").as("v_id"),
      col("us").as("v_us"), col("ms").as("v_ms"))
      .withColumn("band", expr(s"v_ms div $bandMs"))
    val cand = errBanded.join(vBanded, Seq("user_id", "band"))
      .filter(col("v_us") > col("e_us") &&
        col("v_ms") <= col("e_ms") + bandMs)
      .groupBy("user_id", "event_id")
      .agg(count(col("v_id")).as("n"))
    err.select("user_id", "event_id")
      .join(cand, Seq("user_id", "event_id"), "left")
      .select(col("user_id"), col("event_id"),
        coalesce(col("n"), lit(0L)).as("n_next_5min"))
  }

  // e14 — approximate distinct (HLL): the distinct-at-scale path
  // (SURVEY §2.4 aggregator stats note: approx_count_distinct
  // acceptable at 100 TB, flagged approximate). Sketch VALUES are
  // engine-specific, so the registered row is a BOUNDED-ERROR oracle
  // row (VERDICT r10 ask #6): the query carries both arms — the
  // exact counts (DuckDB-verified, e21's semantics) and a per-group
  // flag asserting the HLL estimate lands within the accuracy bound
  // of the exact arm (|approx−exact| ≤ max(2, 5%·exact) — 2.5× the
  // rsd=0.02 the sketch is built with, the same bound the
  // SourcesOperatorsSpec anchor has held at every SF since r8). The
  // oracle emits TRUE for the flags, so a sketch drifting out of
  // bound hash-mismatches the round instead of hiding behind
  // `no_oracle`. At 100 TB the production call is the approx
  // aggregate ALONE (single pass, no expand); the exact arm here is
  // the audit the correctness gate buys its row with.
  val e14 = Q(
    "e14_approx_distinct",
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT props) AS BIGINT) AS n_payloads,
      |  TRUE AS hll_users_ok, TRUE AS hll_payloads_ok
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    def withinBound(approx: Column, exact: Column) =
      abs(approx - exact) <=
        greatest(lit(2L), (exact * lit(0.05)).cast(LongType))
    // TWO aggregations joined on event_type, not one: HLL++ is an
    // ImperativeAggregate, and a single agg mixing it with the two
    // COUNT(DISTINCT)s disables whole-stage codegen for the entire
    // Expand-×3 multi-distinct pipeline (guide §4.1 — prefer
    // codegen'd expressions in the hot path; measured 0.95 s fused
    // vs e21's 0.35 s for the identical exact arm alone). Split, the
    // exact arm keeps e21's fully codegen'd expand-distinct shape
    // and the approx arm is one narrow pass carrying |event_type|
    // sketch buffers; both sides leave the agg partitioned by
    // event_type, so the join adds no exchange. Values are identical
    // by construction — each HLL sees exactly the same rows.
    val ev = Tables.load(s, dir, "events")
    val exact = ev.groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("props")).as("n_payloads"))
    val approx = ev.groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("au"),
        approx_count_distinct(col("props"), 0.02).as("ap"))
    exact.join(approx, "event_type")
      .select(col("event_type"), col("n_users"), col("n_payloads"),
        withinBound(col("au"), col("n_users")).as("hll_users_ok"),
        withinBound(col("ap"), col("n_payloads")).as("hll_payloads_ok"))
  }

  // ---------------------------------------------------------------
  // e15 — tool doom-loop detection (`event_loop_node.py:2108-2152`):
  // a turn's fingerprint is (tool, canonical args) — here the raw
  // (event_type, props) pair, order-sensitive by construction since
  // rows compare positionally along event_id — and a doom loop is
  // `threshold` (3) consecutive turns with identical fingerprints.
  // Differs from e07's stall detect exactly the way the reference's
  // operator differs from its value-stall check: the ARGS participate
  // in the fingerprint. One row per session mirrors the reference
  // contract — (is_doom_loop, description), with `(false, '')` for
  // healthy sessions and the description built from the first doom
  // point's tool name.
  val e15 = Q(
    "e15_doom_loop",
    """WITH t AS (
      |  SELECT user_id, event_id, event_type, props,
      |    (event_type = LAG(event_type, 1) OVER w AND
      |     event_type = LAG(event_type, 2) OVER w AND
      |     props IS NOT DISTINCT FROM LAG(props, 1) OVER w AND
      |     props IS NOT DISTINCT FROM LAG(props, 2) OVER w) AS doom
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN doom THEN 1 ELSE 0 END) AS BIGINT) AS n_doom_points,
      |  CAST(SUM(CASE WHEN doom THEN 1 ELSE 0 END) AS BIGINT) > 0 AS is_doom_loop,
      |  COALESCE('Doom loop detected: 3 consecutive identical tool calls ('
      |    || arg_min(CASE WHEN doom THEN event_type END,
      |               CASE WHEN doom THEN event_id END) || ')',
      |    '') AS description
      |FROM t GROUP BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val doom = col("event_type") === col("t1") &&
      col("event_type") === col("t2") &&
      (col("props") <=> col("p1")) && (col("props") <=> col("p2"))
    Tables.load(s, dir, "events")
      .withColumn("t1", lag(col("event_type"), 1).over(w))
      .withColumn("p1", lag(col("props"), 1).over(w))
      .withColumn("t2", lag(col("event_type"), 2).over(w))
      .withColumn("p2", lag(col("props"), 2).over(w))
      .withColumn("doom", doom)
      .groupBy("user_id")
      .agg(
        sum(when(col("doom"), 1L).otherwise(0L)).as("n_doom_points"),
        (sum(when(col("doom"), 1L).otherwise(0L)) > 0).as("is_doom_loop"),
        coalesce(concat(
          lit("Doom loop detected: 3 consecutive identical tool calls ("),
          min_by(when(col("doom"), col("event_type")),
            when(col("doom"), col("event_id"))), lit(")")), lit(""))
          .as("description"))
  }

  // e16 — conversion funnel view → click → purchase: strictly-ordered
  // first-touch per user (the §2.5 ordered-sequence shape applied
  // corpus-wide). Each stage narrows to one (user_id, first_ms) row
  // BEFORE joining the next stage's pushdown-filtered scan, so at
  // scale the query is three user_id-keyed shuffles over per-user
  // single rows; the closing crossJoins combine 1-row aggregates
  // (driver-scale by construction). Timestamps compare at epoch-ms
  // per the inventory convention.
  val e16 = Q(
    "e16_funnel",
    """WITH b AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
      |           FROM events),
      |v AS (SELECT user_id, MIN(ms) AS t0 FROM b
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT b.user_id, MIN(b.ms) AS t1
      |      FROM b JOIN v ON b.user_id = v.user_id
      |      WHERE b.event_type = 'click' AND b.ms > v.t0
      |      GROUP BY b.user_id),
      |p AS (SELECT b.user_id, MIN(b.ms) AS t2
      |      FROM b JOIN c ON b.user_id = c.user_id
      |      WHERE b.event_type = 'purchase' AND b.ms > c.t1
      |      GROUP BY b.user_id)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_view_click,
      |  (SELECT COUNT(*) FROM p) AS n_view_click_purchase,
      |  CAST((SELECT COUNT(*) FROM c) AS DOUBLE) /
      |    (SELECT COUNT(*) FROM v) AS click_rate,
      |  CAST((SELECT COUNT(*) FROM p) AS DOUBLE) /
      |    (SELECT COUNT(*) FROM c) AS purchase_rate""".stripMargin) {
    (s, dir) =>
      // no pin on b: each stage's scan pushes its own event_type
      // filter down to parquet instead of materializing the union
      def stage(t: String) = Tables.load(s, dir, "events")
        .filter(col("event_type") === t)
        .select(col("user_id"), expr("ts div 1000000").as("ms"))
      val v = Pin(stage("view").groupBy("user_id").agg(min("ms").as("t0")))
      val c = Pin(stage("click")
        .join(v, "user_id").filter(col("ms") > col("t0"))
        .groupBy("user_id").agg(min("ms").as("t1")))
      val p = stage("purchase")
        .join(c, "user_id").filter(col("ms") > col("t1"))
        .groupBy("user_id").agg(min("ms").as("t2"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
        .select(col("n_view"), col("n_view_click"),
          col("n_view_click_purchase"),
          (col("n_view_click").cast(DoubleType) / col("n_view"))
            .as("click_rate"),
          (col("n_view_click_purchase").cast(DoubleType) /
            col("n_view_click")).as("purchase_rate"))
  }

  // e17 — retention cohorts: users grouped by signup day, activity
  // counted by days-since-signup (the classic cohort-retention
  // triangle at day grain — the corpus spans 30 days). The per-user
  // signup row is tiny relative to the event stream (broadcastable in
  // practice; a user_id-keyed shuffle join at extreme scale), and the
  // distinct-count shuffles (cohort, day, user) exactly once. Integer
  // floor division on epoch-ms keeps both engines bit-identical —
  // all quantities are non-negative by the join filter.
  val e17 = Q(
    "e17_retention",
    """WITH s AS (SELECT user_id, MIN(epoch_ms(ts)) AS signup_ms
      |           FROM events WHERE event_type = 'signup'
      |           GROUP BY user_id),
      |a AS (SELECT e.user_id,
      |        s.signup_ms // 86400000 AS cohort_day,
      |        (epoch_ms(e.ts) - s.signup_ms) // 86400000 AS day_n
      |      FROM events e JOIN s ON e.user_id = s.user_id
      |      WHERE epoch_ms(e.ts) >= s.signup_ms)
      |SELECT cohort_day, day_n, COUNT(DISTINCT user_id) AS n_active
      |FROM a GROUP BY cohort_day, day_n""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val signup = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), expr("ts div 1000000").as("ms"))
      .groupBy("user_id").agg(min("ms").as("signup_ms"))
    ev.select(col("user_id"), expr("ts div 1000000").as("ms"))
      .join(signup, "user_id")
      .filter(col("ms") >= col("signup_ms"))
      .select(col("user_id"),
        expr("signup_ms div 86400000").as("cohort_day"),
        expr("(ms - signup_ms) div 86400000").as("day_n"))
      .groupBy("cohort_day", "day_n")
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  // ---------------------------------------------------------------
  // e18 event-transition matrix with lift — the Markov-chain view of
  // the event stream (which event follows which, and how much more
  // often than chance): per (prev, next) type pair, the transition
  // count and lift = p(ab)/(p(a→)·p(→b)). Lift is PMI without the
  // log — the log's libm implementations differ across engines by
  // ulps, while lift = (n_ab/n_from)·(n/n_to) is two divisions and a
  // multiply in a PINNED operation order, identical IEEE steps on
  // both engines. The order matters for scale: the naive integer
  // products n_ab·n / n_from·n_to lose exactness past 2^53 (~1e8
  // transitions) and overflow int64 near ~3e9 — dividing first keeps
  // every intermediate in double range at any corpus size.
  // One lag window on the user partition + a groupBy to ~|types|²
  // rows; the lift denominators are windows over that driver-scale
  // aggregate, not the corpus.
  val e18 = Q(
    "e18_transition_lift",
    """WITH t AS (SELECT user_id, event_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY event_id) AS prev_type
      |  FROM events),
      |p AS (SELECT prev_type, event_type AS next_type,
      |        CAST(COUNT(*) AS BIGINT) AS n_ab
      |      FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |w AS (SELECT *,
      |        CAST(SUM(n_ab) OVER (PARTITION BY prev_type) AS BIGINT)
      |          AS n_from,
      |        CAST(SUM(n_ab) OVER (PARTITION BY next_type) AS BIGINT)
      |          AS n_to,
      |        CAST(SUM(n_ab) OVER () AS BIGINT) AS n
      |      FROM p)
      |SELECT prev_type, next_type, n_ab, n_from, n_to,
      |  CAST(n_ab AS DOUBLE) / n AS p_ab,
      |  (CAST(n_ab AS DOUBLE) / n_from) * (CAST(n AS DOUBLE) / n_to) AS lift
      |FROM w""".stripMargin) { (s, dir) =>
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val p = Tables.load(s, dir, "events")
      .select(col("event_type").as("next_type"),
        lag("event_type", 1).over(byUser).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_ab"))
    val wFrom = Window.partitionBy("prev_type")
    val wTo = Window.partitionBy("next_type")
    val wAll = Window.partitionBy()
    p.withColumn("n_from", sum("n_ab").over(wFrom))
      .withColumn("n_to", sum("n_ab").over(wTo))
      .withColumn("n", sum("n_ab").over(wAll))
      .select(col("prev_type"), col("next_type"), col("n_ab"),
        col("n_from"), col("n_to"),
        (col("n_ab").cast(DoubleType) / col("n")).as("p_ab"),
        ((col("n_ab").cast(DoubleType) / col("n_from")) *
          (col("n").cast(DoubleType) / col("n_to"))).as("lift"))
  }

  // ---------------------------------------------------------------
  // e19 hourly anomaly detection — the monitoring primitive over the
  // event bus (the reference's health-monitor rollup one step
  // further): per (event_type, hour) count, flag hours whose count
  // exceeds the trailing-24-observed-hours baseline by more than 3
  // standard deviations. The z-test runs in EXACT INTEGER algebra —
  // no float mean/variance whose summation order could differ
  // cross-engine: with n/Σc/Σc² from the frame,
  //   spike ⇔ n ≥ 6 ∧ (n·c − Σc) > 0 ∧ (n·c − Σc)² > 9·(n·Σc² − (Σc)²)
  // is (c − μ) > 3σ cleared of denominators. The squared/products
  // side runs in DECIMAL(38,0) (oracle: HUGEINT) — Σc² and dev²
  // exceed 64 bits once hourly counts pass ~10⁸, wrapping silently in
  // non-ANSI BIGINT while the oracle errors (the e18/g03 overflow
  // lesson); 38 digits covers counts to ~10¹⁷/hour, beyond any event
  // volume, and past THAT both engines error identically instead of
  // diverging. A zero-variance baseline makes any strict increase a
  // spike (rhs = 0). Hours with zero events of a type are ABSENT, so
  // the frame spans the last ≤24 observed hours — the sparse-series
  // semantics; a calendar fill would densify but needs a spine join.
  //
  // Scale shape: one (type, hour) collapse (map-side combinable —
  // the only corpus-cardinality shuffle), then the rank window runs
  // at the BUCKET grain, partitioned by type: no global sort, frames
  // are 24 rows.
  val e19 = Q(
    "e19_hourly_anomaly",
    """WITH hc AS (SELECT event_type,
      |    CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS bucket_ms,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |z AS (SELECT event_type, bucket_ms, n_events,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n_baseline,
      |    CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS sc,
      |    CAST(COALESCE(SUM(CAST(n_events AS HUGEINT) * n_events)
      |      OVER w, 0) AS HUGEINT) AS scc
      |  FROM hc
      |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ms
      |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, bucket_ms, n_events, n_baseline,
      |  sc AS baseline_sum,
      |  (n_baseline >= 6
      |    AND (CAST(n_baseline AS HUGEINT)*n_events - sc) > 0
      |    AND (CAST(n_baseline AS HUGEINT)*n_events - sc)
      |      * (CAST(n_baseline AS HUGEINT)*n_events - sc)
      |      > 9 * (CAST(n_baseline AS HUGEINT)*scc
      |             - CAST(sc AS HUGEINT)*sc)) AS is_spike
      |FROM z""".stripMargin) { (s, dir) =>
    val dec38 = DecimalType(38, 0)
    val w = Window.partitionBy("event_type").orderBy("bucket_ms")
      .rowsBetween(-24, -1)
    val hc = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("(ts div 3600000000000) * 3600000").as("bucket_ms"))
      .agg(count(lit(1)).as("n_events"))
    val dev =
      col("n_baseline").cast(dec38) * col("n_events") - col("sc")
    hc.withColumn("n_baseline", count(lit(1)).over(w))
      .withColumn("sc", coalesce(sum("n_events").over(w), lit(0L)))
      .withColumn("scc", coalesce(
        sum(col("n_events").cast(dec38) * col("n_events")).over(w),
        lit(0).cast(dec38)))
      .select(col("event_type"), col("bucket_ms"), col("n_events"),
        col("n_baseline"), col("sc").as("baseline_sum"),
        (col("n_baseline") >= 6 && dev > 0 &&
          dev * dev > lit(9) * (col("n_baseline").cast(dec38) *
            col("scc") - col("sc").cast(dec38) * col("sc")))
          .as("is_spike"))
  }

  // ---------------------------------------------------------------
  // e20 trailing time-window stats — the RANGE-frame capability the
  // window inventory was missing (q15-q17/q25 are ROWS/rank frames;
  // e19's trailing baseline is a bucket-grain ROWS frame): per event,
  // the count/sum/avg of the user's events in the trailing 3 DAYS by
  // EVENT TIME — an interval-bounded frame, so tied timestamps are
  // peers and enter together (standard RANGE semantics, identical in
  // both engines). The money-pipeline exactness contract applies: the
  // windowed sum runs in DECIMAL(12,2) (order-independent), cast to
  // DOUBLE at the edge; the avg is one double division on exact
  // inputs.
  //
  // Scale shape: one user_id-keyed shuffle + an in-partition ordered
  // scan — the same shape as every window in the inventory; the
  // interval bound is frame metadata, not extra data movement.
  private val TrailMs = 259200000L // 3 days
  val e20 = Q(
    "e20_trailing_window",
    s"""SELECT event_id, user_id, epoch_ms(ts) AS ms,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
      |    AS sum_value,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS avg_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |  RANGE BETWEEN $TrailMs PRECEDING AND CURRENT ROW)""".stripMargin) {
    (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ms")
        .rangeBetween(-TrailMs, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("ms", expr("ts div 1000000"))
        .select(col("event_id"), col("user_id"), col("ms"),
          count(lit(1)).over(w).as("n_window"),
          sum(col("value").cast(D12_2)).over(w).cast(DoubleType)
            .as("sum_value"))
        .withColumn("avg_value", col("sum_value") / col("n_window"))
  }

  // ---------------------------------------------------------------
  // e21 — exact-distinct twin of e14 (VERDICT r7 ask #5): the same
  // event_type grain with exact COUNT(DISTINCT) for both columns, so
  // the sketch query has a fully oracle-checked anchor in the
  // registry (e14 itself stays rows-only — sketches differ across
  // engines) and the ≤5 % spec can assert against materialized truth
  // at every SF instead of one. At 100 TB this is the expensive
  // two-shuffle expand-distinct path e14 exists to avoid — shipping
  // both documents the trade.
  val e21 = Q(
    "e21_exact_distinct",
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT props) AS BIGINT) AS n_payloads
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("props")).as("n_payloads"))
  }

  // ---------------------------------------------------------------
  // e22 — approximate quantiles (the quantile-at-scale path, closing
  // the sketch tier the way e14 closes distinct): e06's exact
  // per-type quantiles need a full per-partition sort — at 100 TB the
  // mergeable-sketch answer is percentile_approx (Spark's KLL-style
  // quantile summary: bounded state, map-side partial, one exchange
  // at sketch grain). Sketch VALUES are engine-specific, so the
  // registered row is a BOUNDED-ERROR oracle row (VERDICT r10 ask
  // #6, e14's contract on the quantile axis): the query emits the
  // exact group count (DuckDB-verified) plus per-group flags
  // asserting each approximate quantile lands inside the exact value
  // window at q ± 0.005 — 5× the sketch's deterministic GK
  // rank-error guarantee of 1/accuracy = 0.001, computed with
  // Spark's exact interpolating percentile in the SAME aggregation
  // (no extra exchange). The oracle emits TRUE, so a sketch drifting
  // out of its rank window fails the round's hash gate instead of
  // hiding behind `no_oracle`. The production call at 100 TB is the
  // approx aggregate alone; e06 remains the exact full-quantile twin.
  val e22 = Q(
    "e22_approx_quantiles",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_values,
      |  TRUE AS median_ok, TRUE AS p90_ok
      |FROM events WHERE value IS NOT NULL
      |GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("am"),
        percentile_approx(col("value"), lit(0.9), lit(1000)).as("ap"),
        expr("percentile(value, array(0.495, 0.505, 0.895, 0.905))")
          .as("ex"),
        count(lit(1)).as("n_values"))
      .select(col("event_type"), col("n_values"),
        (col("am") >= col("ex")(0) && col("am") <= col("ex")(1))
          .as("median_ok"),
        (col("ap") >= col("ex")(2) && col("ap") <= col("ex")(3))
          .as("p90_ok"))
  }

  val all: Seq[Q] = Seq(e01, e02, e03, e04, e05, e06, e07, e08, e09, e10,
    e11, e12, e13, e14, e15, e16, e17, e18, e19, e20, e21, e22)
}
