package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Family B — run/decision analytics (`core/framework/builder/query.py`)
  * as oracle-verified queries over the `events` stream, with each event
  * mapped to a decision record: node_id = event_type, success = the
  * value/type predicate, tokens = props.k, latency = value. The same
  * aggregations run over real Run/Decision datasets via
  * [[graft.operators.BuilderQueries]]; these entries pin the semantics
  * against the DuckDB oracle on driver-provided data.
  */
object RunAnalytics {

  // the shared cross-engine props gate + extraction — single-sourced
  // in Fns so b01/b03 and e10 can never disagree about payload validity
  private def kIntSql = graft.functions.Fns.kIntSql
  private def kInt = graft.functions.Fns.kInt

  // ---------------------------------------------------------------
  // a01 as-of join — for every purchase, the most recent earlier error
  // of the same user. The reference approximates nearest-event-in-time
  // with mtime heuristics (worker_monitoring_tools.py:165-174); this is
  // the real operator. Spark lacks ASOF JOIN: implemented as one
  // ordered window over the filtered union — running last(error id)
  // carried onto purchase rows — which shuffles each user's events
  // once, versus the sort-merge ASOF of the oracle. event_id is the
  // (unique, monotone) time axis, so ties cannot occur.
  val a01 = Q(
    "a01_asof_join",
    """WITH p AS (SELECT user_id, event_id FROM events
      |           WHERE event_type = 'purchase'),
      |     e AS (SELECT user_id, event_id AS err_id FROM events
      |           WHERE event_type = 'error')
      |SELECT p.user_id, p.event_id, e.err_id,
      |  p.event_id - e.err_id AS gap
      |FROM p ASOF JOIN e
      |  ON p.user_id = e.user_id AND e.err_id <= p.event_id""".stripMargin) {
    (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .filter(col("event_type").isin("purchase", "error"))
        .withColumn("last_err",
          last(when(col("event_type") === "error", col("event_id")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" &&
          col("last_err").isNotNull)
        .select(col("user_id"), col("event_id"),
          col("last_err").as("err_id"),
          (col("event_id") - col("last_err")).as("gap"))
  }

  // ---------------------------------------------------------------
  // b01 node performance — cross-run per-node totals, success rate,
  // mean latency, token sum (`builder/query.py:366-396`).
  val b01 = Q(
    "b01_node_performance",
    s"""SELECT event_type AS node_id, COUNT(*) AS total,
      |  CAST(SUM(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS successes,
      |  CAST(SUM(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS success_rate,
      |  CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_latency,
      |  CAST(SUM($kIntSql) AS BIGINT) AS total_tokens
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    val ok = when(col("value") >= 50, 1).otherwise(0)
    // latency mean in integer cents (the q01 pattern): a DECIMAL(12,2)
    // sum's >18-precision accumulator is a non-compact byte-array
    // buffer per group — floor(x·100+0.5) long sums are exact for
    // 2-decimal latencies and stay in compact UnsafeRow longs
    Tables.load(s, dir, "events")
      .withColumn("k_int", kInt) // parse+validate once per row
      .groupBy(col("event_type").as("node_id"))
      .agg(
        count(lit(1)).as("total"),
        sum(ok).as("successes"),
        (sum(ok).cast(DoubleType) / count(lit(1))).as("success_rate"),
        (sum(floor(col("value") * 100 + 0.5).cast("long"))
          .cast(DoubleType) / 100.0 / count(lit(1))).as("avg_latency"),
        sum(col("k_int")).as("total_tokens"))
  }

  // ---------------------------------------------------------------
  // b02 modal choice — the most frequent decision per group with a
  // deterministic tie-break (`builder/query.py:453-462`; top-1 window,
  // SURVEY §2.5).
  val b02 = Q(
    "b02_modal_choice",
    """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
      |           FROM events GROUP BY user_id, event_type)
      |SELECT user_id, event_type AS modal_choice, n AS n_times
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY n DESC, event_type) AS rn FROM c) t
      |WHERE rn = 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("n").desc, col("event_type"))
    Tables.load(s, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("modal_choice"),
        col("n").as("n_times"))
  }

  // ---------------------------------------------------------------
  // b03 run metrics — the incremental per-run counters of
  // `schemas/run.py:45-65,111-131`: decision/success counts, token
  // sums, ordered distinct node list, span. The distinct node list is
  // emitted as a sorted comma-joined string (deterministic, and
  // hash-stable across engines, unlike native list columns).
  val b03 = Q(
    "b03_run_metrics",
    s"""SELECT user_id, COUNT(*) AS n_decisions,
      |  CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
      |  CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS success_rate,
      |  CAST(SUM($kIntSql) AS BIGINT) AS total_tokens,
      |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS nodes,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    val ok = when(col("event_type") =!= "error", 1).otherwise(0)
    Tables.load(s, dir, "events")
      .withColumn("k_int", kInt) // parse+validate once per row
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_decisions"),
        sum(ok).as("n_success"),
        (sum(ok).cast(DoubleType) / count(lit(1))).as("success_rate"),
        sum(col("k_int")).as("total_tokens"),
        array_join(array_sort(collect_set(col("event_type"))), ",")
          .as("nodes"),
        min("event_id").as("first_event"),
        max("event_id").as("last_event"))
  }

  // ---------------------------------------------------------------
  // b04 decision-type distribution pivot (`builder/query.py:439-467`
  // "decision-type distribution"; SURVEY §2.4 "distribution = pivot").
  // The pivot values are DECLARED, not discovered — no extra distinct
  // pass over the data, and the output schema is fixed at any scale.
  val b04 = Q(
    "b04_type_pivot",
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.load(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    // pivot leaves null where a (user, type) combination is absent;
    // the oracle's SUM(CASE) yields 0 — align
    pivoted.select(col("user_id") +:
      types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  // ---------------------------------------------------------------
  // b05 deterministic run narrative — the reference's non-LLM fallback
  // for Run.complete() (`run.py:160-189`) as a derived column, pinned
  // against the oracle on the events mapping (user = run, success =
  // b01's value predicate, intent = event_type). The full operator
  // (explicit runs/decisions/problems relations incl. the
  // critical/warning clauses) is [[graft.operators.BuilderQueries
  // .narrative]]; this entry locks the string-assembly semantics:
  // opening, decision summary, first-3 failed intents in event order.
  val b05 = Q(
    "b05_narrative",
    """WITH d AS (SELECT user_id, event_id, event_type,
      |             (value >= 50) AS ok FROM events),
      |m AS (SELECT user_id, COUNT(*) AS total,
      |        CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS succ,
      |        CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS fail
      |      FROM d GROUP BY user_id),
      |f AS (SELECT user_id,
      |        array_to_string(list_slice(
      |          list(event_type ORDER BY event_id), 1, 3), ', ') AS failed_on
      |      FROM d WHERE NOT ok GROUP BY user_id)
      |SELECT m.user_id,
      |  CASE WHEN fail = 0 THEN 'completed' ELSE 'failed' END AS status,
      |  'Run ' || CASE WHEN fail = 0 THEN 'completed successfully'
      |                 ELSE 'failed' END || '. ' ||
      |  'Made ' || CAST(total AS VARCHAR) || ' decisions: ' ||
      |  CAST(succ AS VARCHAR) || ' succeeded, ' ||
      |  CAST(fail AS VARCHAR) || ' failed.' ||
      |  CASE WHEN fail > 0 THEN ' Failed on: ' || f.failed_on
      |       ELSE '' END AS narrative
      |FROM m LEFT JOIN f ON m.user_id = f.user_id""".stripMargin) {
    (s, dir) =>
      val d = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          (col("value") >= 50).as("ok"))
      val failedOn = array_join(transform(
        slice(array_sort(collect_list(
          when(!col("ok"), struct(col("event_id"), col("event_type"))))),
          1, 3),
        x => x.getField("event_type")), ", ")
      d.groupBy("user_id")
        .agg(count(lit(1)).as("total"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("succ"),
          sum(when(!col("ok"), 1L).otherwise(0L)).as("fail"),
          failedOn.as("failed_on"))
        .select(col("user_id"),
          when(col("fail") === 0, "completed").otherwise("failed")
            .as("status"),
          concat(
            lit("Run "),
            when(col("fail") === 0, "completed successfully")
              .otherwise("failed"),
            lit(". Made "), col("total"), lit(" decisions: "),
            col("succ"), lit(" succeeded, "), col("fail"),
            lit(" failed."),
            when(col("fail") > 0,
              concat(lit(" Failed on: "), col("failed_on")))
              .otherwise(lit(""))).as("narrative"))
  }

  // ---------------------------------------------------------------
  // b06 — the COMPOSED find_patterns report (`builder/query.py:
  // 222-282`; VERDICT r8 ask #5): per goal, ONE frame carrying the
  // success rate, the top-5 failure-message histogram (count-desc,
  // message tie-break) and the >0.10-failure-rate nodes (rate-desc) —
  // b01/b02 oracle-check the pieces, this entry locks the composition
  // via [[graft.operators.BuilderQueries.findPatterns]] itself. Event
  // mapping (the family-B convention): run = user stream, goal =
  // user_id % 5, decision success = value ≥ 50 (b01's rule), run
  // failed iff it has an 'error' event, and the failure MESSAGE is
  // the min error value bucketed by 25 ('e0'..'e4' — a deterministic
  // stand-in for the reference's error strings). The two list columns
  // are emitted as comma-joined strings (b03's convention: native
  // list columns are not hash-stable cross-engine).
  val b06 = Q(
    "b06_find_patterns",
    """WITH runs AS (
      |  SELECT user_id % 5 AS goal_id,
      |    CASE WHEN SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      > 0 THEN 'failed' ELSE 'completed' END AS status,
      |    CASE WHEN SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      > 0 THEN 'e' || CAST(CAST(floor(COALESCE(
      |        MIN(CASE WHEN event_type = 'error' THEN value END), -25.0)
      |        / 25.0) AS BIGINT) AS VARCHAR) END AS error
      |  FROM events GROUP BY user_id),
      |rates AS (SELECT goal_id, CAST(COUNT(*) AS BIGINT) AS total_runs,
      |    AVG(CASE WHEN status = 'completed' THEN 1.0::DOUBLE
      |        ELSE 0.0::DOUBLE END) AS success_rate
      |  FROM runs GROUP BY goal_id),
      |tf AS (SELECT goal_id, error, COUNT(*) AS n FROM runs
      |       WHERE status = 'failed' AND error IS NOT NULL
      |       GROUP BY 1, 2),
      |tf5 AS (SELECT goal_id, error, rn FROM
      |         (SELECT *, ROW_NUMBER() OVER (PARTITION BY goal_id
      |            ORDER BY n DESC, error) AS rn FROM tf)
      |        WHERE rn <= 5),
      |tfa AS (SELECT goal_id, string_agg(error, ',' ORDER BY rn)
      |          AS top_failures FROM tf5 GROUP BY goal_id),
      |pd AS (SELECT user_id % 5 AS goal_id, event_type AS node_id,
      |    AVG(CASE WHEN value >= 50 THEN 0.0::DOUBLE
      |        ELSE 1.0::DOUBLE END) AS failure_rate
      |  FROM events GROUP BY 1, 2),
      |pna AS (SELECT goal_id, string_agg(node_id, ','
      |          ORDER BY failure_rate DESC, node_id) AS problematic_nodes
      |        FROM pd WHERE failure_rate > 0.10 GROUP BY goal_id)
      |SELECT r.goal_id, r.total_runs, r.success_rate,
      |  COALESCE(tfa.top_failures, '') AS top_failures,
      |  COALESCE(pna.problematic_nodes, '') AS problematic_nodes
      |FROM rates r LEFT JOIN tfa ON r.goal_id = tfa.goal_id
      |LEFT JOIN pna ON r.goal_id = pna.goal_id""".stripMargin) {
    (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val nErr = sum(when(col("event_type") === "error", 1).otherwise(0))
      val errMin = min(when(col("event_type") === "error", col("value")))
      val runs = ev.groupBy("user_id")
        .agg(nErr.as("n_err"), errMin.as("err_min"))
        .select(
          col("user_id").as("run_id"),
          (col("user_id") % 5).as("goal_id"),
          when(col("n_err") > 0, "failed").otherwise("completed")
            .as("status"),
          when(col("n_err") > 0, concat(lit("e"),
            floor(coalesce(col("err_min"), lit(-25.0)) / 25.0)
              .cast(LongType).cast(StringType))).as("error"))
      val decisions = ev.select(
        (col("user_id") % 5).as("goal_id"),
        col("event_type").as("node_id"),
        when(col("value") >= 50, true).otherwise(false).as("success"))
      graft.operators.BuilderQueries.findPatterns(runs, decisions)
        .select(col("goal_id"), col("total_runs"), col("success_rate"),
          array_join(col("top_failures"), ",").as("top_failures"),
          array_join(col("problematic_nodes"), ",")
            .as("problematic_nodes"))
  }

  val all: Seq[Q] = Seq(a01, b01, b02, b03, b04, b05, b06)
}
