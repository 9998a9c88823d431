package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Family B — run/decision analytics (`core/framework/builder/query.py`,
  * 501 LoC) as one-pass DataFrame aggregations.
  *
  * The reference loads every run JSON into memory and loops in Python
  * (N+1 file reads, `storage/backend.py:108-114`); here each analysis
  * is a declarative plan over a `runs` and an exploded `decisions`
  * DataFrame, so the same query runs over ten runs or ten billion.
  *
  * Expected columns —
  * runs: run_id, goal_id, status, error, started_at;
  * decisions: run_id, goal_id, idx, node_id, decision_type, intent,
  * chosen_option_id, success, latency_ms, tokens, error.
  */
object BuilderQueries {

  /** Per-goal success rate (`query.py:231-238`). */
  def goalSuccessRate(runs: DataFrame): DataFrame =
    runs.groupBy("goal_id").agg(
      count(lit(1)).as("total_runs"),
      avg(when(col("status") === "completed", 1.0).otherwise(0.0))
        .as("success_rate"))

  /** Deterministic run narrative (`run.py:160-189`) — the reference's
    * own non-LLM fallback for `Run.complete()`, assembled per run as a
    * derived column:
    * opening ("Run completed successfully." / "Run failed."), decision
    * summary, critical/warning problem lists (insertion order), and
    * the first 3 failed-decision intents. `problems` rows are
    * (run_id, idx, severity, description); pass None when the run
    * store has no problems relation. */
  def narrative(runs: DataFrame, decisions: DataFrame,
      problems: Option[DataFrame] = None): DataFrame = {
    val intents = transform(
      slice(array_sort(collect_list( // nulls drop: failures only
        when(!col("success"), struct(col("idx"), col("intent"))))), 1, 3),
      s => s.getField("intent"))
    val m = decisions.groupBy("run_id").agg(
      count(lit(1)).as("total_decisions"),
      sum(when(col("success"), 1L).otherwise(0L)).as("n_success"),
      sum(when(!col("success"), 1L).otherwise(0L)).as("n_failed"),
      array_join(intents, ", ").as("failed_intents"))
    val probAgg = problems.map { p =>
      def sevList(severity: String) = array_join(transform(
        array_sort(collect_list(when(col("severity") === severity,
          struct(col("idx"), col("description"))))),
        s => s.getField("description")), ", ")
      p.groupBy("run_id").agg(
        sevList("critical").as("critical_str"),
        sevList("warning").as("warning_str"))
    }
    val withProblems = probAgg match {
      case Some(pa) => m.join(pa, Seq("run_id"), "left")
      case None => m.withColumn("critical_str", lit(""))
        .withColumn("warning_str", lit(""))
    }
    runs.select(col("run_id"), col("status"))
      .join(withProblems, Seq("run_id"), "left")
      .select(col("run_id"), col("status"),
        concat_ws(" ",
          concat(lit("Run "),
            when(col("status") === "completed", "completed successfully")
              .otherwise("failed"), lit(".")),
          concat(lit("Made "), coalesce(col("total_decisions"), lit(0L)),
            lit(" decisions: "), coalesce(col("n_success"), lit(0L)),
            lit(" succeeded, "), coalesce(col("n_failed"), lit(0L)),
            lit(" failed.")),
          when(length(col("critical_str")) > 0,
            concat(lit("Critical issues: "), col("critical_str"))),
          when(length(col("warning_str")) > 0,
            concat(lit("Warnings: "), col("warning_str"))),
          when(col("n_failed") > 0,
            concat(lit("Failed on: "), col("failed_intents"))))
          .as("narrative"))
  }

  /** Top-5 failure messages by count (`query.py:241-253`). */
  def topFailures(runs: DataFrame, n: Int = 5): DataFrame =
    runs.filter(col("status") === "failed" && col("error").isNotNull)
      .groupBy("error").agg(count(lit(1)).as("n_runs"))
      .orderBy(col("n_runs").desc, col("error"))
      .limit(n)

  /** Per-node failure rates filtered > 0.10, sorted desc
    * (`query.py:255-270`). */
  def problematicNodes(decisions: DataFrame,
      threshold: Double = 0.10): DataFrame =
    decisions.groupBy("node_id").agg(
      count(lit(1)).as("n_decisions"),
      avg(when(!col("success"), 1.0).otherwise(0.0)).as("failure_rate"))
      .filter(col("failure_rate") > threshold)
      .orderBy(col("failure_rate").desc, col("node_id"))

  /** Decision-type distribution + modal chosen option per 50-char
    * intent prefix (`query.py:439-467`; prefix `:449`). */
  def decisionPatterns(decisions: DataFrame): DataFrame = {
    val w = Window.partitionBy("intent_prefix")
      .orderBy(col("n").desc, col("chosen_option_id"))
    decisions
      .withColumn("intent_prefix", substring(col("intent"), 1, 50))
      .groupBy("intent_prefix", "chosen_option_id")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("intent_prefix"), col("chosen_option_id")
        .as("modal_choice"), col("n").as("n_times"))
  }

  /** Cross-run per-node performance (`query.py:366-396`). */
  def nodePerformance(decisions: DataFrame): DataFrame =
    decisions.groupBy("node_id").agg(
      count(lit(1)).as("total"),
      sum(when(col("success"), 1).otherwise(0)).as("successes"),
      avg(when(col("success"), 1.0).otherwise(0.0)).as("success_rate"),
      avg("latency_ms").as("avg_latency_ms"),
      sum("tokens").as("total_tokens"))

  /** Recent failed runs (`query.py:159-167`). */
  def recentFailures(runs: DataFrame, limit: Int = 10): DataFrame =
    runs.filter(col("status") === "failed")
      .orderBy(col("started_at").desc, col("run_id"))
      .limit(limit)

  /** Failure chain: decisions of a run up to and including the first
    * failure (`query.py:181-196`). */
  def failureChain(decisions: DataFrame, runId: String): DataFrame = {
    val d = decisions.filter(col("run_id") === runId)
    val firstFail = d.agg(min(when(!col("success"), col("idx"))))
      .head().get(0)
    firstFail match {
      case i: Int => d.filter(col("idx") <= i).orderBy("idx")
      case l: Long => d.filter(col("idx") <= l).orderBy("idx")
      case _ => d.orderBy("idx") // no failure: whole chain
    }
  }

  /** The composed `find_patterns` report (`query.py:222-282`): per
    * goal, one row with the success rate, the top-5 failure messages
    * (count-desc, message tie-break), and the problematic nodes
    * (failure rate > threshold, rate-desc). Arrays are built with
    * deterministic ordering so the report is hash-stable. */
  def findPatterns(runs: DataFrame, decisions: DataFrame,
      threshold: Double = 0.10): DataFrame = {
    val rates = goalSuccessRate(runs)
    val failures = runs
      .filter(col("status") === "failed" && col("error").isNotNull)
      .groupBy("goal_id", "error").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(Window.partitionBy("goal_id")
        .orderBy(col("n").desc, col("error"))))
      .filter(col("rn") <= 5)
      .groupBy("goal_id")
      .agg(collect_list(struct(col("rn"), col("error")))
        .as("failure_structs"))
      .select(col("goal_id"),
        transform(array_sort(col("failure_structs")),
          s => s.getField("error")).as("top_failures"))
    val problem = decisions.groupBy("goal_id", "node_id").agg(
      avg(when(!col("success"), 1.0).otherwise(0.0)).as("failure_rate"))
      .filter(col("failure_rate") > threshold)
      .groupBy("goal_id")
      .agg(collect_list(struct((-col("failure_rate")).as("neg_rate"),
        col("node_id"))).as("problem_structs"))
      .select(col("goal_id"),
        transform(array_sort(col("problem_structs")),
          s => s.getField("node_id")).as("problematic_nodes"))
    rates
      .join(failures, Seq("goal_id"), "left")
      .join(problem, Seq("goal_id"), "left")
      .select(col("goal_id"), col("total_runs"), col("success_rate"),
        coalesce(col("top_failures"),
          array().cast("array<string>")).as("top_failures"),
        coalesce(col("problematic_nodes"),
          array().cast("array<string>")).as("problematic_nodes"))
  }

  /** Failure analysis for one run (`query.py:171-210`): first failed
    * decision = failure point and root cause; all-decisions-succeeded
    * on a failed run flags the "external cause?" branch. Returns one
    * row (run_id, failure_point_node, root_cause, n_chain_decisions,
    * external_cause). */
  def analyzeFailure(runs: DataFrame, decisions: DataFrame,
      runId: String): DataFrame = {
    val run = runs.filter(col("run_id") === runId &&
      col("status") === "failed")
    val d = decisions.filter(col("run_id") === runId)
    val firstFail = d.filter(!col("success"))
      .orderBy("idx")
      .limit(1)
      .select(col("run_id"),
        col("node_id").as("failure_point_node"),
        coalesce(col("error"), lit("Unknown")).as("root_cause"))
    val chainLen = d.agg(
      coalesce(min(when(!col("success"), col("idx"))),
        max(col("idx"))).as("last_idx"))
      .select(coalesce(col("last_idx") + 1, lit(0L))
        .as("n_chain_decisions")) // zero-decision run: empty chain
    run.select(col("run_id"))
      .join(firstFail, Seq("run_id"), "left")
      .crossJoin(chainLen)
      .select(col("run_id"),
        coalesce(col("failure_point_node"),
          lit("Unknown - no decision marked as failed"))
          .as("failure_point_node"),
        coalesce(col("root_cause"),
          lit("Run failed but all decisions succeeded (external cause?)"))
          .as("root_cause"),
        col("n_chain_decisions"),
        col("failure_point_node").isNull.as("external_cause"))
  }

  /** Improvement suggestions as a rule table over the pattern rows
    * (`query.py:310-364`): problematic nodes → node_improvement
    * (priority high when rate > 0.3); errors seen ≥2× →
    * error_handling (high at ≥5); goal success rate < 0.8 →
    * architecture. Output: goal_id, type, target, priority. */
  def suggestImprovements(runs: DataFrame,
      decisions: DataFrame): DataFrame = {
    val byGoalRates = goalSuccessRate(runs)
    val nodeSuggestions = decisions.groupBy("goal_id", "node_id").agg(
      avg(when(!col("success"), 1.0).otherwise(0.0)).as("failure_rate"))
      .filter(col("failure_rate") > 0.10)
      .select(col("goal_id"),
        lit("node_improvement").as("type"),
        col("node_id").as("target"),
        when(col("failure_rate") > 0.3, "high").otherwise("medium")
          .as("priority"))
    val errorSuggestions = runs
      .filter(col("status") === "failed" && col("error").isNotNull)
      .groupBy("goal_id", "error").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("goal_id"),
        lit("error_handling").as("type"),
        col("error").as("target"),
        when(col("n") >= 5, "high").otherwise("medium").as("priority"))
    val archSuggestions = byGoalRates
      .filter(col("success_rate") < 0.8)
      .select(col("goal_id"),
        lit("architecture").as("type"),
        col("goal_id").as("target"),
        lit("high").as("priority"))
    nodeSuggestions.unionByName(errorSuggestions)
      .unionByName(archSuggestions)
  }

  /** Summary-with-fallback lookup (`storage/backend.py:116-127`): every
    * run keeps its stored summary when present, otherwise the summary
    * computed from the run row itself — a right join + coalesce per
    * column. */
  def summaryWithFallback(summaries: DataFrame, runs: DataFrame)
      : DataFrame = {
    val computed = runs.select(
      col("run_id"),
      col("status").as("run_status"),
      col("error").as("run_error"))
    summaries.join(computed, Seq("run_id"), "right")
      .select(
        col("run_id"),
        coalesce(col("status"), col("run_status")).as("status"),
        coalesce(col("error"), col("run_error")).as("error"),
        col("status").isNotNull.as("from_stored_summary"))
  }

  /** Run comparison (`query.py:284-306,469-501`): positional zip-join
    * of two runs' decisions; first index where chosen options diverge
    * plus node-set differences. Returns a 1-row DataFrame. */
  def compareRuns(decisions: DataFrame, runA: String,
      runB: String): DataFrame = {
    val a = decisions.filter(col("run_id") === runA)
      .select(col("idx"), col("node_id").as("node_a"),
        col("chosen_option_id").as("choice_a"))
    val b = decisions.filter(col("run_id") === runB)
      .select(col("idx"), col("node_id").as("node_b"),
        col("chosen_option_id").as("choice_b"))
    a.join(b, Seq("idx"), "full_outer")
      .agg(
        // the reference zips (stops at the shorter run) and compares
        // with != — a position where BOTH recorded no choice is NOT a
        // divergence (None != None is False, query.py:480-487);
        // rows past the shorter run land in the nodes_only lists
        min(when(col("node_a").isNotNull && col("node_b").isNotNull &&
          !(col("choice_a") <=> col("choice_b")), col("idx")))
          .as("first_divergence_idx"),
        count(when(col("node_a").isNotNull && col("node_b").isNotNull,
          1)).as("compared_steps"),
        array_sort(array_distinct(collect_list(
          when(col("node_b").isNull, col("node_a")))))
          .as("nodes_only_in_a"),
        array_sort(array_distinct(collect_list(
          when(col("node_a").isNull, col("node_b")))))
          .as("nodes_only_in_b"))
  }
}
