package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The three-level runtime-log rollup (SURVEY §2.4, family D).
  *
  * Reference: L3 per-LLM-turn step logs roll up to L2 per-node details,
  * which roll up to L1 per-run summaries (`runtime_log_schemas.py:29-123`,
  * `RUNTIME_LOGGING.md:82-106`). Needs-attention thresholds
  * (`runtime_logger.py:190-203`): retries > 3 ∨ escalations > 2 ∨
  * latency > 60000 ms ∨ tokens > 100000 ∨ steps > 20.
  *
  * Each rollup is ONE groupBy (map-side partial aggregation), so the
  * full L3→L1 pipeline is two shuffles regardless of log volume —
  * versus the reference's per-file JSON reads.
  *
  * Expected L3 columns: run_id, node_id, step, verdict
  * (accept|retry|escalate|continue), latency_ms, tokens_in, tokens_out,
  * is_retry, is_escalation, exit_status.
  */
object LogRollups {

  val LatencyThresholdMs = 60000L
  val TokenThreshold = 100000L
  val StepThreshold = 20L
  val RetryThreshold = 3L
  val EscalationThreshold = 2L

  /** L3 → L2: per-(run, node) detail with attention flags + reasons. */
  def l3ToL2(steps: DataFrame): DataFrame = {
    // null-tolerant: a step missing one token side still contributes
    // the other (null + x = null would drop the row from the sum)
    val tokens = coalesce(col("tokens_in"), lit(0L)) +
      coalesce(col("tokens_out"), lit(0L))
    steps
      .groupBy("run_id", "node_id")
      .agg(
        count(lit(1)).as("step_count"),
        sum(tokens).as("total_tokens"),
        sum("latency_ms").as("total_latency_ms"),
        sum(when(col("verdict") === "accept", 1).otherwise(0))
          .as("accept_count"),
        sum(when(col("verdict") === "retry", 1).otherwise(0))
          .as("retry_count"),
        sum(when(col("verdict") === "escalate", 1).otherwise(0))
          .as("escalate_count"),
        min("step").as("first_step"),
        max("step").as("last_step"),
        // the FINAL step's status — max_by is deterministic; a bare
        // last() depends on shuffle arrival order
        max_by(col("exit_status"), col("step")).as("exit_status"))
      .withColumn("attention_reasons", array_compact(array(
        when(col("retry_count") > RetryThreshold, "retries"),
        when(col("escalate_count") > EscalationThreshold, "escalations"),
        when(col("total_latency_ms") > LatencyThresholdMs, "latency"),
        when(col("total_tokens") > TokenThreshold, "tokens"),
        when(col("step_count") > StepThreshold, "steps"))))
      .withColumn("needs_attention", size(col("attention_reasons")) > 0)
  }

  /** L2 → L1: per-run summary. Quality rules (`executor.py:963-1045`):
    * failed if any node failed; degraded if any retries; else clean.
    * node_path is DEDUPLICATED first-visit order (the L2 grain is
    * (run, node), so revisits are not representable here) — the full
    * visit sequence comes from [[visitPath]] over the L3 steps or from
    * `SessionState.progress.path`. */
  def l2ToL1(details: DataFrame): DataFrame = {
    details
      .groupBy("run_id")
      .agg(
        count(lit(1)).as("node_count"),
        sum("step_count").as("total_steps"),
        sum("total_tokens").as("total_tokens"),
        sum("total_latency_ms").as("total_latency_ms"),
        max(col("needs_attention").cast("int")).cast("boolean")
          .as("needs_attention"),
        // node_path ordered by FIRST step seen per node (the reference
        // path order; last_step would misorder revisited nodes)
        array_sort(collect_list(struct(col("first_step"), col("node_id"))))
          .as("path_structs"),
        max(when(col("exit_status") === "failed", 1).otherwise(0))
          .as("any_failed"),
        sum("retry_count").as("total_retries"))
      .withColumn("node_path",
        transform(col("path_structs"), s => s.getField("node_id")))
      .withColumn("execution_quality",
        when(col("any_failed") === 1, "failed")
          .when(col("total_retries") > 0, "degraded")
          .otherwise("clean"))
      .withColumn("status",
        when(col("any_failed") === 1, "failed").otherwise("completed"))
      .drop("path_structs", "any_failed")
  }

  /** True node visit path per run from the L3 step log: consecutive
    * same-node steps collapse into one visit, revisits are kept
    * (`SessionState.progress.path` semantics — the path the L2 grain
    * cannot reconstruct). */
  def visitPath(steps: DataFrame): DataFrame =
    steps
      .groupBy("run_id")
      .agg(array_sort(collect_list(struct(col("step"), col("node_id"))))
        .as("ordered"))
      .select(col("run_id"),
        expr("""filter(
          transform(ordered, (s, i) ->
            CASE WHEN i = 0 OR ordered[i-1].node_id != s.node_id
                 THEN s.node_id END),
          x -> x IS NOT NULL)""").as("node_path"))

  /** Tail-N recent verdicts per (run, node) — the worker-monitoring
    * window query (`worker_monitoring_tools.py:152-156`). */
  def recentVerdicts(steps: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("run_id", "node_id")
      .orderBy(col("step").desc)
    steps.withColumn("recency", row_number().over(w))
      .filter(col("recency") <= n)
  }

  /** Steps since last accept per (run, node)
    * (`worker_monitoring_tools.py:158-163`): trailing distance from the
    * running max accept-step. */
  def stepsSinceLastAccept(steps: DataFrame): DataFrame = {
    val w = Window.partitionBy("run_id", "node_id").orderBy("step")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    steps
      .withColumn("last_accept_step",
        max(when(col("verdict") === "accept", col("step"))).over(w))
      .withColumn("steps_since_accept",
        when(col("last_accept_step").isNull, col("step"))
          .otherwise(col("step") - col("last_accept_step")))
  }
}
