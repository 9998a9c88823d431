package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted goal-progress evaluation (SURVEY §2.4; reference
  * `runtime/outcome_aggregator.py:225-402`).
  *
  *  - a decision is "related" to a criterion when their keyword sets
  *    overlap in ≥ 2 words (`:376-383`) — tokenization = lowercase
  *    whitespace split;
  *  - per-criterion progress = success rate of related decisions;
  *  - overall = Σ(weight·progress)/Σweight (`:313-374`);
  *  - recommendation: complete ≥ 0.95; adjust < 0.3 with > 10
  *    decisions; else continue (`:385-402`).
  *
  * criteria: goal_id, criterion_id, description, weight;
  * decisions: goal_id, intent, success.
  */
object GoalProgress {

  private def words(c: org.apache.spark.sql.Column) =
    // Python str.split() (no sep) splits on whitespace RUNS — tabs and
    // newlines included — and discards the empty tokens doubled/edge
    // whitespace produces; '' must not count as an overlap
    array_remove(array_distinct(split(lower(c), "\\s+")), "")

  /** Per-criterion progress: success rate over keyword-related
    * decisions (≥2 overlapping words). */
  def criterionProgress(criteria: DataFrame,
      decisions: DataFrame): DataFrame =
    criteria
      .join(decisions, Seq("goal_id"), "left")
      .withColumn("overlap",
        size(array_intersect(words(col("description")),
          words(col("intent")))))
      .withColumn("related", col("overlap") >= 2)
      .groupBy("goal_id", "criterion_id", "weight")
      .agg(
        sum(when(col("related"), 1).otherwise(0)).as("n_related"),
        coalesce(
          avg(when(col("related"),
            when(col("success"), 1.0).otherwise(0.0))),
          lit(0.0)).as("progress"))

  /** Overall weighted progress + recommendation per goal. */
  def goalProgress(criteria: DataFrame, decisions: DataFrame): DataFrame = {
    val perCriterion = criterionProgress(criteria, decisions)
    val nDecisions = decisions.groupBy("goal_id")
      .agg(count(lit(1)).as("n_decisions"))
    perCriterion
      .groupBy("goal_id")
      .agg((sum(col("weight") * col("progress")) / sum(col("weight")))
        .as("overall_progress"))
      .join(nDecisions, Seq("goal_id"), "left")
      .withColumn("n_decisions", coalesce(col("n_decisions"), lit(0L)))
      .withColumn("recommendation",
        when(col("overall_progress") >= 0.95, "complete")
          .when(col("overall_progress") < 0.3 && col("n_decisions") > 10,
            "adjust")
          .otherwise("continue"))
  }

  /** `Goal.is_success`: met weight ≥ 0.9 × total weight
    * (`goal.py:160-168`); a criterion counts as met at progress ≥ 1. */
  def isSuccess(criteria: DataFrame, decisions: DataFrame): DataFrame =
    criterionProgress(criteria, decisions)
      .groupBy("goal_id")
      .agg(
        sum(col("weight")).as("total_weight"),
        sum(when(col("progress") >= 1.0, col("weight")).otherwise(0.0))
          .as("met_weight"))
      .withColumn("is_success",
        col("met_weight") >= lit(0.9) * col("total_weight"))
}
