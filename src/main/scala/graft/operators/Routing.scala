package graft.operators

import graft.functions.SafeEval
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Edge-condition evaluation and routing (SURVEY §2.2, §2.10).
  *
  * Reference semantics (`core/framework/graph/edge.py`):
  *  - condition kinds ALWAYS / ON_SUCCESS / ON_FAILURE /
  *    CONDITIONAL(expr) / LLM_DECIDE (`edge.py:39-46`);
  *  - CONDITIONAL evaluates a safe_eval expr over output∪memory, a
  *    failed eval is False (`edge.py:107-204`);
  *  - LLM_DECIDE is non-deterministic; its documented fallback is
  *    source-success (`edge.py:146-147,271-274`) — the fallback IS the
  *    deterministic default here, the LLM impl stays a pluggable
  *    boundary (SURVEY §7.4);
  *  - routing picks the first traversable edge by descending priority
  *    (`edge.py:497-500`, `executor.py:1692-1770`);
  *  - `input_mapping` projects/renames source keys
  *    (`edge.py:276-303`).
  */
object Routing {

  sealed trait EdgeCondition
  case object Always extends EdgeCondition
  case object OnSuccess extends EdgeCondition
  case object OnFailure extends EdgeCondition
  final case class Conditional(expr: String) extends EdgeCondition
  case object LlmDecide extends EdgeCondition // deterministic fallback

  /** Traversability predicate for one edge over a state row that
    * carries a boolean `source_success` column plus flattened
    * output/memory columns. */
  def traversable(cond: EdgeCondition,
      schema: StructType = new StructType()): Column = cond match {
    case Always => lit(true)
    case OnSuccess => col("source_success")
    case OnFailure => !col("source_success")
    case Conditional(e) => SafeEval.condition(e, schema)
    case LlmDecide => col("source_success") // edge.py:271-274 fallback
  }

  /** First-match routing: given per-row candidate edges (one row per
    * (state_id, edge)), keep the highest-priority traversable edge per
    * state. Ties break on target name for determinism. */
  def firstMatch(candidates: DataFrame, traversableCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("state_id")
      .orderBy(col("priority").desc, col("target"))
    candidates
      .filter(traversableCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** `input_mapping` projection: {targetKey -> sourceKey}; source key
    * resolved in output first, then memory (`edge.py:276-303`). Output
    * and memory are map columns on the state row. */
  def applyInputMapping(state: DataFrame,
      mapping: Map[String, String]): DataFrame = {
    val cols = mapping.toSeq.sortBy(_._1).map { case (tgt, src) =>
      coalesce(element_at(col("output"), src),
        element_at(col("memory"), src)).as(tgt)
    }
    state.select(col("state_id") +: cols: _*)
  }
}
