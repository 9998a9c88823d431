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

  /** The LLM plug-point (SURVEY §7.4) made first-class: the three
    * places the reference calls a live model take THIS boundary, and
    * every method's default is the reference's own documented
    * deterministic fallback — so the engine analyzes identically with
    * no client plugged, and a live client (a verdict table joined in,
    * a scoring pandas-UDF, a real API caller resolved ahead of the
    * plan) changes DECISIONS, never plan shapes: each hook returns a
    * Column over the state row and composes into the same when-chains
    * and projections the fallbacks use.
    *
    *  - [[decideEdge]]: LLM_DECIDE traversability
    *    (`edge.py:206-274`; fallback `:271-274` = source success);
    *  - [[judgeVerdict]]: the conversation judge
    *    (`event_loop_node.py:1839-1931`; deterministic part =
    *    [[implicitJudge]]);
    *  - [[cleanOutput]]: LLM output cleaning (`output_cleaner.py:209+`;
    *    deterministic fallback = balanced-brace extraction + repair).
    */
  trait LlmBoundary extends Serializable {
    def decideEdge(source: String, target: String,
        successCol: Column): Column = successCol
    def judgeVerdict(toolCalls: Column, missingKeys: Column,
        nullableOnlyNoneSet: Column): Column =
      implicitJudge(toolCalls, missingKeys, nullableOnlyNoneSet)
    def cleanOutput(raw: Column): Column =
      graft.functions.JsonRepair.extractJson(raw)
  }
  object LlmBoundary {
    /** All three reference fallbacks, unmodified. */
    object Fallback extends LlmBoundary
  }

  /** Traversability predicate for one edge over a state row that
    * carries a boolean `source_success` column plus flattened
    * output/memory columns. LLM_DECIDE routes through the boundary
    * (default: the reference's source-success fallback); callers that
    * know the edge's endpoints pass them so a plugged boundary that
    * routes on edge identity sees the real names — GraphRunner's
    * compiled chain always does. */
  def traversable(cond: EdgeCondition,
      schema: StructType = new StructType(),
      llm: LlmBoundary = LlmBoundary.Fallback,
      source: String = "", target: String = ""): Column = cond match {
    case Always => lit(true)
    case OnSuccess => col("source_success")
    case OnFailure => !col("source_success")
    case Conditional(e) => SafeEval.condition(e, schema)
    case LlmDecide => llm.decideEdge(source, target, col("source_success"))
  }

  /** First-match routing: given per-row candidate edges (one row per
    * (state_id, edge)), keep the highest-priority traversable edge per
    * state. Ties break on target name for determinism.
    *
    * This is the DATAFRAME-grain variant for edge sets too large or
    * too dynamic to bake into the plan (per-tenant edge tables, edges
    * themselves produced by a query). When the edge set is
    * driver-scale — every workflow graph — [[GraphRunner]] compiles
    * the same (priority desc, target asc) rule into a `when`-chain
    * instead, which routes with ZERO shuffles per round where this
    * window pays one; the spec asserts the two agree row-for-row. */
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

  /** Memory ACL enforcement (`node.py:288-308,436-452`): project the
    * state down to the allowed keys; requesting a key outside the
    * grant throws, mirroring the reference's PermissionError. */
  def enforceAcl(state: DataFrame, allowed: Set[String],
      requested: Seq[String]): DataFrame = {
    val denied = requested.filterNot(allowed)
    require(denied.isEmpty,
      s"memory ACL violation: ${denied.mkString(", ")} not readable")
    state.select(requested.map(col): _*)
  }

  /** Parallel-branch memory merge (`executor.py:73-99,1853-2082`):
    * branch outputs keyed (state_id, key, value, branch_idx) fold to
    * one value per key under the reference's deterministic conflict
    * strategies — `last_wins` (highest branch index), `first_wins`
    * (lowest), `error` (any conflict throws). */
  def mergeBranches(outputs: DataFrame, strategy: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    strategy match {
      case "last_wins" | "first_wins" =>
        val ord = if (strategy == "last_wins") col("branch_idx").desc
          else col("branch_idx").asc
        val w = Window.partitionBy("state_id", "key").orderBy(ord)
        outputs.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("state_id", "key", "value")
      case "error" =>
        val conflicts = outputs.groupBy("state_id", "key")
          .agg(countDistinct(col("branch_idx")).as("n"))
          .filter(col("n") > 1)
        if (!conflicts.isEmpty)
          throw new IllegalStateException(
            "memory conflict between parallel branches")
        outputs.select("state_id", "key", "value")
      case other =>
        throw new IllegalArgumentException(
          s"unknown merge strategy: $other")
    }
  }

  /** Output validation (`graph/validator.py`; `event_loop_node.py:
    * 2035-2046`): keys a node declared but did not set — required
    * minus present, as an array column over the output map. */
  def missingOutputKeys(output: Column, required: Column): Column =
    array_except(required, map_keys(output))

  /** Dynamic fan-out detection (`executor.py:1771-1818`): per state,
    * the count of currently-traversable edges; >1 means the execution
    * fans out. `candidates` rows are (state_id, edge…) as in
    * [[firstMatch]]. */
  def dynamicFanout(candidates: DataFrame,
      traversableCol: Column): DataFrame =
    candidates.filter(traversableCol)
      .groupBy("state_id")
      .agg(count(lit(1)).as("n_traversable"))
      .withColumn("is_fanout", col("n_traversable") > 1)

  /** The implicit-judge accept predicate (`event_loop_node.py:
    * 1839-1931`, deterministic part — SURVEY §2.10): a node result is
    * accepted when the turn made no tool calls AND no required output
    * key is missing; the all-nullable-but-none-set case retries. Rows:
    * tool_calls array, missing_keys array, nullable_only boolean. */
  def implicitJudge(toolCalls: Column, missingKeys: Column,
      nullableOnlyNoneSet: Column): Column =
    when(size(toolCalls) === 0 && size(missingKeys) === 0 &&
      !nullableOnlyNoneSet, "accept")
      .otherwise("retry")
}
