package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Checkpoint-index queries (SURVEY §2.5, §2.9; reference
  * `schemas/checkpoint.py:14-177`, `storage/checkpoint_store.py`).
  *
  * Expected columns: session_id, checkpoint_id, checkpoint_type
  * (node_start | node_complete | pause), current_node, created_at
  * (timestamp), is_clean.
  */
object Checkpoints {

  /** Latest clean checkpoint per session (`checkpoint.py:175-178`):
    * the reference's index is an appended list and latest-clean is
    * `clean[-1]` — pure insertion order. If the input carries a
    * monotonic insertion sequence column `seq` (the relational analog
    * of list position), order by it exactly; otherwise fall back to
    * `created_at` desc with a `checkpoint_id` desc tie-break — a
    * deliberate determinism delta from list order that only differs
    * when two clean checkpoints share a same-second `created_at` AND
    * their id lexicographic order disagrees with insertion order. */
  def latestClean(checkpoints: DataFrame): DataFrame = {
    val order =
      if (checkpoints.columns.contains("seq")) Seq(col("seq").desc)
      else Seq(col("created_at").desc, col("checkpoint_id").desc)
    val w = Window.partitionBy("session_id").orderBy(order: _*)
    checkpoints
      .filter(col("is_clean"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Age-based pruning predicate (`checkpoint_store.py:199-239`):
    * checkpoints to KEEP given a cutoff timestamp — deletion is the
    * caller's sink-side concern. */
  def withinAge(checkpoints: DataFrame,
      cutoff: java.sql.Timestamp): DataFrame =
    checkpoints.filter(col("created_at") >= lit(cutoff))

  /** Resume-point resolution (`executor.py:405-457`): per session the
    * node to resume from — the latest clean checkpoint's current_node,
    * else null (caller falls back to the entry point, mirroring
    * `session_state.py:156-165`). */
  def resumePoints(checkpoints: DataFrame): DataFrame =
    latestClean(checkpoints)
      .select(col("session_id"),
        col("current_node").as("resume_from"),
        col("checkpoint_id").as("resume_checkpoint_id"))
}
