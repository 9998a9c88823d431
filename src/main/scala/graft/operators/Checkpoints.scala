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

  /** Latest clean checkpoint per session
    * (`checkpoint.py:171-177`): newest `is_clean` row, checkpoint_id
    * tie-break for determinism. */
  def latestClean(checkpoints: DataFrame): DataFrame = {
    val w = Window.partitionBy("session_id")
      .orderBy(col("created_at").desc, col("checkpoint_id").desc)
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
