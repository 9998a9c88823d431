package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Reuse pin for DataFrames that fan out into several consumers (both
  * sides of a self-join, iteration state in BFS loops).
  *
  * Mode knob `spark.graft.pin` (session conf):
  *  - `localCheckpoint` (default): eager, truncates lineage, stores
  *    non-replicated executor-local blocks. Right for local[N] and for
  *    iterative loops where lineage growth would bloat the planner —
  *    but a lost executor fails the job, so on a real cluster prefer:
  *  - `persist`: MEMORY_AND_DISK cache with lineage kept — a lost
  *    block recomputes from the parquet scan instead of failing the
  *    job. Iterative callers stay correct (plan depth grows per round
  *    but rounds are bounded by graph diameter).
  *  - `none`: no pin (the subtree recomputes per consumer; useful for
  *    measuring what a pin is worth).
  */
object Pin {
  val Key = "spark.graft.pin"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(Key).getOrElse("localCheckpoint") match {
      case "persist" => df.persist(StorageLevel.MEMORY_AND_DISK)
      case "none" => df
      case _ => df.localCheckpoint(true)
    }
}
