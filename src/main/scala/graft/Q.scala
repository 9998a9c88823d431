package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark-first implementation plus
  * (when SQL-expressible) the DuckDB oracle the driver diff-tests
  * against. Keeping both in one value keeps column aliases in sync —
  * the driver's compare sorts columns BY NAME before hashing.
  *
  * Oracle-parity rules used throughout the inventory:
  *  - money/ratio aggregations run in exact DECIMAL (order-independent,
  *    bit-identical across engines), cast to DOUBLE only at the end;
  *  - divisions happen in IEEE double on exact inputs (deterministic);
  *  - timestamps are compared at epoch-millisecond precision (events.ts
  *    is ns in parquet; Spark reads the full ns value via nanosAsLong,
  *    DuckDB 1.x reads it µs-TRUNCATED — so raw-ts comparisons against
  *    the oracle are only safe at µs or coarser; ms is the precision
  *    the inventory standardizes on);
  *  - every ORDER BY ... LIMIT has a unique-key tiebreak so both
  *    engines select the same row set.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
