package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (the 100 TB design lever the builder
  * contract calls out: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split (on by default) handles sort-merge joins;
  * explicit salting remains the tool for skewed AGGREGATIONS and for
  * hub keys in self-joins (the d02 shingle join's "hub shingle" case).
  */
object Skew {

  /** Content-derived salt in [0, buckets): deterministic per ROW
    * content, so a fetch-failure recompute of some map tasks re-derives
    * the SAME salt for the same row — `rand()` is only deterministic
    * per (partition, row order) and double-counts/drops rows when a
    * retry reorders input (the SPARK-23207 class of bug). Identical
    * duplicate rows share a salt; spreading depends on row diversity,
    * which skewed-hot-key inputs have by construction. */
  private def contentSalt(df: DataFrame, buckets: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(buckets))

  /** Salted large-to-small join: the skewed (large) side gets a
    * content-derived salt in [0, buckets); the small side is
    * replicated `buckets` ways — the shuffle key becomes (key, salt),
    * splitting each hot key across `buckets` reducers. Semantics
    * identical to `large.join(small, keys, "left")` for 1:1
    * small-side keys. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val salted = large.withColumn("__salt", contentSalt(large, buckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), "left").drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on
    * (key, salt), then final merge on key. `partial` builds the salted
    * partials from (groupBy over key+salt); `merge` folds partials —
    * e.g. partial=sum → merge=sum, partial=count → merge=sum. */
  def twoPhaseAgg(df: DataFrame, key: String, buckets: Int,
      valueCol: Column, partialAgg: Column => Column,
      mergeAgg: Column => Column): DataFrame =
    df.withColumn("__salt", contentSalt(df, buckets))
      .groupBy(col(key), col("__salt"))
      .agg(partialAgg(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(mergeAgg(col("__partial")).as("value"))
}
