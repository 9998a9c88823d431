package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Deterministic sampling / split assignment for training-data
  * pipelines (BASELINE.json north star: the operators a 100 TB corpus
  * pipeline needs beyond the reference's own surface).
  *
  * Both operators key on the content-stable [[Fns.hash60]] of the row
  * id — NOT `rand()` — for three scale properties: (1) retry-safe
  * (SPARK-23207 class: a recomputed partition reassigns identically);
  * (2) growth-stable (adding documents never moves an existing row's
  * split, so yesterday's train set is a subset of today's); (3)
  * cross-engine reproducible (the same md5 construction verifies in
  * DuckDB). [[assignSplits]] is a pure narrow projection — zero
  * shuffles at any scale; [[stratifiedSample]] pays exactly one
  * shuffle (the per-stratum window) to deliver EXACT fractions.
  */
object Sampling {

  private def bucket(idCol: Column): Column =
    Fns.hash60(idCol.cast("string")) % 100

  /** Hash-bucket split assignment: `splits` = (name, cumulative upper
    * percent), e.g. `Seq("train" -> 80, "val" -> 90, "test" -> 100)`.
    * Adds a `split` column; rows keep their assignment forever as the
    * corpus grows. */
  def assignSplits(df: DataFrame, idCol: Column,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.last._2 == 100,
      "split upper bounds must be cumulative percents ending at 100")
    require(splits.map(_._2) == splits.map(_._2).sorted &&
      splits.map(_._2).distinct == splits.map(_._2),
      "split bounds must be strictly increasing — an out-of-order " +
        "bound makes a split silently unreachable")
    val b = bucket(idCol)
    // CASE chain in declaration order, so the earliest bound wins —
    // the cumulative-percent contract
    val ordered = splits.init.foldRight(lit(splits.last._1): Column) {
      case ((name, hi), rest) => when(b < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", ordered)
  }

  /** Train/test contamination check — the decontamination pass every
    * training pipeline needs: rows in `heldSplit` whose content hash
    * also appears in `trainSplit` (duplicate documents straddling the
    * split leak eval data into training). Requires the `split` column
    * from [[assignSplits]] and a content column. One groupBy + one
    * equi-join on the 16-byte content hash — the d01 exact-dedup
    * shuffle shape, never the text. */
  def contamination(assigned: DataFrame, contentCol: Column,
      trainSplit: String = "train", heldSplit: String = "test"):
      DataFrame = {
    val hashed = assigned.withColumn("_h", md5(contentCol))
    val train = hashed.filter(col("split") === trainSplit)
      .groupBy("_h").agg(count(lit(1)).as("n_train_dups"))
    hashed.filter(col("split") === heldSplit)
      .join(train, "_h")
      .drop("_h")
  }

  /** Exact-fraction per-stratum sample: the first `ceil(frac · n)`
    * rows of each stratum in (hash, id) order — deterministic, exact
    * proportions per stratum (a bucket filter only approximates them
    * on small strata). */
  def stratifiedSample(df: DataFrame, idCol: Column,
      stratumCol: Column, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val hv = Fns.hash60(idCol.cast("string"))
    val w = Window.partitionBy(stratumCol).orderBy(hv, idCol)
    val n = Window.partitionBy(stratumCol)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(n))
      .filter(col("_rn") <= ceil(lit(frac) * col("_n")).cast("long"))
      .drop("_rn", "_n")
  }
}
