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
  * DuckDB via [[Fns.hash60Sql]]). [[assignSplits]] is a pure narrow
  * projection — zero shuffles at any scale; [[stratifiedSample]] pays
  * exactly one shuffle (the per-stratum window) to deliver EXACT
  * fractions.
  */
object Sampling {

  private def requireFree(df: DataFrame, names: String*): Unit =
    names.foreach(n => require(!df.columns.contains(n),
      s"input already has a '$n' column — rename it before sampling"))

  private def bucket(idCol: Column): Column =
    Fns.hash60(idCol.cast("string")) % 100

  /** Hash-bucket split assignment: `splits` = (name, cumulative upper
    * percent), e.g. `Seq("train" -> 80, "val" -> 90, "test" -> 100)`.
    * Adds a `split` column; rows keep their assignment forever as the
    * corpus grows. A null id yields a null split (not a silent
    * landing in the last bucket). */
  def assignSplits(df: DataFrame, idCol: Column,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.last._2 == 100,
      "split upper bounds must be cumulative percents ending at 100")
    require(splits.map(_._2) == splits.map(_._2).sorted &&
      splits.map(_._2).distinct == splits.map(_._2) &&
      splits.head._2 > 0,
      "split bounds must be strictly increasing and start above 0 — " +
        "otherwise a split is silently unreachable")
    requireFree(df, "split")
    val b = bucket(idCol)
    // CASE chain in declaration order, so the earliest bound wins —
    // the cumulative-percent contract
    val ordered = splits.init.foldRight(lit(splits.last._1): Column) {
      case ((name, hi), rest) => when(b < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", when(b.isNotNull, ordered))
  }

  /** Train/test contamination check — the decontamination pass every
    * training pipeline needs: rows in `heldSplit` whose content key
    * also appears in `trainSplit` (duplicate documents straddling the
    * split leak eval data into training). Requires the `split` column
    * from [[assignSplits]]. `keyCol` is the content identity: raw
    * text (hashed here to a hex digest so only the digest shuffles),
    * or — with `hashKey = false` — an already-content-derived key
    * like d05's winnowing fingerprint, joined as-is (an 8-byte long
    * shuffles instead of a 32-char digest string). One groupBy + one
    * equi-join on the key — the d01 exact-dedup shuffle shape, never
    * the text. */
  def contamination(assigned: DataFrame, keyCol: Column,
      trainSplit: String = "train", heldSplit: String = "test",
      hashKey: Boolean = true): DataFrame = {
    requireFree(assigned, "_graft_key")
    val keyed = assigned.withColumn("_graft_key",
      if (hashKey) md5(keyCol) else keyCol)
    val train = keyed.filter(col("split") === trainSplit)
      .groupBy("_graft_key").agg(count(lit(1)).as("n_train_dups"))
    keyed.filter(col("split") === heldSplit)
      .join(train, "_graft_key")
      .drop("_graft_key")
  }

  /** Exact-fraction per-stratum sample: the first `ceil(frac · n)`
    * rows of each stratum in (hash, id) order — deterministic, exact
    * proportions per stratum (a bucket filter only approximates them
    * on small strata). The product rounds to 6 decimals before the
    * ceil so IEEE noise cannot inflate the count (0.07·100 is
    * 7.000000000000001 in doubles — raw ceil would take 8 rows);
    * fractions are treated as exact to 6 decimal places. */
  def stratifiedSample(df: DataFrame, idCol: Column,
      stratumCol: Column, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    requireFree(df, "_graft_rn", "_graft_n")
    val hv = Fns.hash60(idCol.cast("string"))
    val w = Window.partitionBy(stratumCol).orderBy(hv, idCol)
    val n = Window.partitionBy(stratumCol)
    df.withColumn("_graft_rn", row_number().over(w))
      .withColumn("_graft_n", count(lit(1)).over(n))
      .filter(col("_graft_rn") <=
        ceil(round(lit(frac) * col("_graft_n"), 6)).cast("long"))
      .drop("_graft_rn", "_graft_n")
  }

  /** Token-budget quota sampling — the data-mixing step that caps each
    * stratum (source, language, domain) at a weight budget: rows are
    * taken in deterministic (hash, id) order until the stratum's
    * cumulative weight would stay within `budget` (the first row
    * crossing the budget is dropped along with everything after it).
    * Content-hash order makes the take a representative sample rather
    * than a prefix of ingestion order; one window shuffle on the
    * stratum key. NOT growth-stable (a new doc can hash into the kept
    * range and push the tail out) — quota sampling is inherently a
    * snapshot decision; pin the corpus version for reproducibility.
    * Output keeps the surviving rows plus `cum_weight` (the stratum's
    * running total INCLUDING this row). */
  def takeWeightBudget(df: DataFrame, idCol: Column, stratumCol: Column,
      weightCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    requireFree(df, "cum_weight")
    val hv = Fns.hash60(idCol.cast("string"))
    val w = Window.partitionBy(stratumCol).orderBy(hv, idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_weight",
        sum(weightCol.cast("long")).over(w))
      .filter(col("cum_weight") <= budget)
  }

  /** Sequence-packing offsets for training: documents concatenate in
    * (shard, id) order and cut into fixed-`capacity` token sequences
    * — each row gets the sequence index and intra-sequence offset
    * where its text starts (simple concat-packing: a document may
    * straddle a boundary and continue in the next sequence). Shards
    * are independent window partitions, so packing parallelizes
    * across executors at any corpus size while staying deterministic;
    * the one shuffle is the shard-keyed window sort. Output adds
    * `shard`, `start_pos`, `seq_index`, `seq_offset`. */
  def packSequences(df: DataFrame, idCol: Column, tokensCol: Column,
      shards: Int, capacity: Long): DataFrame = {
    require(shards > 0 && capacity > 0, "shards and capacity must be > 0")
    requireFree(df, "shard", "start_pos", "seq_index", "seq_offset",
      "_graft_tok")
    val w = Window.partitionBy(col("shard")).orderBy(idCol)
    df.withColumn("shard", pmod(idCol, lit(shards.toLong)))
      .withColumn("_graft_tok", tokensCol.cast("long"))
      .withColumn("start_pos",
        sum(col("_graft_tok")).over(w) - col("_graft_tok"))
      .withColumn("seq_index", expr(s"start_pos div ${capacity}L"))
      .withColumn("seq_offset", col("start_pos") % capacity)
      .drop("_graft_tok")
  }
}
