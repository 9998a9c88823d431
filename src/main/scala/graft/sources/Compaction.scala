package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-files compaction (SURVEY §4.3, §7.4.5).
  *
  * The reference's storage layout is one JSON document per session and
  * append-only JSONL logs per run — at 100 TB that is the classic
  * small-files problem: every analytics query pays open()+parse per
  * tiny file. This job rewrites those layouts into date-partitioned
  * Parquet once, after which every query in the library runs off
  * columnar scans with partition pruning; the JSON path stays only for
  * the freshness tail (the reference itself migrated layouts the same
  * way, `runtime_log_store.py:50-74`).
  *
  * Partitioning contract:
  *  - `sessions` → `started_date=YYYY-MM-DD/` (list-scans filter on
  *    recency and status; date prunes, status is a row filter);
  *  - `events` → `event_date=YYYY-MM-DD/` from the event timestamp.
  *
  * File sizing: one `repartition(N, partitionCol)` before the write so
  * each partition lands in ~`targetFiles` files instead of
  * one-per-task — the knob that keeps 128 MB-ish objects at scale.
  */
object Compaction {

  /** Compact `sessions/<asterisk>/state.json` into date-partitioned
    * Parquet. Returns the compacted row count. */
  def compactSessions(spark: SparkSession, sessionsRoot: String,
      outDir: String, targetFiles: Int = 1): Long = {
    val df = SessionSource.load(spark, sessionsRoot)
      .withColumn("started_date",
        to_date(try_to_timestamp(col("timestamps.started_at"))))
    // hash-partitioning by the date alone funnels each whole date
    // through ONE task (one giant file, a straggler on hot dates); a
    // stable salt from the row key splits every date across
    // ~targetFiles writers
    df.repartition(
        col("started_date"),
        pmod(hash(col("session_id")), lit(targetFiles)))
      .write
      .partitionBy("started_date")
      .mode("overwrite")
      .parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** Compact an events JSONL log directory (the `HIVE_DEBUG_EVENTS`
    * layout, `event_bus.py:28-56`) into date-partitioned Parquet.
    * Reads the reference's own serialization (snake_case fields, ISO
    * `timestamp` — `event_bus.py:150-162`) via
    * [[graft.streaming.EventStream.batchFromJsonl]]. */
  def compactEvents(spark: SparkSession, jsonlDir: String,
      outDir: String, targetFiles: Int = 1): Long = {
    val df = graft.streaming.EventStream.batchFromJsonl(spark, jsonlDir)
      .withColumn("event_date", to_date(col("ts")))
    df.repartition(
        col("event_date"), pmod(hash(col("ts")), lit(targetFiles)))
      .write
      .partitionBy("event_date")
      .mode("overwrite")
      .parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** Bucketed compaction for co-located joins: both sides of a
    * recurring large-large equi-join (e.g. runs ⋈ decisions on
    * run_id) written with the same bucket spec join WITHOUT a shuffle
    * — each bucket pair joins locally. This is the pre-pay-the-shuffle
    * lever for the 100 TB recurring-join workload; one-off joins keep
    * using plain partitioned parquet. Requires a catalog table (the
    * bucket metadata lives in the metastore). */
  def compactBucketedForJoin(df: DataFrame, tableName: String,
      key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Z-order clustered write — the PRODUCTION half of
    * `s18_zorder_layout` (Delta/Iceberg `OPTIMIZE ZORDER BY`): cluster
    * `df` along the Morton curve of two numeric dimensions and write
    * `files` parquet files whose per-file min/max zone maps are narrow
    * in BOTH dimensions, so a scan with a predicate on either one
    * prunes most files. s18 PLANS the layout (exact NTILE cuts, the
    * measurable zone-map report); this EXECUTES it the way a cluster
    * does — `repartitionByRange(zkey)` + `sortWithinPartitions` + one
    * file per partition. Range boundaries come from Spark's reservoir
    * sampling, so file sizes are approximately (not exactly) equal —
    * the production trade for having no single-partition stage at any
    * scale. The key is [[graft.functions.Fns.morton8]] — the SAME bit
    * layout s18's audited plan uses, so the planner's report and the
    * written files cut along the same curve.
    *
    * Returns the written files' zone maps (one row per file:
    * n_rows + min/max of each dimension) read back from the output —
    * the statistics a scan planner prunes with, verifiable directly. */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String,
      outDir: String, files: Int = 32): DataFrame = {
    val g = df.agg(
      min(col(dimA)).as("a0"), max(col(dimA)).as("a1"),
      min(col(dimB)).as("b0"), max(col(dimB)).as("b1"))
    val z = df.crossJoin(broadcast(g))
      .withColumn("__na", least(lit(255L),
        expr(s"($dimA - a0) * 256 div (a1 - a0 + 1)")))
      .withColumn("__nb", least(lit(255L),
        expr(s"($dimB - b0) * 256 div (b1 - b0 + 1)")))
      .withColumn("__zkey",
        graft.functions.Fns.morton8(col("__na"), col("__nb")))
      .drop("a0", "a1", "b0", "b1", "__na", "__nb")
    z.repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(outDir)
    val spark = df.sparkSession
    spark.read.parquet(outDir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(dimA)).as(s"min_$dimA"), max(col(dimA)).as(s"max_$dimA"),
        min(col(dimB)).as(s"min_$dimB"), max(col(dimB)).as(s"max_$dimB"))
  }

  /** Freshness-tail union: compacted Parquet ∪ the raw JSON written
    * since the last compaction run — the query-time view that makes
    * compaction invisible to readers. */
  def sessionsView(spark: SparkSession, compactedDir: String,
      freshRoot: Option[String]): DataFrame = {
    val compacted = spark.read.parquet(compactedDir)
    freshRoot match {
      case Some(root) =>
        import org.apache.spark.sql.expressions.Window
        val fresh = SessionSource.load(spark, root)
          .withColumn("started_date",
            to_date(try_to_timestamp(col("timestamps.started_at"))))
        // dedup must PREFER the fresh row (a session updated since the
        // last compaction has newer state); dropDuplicates keeps an
        // arbitrary shuffle-order row, so rank explicitly
        val w = Window.partitionBy("session_id").orderBy(
          col("__fresh").desc, col("timestamps.updated_at").desc)
        compacted.withColumn("__fresh", lit(0))
          .unionByName(fresh.withColumn("__fresh", lit(1)),
            allowMissingColumns = true)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__fresh", "__rn")
      case None => compacted
    }
  }
}
