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
