package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Session-state store reader (SURVEY §1.1, §2.1).
  *
  * The reference persists one JSON document per session at
  * `sessions/{session_id}/state.json` (`storage/backend.py:4-6`) and
  * answers list queries by scanning the directory, filtering on
  * status, sorting by recency and limiting
  * (`storage/session_store.py:121-173`) — N+1 file reads per query.
  * Here the same layout is ONE `spark.read.json` with an explicit
  * schema (no sampling pass, malformed files land in
  * `_corrupt_record` instead of failing the scan), and the computed
  * fields `duration_ms` / `is_resumable`
  * (`schemas/session_state.py:146-175`) are derived columns.
  *
  * At 100 TB the glob becomes a date-partitioned compaction output;
  * the query code is unchanged (SURVEY §7.4.5).
  */
object SessionSource {

  /** Explicit schema for `SessionState` v1.1
    * (`schemas/session_state.py:85-144`). Open-schema extras survive
    * in `_corrupt_record`-free permissive mode only if declared — the
    * analytics contract needs exactly these columns. */
  val schema: StructType = StructType(Seq(
    StructField("schema_version", StringType),
    StructField("session_id", StringType),
    StructField("stream_id", StringType),
    StructField("correlation_id", StringType),
    StructField("status", StringType),
    StructField("goal_id", StringType),
    StructField("agent_id", StringType),
    StructField("entry_point", StringType),
    StructField("timestamps", StructType(Seq(
      StructField("started_at", StringType),
      StructField("updated_at", StringType),
      StructField("completed_at", StringType),
      StructField("paused_at_time", StringType)))),
    StructField("progress", StructType(Seq(
      StructField("current_node", StringType),
      StructField("paused_at", StringType),
      StructField("resume_from", StringType),
      StructField("steps_executed", LongType),
      StructField("total_tokens", LongType),
      StructField("total_latency_ms", LongType),
      StructField("path", ArrayType(StringType)),
      StructField("total_retries", LongType),
      StructField("nodes_with_failures", ArrayType(StringType)),
      StructField("retry_details", MapType(StringType, LongType)),
      StructField("had_partial_failures", BooleanType),
      StructField("execution_quality", StringType),
      StructField("node_visit_counts", MapType(StringType, LongType))))),
    StructField("result", StructType(Seq(
      StructField("success", BooleanType),
      StructField("error", StringType)))),
    StructField("memory", MapType(StringType, StringType)),
    StructField("isolation_level", StringType),
    StructField("checkpoint_enabled", BooleanType),
    StructField("latest_checkpoint_id", StringType),
    StructField("_corrupt_record", StringType)))

  /** Load every session state under `root` (glob
    * `root/<asterisk>/state.json`), dropping corrupt documents, with
    * the computed columns:
    *  - `duration_ms`: completed−started in ms, 0 while running
    *    (`session_state.py:146-154`);
    *  - `is_resumable`: any non-completed status
    *    (`session_state.py:156-165`). */
  def load(spark: SparkSession, root: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$root/*/state.json")
      .filter(col("_corrupt_record").isNull && col("session_id").isNotNull)
      .drop("_corrupt_record")
      .withColumn("duration_ms",
        coalesce(
          unix_millis(try_to_timestamp(col("timestamps.completed_at"))) -
            unix_millis(try_to_timestamp(col("timestamps.started_at"))),
          lit(0L)))
      .withColumn("is_resumable", col("status") =!= "completed")

  /** The list-scan query (`session_store.py:121-173`): optional status
    * filter (plus the `needs_attention`-style pseudo-status
    * `resumable`), newest-first by started_at with session_id
    * tie-break, limit. */
  def scan(sessions: DataFrame, status: Option[String] = None,
      limit: Int = 100): DataFrame = {
    val filtered = status match {
      case Some("resumable") => sessions.filter(col("is_resumable"))
      case Some(s) => sessions.filter(col("status") === s)
      case None => sessions
    }
    filtered
      .orderBy(col("timestamps.started_at").desc, col("session_id"))
      .limit(limit)
  }

  /** The auto-discovery ordering (`worker_monitoring_tools.py:109-117`):
    * two-level sort — live sessions (`in_progress`/`running`) before
    * finished ones, then most-recent first (updated_at standing in for
    * the reference's file mtime, falling back to started_at), with a
    * session_id tie-break for determinism. `head(1)` of this is the
    * reference's `session_id == "auto"` resolution. */
  def scanPrioritized(sessions: DataFrame, limit: Int = 100): DataFrame =
    sessions
      .withColumn("status_priority",
        when(col("status").isin("in_progress", "running"), 0)
          .otherwise(1))
      .orderBy(col("status_priority"),
        coalesce(col("timestamps.updated_at"),
          col("timestamps.started_at")).desc,
        col("session_id"))
      .limit(limit)
      .drop("status_priority") // internal sort key, not contract schema

  /** Timestamp inference from the id format
    * `session_YYYYMMDD_HHMMSS_{uuid8}` for documents predating the
    * timestamps block (`runtime_log_store.py:290+`). */
  def inferStartedAt(sessionId: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    to_timestamp(
      regexp_extract(sessionId, "session_(\\d{8}_\\d{6})_", 1),
      "yyyyMMdd_HHmmss")
}
