package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.types.StructField

import graft.plans.SqlGate

/** Warehouse-gateway query surface with the reference's BigQuery tool
  * contract (`bigquery_tool.py:149-392`), served by the Spark catalog
  * instead of a cloud API (this environment has no network; the
  * catalog is where JDBC-federated and file-backed tables both land).
  *
  * Contract mirrored:
  *  - `runQuery(sql, maxRows)` — read-only gate (write statements
  *    rejected with the same error/help envelope), `max_rows` bounds
  *    1..10000 (`bigquery_tool.py:206-214`), result envelope with
  *    `rows`, `total_rows`, `rows_returned`, `schema` (name/type/mode
  *    triples), `bytes_processed` (scan bytes, the cost-awareness
  *    number), `query_truncated`.
  *  - `describeDataset(datasetId)` — per-table `table_id` / `type` /
  *    `row_count` / `size_bytes` / `columns`, or the not-found error
  *    envelope (`bigquery_tool.py:330-385`).
  *
  * Differences, deliberate: the read-only check is the parsed-plan
  * [[SqlGate]] rather than the reference's keyword regex — a column
  * literally named `created_at` must not trip a `\bCREATE\b` scan, and
  * a write smuggled through a CTE must not pass one. Stricter on real
  * writes, laxer on false positives; the envelope is identical.
  *
  * Scale note: `total_rows` counts the full result distributed (one
  * Spark count job) and only `maxRows` rows are ever collected to the
  * driver — the reference streams-then-stops at `max_rows` on the
  * client for the same reason. `bytes_processed` sums the executed
  * scan nodes' `filesSize` metric — the bytes of the files selected
  * AFTER partition pruning (column pruning reduces actual I/O via
  * parquet column chunks but not this file-size accounting; BQ's
  * bytes_processed has the same partition-pruned, column-aware-only-
  * for-columnar-tables character).
  */
object BigQueryGateway {

  val MaxRowsCap = 10000
  val DefaultMaxRows = 1000

  final case class ColumnInfo(name: String, dataType: String, mode: String)
  final case class QueryResult(
      success: Boolean,
      rows: Seq[Row],
      totalRows: Long,
      rowsReturned: Int,
      schema: Seq[ColumnInfo],
      bytesProcessed: Long,
      queryTruncated: Boolean)
  final case class TableInfo(
      tableId: String,
      tableType: String,
      rowCount: Option[Long],
      sizeBytes: Option[Long],
      columns: Seq[ColumnInfo])
  final case class DatasetInfo(
      success: Boolean,
      datasetId: String,
      tables: Seq[TableInfo])
  /** Error envelope (`error` + optional `help`), as a throwable so
    * Scala callers can catch; fields mirror the reference's dict. */
  final case class GatewayError(error: String, help: Option[String])
    extends RuntimeException(error)

  private def columnInfo(f: StructField): ColumnInfo =
    ColumnInfo(f.name, f.dataType.sql,
      if (f.nullable) "NULLABLE" else "REQUIRED")

  /** Bytes actually read by the executed plan's scan nodes (parquet/
    * file scans expose `filesSize`; JDBC scans have no byte metric and
    * contribute 0). Descends query stages; counts each scan once. */
  private def bytesScanned(plan: SparkPlan): Long = {
    def walk(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case leaf if leaf.children.isEmpty =>
        leaf.metrics.get("filesSize").map(_.value).getOrElse(0L)
      case other => other.children.map(walk).sum
    }
    walk(plan)
  }

  /** `run_bigquery_query` (`bigquery_tool.py:149-243`). Throws
    * [[GatewayError]] with the reference's message/help text on a
    * blocked statement or out-of-bounds `maxRows`. */
  def runQuery(
      spark: SparkSession,
      sql: String,
      maxRows: Int = DefaultMaxRows): QueryResult = {
    if (maxRows < 1)
      throw GatewayError("max_rows must be at least 1", None)
    if (maxRows > MaxRowsCap)
      throw GatewayError(s"max_rows cannot exceed $MaxRowsCap",
        Some("For larger result sets, consider using pagination or " +
          "exporting to distributed storage."))
    val gated =
      try {
        if (!SqlGate.isSelectOnly(spark, sql))
          throw GatewayError("Write operations are not allowed",
            Some("Only SELECT queries are permitted. INSERT, UPDATE, " +
              "DELETE, DROP, CREATE, ALTER, TRUNCATE, and MERGE are " +
              "blocked."))
        spark.sql(sql)
      } catch {
        case e: GatewayError => throw e
        case NonFatal(e) =>
          throw GatewayError(s"Query failed: ${e.getMessage}", None)
      }
    // one distributed count for total_rows; only maxRows rows ever
    // reach the driver
    val totalRows = gated.count()
    val limited = gated.limit(maxRows)
    val rows = limited.collect().toSeq
    QueryResult(
      success = true,
      rows = rows,
      totalRows = totalRows,
      rowsReturned = rows.size,
      schema = gated.schema.fields.toSeq.map(columnInfo),
      bytesProcessed = bytesScanned(limited.queryExecution.executedPlan),
      queryTruncated = totalRows > maxRows)
  }

  /** `describe_dataset` (`bigquery_tool.py:277-392`) over a Spark
    * catalog database. Temp views (how this engine registers parquet
    * and JDBC tables) live in the session's current database under
    * catalog listing; their backing row count and on-disk size come
    * from the optimized plan's statistics — file-source stats are
    * footer/metadata-derived, no data scan. */
  def describeDataset(
      spark: SparkSession, datasetId: String): DatasetInfo = {
    if (datasetId == null || datasetId.trim.isEmpty)
      throw GatewayError("dataset_id is required", None)
    val tables =
      try spark.catalog.listTables(datasetId).collect().toSeq
      catch {
        case NonFatal(e) =>
          throw GatewayError(s"Dataset not found: $datasetId",
            Some("Check that the dataset exists and you have access " +
              s"to it. Full error: ${e.getMessage}"))
      }
    val infos = tables.sortBy(_.name).map { t =>
      val df = spark.table(t.name)
      val stats = df.queryExecution.optimizedPlan.stats
      // views report no storage numbers, mirroring BQ (`row_count:
      // None for views`); tables report metadata-derived stats
      val isView = t.tableType == "VIEW"
      TableInfo(
        tableId = t.name,
        tableType = t.tableType,
        rowCount =
          if (isView) None
          else stats.rowCount.map(_.toLong).orElse(Some(df.count())),
        sizeBytes = if (isView) None else Some(stats.sizeInBytes.toLong),
        columns = df.schema.fields.toSeq.map(columnInfo))
    }
    DatasetInfo(success = true, datasetId = datasetId, tables = infos)
  }
}
