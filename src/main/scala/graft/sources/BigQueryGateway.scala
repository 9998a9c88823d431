package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical
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
  * Scale note: one execution serves the common case — `maxRows + 1`
  * rows are collected, which bounds the driver AND decides
  * `query_truncated`; only a truncated result pays a second
  * distributed count job for the exact `total_rows` (the reference
  * streams-then-stops at `max_rows` and reads the job's row count
  * from BQ metadata — same shape). `bytes_processed` sums the executed
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
        val bad = SqlGate.offendingNodes(spark, sql)
        if (bad.nonEmpty) {
          // a blocked statement gets the envelope that explains WHY:
          // read-side catalog commands (SHOW/DESCRIBE/EXPLAIN/SET/...)
          // are not writes, and telling their caller "write operations
          // are not allowed" sends them down the wrong help text
          val readSideCmd = bad.forall { p =>
            val name = p.getClass.getSimpleName
            !p.isInstanceOf[logical.AlterTableCommand] &&
              AlterSetName.findPrefixOf(name).isEmpty &&
              ReadCommandName.findPrefixOf(name).isDefined
          }
          if (readSideCmd)
            throw GatewayError("Only SELECT queries are supported",
              Some("Catalog and session statements (SHOW, DESCRIBE, " +
                "EXPLAIN, SET, ...) are not part of this query " +
                "surface; use describe_dataset for table metadata."))
          else
            throw GatewayError("Write operations are not allowed",
              Some("Only SELECT queries are permitted. INSERT, UPDATE, " +
                "DELETE, DROP, CREATE, ALTER, TRUNCATE, and MERGE are " +
                "blocked."))
        }
        spark.sql(sql)
      } catch {
        case e: GatewayError => throw e
        case NonFatal(e) =>
          throw GatewayError(s"Query failed: ${e.getMessage}", None)
      }
    // execution-time failures (ANSI arithmetic/cast errors, missing
    // files) must land in the same envelope as analysis failures —
    // the caller sees one error contract either way
    try {
      val limited = gated.limit(maxRows + 1)
      val collected = limited.collect()
      val truncated = collected.length > maxRows
      val rows = collected.take(maxRows).toSeq
      // untruncated results know their total from the single collect;
      // only truncation pays a count job. max() guards the envelope's
      // internal consistency when a nondeterministic query returns a
      // different cardinality on the second execution.
      val totalRows =
        if (!truncated) collected.length.toLong
        else math.max(gated.count(), collected.length.toLong)
      QueryResult(
        success = true,
        rows = rows,
        totalRows = totalRows,
        rowsReturned = rows.size,
        schema = gated.schema.fields.toSeq.map(columnInfo),
        bytesProcessed = bytesScanned(limited.queryExecution.executedPlan),
        queryTruncated = truncated)
    } catch {
      case e: GatewayError => throw e
      case NonFatal(e) =>
        throw GatewayError(s"Query failed: ${e.getMessage}", None)
    }
  }

  /** Catalyst command classes that READ catalog/session state; a
    * prefix match on the node's simple class name (ShowTables,
    * DescribeRelation, ExplainCommand, SetCommand, ...). Anything
    * offending that is not recognized here gets the write envelope —
    * the conservative default. */
  private val ReadCommandName =
    ("(?i)(show|describe|desc|explain|reset|use|refresh|analyze|" +
      "cache|uncache|list|set)").r

  /** ALTER ... SET statements parse to nodes whose simple names also
    * START with "set" (SetTableProperties, SetTableLocation,
    * SetNamespaceProperties, SetViewProperties, ...). They are
    * mutations and must get the write envelope, so they are excluded
    * BEFORE the read-side prefix match — by the `AlterTableCommand`
    * trait where Catalyst provides it (table alters) and by this
    * name pattern for the namespace/view alters that don't carry the
    * trait. */
  private val AlterSetName = "(?i)(un)?set(table|namespace|view)".r

  /** `describe_dataset` (`bigquery_tool.py:277-392`) over a Spark
    * catalog database. Temp views (how this engine registers parquet
    * and JDBC tables) live in the session's current database under
    * catalog listing. `size_bytes` comes from the optimized plan's
    * statistics (file-source sizes are listing-derived, no data
    * scan); `row_count` uses catalog stats when ANALYZE/CBO has
    * recorded them, else pays ONE count job per table — over parquet
    * that job decodes no columns (the scan answers from row-group
    * metadata), the Spark analogue of BQ's metadata row count. */
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
      // resolve by QUALIFIED name: an unqualified lookup would hit the
      // session's CURRENT database, not the requested dataset (temp
      // views carry no database and resolve by bare name)
      val qualified = Option(t.database).filter(_.nonEmpty)
        .map(db => s"`$db`.`${t.name}`").getOrElse(s"`${t.name}`")
      val df = spark.table(qualified)
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
