package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoDir, InsertIntoStatement, LogicalPlan, ParsedStatement}

/** The family-A SQL surface: SELECT-only queries over registered
  * tabular data (SURVEY §2.1–§2.2, §3.1).
  *
  * The reference guards its SQL tools with string checks — uppercase
  * keyword blocklist + "must start with SELECT" (`csv_tool.py:333-352`,
  * `excel_tool.py:543-562`, `postgres_tool.py:55-79`). String checks
  * are bypassable (comments, CTE tricks); here the guard inspects the
  * *parsed* Catalyst plan and rejects anything that is a command or
  * write — the plan-type check SURVEY §4.2(a) calls for, no custom
  * `Rule` needed.
  */
object SqlGate {

  final class BlockedSqlException(msg: String) extends Exception(msg)

  /** True when the parsed plan is a pure query (no command/write). */
  def isSelectOnly(spark: SparkSession, sql: String): Boolean =
    offendingNodes(spark, sql).isEmpty

  /** The parsed-plan nodes that make a statement non-SELECT. Exposed
    * so callers (the warehouse gateway) can distinguish a blocked
    * WRITE from a blocked read-side command (SHOW/DESCRIBE/EXPLAIN)
    * in their error envelopes. */
  def offendingNodes(spark: SparkSession, sql: String): Seq[LogicalPlan] = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    def offending(p: LogicalPlan): Boolean = p match {
      case _: Command => true
      case _: ParsedStatement => true // DDL/DML not yet resolved
      case _: InsertIntoStatement => true
      // INSERT OVERWRITE DIRECTORY parses to InsertIntoDir — a plain
      // UnaryNode, not a Command — but executing it writes files
      // (found by the adversarial gate corpus)
      case _: InsertIntoDir => true
      // EXECUTE IMMEDIATE parses to a plain LogicalPlan (neither
      // Command nor ParsedStatement) but executes arbitrary embedded
      // SQL — a gate bypass if not rejected explicitly
      case _: org.apache.spark.sql.catalyst.analysis
          .UnresolvedExecuteImmediate => true
      case _ => false
    }
    plan.collect { case p if offending(p) => p }
  }

  /** Run a SELECT-only query; reject anything else (reference returns
    * an error string, we throw — the tool layer renders it). */
  def query(spark: SparkSession, sql: String): DataFrame = {
    if (!isSelectOnly(spark, sql))
      throw new BlockedSqlException(
        "Only SELECT queries are allowed for security reasons")
    spark.sql(sql)
  }

  /** `csv_sql` semantics (`csv_tool.py:273-310`): load a CSV with a
    * header row, register it as table `data`, run the SELECT. The gate
    * runs BEFORE the load — a blocked query must not pay the
    * full-file inferSchema scans or leave the view registered. */
  def csvSql(spark: SparkSession, path: String, sql: String): DataFrame = {
    gate(spark, sql)
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path).createOrReplaceTempView("data")
    spark.sql(sql) // already gated — avoid a second parse
  }

  private def gate(spark: SparkSession, sql: String): Unit =
    if (!isSelectOnly(spark, sql))
      throw new BlockedSqlException(
        "Only SELECT queries are allowed for security reasons")

  /** `excel_sql` semantics (`excel_tool.py:574-617`): every sheet is a
    * table named after the sheet with spaces → underscores. Sheets
    * arrive as (name → DataFrame). */
  def sheetSql(spark: SparkSession, sheets: Map[String, DataFrame],
      sql: String): DataFrame = {
    gate(spark, sql) // before registration: a blocked query must not
    sheets.foreach { case (name, df) => // leave views behind
      df.createOrReplaceTempView(name.replace(" ", "_"))
    }
    spark.sql(sql)
  }
}
