package graft.sources

import graft.plans.SqlGate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC read path — `pg_query` and its introspection siblings
  * (`postgres_tool.py:271-505`) as real `spark.read.jdbc` scans
  * (SURVEY §2.1).
  *
  * The reference opens a psycopg pool, validates the text with a
  * keyword regex, sets a statement timeout, executes, and fetches at
  * most `MAX_ROWS`. Spark-first that becomes:
  *  - the SELECT-only guard is the parsed-plan gate ([[SqlGate]]) —
  *    strictly stronger than the reference's regex (comments and CTE
  *    tricks don't bypass a plan-type check) — plus the reference's
  *    single-statement rule verbatim;
  *  - the query ships to the database via the `query` option, so the
  *    remote engine executes it exactly like `pg_query` does (the
  *    result, not the base tables, comes over the wire);
  *  - `queryTimeout` carries the reference's 3 s statement timeout;
  *  - the `MAX_ROWS` fetch cap is a `limit` on the scan.
  *
  * For table-shaped access, [[table]] exposes the remote table as a
  * DataFrame whose filters and column projections PUSH DOWN into the
  * remote scan (`PushedFilters` in the plan) — the piece the
  * reference cannot do (it always ships full query results) and the
  * reason a 100 TB Spark job can join against a warehouse table
  * without draining it.
  *
  * Delta vs the reference, by design: the gate parses with Spark's
  * parser, so database-specific SELECT syntax Spark cannot parse is
  * rejected rather than passed through.
  */
object JdbcSource {

  /** `MAX_ROWS` (`postgres_tool.py:32`). */
  val MaxRows = 1000

  /** `STATEMENT_TIMEOUT_MS` (`postgres_tool.py:33`), as whole seconds
    * for the JDBC `queryTimeout` option. */
  val StatementTimeoutSec = 3

  /** Read-only SELECT passthrough (`pg_query`,
    * `postgres_tool.py:271-366`): gate, push the whole query to the
    * remote database, cap the fetch. */
  def pgQuery(spark: SparkSession, url: String, sql: String,
      props: Map[String, String] = Map.empty,
      maxRows: Int = MaxRows): DataFrame = {
    val trimmed = sql.trim.stripSuffix(";")
    // single-statement rule (postgres_tool.py:66-70)
    if (trimmed.contains(";"))
      throw new SqlGate.BlockedSqlException(
        "Multiple statements are not allowed")
    if (!SqlGate.isSelectOnly(spark, trimmed))
      throw new SqlGate.BlockedSqlException(
        "Only SELECT queries are allowed for security reasons")
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", trimmed)
      .option("queryTimeout", StatementTimeoutSec)
      .options(props)
      .load()
      .limit(maxRows)
  }

  /** Remote table as a pushdown-capable scan: filters and projections
    * reach the database (`PushedFilters` in the formatted plan).
    * `partitionOn`/`numPartitions` split the read into parallel range
    * scans — the knob that makes a warehouse extract scale with the
    * cluster instead of serializing through one connection. */
  def table(spark: SparkSession, url: String, tableName: String,
      props: Map[String, String] = Map.empty,
      partitionOn: Option[(String, Long, Long)] = None,
      numPartitions: Int = 1): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", tableName)
      .option("queryTimeout", StatementTimeoutSec)
      .options(props)
    partitionOn match {
      case Some((column, lower, upper)) =>
        base.option("partitionColumn", column)
          .option("lowerBound", lower)
          .option("upperBound", upper)
          .option("numPartitions", numPartitions)
          .load()
      case None => base.load()
    }
  }

  // --- introspection (driver-scale metadata, postgres_tool.py:85-107)

  private def withConnection[T](url: String,
      props: Map[String, String])(f: java.sql.Connection => T): T = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, p)
    try f(conn)
    finally conn.close()
  }

  /** `pg_list_schemas` over JDBC metadata. */
  def listSchemas(spark: SparkSession, url: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    withConnection(url, props) { conn =>
      val rs = conn.getMetaData.getSchemas
      val out = scala.collection.mutable.ListBuffer[String]()
      while (rs.next()) out += rs.getString("TABLE_SCHEM")
      out.toList
    }.sorted.toDF("schema_name")
  }

  /** `pg_list_tables` (base tables only, like the reference's
    * `table_type = 'BASE TABLE'` filter). */
  def listTables(spark: SparkSession, url: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    withConnection(url, props) { conn =>
      val rs = conn.getMetaData.getTables(null, null, "%",
        Array("TABLE"))
      val out = scala.collection.mutable.ListBuffer[(String, String)]()
      while (rs.next())
        out += ((Option(rs.getString("TABLE_SCHEM")).getOrElse(""),
          rs.getString("TABLE_NAME")))
      out.toList
    }.toDF("table_schema", "table_name")
  }

  /** `pg_describe_table` → ordered column metadata. */
  def describeTable(spark: SparkSession, url: String, tableName: String,
      schema: Option[String] = None,
      props: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    withConnection(url, props) { conn =>
      val rs = conn.getMetaData.getColumns(null, schema.orNull,
        tableName, "%")
      val out = scala.collection.mutable
        .ListBuffer[(String, String, String, String, Int)]()
      while (rs.next())
        out += ((rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME"),
          rs.getString("IS_NULLABLE"),
          Option(rs.getString("COLUMN_DEF")).getOrElse(""),
          rs.getInt("ORDINAL_POSITION")))
      out.toList
    }.sortBy(_._5)
      .toDF("column_name", "data_type", "is_nullable", "column_default",
        "ordinal_position")
  }
}
