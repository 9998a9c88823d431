package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog introspection (SURVEY §2.1) — the reference's Postgres/BQ
  * metadata tools re-expressed on `spark.catalog`:
  * `pg_list_schemas` / `pg_list_tables` / `pg_describe_table` /
  * `pg_explain` (`postgres_tool.py:85-107,271-505`) and BigQuery's
  * `describe_dataset` (`bigquery_tool.py:277+`).
  *
  * Each returns a DataFrame so metadata composes with the rest of the
  * query surface (the reference returns dicts).
  */
object Catalog {

  /** `pg_list_schemas` → one row per database/namespace. */
  def listSchemas(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases()
      .map(d => (d.name, Option(d.description).getOrElse("")))
      .toDF("schema_name", "description")
  }

  /** `pg_list_tables(schema)` → tables + temp views, like the
    * information_schema query at `postgres_tool.py:85-96`. */
  def listTables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables()
      .map(t => (t.name,
        Option(t.database).getOrElse(""),
        t.tableType,
        t.isTemporary))
      .toDF("table_name", "schema_name", "table_type", "is_temporary")
  }

  /** `pg_describe_table` → ordered column metadata
    * (`postgres_tool.py:97-107`). */
  def describeTable(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    spark.catalog.listColumns(table)
      .map(c => (c.name, c.dataType, c.nullable, c.isPartition))
      .toDF("column_name", "data_type", "is_nullable", "is_partition")
  }

  /** `pg_explain` — the physical plan as a one-column DataFrame
    * (`postgres_tool.py:381-418`; EXPLAIN text there, formatted plan
    * here). Gated like the rest of the SQL surface: `spark.sql` runs
    * command plans EAGERLY at Dataset creation, so an ungated explain
    * would execute DDL/DML instead of describing it. */
  def explainSql(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val plan = graft.plans.SqlGate.query(spark, sql)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    plan.split("\n").toSeq.toDF("plan_line")
  }

  /** `describe_dataset`-style summary: per registered table, column
    * count (row counts are a scan — deliberately not free, as in
    * `bigquery_tool.py:277+` which reports metadata only). */
  def describeAll(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq
      .map(t => (t.name, spark.table(t.name).schema.fields.length))
      .toDF("table_name", "n_columns")
  }
}
