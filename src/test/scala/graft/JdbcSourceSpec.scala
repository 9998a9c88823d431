package graft

import graft.plans.SqlGate
import graft.sources.JdbcSource
import org.apache.spark.sql.functions._

/** JDBC path against an in-process Derby database (the same embedded
  * driver Spark ships for its metastore) — proves the `pg_query`
  * semantics (`postgres_tool.py:271-366`) without a network. */
class JdbcSourceSpec extends SparkTestBase {

  private lazy val url: String = {
    val u = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE runs (run_id INT NOT NULL, status VARCHAR(16), tokens INT)")
      (1 to 50).foreach { i =>
        st.execute(s"INSERT INTO runs VALUES ($i, " +
          s"'${if (i % 5 == 0) "failed" else "ok"}', ${i * 100})")
      }
    } finally conn.close()
    u
  }

  test("pgQuery: SELECT passthrough executes remotely, rows capped " +
      "(postgres_tool.py:271-366)") {
    val df = JdbcSource.pgQuery(spark, url,
      "SELECT run_id, status FROM runs WHERE run_id <= 3")
    assert(df.columns.toSeq.map(_.toLowerCase) === Seq("run_id", "status"))
    assert(df.count() === 3)
    // MAX_ROWS cap
    val capped = JdbcSource.pgQuery(spark, url,
      "SELECT run_id FROM runs", maxRows = 10)
    assert(capped.count() === 10)
  }

  test("pgQuery: gate rejects DML and multi-statement input " +
      "(postgres_tool.py:55-79)") {
    intercept[SqlGate.BlockedSqlException] {
      JdbcSource.pgQuery(spark, url, "DELETE FROM runs")
    }
    intercept[SqlGate.BlockedSqlException] {
      JdbcSource.pgQuery(spark, url,
        "SELECT run_id FROM runs; DROP TABLE runs")
    }
    // trailing semicolon alone is fine, as in the reference
    assert(JdbcSource.pgQuery(spark, url,
      "SELECT run_id FROM runs WHERE run_id = 1;").count() === 1)
    // the blocked DELETE must not have executed
    assert(JdbcSource.pgQuery(spark, url, "SELECT COUNT(*) AS n FROM runs")
      .head().get(0).asInstanceOf[Number].longValue() === 50L)
  }

  test("table(): filter and projection push down into the remote scan") {
    val df = JdbcSource.table(spark, url, "runs")
      .filter(col("tokens") > 4000)
      .select("run_id", "tokens")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("TOKENS"), s"expected pushed filter in:\n$plan")
    assert(df.count() === 10)
  }

  test("table(): partitioned range read splits into parallel scans") {
    val df = JdbcSource.table(spark, url, "runs",
      partitionOn = Some(("run_id", 1L, 51L)), numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 50)
  }

  test("introspection: listSchemas / listTables / describeTable " +
      "(postgres_tool.py:85-107)") {
    assert(JdbcSource.listSchemas(spark, url)
      .filter(col("schema_name") === "APP").count() === 1)
    val tables = JdbcSource.listTables(spark, url)
    assert(tables.filter(col("table_name") === "RUNS").count() === 1)
    val cols = JdbcSource.describeTable(spark, url, "RUNS").collect()
    assert(cols.map(_.getString(0)).toSeq ===
      Seq("RUN_ID", "STATUS", "TOKENS"))
    assert(cols.head.getString(2) === "NO") // NOT NULL column
  }
}
