package graft

import graft.sources.BigQueryGateway
import graft.sources.BigQueryGateway.GatewayError

/** Contract tests for the warehouse-gateway surface, mirroring the
  * reference's own suite (`tools/tests/tools/test_bigquery_tool.py`):
  * write-statement blocking, max_rows bounds, result envelope fields,
  * truncation flag, describe_dataset shape and error envelopes. */
class BigQueryGatewaySpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private def ready(): Unit = Tables.registerAll(spark, dir)

  test("blocks every write statement class, case-insensitive " +
      "(test_blocks_insert..test_blocks_case_insensitive)") {
    ready()
    val writes = Seq(
      "INSERT INTO region VALUES (9, 'X', 'c')",
      "UPDATE region SET r_name = 'x'",
      "DELETE FROM region",
      "DROP TABLE region",
      "CREATE TABLE t2 (a INT) USING parquet",
      "ALTER TABLE region ADD COLUMNS (x INT)",
      // ALTER ... SET parses to Set* nodes (SetTableProperties,
      // SetTableLocation, SetNamespaceProperties) whose names also
      // start with the read-side "set" prefix — they must still get
      // the WRITE envelope (round-5 advisor finding)
      "ALTER TABLE region SET TBLPROPERTIES ('k' = 'v')",
      "ALTER TABLE region UNSET TBLPROPERTIES ('k')",
      "TRUNCATE TABLE region",
      "MERGE INTO region USING region s ON false WHEN MATCHED THEN DELETE",
      "insert into region values (9, 'X', 'c')")
    writes.foreach { sql =>
      val e = intercept[GatewayError](BigQueryGateway.runQuery(spark, sql))
      assert(e.error === "Write operations are not allowed", sql)
      assert(e.help.exists(_.contains("Only SELECT queries")), sql)
    }
  }

  test("allows SELECT and subqueries; parsed-plan gate does not trip " +
      "on write keywords inside identifiers/literals (stricter-better " +
      "than the reference regex, documented)") {
    ready()
    val r1 = BigQueryGateway.runQuery(spark,
      "SELECT r_name FROM region ORDER BY r_regionkey")
    assert(r1.success && r1.totalRows === 5 && r1.rowsReturned === 5)
    val r2 = BigQueryGateway.runQuery(spark,
      """SELECT * FROM (SELECT n_name FROM nation
        |WHERE n_regionkey IN (SELECT r_regionkey FROM region)) t""".stripMargin)
    assert(r2.success && r2.totalRows === 25)
    // the reference's \bCREATE\b regex would reject this SELECT
    val r3 = BigQueryGateway.runQuery(spark,
      "SELECT 'do not create or drop anything' AS note")
    assert(r3.success && r3.totalRows === 1)
  }

  test("read-side catalog commands get the SELECT-only envelope, not " +
      "the write envelope (they are not writes)") {
    ready()
    Seq("SHOW TABLES", "DESCRIBE TABLE region",
        "EXPLAIN SELECT 1").foreach { sql =>
      val e = intercept[GatewayError](BigQueryGateway.runQuery(spark, sql))
      assert(e.error === "Only SELECT queries are supported", sql)
      assert(e.help.exists(_.contains("describe_dataset")), sql)
    }
  }

  test("execution-time failures land in the Query failed envelope " +
      "(ANSI mode: the error surfaces at collect, not analysis)") {
    ready()
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val e = intercept[GatewayError](
        BigQueryGateway.runQuery(spark,
          "SELECT r_regionkey div (r_regionkey - r_regionkey) FROM region"))
      assert(e.error.startsWith("Query failed:"))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("describe_dataset resolves tables in the REQUESTED database, " +
      "not the session's current one") {
    ready()
    spark.sql("CREATE DATABASE IF NOT EXISTS gw_ds2")
    try {
      spark.sql("DROP TABLE IF EXISTS gw_ds2.gw_t1")
      spark.sql(
        "CREATE TABLE gw_ds2.gw_t1 USING parquet AS SELECT 1 AS a, 'x' AS b")
      // current database stays 'default'; an unqualified lookup of
      // gw_t1 would throw TABLE_OR_VIEW_NOT_FOUND here
      val d = BigQueryGateway.describeDataset(spark, "gw_ds2")
      val t1 = d.tables.find(_.tableId == "gw_t1").get
      assert(t1.columns.map(_.name) === Seq("a", "b"))
      assert(t1.rowCount === Some(1L))
    } finally spark.sql("DROP DATABASE IF EXISTS gw_ds2 CASCADE")
  }

  test("max_rows bounds: 0/negative/excessive rejected, 1..10000 ok " +
      "(test_rejects_*_max_rows)") {
    ready()
    assert(intercept[GatewayError](
      BigQueryGateway.runQuery(spark, "SELECT 1", maxRows = 0))
      .error === "max_rows must be at least 1")
    assert(intercept[GatewayError](
      BigQueryGateway.runQuery(spark, "SELECT 1", maxRows = -5))
      .error === "max_rows must be at least 1")
    val e = intercept[GatewayError](
      BigQueryGateway.runQuery(spark, "SELECT 1", maxRows = 10001))
    assert(e.error === "max_rows cannot exceed 10000")
    assert(e.help.isDefined)
    assert(BigQueryGateway.runQuery(spark, "SELECT 1", maxRows = 10000)
      .success)
  }

  test("successful query envelope: schema name/type/mode, " +
      "bytes_processed from the parquet scan (test_successful_query)") {
    ready()
    val r = BigQueryGateway.runQuery(spark,
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey")
    assert(r.totalRows === 25 && r.rowsReturned === 25 && !r.queryTruncated)
    assert(r.rows.head.getAs[String]("n_name") === "NATION_0")
    assert(r.schema.map(_.name) === Seq("n_nationkey", "n_name"))
    assert(r.schema.forall(c => c.mode == "NULLABLE" && c.dataType.nonEmpty))
    // cost awareness: the nation parquet was actually scanned
    assert(r.bytesProcessed > 0)
  }

  test("query_truncated when total_rows exceeds max_rows " +
      "(test_query_truncation)") {
    ready()
    val r = BigQueryGateway.runQuery(spark,
      "SELECT o_orderkey FROM orders", maxRows = 10)
    assert(r.rowsReturned === 10 && r.totalRows > 10 && r.queryTruncated)
  }

  test("describe_dataset: empty/whitespace id rejected; unknown " +
      "dataset -> not-found envelope (test_empty_dataset_id, " +
      "test_dataset_not_found_error)") {
    assert(intercept[GatewayError](
      BigQueryGateway.describeDataset(spark, ""))
      .error === "dataset_id is required")
    assert(intercept[GatewayError](
      BigQueryGateway.describeDataset(spark, "   "))
      .error === "dataset_id is required")
    val e = intercept[GatewayError](
      BigQueryGateway.describeDataset(spark, "no_such_dataset"))
    assert(e.error === "Dataset not found: no_such_dataset")
    assert(e.help.exists(_.contains("Check that the dataset exists")))
  }

  test("describe_dataset lists tables with row_count/size_bytes/" +
      "columns (test_successful_describe)") {
    ready()
    val d = BigQueryGateway.describeDataset(spark, "default")
    assert(d.success && d.datasetId === "default")
    val byId = d.tables.map(t => t.tableId -> t).toMap
    assert(Tables.names.forall(byId.contains))
    val nation = byId("nation")
    assert(nation.rowCount === Some(25L))
    assert(nation.sizeBytes.exists(_ > 0))
    assert(nation.columns.map(_.name)
      .containsSlice(Seq("n_nationkey", "n_name")))
    assert(nation.columns.forall(_.mode == "NULLABLE"))
  }
}
