package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runtime-log scan (SURVEY §2.1 [D]; reference
  * `runtime_log_store.py:144-232`, `runtime_logs_tool.py:49-141`).
  *
  * Reads BOTH on-disk layouts — new `sessions/{id}/logs/` and the
  * deprecated `runtime_logs/runs/{id}/` — with the reference's exact
  * field names, synthesizes an `in_progress` summary row for run dirs
  * whose `summary.json` has not been written yet
  * (`runtime_logs_tool.py:117-124`), and normalizes the L3 step log
  * to the [[graft.operators.LogRollups]] column contract.
  *
  * Directory enumeration happens driver-side (it IS the partition
  * listing; at 100 TB this becomes a manifest/catalog lookup while
  * the per-file reads stay distributed).
  */
object RuntimeLogSource {

  val summarySchema: StructType = StructType(Seq(
    StructField("run_id", StringType),
    StructField("agent_id", StringType),
    StructField("goal_id", StringType),
    StructField("status", StringType),
    StructField("total_nodes_executed", LongType),
    StructField("node_path", ArrayType(StringType)),
    StructField("total_input_tokens", LongType),
    StructField("total_output_tokens", LongType),
    StructField("needs_attention", BooleanType),
    StructField("attention_reasons", ArrayType(StringType)),
    StructField("started_at", StringType),
    StructField("duration_ms", LongType),
    StructField("execution_quality", StringType),
    StructField("trace_id", StringType),
    StructField("execution_id", StringType)))

  /** (run_id, logDir) pairs across both layouts
    * (`runtime_logs_tool.py:49-77`). */
  private def runDirs(workDir: String): Seq[(String, java.io.File)] = {
    def subdirs(p: java.io.File): Seq[java.io.File] =
      Option(p.listFiles()).getOrElse(Array.empty).filter(_.isDirectory).toSeq
    val newStyle = subdirs(new java.io.File(workDir, "sessions"))
      .filter(_.getName.startsWith("session_"))
      .map(d => d.getName -> new java.io.File(d, "logs"))
      .filter(_._2.isDirectory)
    val oldStyle = subdirs(new java.io.File(
      new java.io.File(workDir, "runtime_logs"), "runs"))
      .map(d => d.getName -> d)
    newStyle ++ oldStyle
  }

  /** L1 summaries across both layouts; missing `summary.json` →
    * synthesized `in_progress` row. */
  def summaries(spark: SparkSession, workDir: String): DataFrame = {
    val dirs = runDirs(workDir)
    val (withSummary, inProgress) = dirs.partition {
      case (_, d) => new java.io.File(d, "summary.json").isFile
    }
    val stored =
      if (withSummary.isEmpty) spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), summarySchema)
      else spark.read.schema(summarySchema)
        .option("mode", "DROPMALFORMED")
        .json(withSummary.map(d =>
          new java.io.File(d._2, "summary.json").getPath): _*)
    import spark.implicits._
    val synthesized = inProgress.map(_._1)
      .toDF("run_id")
      .withColumn("status", lit("in_progress"))
      .withColumn("started_at", lit(""))
      .withColumn("needs_attention", lit(false))
    stored.unionByName(synthesized, allowMissingColumns = true)
  }

  /** The list query (`runtime_logs_tool.py:126-139`): status filter —
    * `needs_attention` is a FLAG filter, anything else an equality —
    * then started_at desc (run_id tie-break) and limit. */
  def scan(summaries: DataFrame, status: Option[String] = None,
      limit: Int = 20): DataFrame = {
    val filtered = status match {
      case Some("needs_attention") =>
        summaries.filter(col("needs_attention"))
      case Some(s) => summaries.filter(col("status") === s)
      case None => summaries
    }
    filtered.orderBy(col("started_at").desc, col("run_id")).limit(limit)
  }

  /** L3 step logs (`tool_logs.jsonl`, both layouts, tolerant parse per
    * `runtime_log_store.py:265-289`) normalized to the LogRollups
    * contract: run_id (from the path), node_id, step, lowercase
    * verdict, tokens_in/out, latency_ms, exit_status. */
  def stepLogs(spark: SparkSession, workDir: String): DataFrame = {
    val files = runDirs(workDir)
      .map(d => new java.io.File(d._2, "tool_logs.jsonl"))
      .filter(_.isFile)
    if (files.isEmpty)
      throw new IllegalArgumentException(s"no tool_logs.jsonl under $workDir")
    spark.read
      // explicit schema: a field absent from EVERY line (error on
      // all-healthy logs) would vanish under inference and turn
      // col("error") into an AnalysisException; inference also costs
      // an extra full pass at scale
      .schema("node_id STRING, step_index BIGINT, verdict STRING, " +
        "input_tokens BIGINT, output_tokens BIGINT, " +
        "latency_ms BIGINT, error STRING")
      .option("mode", "DROPMALFORMED")
      .json(files.map(_.getPath): _*)
      .withColumn("run_id",
        coalesce(
          nullif(regexp_extract(input_file_name(),
            "sessions/([^/]+)/logs", 1), lit("")),
          regexp_extract(input_file_name(),
            "runtime_logs/runs/([^/]+)/", 1)))
      .select(
        col("run_id"),
        col("node_id"),
        col("step_index").cast(IntegerType).as("step"),
        lower(col("verdict")).as("verdict"),
        col("input_tokens").cast(LongType).as("tokens_in"),
        col("output_tokens").cast(LongType).as("tokens_out"),
        col("latency_ms").cast(LongType),
        coalesce(col("error"), lit("")).as("error"))
      .withColumn("exit_status",
        when(col("error") =!= "", "failed").otherwise("completed"))
  }
}
