package graft

import graft.model.Model._
import graft.operators.LogRollups
import org.apache.spark.sql.functions._

/** The typed core model (SURVEY §7.1 module 1): every case class must
  * have a working product encoder (Dataset round-trip) and compose
  * with the analytics operators. */
class ModelSpec extends SparkTestBase {
  import spark.implicits._

  test("Dataset[T] round-trip for the nested Run model") {
    val run = Run(
      runId = "r1", goalId = "g1", status = "completed",
      startedAtMs = Some(1000L), completedAtMs = Some(6000L),
      decisions = Seq(Decision(
        decisionId = "d1", nodeId = "n1", intent = "pick a tool",
        decisionType = "tool_selection",
        options = Seq(DecisionOption("o1", "use search")),
        chosenOptionId = Some("o1"),
        outcome = Some(Outcome(success = true)),
        latencyMs = 120L, tokens = 42L)),
      metrics = RunMetrics(decisionCount = 1, successCount = 1,
        totalTokens = 42L),
      extras = Map("custom_field" -> "kept"))
    val ds = Seq(run).toDS()
    val back = ds.collect().head
    assert(back === run)
    assert(back.durationMs === 5000L)
    assert(back.metrics.successRate === 1.0)
    // explodes to a flat decisions frame (SURVEY §1.1 Run mapping)
    val flat = ds.select(col("runId"), explode(col("decisions")).as("d"))
      .select("runId", "d.nodeId", "d.outcome.success")
    assert(flat.head().getBoolean(2))
  }

  test("Dataset[NodeStepLog] feeds the L3→L2→L1 rollup directly") {
    val steps = Seq(
      NodeStepLog("r1", "n1", 1, "retry", latencyMs = 100, tokensIn = 10,
        tokensOut = 5),
      NodeStepLog("r1", "n1", 2, "accept", latencyMs = 200, tokensIn = 20,
        tokensOut = 10))
      .toDS()
      .withColumnRenamed("runId", "run_id")
      .withColumnRenamed("nodeId", "node_id")
      .withColumnRenamed("latencyMs", "latency_ms")
      .withColumnRenamed("tokensIn", "tokens_in")
      .withColumnRenamed("tokensOut", "tokens_out")
      .withColumn("exit_status", lit("completed"))
    val l2 = LogRollups.l3ToL2(steps)
    assert(l2.count() === 1)
    val row = l2.head()
    assert(row.getAs[Long]("step_count") === 2L)
    assert(row.getAs[Long]("retry_count") === 1L)
    val l1 = LogRollups.l2ToL1(l2)
    assert(l1.head().getAs[String]("execution_quality") === "degraded")
  }

  test("GraphSpec encodes with nested node/edge specs") {
    val g = GraphSpec(
      nodes = Seq(NodeSpec("a"), NodeSpec("b", maxRetries = 1)),
      edges = Seq(EdgeSpec("a", "b", condition = "on_success",
        inputMapping = Map("x" -> "y"), priority = 2)),
      entryNodes = Seq("a"), terminalNodes = Seq("b"))
    val back = Seq(g).toDS().collect().head
    assert(back === g)
    assert(back.maxSteps === 100)
  }

  test("Checkpoint / Message / RunSummaryLog encoders") {
    val cp = Checkpoint("c1", "s1", "pause", Some("n1"), None,
      executionPath = Seq("a", "n1"), isClean = false,
      createdAtMs = 123L)
    assert(Seq(cp).toDS().collect().head === cp)
    val msg = Message(1L, "assistant", "hello",
      toolCalls = Seq("t1"), isTransitionMarker = true)
    assert(Seq(msg).toDS().collect().head === msg)
    val l1 = RunSummaryLog("r1", "completed", Seq("a", "b"), 5, 100, 900,
      needsAttention = false, executionQuality = "clean")
    assert(Seq(l1).toDS().collect().head === l1)
  }
}
