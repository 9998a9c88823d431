package graft.model

/** The typed core data model (SURVEY §1.1, §7.1 module 1): one case
  * class per reference row type, usable as `Dataset[T]` via the
  * implicit product encoders. Open-schema fidelity (`extra="allow"` on
  * nearly every reference Pydantic model, e.g. `run.py:42,65,100`) is
  * kept with an `extras: Map[String, String]` column on each record.
  *
  * Timestamps are epoch milliseconds (`Long`) at the model layer —
  * the reference mixes naive datetimes and ISO strings
  * (`session_state.py:29-37` vs `run.py:77`); ingestion normalizes to
  * UTC ms (SURVEY §7.4.4) and [[graft.functions.Fns.durationMs]]
  * handles the ISO-string path.
  */
object Model {

  /** `goal.py:32-56`. */
  final case class SuccessCriterion(
      id: String,
      description: String,
      weight: Double, // ∈ [0, 1]
      extras: Map[String, String] = Map.empty)

  /** `goal.py:59-80`; `hard` mirrors the hard/soft constraint kinds. */
  final case class Constraint(
      id: String,
      description: String,
      hard: Boolean,
      extras: Map[String, String] = Map.empty)

  /** `goal.py:83-158`. */
  final case class Goal(
      goalId: String,
      description: String,
      criteria: Seq[SuccessCriterion] = Seq.empty,
      constraints: Seq[Constraint] = Seq.empty,
      extras: Map[String, String] = Map.empty)

  /** `node.py:141-255` — key schemas flattened to name lists plus a
    * (key → type) map; the full `{key: {type, required, description}}`
    * shape lives in the JSON ingest schema. */
  final case class NodeSpec(
      id: String,
      inputKeys: Seq[String] = Seq.empty,
      outputKeys: Seq[String] = Seq.empty,
      nullableOutputKeys: Seq[String] = Seq.empty,
      tools: Seq[String] = Seq.empty,
      maxRetries: Int = 3,
      maxNodeVisits: Int = 0, // 0 = unlimited
      extras: Map[String, String] = Map.empty)

  /** `edge.py:49-105`; `condition` is the enum name, `conditionExpr`
    * the safe_eval predicate for CONDITIONAL edges. */
  final case class EdgeSpec(
      source: String,
      target: String,
      condition: String = "always",
      conditionExpr: Option[String] = None,
      inputMapping: Map[String, String] = Map.empty,
      priority: Int = 0,
      extras: Map[String, String] = Map.empty)

  /** `edge.py:351-467` — adjacency-list graph spec. */
  final case class GraphSpec(
      nodes: Seq[NodeSpec],
      edges: Seq[EdgeSpec],
      entryNodes: Seq[String],
      terminalNodes: Seq[String],
      pauseNodes: Seq[String] = Seq.empty,
      maxSteps: Int = 100, // edge.py:435
      extras: Map[String, String] = Map.empty)

  /** `schemas/decision.py:57-106`. */
  final case class DecisionOption(
      optionId: String,
      description: String,
      extras: Map[String, String] = Map.empty)

  /** Outcome of a decision (`runtime/outcome_aggregator.py:145-180`
    * correlation target). */
  final case class Outcome(
      success: Boolean,
      result: Option[String] = None,
      error: Option[String] = None,
      extras: Map[String, String] = Map.empty)

  /** `schemas/decision.py:109-181`. */
  final case class Decision(
      decisionId: String,
      nodeId: String,
      intent: String,
      decisionType: String,
      options: Seq[DecisionOption] = Seq.empty,
      chosenOptionId: Option[String] = None,
      reasoning: Option[String] = None,
      outcome: Option[Outcome] = None,
      latencyMs: Long = 0L,
      tokens: Long = 0L,
      extras: Map[String, String] = Map.empty)

  /** `schemas/run.py:45-65` — the incremental per-run counters. */
  final case class RunMetrics(
      decisionCount: Long = 0L,
      successCount: Long = 0L,
      failureCount: Long = 0L,
      totalTokens: Long = 0L,
      totalLatencyMs: Long = 0L,
      nodesVisited: Seq[String] = Seq.empty,
      edgesTraversed: Seq[String] = Seq.empty) {
    def successRate: Double =
      if (decisionCount == 0) 0.0 else successCount.toDouble / decisionCount
  }

  /** `schemas/run.py:68-189`. */
  final case class Run(
      runId: String,
      goalId: String,
      status: String, // run.py:17-24 enum
      startedAtMs: Option[Long] = None,
      completedAtMs: Option[Long] = None,
      decisions: Seq[Decision] = Seq.empty,
      problems: Seq[String] = Seq.empty,
      metrics: RunMetrics = RunMetrics(),
      narrative: Option[String] = None,
      error: Option[String] = None,
      extras: Map[String, String] = Map.empty) {
    def durationMs: Long = (for {
      s <- startedAtMs; c <- completedAtMs
    } yield c - s).getOrElse(0L)
  }

  /** L3 per-LLM-turn step log (`runtime_log_schemas.py:29-58`). */
  final case class NodeStepLog(
      runId: String,
      nodeId: String,
      step: Int,
      verdict: String, // accept | retry | escalate | continue
      toolCalls: Seq[String] = Seq.empty,
      tokensIn: Long = 0L,
      tokensOut: Long = 0L,
      latencyMs: Long = 0L,
      traceId: Option[String] = None,
      spanId: Option[String] = None,
      extras: Map[String, String] = Map.empty)

  /** L2 per-node detail (`runtime_log_schemas.py:66-94`). */
  final case class NodeDetail(
      runId: String,
      nodeId: String,
      stepCount: Long,
      acceptCount: Long,
      retryCount: Long,
      escalateCount: Long,
      totalTokens: Long,
      totalLatencyMs: Long,
      exitStatus: String,
      needsAttention: Boolean,
      attentionReasons: Seq[String] = Seq.empty,
      extras: Map[String, String] = Map.empty)

  /** L1 per-run summary (`runtime_log_schemas.py:102-123`). */
  final case class RunSummaryLog(
      runId: String,
      status: String,
      nodePath: Seq[String],
      totalSteps: Long,
      totalTokens: Long,
      totalLatencyMs: Long,
      needsAttention: Boolean,
      executionQuality: String, // clean | degraded | failed
      extras: Map[String, String] = Map.empty)

  /** Conversation message (`graph/conversation.py:12-90`). */
  final case class Message(
      seq: Long,
      role: String,
      content: String,
      toolCalls: Seq[String] = Seq.empty,
      toolCallId: Option[String] = None,
      isTransitionMarker: Boolean = false,
      extras: Map[String, String] = Map.empty)

  /** `schemas/checkpoint.py:14-100`. */
  final case class Checkpoint(
      checkpointId: String,
      sessionId: String,
      checkpointType: String, // node_start | node_complete | pause
      currentNode: Option[String],
      nextNode: Option[String],
      executionPath: Seq[String] = Seq.empty,
      sharedMemory: Map[String, String] = Map.empty,
      isClean: Boolean = true,
      createdAtMs: Long = 0L,
      extras: Map[String, String] = Map.empty)
}
