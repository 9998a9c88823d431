package graft.operators

import graft.model.Model.EdgeSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vectorized deterministic graph traversal (family E, SURVEY §2.10).
  *
  * The reference executes ONE session at a time through an asyncio
  * loop (`executor.py:286-1300`); the Spark-native re-expression runs
  * N sessions as N rows stepping through the same graph together —
  * each iteration is one join + one window over ALL active sessions,
  * so a million concurrent sessions cost the same plan as three.
  * LLM-driven node behavior stays out (SURVEY §7.4.1): node outputs
  * are provided as a deterministic (node, key, value) relation, the
  * same shape the reference's recorded runs produce.
  *
  * Semantics mirrored from the reference:
  *  - outputs merge into memory BEFORE edge evaluation
  *    (`executor.py:860-865`), later writes win (`map_concat` order);
  *  - routing picks the highest-priority traversable edge
  *    (`edge.py:497-500`) — [[Routing.firstMatch]];
  *  - conditions: ALWAYS / ON_SUCCESS / ON_FAILURE / CONDITIONAL
  *    (safe_eval over the memory map via `memory.get(...)`);
  *  - sessions stop at terminal nodes (`executor.py:1064-1067`) or on
  *    no traversable edge (status `stuck`), or at `maxSteps`
  *    (`edge.py:435` default 100 → status `max_steps`).
  *
  * States: (state_id, node, success, memory: Map[String,String]).
  * Returns final states + ordered `path`.
  */
object GraphRunner {

  def run(spark: SparkSession,
      edges: Seq[EdgeSpec],
      terminals: Set[String],
      initialStates: DataFrame,
      nodeOutputs: Map[String, Map[String, String]],
      maxSteps: Int = 100): DataFrame = {
    import spark.implicits._

    val edgeDf = edges.map(e => (e.source, e.target, e.condition,
      e.conditionExpr.getOrElse(""), e.priority)).toDF(
      "source", "target", "condition", "condition_expr", "priority")

    val outDf = nodeOutputs.toSeq.map { case (n, kv) => (n, kv) }
      .toDF("node", "node_output")

    // memory is Map[String,String]: safe_eval conditions address it as
    // memory.get('key'); the traversability column per edge row
    val memSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("memory",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))))
    val traversable =
      when(col("condition") === "always", lit(true))
        .when(col("condition") === "on_success", col("success"))
        .when(col("condition") === "on_failure", !col("success"))
        .when(col("condition") === "conditional",
          // per-row dispatch would need expr compilation per edge; the
          // edge set is driver-scale, so conditions compile ONCE here
          // and a CASE chain dispatches on the expression text
          lit(false)) // replaced below
        .otherwise(col("success")) // llm_decide fallback edge.py:271-274

    // compile each distinct CONDITIONAL expr once (driver-scale set).
    // An expression that fails to PARSE or to RESOLVE routes False
    // instead of aborting the run — the reference catches every
    // safe_eval error (syntax errors and unknown names included) and
    // treats the edge as non-traversable (edge.py:199-204); runtime
    // eval failures already have TRY semantics inside
    // SafeEval.condition. Resolution is probed EAGERLY against the
    // memory schema on an empty frame: an unresolved name would
    // otherwise surface as an AnalysisException at the first filter
    // use and kill all N sessions.
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], memSchema)
    val condExprs = edges.filter(_.condition == "conditional")
      .flatMap(_.conditionExpr).distinct
    val conditionalCol = condExprs.foldLeft(lit(false)) { (acc, e) =>
      val compiled =
        try {
          val c = graft.functions.SafeEval.condition(e, memSchema)
          probe.select(c) // analysis check only; runs no job
          c
        } catch { case _: Exception => lit(false) }
      when(col("condition_expr") === e, compiled).otherwise(acc)
    }
    val travCol = when(col("condition") === "conditional", conditionalCol)
      .otherwise(traversable)

    var states = initialStates
      .withColumn("step", lit(0))
      .withColumn("path", array(col("node")))
      .withColumn("status", lit("active"))
    var iter = 0
    var activeLeft = true
    while (activeLeft && iter < maxSteps) {
      iter += 1
      val active = states.filter(col("status") === "active")
      val finished = states.filter(col("status") =!= "active")
      // 1. execute: merge node outputs into memory (before edge eval)
      // later writes win: drop overwritten keys from the old memory
      // BEFORE concatenating — a plain map_concat throws
      // DUPLICATED_MAP_KEY under Spark's default mapKeyDedupPolicy
      // whenever a node rewrites an existing key (the exact case the
      // reference's write-before-edge-eval semantics produce)
      val executed = active.join(outDf, Seq("node"), "left")
        .withColumn("memory",
          when(col("node_output").isNotNull,
            map_concat(
              map_filter(col("memory"),
                (k, _) => !map_contains_key(col("node_output"), k)),
              col("node_output")))
            .otherwise(col("memory")))
        .drop("node_output")
      // 2. terminal check
      val nowTerminal = executed
        .filter(col("node").isin(terminals.toSeq: _*))
        .withColumn("status", lit("completed"))
      val stepping = executed
        .filter(!col("node").isin(terminals.toSeq: _*))
      // 3. route: highest-priority traversable edge per state
      val candidates = stepping
        .join(edgeDf, stepping("node") === edgeDf("source"), "left")
      val routed = Routing.firstMatch(
        candidates.filter(col("source").isNotNull), travCol)
        .withColumn("node", col("target"))
        .withColumn("step", col("step") + 1)
        .withColumn("path", concat(col("path"), array(col("target"))))
        .drop("source", "target", "condition", "condition_expr",
          "priority")
      val stuck = stepping
        .join(routed.select(col("state_id").as("routed_id")),
          stepping("state_id") === col("routed_id"), "left_anti")
        .withColumn("status", lit("stuck"))
      // Eager localCheckpoint, NOT Pin/persist: each round's state is
      // a 4-way union re-referencing the previous round's tree, so a
      // lazy pin keeps a logical plan that grows ~4^iter nodes — at
      // maxSteps=6 that is minutes of pure Catalyst analysis before a
      // row moves (measured: sf0.01 traversal >9 min under persist,
      // seconds under checkpoint). This is exactly Pin's documented
      // localCheckpoint escape hatch (unbounded iterative lineage);
      // the round's convergence probe doubles as the materializer,
      // the same contract as GraphOps.connectedComponents.
      states = finished
        .unionByName(nowTerminal)
        .unionByName(routed.select(finished.columns.map(col): _*))
        .unionByName(stuck)
        .localCheckpoint(true)
      activeLeft = !states.filter(col("status") === "active").isEmpty
    }
    states.withColumn("status",
      when(col("status") === "active", "max_steps")
        .otherwise(col("status")))
  }
}
