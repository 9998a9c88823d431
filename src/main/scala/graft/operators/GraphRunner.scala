package graft.operators

import graft.model.Model.EdgeSpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructField, StructType}

/** Vectorized deterministic graph traversal (family E, SURVEY §2.10).
  *
  * The reference executes ONE session at a time through an asyncio
  * loop (`executor.py:286-1300`); the Spark-native re-expression runs
  * N sessions as N rows stepping through the same graph together.
  * The edge set and node outputs are DRIVER-scale (a workflow has
  * tens of edges, never millions), so routing compiles into the plan
  * instead of joining against it: each round is ONE narrow projection
  * over the active sessions — a prioritized `when`-chain per source
  * node picks the highest-priority traversable edge, and node outputs
  * merge as literal maps. No join, no window, ZERO shuffles per
  * round; a million concurrent sessions cost one map pass per step.
  * (The first cut joined an edge DataFrame and ranked candidates with
  * a row_number window — one full session-set shuffle per round; the
  * compiled dispatch removes exactly that, the same driver-scale
  * literal-baking move as v07's centroid codebook.)
  * LLM-driven node behavior stays out (SURVEY §7.4.1): node outputs
  * are provided as a deterministic node → {key: value} map, the same
  * shape the reference's recorded runs produce.
  *
  * Semantics mirrored from the reference:
  *  - outputs merge into memory BEFORE edge evaluation
  *    (`executor.py:860-865`), later writes win (`map_concat` order);
  *  - routing picks the highest-priority traversable edge, ties on
  *    target name (`edge.py:497-500` — [[Routing.firstMatch]]'s rule,
  *    compiled: edges sorted by (priority desc, target asc) into the
  *    when-chain);
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
      maxSteps: Int = 100,
      llm: Routing.LlmBoundary = Routing.LlmBoundary.Fallback)
      : DataFrame = {

    // memory is Map[String,String]: safe_eval conditions address it as
    // memory.get('key'). Each CONDITIONAL expr compiles ONCE here; an
    // expression that fails to PARSE or to RESOLVE routes False
    // instead of aborting the run — the reference catches every
    // safe_eval error (syntax errors and unknown names included) and
    // treats the edge as non-traversable (edge.py:199-204); runtime
    // eval failures already have TRY semantics inside
    // SafeEval.condition. Resolution is probed EAGERLY against the
    // memory schema on an empty frame: an unresolved name would
    // otherwise surface as an AnalysisException at the first use and
    // kill all N sessions.
    val memSchema = StructType(Seq(StructField("memory",
      MapType(StringType, StringType))))
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], memSchema)
    def traversable(e: EdgeSpec): Column = e.condition match {
      case "always" => lit(true)
      case "on_success" => col("success")
      case "on_failure" => !col("success")
      case "conditional" => e.conditionExpr.map { ex =>
        try {
          val c = graft.functions.SafeEval.condition(ex, memSchema)
          probe.select(c) // analysis check only; runs no job
          c
        } catch { case _: Exception => lit(false) }
      }.getOrElse(lit(false))
      // llm_decide through the pluggable boundary; the default IS the
      // reference's fallback (edge.py:271-274) — route on success
      case _ => llm.decideEdge(e.source, e.target, col("success"))
    }

    // firstMatch compiled: per source node, edges in (priority desc,
    // target asc) order fold into a when-chain; null = no traversable
    // edge (→ stuck). Evaluates against the POST-MERGE memory because
    // the route projection reads the executed frame below.
    val nullStr = lit(null).cast(StringType)
    val routeCol: Column = edges.groupBy(_.source).toSeq.sortBy(_._1)
      .foldLeft(nullStr) { case (acc, (src, es)) =>
        val chain = es.sortBy(e => (-e.priority, e.target))
          .foldRight(nullStr) { (e, tail) =>
            when(traversable(e), lit(e.target)).otherwise(tail)
          }
        when(col("node") === src, chain).otherwise(acc)
      }

    // node outputs as literal maps, merged into memory when the
    // session sits AT the writing node — later writes win: overwritten
    // keys drop from the old memory BEFORE concatenating (a plain
    // map_concat throws DUPLICATED_MAP_KEY under Spark's default
    // mapKeyDedupPolicy whenever a node rewrites an existing key — the
    // exact case the reference's write-before-edge-eval semantics
    // produce).
    val mergeCol: Column = nodeOutputs.toSeq.sortBy(_._1)
      .foldLeft(col("memory")) { case (acc, (n, kv)) =>
        val keys = kv.keys.toSeq.sorted
        when(col("node") === n,
          map_concat(
            map_filter(col("memory"), (k, _) =>
              keys.map(kk => k =!= lit(kk)).reduce(_ && _)),
            typedlit(kv)))
          .otherwise(acc)
      }

    val isTerminal =
      if (terminals.isEmpty) lit(false)
      else col("node").isin(terminals.toSeq: _*)

    var states = initialStates
      .withColumn("step", lit(0))
      .withColumn("path", array(col("node")))
      .withColumn("status", lit("active"))
    val cols = states.columns.map(col)
    var iter = 0
    var activeLeft = true
    while (activeLeft && iter < maxSteps) {
      iter += 1
      val active = states.filter(col("status") === "active")
      val finished = states.filter(col("status") =!= "active")
      // one narrow pass: execute (merge outputs), terminal check,
      // route, then fold node/step/path/status per row
      val stepped = active
        .withColumn("memory", mergeCol)
        .withColumn("tgt", when(!isTerminal, routeCol))
        .withColumn("status",
          when(isTerminal, "completed")
            .when(col("tgt").isNull, "stuck")
            .otherwise("active"))
        .withColumn("step",
          when(col("status") === "active", col("step") + 1)
            .otherwise(col("step")))
        .withColumn("path",
          when(col("status") === "active",
            concat(col("path"), array(col("tgt"))))
            .otherwise(col("path")))
        .withColumn("node",
          when(col("status") === "active", col("tgt"))
            .otherwise(col("node")))
        .select(cols: _*)
      // localCheckpoint, NOT Pin/persist: each round's state
      // re-references the previous round's tree, so a lazy pin keeps a
      // logical plan that grows exponentially in the round count — at
      // maxSteps=6 that was minutes of pure Catalyst analysis before a
      // row moved (measured: sf0.01 traversal >9 min under persist,
      // seconds under checkpoint). This is exactly Pin's documented
      // localCheckpoint escape hatch (unbounded iterative lineage).
      // LAZY + a count as the materializing action: the active-left
      // probe must scan every partition anyway, so it doubles as the
      // checkpoint materializer — the eager variant ran a separate
      // full-compute job and the isEmpty probe escalated through 1-3
      // more on the terminal round. The LAST allowed round skips both
      // (the loop exits regardless; the caller's action materializes
      // the final narrow projection from the prior checkpoint).
      if (iter < maxSteps) {
        states = finished
          .unionByName(stepped)
          .localCheckpoint(false)
        activeLeft = states.filter(col("status") === "active").count() > 0
      } else {
        states = finished.unionByName(stepped)
        activeLeft = false
      }
    }
    states.withColumn("status",
      when(col("status") === "active", "max_steps")
        .otherwise(col("status")))
  }
}
