package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Graph-shaped query capabilities of the reference's dataflow engine,
  * re-expressed on DataFrames (SURVEY §2.10): reachability
  * (`edge.py:626-660`, `executor.py:259-269`), static fan-out/fan-in
  * detection (`edge.py:506-540`), convergence-node search
  * (`executor.py:1819-1852`) and graph validation (`edge.py:574-698`).
  *
  * Edges are a DataFrame with `src`/`dst` string columns; nodes a
  * DataFrame with an `id` column. The BFS is a driver-side loop of
  * DataFrame joins — iterations are bounded by graph *diameter* (not
  * size), and each round pins its state for fan-out reuse (releasing
  * pins two rounds back via [[Pin.Ledger]]; under the default lazy
  * persist the plan keeps lineage, and rounds are diameter-bounded so
  * plan depth stays small), so the same code runs on a 5-node routing
  * graph or a billion-edge lineage graph (where each round is one
  * distributed hash join).
  */
object GraphOps {

  /** Min-depth BFS from `entry` nodes. Returns (node, depth). */
  def reachable(edges: DataFrame, entry: Seq[String],
      maxIters: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var frontier = entry.toDF("node").withColumn("depth", lit(0))
    var visited = frontier
    var depth = 0
    var done = false
    val pins = new Pin.Ledger
    while (!done && depth < maxIters) {
      depth += 1
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("depth", lit(depth))
        .pipe(pins.pin)
      // count(), not isEmpty: under the default lazy-persist pin an
      // isEmpty (take(1)) materializes only the partitions it
      // touches, leaving the pin partially cached for the union
      // consumer to finish — and escalates through 1-3 jobs on the
      // empty terminal round. One count materializes the pin fully
      // and answers emptiness in a single job.
      if (next.count() == 0L) { done = true; Pin.release(next) }
      else {
        visited = pins.pin(visited.union(next))
        frontier = next
      }
      pins.advance()
    }
    visited
  }

  /** [[reachable]] for a graph already reduced to driver scale (e.g.
    * the aggregated transition graph of an event stream: heavy
    * distributed groupBy first, then an O(nodes) algorithm on the
    * result). Collects the edge list and runs the BFS in-process —
    * zero Spark jobs per iteration vs one join+checkpoint each for the
    * distributed variant. */
  def reachableLocal(edges: DataFrame, entry: Seq[String],
      maxIters: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select("src", "dst").as[(String, String)].collect()
      .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).toSeq }
    val depth = scala.collection.mutable.Map[String, Int]()
    entry.foreach(e => depth(e) = 0)
    var frontier = entry.toSet
    var d = 0
    while (frontier.nonEmpty && d < maxIters) {
      d += 1
      frontier = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
        .filterNot(depth.contains)
      frontier.foreach(n => depth(n) = d)
    }
    depth.toSeq.toDF("node", "depth")
  }

  // flood rounds before pointer jumping activates (see loop note)
  private val JumpAfter = 3

  /** Connected components of an undirected graph by min-label
    * propagation: every node's label converges to the smallest node id
    * in its component. Each round is ONE distributed join + aggregation
    * on the symmetrized edge relation, and the round count is bounded
    * by component diameter (the min label floods one hop per round) —
    * the scale path for dedup-cluster assignment (canonical-document
    * election over an LSH candidate graph), where components are
    * near-dup clusters: small and shallow by construction — but each
    * round also POINTER-JUMPS (label ← label of its label, the path
    * halving of Shiloach–Vishkin / hash-to-min), so label chains halve
    * per round and a diameter-d component converges in O(log d) rounds
    * instead of d. A 10⁶-long chain — where plain flooding would need
    * 10⁶ rounds — finishes in ~20. The jump is one extra join on the
    * LABELS frame (node-grain, small next to the edge join), a cost
    * shallow graphs barely notice.
    *
    * `edges` needs `src`/`dst` columns of one orderable type. Returns
    * `(id, component)` for every node incident to at least one edge,
    * `component` = min id in the node's component. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // symmetrize once: propagation must run both directions
    val sym = Pin(e.union(e.select(col("dst"), col("src"))))
    // labels chain on THEMSELVES each round (labels ⋈ f(labels)), so
    // unlike the BFS loops the logical plan doubles per round — lazy
    // persist keeps lineage and the planner's tree goes exponential
    // (measured: a diameter-11 path OOMs plan stringification alone).
    // This is the unbounded-iterative-lineage case [[Pin]] reserves
    // eager localCheckpoint for: truncate per round, and the round's
    // convergence probe doubles as the checkpoint's materializer.
    // lazy: round 1's materializing action computes it (both round-1
    // consumers read through the checkpoint RDD's cache layer), so
    // the init pays no job of its own
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(false)
    var converged = false
    var it = 0
    val dbg = sys.env.get("SPARK_GRAFT_CC_DEBUG").contains("true")
    while (!converged && it < maxIters) {
      it += 1
      val tRound = System.nanoTime()
      // smallest label visible from each node's neighborhood this round
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("id"))
        .agg(min("component").as("nbr"))
      val hopped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("component").as("old"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component"))
      // pointer jump: a label is always some node in the same
      // component (invariant: it only ever copies another node's
      // label, monotonically decreasing), so following component →
      // label(component) stays inside the component while halving
      // label-chain length. Fixpoint unchanged: no neighbor OR parent
      // improvement ⇔ labels constant across every edge ⇔ min-label
      // assignment. ADAPTIVE: the jump join only switches on once the
      // graph has proven deep (still unconverged after `JumpAfter`
      // flood rounds) — near-dup clusters converge before it ever
      // activates and pay nothing, while a chain of any depth still
      // finishes in O(log d) rounds after the switch.
      val jumped =
        if (it <= JumpAfter) hopped
        else {
          val parent = labels
            .select(col("id").as("p_id"), col("component").as("p_comp"))
          hopped.join(parent, hopped("component") === col("p_id"), "left")
            .select(col("id"),
              least(col("component"),
                coalesce(col("p_comp"), col("component")))
                .as("component"),
              col("old"))
        }
      // LAZY checkpoint + one full-scan scalar as the materializing
      // action: the convergence count must read every partition
      // anyway, so it doubles as the checkpoint's materializer — the
      // previous eager checkpoint ran its own job and the isEmpty
      // probe added 1-3 more (take(1) escalates through partitions
      // on the converged round, when nothing matches); one action
      // per round replaces both (guide §1.2: fewer passes).
      val next = jumped
        .withColumn("improved", col("component") < col("old"))
        .drop("old")
        .localCheckpoint(false)
      converged = next.filter(col("improved")).count() == 0L
      // next is fully materialized (eager checkpoint + the probe), so
      // the previous round's snapshot has no remaining consumer — free
      // its executor blocks now instead of waiting for driver GC
      // (deep graphs would otherwise hold one O(|nodes|) generation
      // per round)
      org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(labels)
      labels = next.drop("improved")
      if (dbg) System.err.println(f"[cc] round $it%d " +
        f"${(System.nanoTime() - tRound) / 1e9}%.3f s converged=$converged")
    }
    Pin.release(sym)
    // an unconverged result is WRONG (one component reported as many,
    // several is_canonical rows per true cluster) — refuse it loudly
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters rounds " +
        s"(reachable diameter ≈ $JumpAfter flood rounds then doubling " +
        s"per jump round — ~2^(maxIters-$JumpAfter) past the flood " +
        "prefix); raise maxIters, or check the input for label-type " +
        "mismatches")
    labels
  }

  /** Out/in degree per node over distinct edges; fan-out = >1 distinct
    * successor (reference counts ON_SUCCESS edges, `edge.py:506-523`). */
  def degrees(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // pinned: the distinct edge relation fans out into BOTH degree
    // aggregations below — unpinned, the (possibly expensive) edges
    // subtree plus the distinct ran once per branch (r11; g02's
    // events window+lag edge build paid twice)
    val e = Pin(edges.select("src", "dst").distinct())
    val out = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_degree"))
    nodes.select(col("id"))
      .join(out, Seq("id"), "left").join(in, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("is_fanout", col("out_degree") > 1)
      .withColumn("is_fanin", col("in_degree") > 1)
  }

  /** First common node reachable from every branch head — the
    * convergence node of a parallel fan-out (`executor.py:1819-1852`):
    * intersection of the branches' reachable sets, closest by summed
    * depth, name as tie-break. */
  def convergence(edges: DataFrame, branches: Seq[String]): DataFrame = {
    require(branches.nonEmpty)
    branches.map(b => reachable(edges, Seq(b)))
      .reduce((a, b) => a.join(b, Seq("node"))
        .select(col("node"), (a("depth") + b("depth")).as("depth")))
      .filter(!col("node").isin(branches: _*)) // heads are not successors
      .orderBy(col("depth"), col("node"))
      .limit(1)
  }

  /** Structural validation as an errors dataset (`edge.py:574-698`):
    * dangling edge endpoints, duplicate node ids, unreachable nodes.
    * Each rule is an anti-join/aggregation; the union is the report. */
  def validate(nodes: DataFrame, edges: DataFrame,
      entry: Seq[String]): DataFrame = {
    val ids = nodes.select(col("id"))
    val srcMissing = edges.join(ids, edges("src") === ids("id"), "left_anti")
      .select(lit("edge_source_missing").as("error"), col("src").as("node"))
      .distinct()
    val dstMissing = edges.join(ids, edges("dst") === ids("id"), "left_anti")
      .select(lit("edge_target_missing").as("error"), col("dst").as("node"))
      .distinct()
    val dup = nodes.groupBy("id").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select(lit("duplicate_node_id").as("error"), col("id").as("node"))
    val unreachable = ids
      .join(reachable(edges, entry).select("node"),
        ids("id") === col("node"), "left_anti")
      .select(lit("unreachable_node").as("error"), col("id").as("node"))
    srcMissing.union(dstMissing).union(dup).union(unreachable)
  }
}
