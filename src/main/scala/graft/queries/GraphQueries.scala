package graft.queries

import graft.{Q, Tables}
import graft.operators.{GraphOps, Pin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics derived from the event stream — the reference's
  * reachability / fan-out / validation operators (SURVEY §2.10) applied
  * to the behavioral transition graph of `events`.
  *
  * The graph is built distributed (one window + one groupBy over the
  * full stream); the BFS then runs on the aggregated, tiny node set —
  * at 100 TB the transition aggregation is the heavy stage and the
  * graph algorithms stay O(nodes), which is the right split.
  */
object GraphQueries {

  /** Transition edges with above-average frequency: (src, dst). */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val tr = Tables.load(s, dir, "events")
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("c"))
    val avg = tr.agg((sum("c") / count(lit(1))).as("avg"))
    tr.crossJoin(avg).filter(col("c") > col("avg")).select("src", "dst")
  }

  private val edgesCte =
    """WITH RECURSIVE s AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
      |  FROM events),
      |tr AS (SELECT event_type AS src, nxt AS dst, COUNT(*) AS c
      |       FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |e AS (SELECT src, dst FROM tr
      |      WHERE c > (SELECT SUM(c) / COUNT(*) FROM tr)),
      |nodes AS (SELECT DISTINCT event_type AS id FROM events)""".stripMargin

  // ---------------------------------------------------------------
  // g01 reachability — BFS min-depth from the first node over the
  // above-average transition graph (reachability semi-join,
  // edge.py:626-660; unreachable detection, executor.py:259-269).
  // Spark side: iterative frontier joins; oracle: recursive CTE.
  val g01 = Q(
    "g01_reachability",
    s"""$edgesCte,
      |entry AS (SELECT MIN(id) AS n FROM nodes),
      |r AS (SELECT n AS node, 0 AS depth FROM entry
      |      UNION ALL
      |      SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.node
      |      WHERE r.depth < 6),
      |m AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node)
      |SELECT nodes.id AS node, m.depth IS NOT NULL AS reachable, m.depth
      |FROM nodes LEFT JOIN m ON nodes.id = m.node""".stripMargin) {
    (s, dir) =>
      val e = edges(s, dir)
      val nodes = Pin(Tables.load(s, dir, "events") // entry pick + final left join reuse
        .select(col("event_type").as("id")).distinct())
      val entry = nodes.agg(min("id")).head().getString(0)
      // the transition graph is post-aggregation (≤ |event types|
      // nodes): BFS on the collected edge list, not per-depth joins.
      // maxIters = 6 matches the oracle's recursion cap (depth < 6 →
      // max emitted depth 6) so both sides bound identically on any
      // graph shape.
      val r = GraphOps.reachableLocal(e, Seq(entry), maxIters = 6)
      nodes.join(r, nodes("id") === r("node"), "left")
        .select(col("id").as("node"),
          col("depth").isNotNull.as("reachable"), col("depth"))
  }

  // ---------------------------------------------------------------
  // g02 fan-out / fan-in — static branch detection on the transition
  // graph (edge.py:506-540): distinct-successor/predecessor degrees.
  val g02 = Q(
    "g02_fanout_fanin",
    s"""$edgesCte,
      |o AS (SELECT src AS id, COUNT(*) AS out_degree
      |      FROM (SELECT DISTINCT src, dst FROM e) GROUP BY src),
      |i AS (SELECT dst AS id, COUNT(*) AS in_degree
      |      FROM (SELECT DISTINCT src, dst FROM e) GROUP BY dst)
      |SELECT nodes.id, COALESCE(o.out_degree, 0) AS out_degree,
      |  COALESCE(i.in_degree, 0) AS in_degree,
      |  COALESCE(o.out_degree, 0) > 1 AS is_fanout,
      |  COALESCE(i.in_degree, 0) > 1 AS is_fanin
      |FROM nodes LEFT JOIN o ON nodes.id = o.id
      |           LEFT JOIN i ON nodes.id = i.id""".stripMargin) {
    (s, dir) =>
      val nodes = Tables.load(s, dir, "events")
        .select(col("event_type").as("id")).distinct()
      GraphOps.degrees(nodes, edges(s, dir))
  }

  val all: Seq[Q] = Seq(g01, g02)
}
