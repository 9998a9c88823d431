package graft

import graft.operators.{GraphOps, Pin}
import graft.queries.TextDedup
import org.apache.spark.sql.Row

/** The `spark.graft.pin` knob trades local-mode speed
  * (localCheckpoint) against cluster fault tolerance (persist with
  * lineage kept) — results must be identical in every mode, for both
  * a fan-out consumer (d02) and an iterative one (BFS reachability).
  */
class PinSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withMode[A](mode: String)(body: => A): A = {
    val prev = spark.conf.getOption(Pin.Key)
    spark.conf.set(Pin.Key, mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Pin.Key, v)
      case None => spark.conf.unset(Pin.Key)
    }
  }

  private def run(mode: String): Seq[Row] = withMode(mode) {
    TextDedup.d02.run(spark, sf)
      .orderBy("doc_a", "doc_b").collect().toSeq
  }

  test("d02 results identical across pin modes") {
    val base = run("localCheckpoint")
    assert(base.nonEmpty)
    assert(run("persist") === base)
    assert(run("none") === base)
  }

  test("BFS reachability identical across pin modes") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("src", "dst")
    def reach(mode: String): Set[(String, Int)] = withMode(mode) {
      GraphOps.reachable(edges, Seq("a"), maxIters = 10)
        .as[(String, Int)].collect().toSet
    }
    val base = reach("localCheckpoint")
    assert(base === Set(("a", 0), ("b", 1), ("c", 2), ("d", 3)))
    assert(reach("persist") === base)
  }
}
