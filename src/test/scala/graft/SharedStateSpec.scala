package graft

import graft.streaming.SharedState
import graft.streaming.SharedState.{StateChange, StateOp}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Reference-semantics tests for the shared-state manager port
  * (`shared_state.py` SharedStateManager): isolation visibility, the
  * ISOLATED write downgrade, the read-rule old_value quirk, read_all
  * merge precedence, the history cap, and cross-microbatch streaming
  * state. */
class SharedStateSpec extends SparkTestBase {
  import spark.implicits._
  private implicit def s: org.apache.spark.sql.SparkSession = spark

  private def op(seq: Long, ex: String, st: String, iso: String,
      scope: String, key: String, v: String) =
    StateOp(seq, ex, st, iso, scope, key, v)

  test("ISOLATED writes downgrade to execution scope and stay " +
      "invisible to other executions (shared_state.py:207-209,152-182)") {
    val ops = Seq(
      // e1 ISOLATED asks for a GLOBAL write — must land in e1's
      // execution state
      op(1, "e1", "s1", "isolated", "global", "k", "from_e1"),
      // e2 SHARED writes the real global
      op(2, "e2", "s1", "shared", "global", "k", "global_v"),
      // e1 ISOLATED reads only its own execution state
      op(3, "e1", "s1", "isolated", "execution", "k", "again"),
      // e3 ISOLATED never wrote k: its change's old_value is None
      // even though global state holds a value
      op(4, "e3", "s1", "isolated", "execution", "k", "e3v")).toDS()
    val chs = SharedState.changes(ops).collect().sortBy(_.seq)
    assert(chs(0).scope === "execution") // the downgrade
    assert(chs(2).oldValue === Some("from_e1")) // e1 sees e1's value
    assert(chs(3).oldValue === None) // ISOLATED blind to global
    val st = SharedState.apply(ops).collect()
      .map(r => (r.scope, r.scopeId) -> r.value).toMap
    assert(st(("execution", "e1")) === "again")
    assert(st(("global", "")) === "global_v")
  }

  test("old_value records the READ-rule resolution, not the written " +
      "scope (shared_state.py:205 quirk)") {
    val ops = Seq(
      op(1, "e1", "s1", "shared", "execution", "k", "exec_v"),
      // stream-scope write while an execution-scope value shadows the
      // key: the reference records old_value = the execution value
      op(2, "e1", "s1", "shared", "stream", "k", "stream_v"),
      // a DIFFERENT execution on the stream resolves to the stream
      // value now
      op(3, "e2", "s1", "shared", "global", "k", "global_v")).toDS()
    val chs = SharedState.changes(ops).collect().sortBy(_.seq)
    assert(chs(1).oldValue === Some("exec_v"))
    assert(chs(2).oldValue === Some("stream_v"))
  }

  test("readAll merges global < stream < execution, and ISOLATED " +
      "sees only execution (shared_state.py:290-316)") {
    val ops = Seq(
      op(1, "e1", "s1", "shared", "global", "a", "g"),
      op(2, "e1", "s1", "shared", "stream", "a", "s"),
      op(3, "e1", "s1", "shared", "execution", "a", "e"),
      op(4, "e1", "s1", "shared", "global", "b", "g_only"),
      op(5, "e2", "s2", "shared", "stream", "c", "other_stream")).toDS()
    val st = SharedState.apply(ops)
    val all = SharedState.readAll(st, "e1", "s1", "shared").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(all === Map("a" -> "e", "b" -> "g_only")) // c: other stream
    val iso = SharedState.readAll(st, "e1", "s1", "isolated").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(iso === Map("a" -> "e")) // only the execution level
  }

  test("recentChanges keeps the LAST maxHistory changes by seq " +
      "(shared_state.py:280-287)") {
    val ops = (1L to 5L)
      .map(i => op(i, "e1", "s1", "shared", "global", s"k$i", s"v$i"))
      .toDS()
    val recent = SharedState.recentChanges(ops, maxHistory = 3)
      .collect().map(_.seq).sorted
    assert(recent.toSeq === Seq(3L, 4L, 5L))
  }

  test("streaming twin: per-key state persists across microbatches " +
      "and old_values resolve against it") {
    val input = MemoryStream[StateOp](spark)
    val q = SharedState.changesStream(input.toDS())
      .writeStream.format("memory").queryName("sstate")
      .outputMode("append").start()
    try {
      input.addData(op(1, "e1", "s1", "shared", "stream", "k", "v1"))
      q.processAllAvailable()
      input.addData(op(2, "e2", "s1", "shared", "global", "k", "v2"))
      q.processAllAvailable()
      val chs = spark.table("sstate").as[StateChange].collect()
        .sortBy(_.seq)
      assert(chs.length === 2)
      // batch-2's old_value resolves against batch-1's stream state
      assert(chs(1).oldValue === Some("v1"))
    } finally q.stop()
  }

  test("streaming twin: a late op (seq <= the key's applied max) is " +
      "dropped, preserving the seq total order across microbatches") {
    val input = MemoryStream[StateOp](spark)
    val q = SharedState.changesStream(input.toDS())
      .writeStream.format("memory").queryName("sstate_late")
      .outputMode("append").start()
    try {
      input.addData(op(5, "e1", "s1", "shared", "global", "k", "v5"))
      q.processAllAvailable()
      // seq=3 arrives AFTER seq=5 committed: dropped, not reordered
      input.addData(
        op(3, "e1", "s1", "shared", "global", "k", "v3"),
        op(6, "e1", "s1", "shared", "global", "k", "v6"))
      q.processAllAvailable()
      val chs = spark.table("sstate_late").as[StateChange].collect()
        .sortBy(_.seq)
      assert(chs.map(_.seq).toSeq === Seq(5L, 6L))
      assert(chs(1).oldValue === Some("v5")) // v3 never applied
    } finally q.stop()
  }
}
