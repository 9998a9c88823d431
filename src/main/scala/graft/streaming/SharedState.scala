package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's shared-state manager (`runtime/shared_state.py`:
  * SharedStateManager/StreamMemory, 499 LoC) as a DETERMINISTIC
  * Spark operator: state ops arrive as a totally-ordered dataset
  * (`seq` — the replayable stand-in for the asyncio arrival order),
  * and the engine reproduces the manager's semantics exactly:
  *
  *  - three scopes (`global` / `stream` / `execution`), with reads
  *    resolving execution-first, then stream, then global
  *    (`shared_state.py:152-182`) — and ISOLATED seeing ONLY
  *    execution state;
  *  - ISOLATED writes downgrade to execution scope no matter what the
  *    caller asked (`:207-209`);
  *  - every write records a StateChange whose old_value comes from
  *    the READ rule, not the written scope (`:205,218-228` — so a
  *    stream-scope write records the execution-scope value it was
  *    shadowed by, a quirk this port preserves);
  *  - the change history keeps only the most recent `maxHistory`
  *    entries (`:280-287`, default 1000);
  *  - SYNCHRONIZED's per-key write locks (`:253-278`) are exactly
  *    Spark's single-writer-per-key state model: the per-key fold IS
  *    the serialized critical section, so the level needs no extra
  *    machinery here — the op order (seq) is the lock-acquisition
  *    order.
  *
  * Scale shape: ops group by KEY — every key's machine folds
  * independently and in parallel (the per-key lock granularity the
  * reference approximates with its lock map); nothing global except
  * the seq order itself. The version column is the op's seq — the
  * reference's single global `_version` counter is a process-local
  * int; a monotone per-write stamp is the distributed equivalent
  * (documented deviation).
  */
object SharedState {

  /** One state operation. `isolation` ∈ isolated|shared|synchronized,
    * `scope` ∈ global|stream|execution (`StateScope`). */
  case class StateOp(seq: Long, executionId: String, streamId: String,
      isolation: String, scope: String, key: String, value: String)

  /** The reference's StateChange row (+ the seq stamp as version). */
  case class StateChange(seq: Long, key: String, oldValue: Option[String],
      newValue: String, scope: String, executionId: String,
      streamId: String)

  /** Final state row after the fold: one per (scope, scopeId, key). */
  case class StateRow(scope: String, scopeId: String, key: String,
      value: String, version: Long)

  /** Per-key machine: the three storage levels for ONE key, plus the
    * highest seq applied so far (the streaming lateness watermark).
    * Public + simple types so Spark's state encoder can build it. */
  case class KeyState(global: Option[String],
      stream: Map[String, String], exec: Map[String, String],
      maxSeq: Long)

  private val emptyKs = KeyState(None, Map.empty, Map.empty, -1L)

  /** The reference's read-resolution rule (`shared_state.py:152-182`):
    * execution first; stream then global unless ISOLATED. */
  private def resolve(ks: KeyState, op: StateOp): Option[String] = {
    val ex = ks.exec.get(op.executionId)
    if (ex.isDefined) ex
    else if (op.isolation == "isolated") None
    else ks.stream.get(op.streamId).orElse(ks.global)
  }

  /** Apply one write (`:184-251`): ISOLATED downgrades to execution
    * scope; returns (new machine, the recorded change). */
  private def applyOp(ks: KeyState, op: StateOp): (KeyState, StateChange) = {
    val old = resolve(ks, op)
    val scope = if (op.isolation == "isolated") "execution" else op.scope
    val next = scope match {
      case "global" => ks.copy(global = Some(op.value))
      case "stream" =>
        ks.copy(stream = ks.stream + (op.streamId -> op.value))
      case _ => ks.copy(exec = ks.exec + (op.executionId -> op.value))
    }
    (next.copy(maxSeq = math.max(ks.maxSeq, op.seq)),
      StateChange(op.seq, op.key, old, op.value, scope,
        op.executionId, op.streamId))
  }

  private def foldKey(ops: Iterator[StateOp],
      ks0: KeyState): (KeyState, Seq[StateChange]) =
    ops.toSeq.sortBy(_.seq).foldLeft((ks0, Vector.empty[StateChange])) {
      case ((ks, acc), op) =>
        val (next, ch) = applyOp(ks, op)
        (next, acc :+ ch)
    }

  /** Batch: full change log (every write, with the read-rule old
    * value), ordered within each key by seq. */
  def changes(ops: Dataset[StateOp])(
      implicit spark: SparkSession): Dataset[StateChange] = {
    import spark.implicits._
    ops.groupByKey(_.key).flatMapGroups { (_, it) =>
      foldKey(it, emptyKs)._2.iterator
    }
  }

  /** Batch: the bounded audit ring the reference keeps (`_max_history`
    * = 1000): globally the LAST `maxHistory` changes by seq. The cap
    * is a total-order top-k — `orderBy(desc).limit` plans as
    * TakeOrdered (no full sort at scale). */
  def recentChanges(ops: Dataset[StateOp], maxHistory: Int = 1000)(
      implicit spark: SparkSession): Dataset[StateChange] = {
    import spark.implicits._
    changes(ops).orderBy(col("seq").desc).limit(maxHistory)
  }

  /** Batch: final state rows after all ops — one per (scope, scopeId,
    * key) with the seq of the write that produced the value. */
  def apply(ops: Dataset[StateOp])(
      implicit spark: SparkSession): Dataset[StateRow] = {
    import spark.implicits._
    ops.groupByKey(_.key).flatMapGroups { (key, it) =>
      val opsSeq = it.toSeq.sortBy(_.seq)
      val perTarget = scala.collection.mutable
        .LinkedHashMap.empty[(String, String), (String, Long)]
      var ks = emptyKs
      opsSeq.foreach { op =>
        val (next, ch) = applyOp(ks, op)
        ks = next
        val scopeId = ch.scope match {
          case "global" => ""
          case "stream" => op.streamId
          case _ => op.executionId
        }
        perTarget((ch.scope, scopeId)) = (op.value, op.seq)
      }
      perTarget.iterator.map { case ((scope, id), (v, seq)) =>
        StateRow(scope, id, key, v, seq)
      }
    }
  }

  /** The `read_all` merge (`shared_state.py:290-316`): global <
    * stream < execution overwrite precedence; ISOLATED sees only the
    * execution level. A driver-facing view over [[apply]]'s rows. */
  def readAll(state: Dataset[StateRow], executionId: String,
      streamId: String, isolation: String): DataFrame = {
    val precedence = when(col("scope") === "execution", 3)
      .when(col("scope") === "stream", 2).otherwise(1)
    val visible =
      if (isolation == "isolated")
        state.filter(col("scope") === "execution" &&
          col("scopeId") === executionId)
      else
        state.filter(
          (col("scope") === "execution" && col("scopeId") === executionId) ||
            (col("scope") === "stream" && col("scopeId") === streamId) ||
            col("scope") === "global")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key")
      .orderBy(col("prec").desc, col("version").desc)
    visible.withColumn("prec", precedence)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("key", "value")
  }

  /** Streaming twin: live ops fold through the same per-key machine
    * via flatMapGroupsWithState, emitting change rows as they commit —
    * one KeyState per key in the state store (the per-key lock
    * granularity), microbatch arrival order = seq order within a
    * batch (callers stamp seq; intra-batch the fold sorts by it).
    *
    * Cross-batch lateness contract: an op whose seq is ≤ the key's
    * highest already-applied seq ([[KeyState.maxSeq]]) arrived late —
    * applying it would violate the documented seq total order (the
    * batch [[changes]] fold would have applied it earlier). Such ops
    * are DROPPED, not applied out of order — the same
    * drop-don't-reorder stance EventStream's watermark anomaly
    * handling takes. The batch fold is unaffected (one group sees all
    * ops, sorted). */
  def changesStream(ops: Dataset[StateOp])(
      implicit spark: SparkSession): Dataset[StateChange] = {
    import spark.implicits._
    ops.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, StateChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[KeyState]) =>
          val ks0 = state.getOption.getOrElse(emptyKs)
          val fresh = it.filter(_.seq > ks0.maxSeq)
          val (next, chs) = foldKey(fresh, ks0)
          state.update(next)
          chs.iterator
      }
  }
}
