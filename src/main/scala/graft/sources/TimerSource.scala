package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Timer / cron trigger source (SURVEY §2.1; reference
  * `runtime/agent_runtime.py:414-531` — `_make_cron_timer` /
  * `_make_timer`).
  *
  * The reference runs one asyncio loop per entry point that sleeps to
  * the next fire time and emits a trigger payload
  * `{"event": {"source": "timer", "reason": "scheduled"}}`. The
  * Spark-native re-expression splits that into
  *
  *  - a deterministic **schedule expansion**: every fire instant for
  *    every spec inside a time window, as a DataFrame — the batch
  *    backbone (backfill, audit, "what fired while we were down");
  *  - a streaming **filter predicate** ([[matchesCron]]) a rate-source
  *    tick stream applies to emit live trigger rows, per the survey's
  *    `Trigger.ProcessingTime` mapping.
  *
  * Scale shape: cron text parses ONCE per spec row (specs are
  * entry-point-grain — thousands at most); tick generation is a
  * two-level `sequence`/`explode` (days × minutes-in-day) so no row
  * ever carries more than a day's minutes in one array, and matching
  * is pure bitwise arithmetic inside whole-stage codegen. The expanded
  * grid distributes over (spec × day) — a year × 10k specs is ~3.7 M
  * perfectly parallel rows before the mask filter prunes it.
  *
  * Cron semantics follow the reference's croniter dependency (vixie
  * cron): five fields `min hour dom month dow`; `*`, lists, ranges,
  * steps; dow 0–7 with 0 and 7 both Sunday; when BOTH dom and dow are
  * restricted a tick fires if EITHER matches. Month/dow names are not
  * supported (the reference's own graphs use numeric fields). An
  * invalid expression drops the spec — the reference logs a warning
  * and `continue`s (`agent_runtime.py:405-412`); [[resolve]] surfaces
  * the same outcome as an `invalid` flag so callers can audit.
  *
  * Timing model note: after each interval fire the reference sleeps
  * `interval` from fire COMPLETION, so real schedules drift by
  * execution latency; the deterministic model is the undrifted grid.
  * Cron fires recompute from wall clock and do not drift.
  */
object TimerSource {

  /** One entry-point timer config (`agent_runtime.py:379-399`):
    * exactly one of `cron` / `intervalMinutes` is expected. */
  final case class TimerSpec(
      entryPointId: String,
      cron: Option[String],
      intervalMinutes: Option[Double],
      runImmediately: Boolean)

  /** Parsed vixie-cron masks: bit i of each mask = value i allowed. */
  final case class CronMasks(
      minute: Long, hour: Long, dom: Long, month: Long, dow: Long,
      domRestricted: Boolean, dowRestricted: Boolean)

  private def fieldMask(spec: String, lo: Int, hi: Int,
      normalize: Int => Int = identity): Option[Long] = {
    var mask = 0L
    val parts = spec.split(",", -1)
    if (parts.exists(_.isEmpty)) return None
    for (part <- parts) {
      val (rangePart, step) = part.split("/", -1) match {
        case Array(r) => (r, 1)
        case Array(r, s) =>
          val st = s.toIntOption.getOrElse(return None)
          if (st < 1) return None else (r, st)
        case _ => return None
      }
      val (from, to) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          r.split("-", -1) match {
            case Array(a, b) =>
              val f = a.toIntOption.getOrElse(return None)
              val t = b.toIntOption.getOrElse(return None)
              (f, t)
            case _ => return None
          }
        // single value with a step ("a/n") means "a to hi by n" in cron
        case r =>
          val v = r.toIntOption.getOrElse(return None)
          if (step > 1 || part.contains("/")) (v, hi) else (v, v)
      }
      if (from < lo || to > hi + (if (hi == 6) 1 else 0) || from > to)
        return None
      var v = from
      while (v <= to) { mask |= 1L << normalize(v); v += step }
    }
    if (mask == 0L) None else Some(mask)
  }

  /** Parse a 5-field cron expression; None = invalid (dropped spec). */
  def parseCron(expr: String): Option[CronMasks] = {
    val f = expr.trim.split("\\s+")
    if (f.length != 5) return None
    for {
      min <- fieldMask(f(0), 0, 59)
      hr  <- fieldMask(f(1), 0, 23)
      dom <- fieldMask(f(2), 1, 31)
      mon <- fieldMask(f(3), 1, 12)
      dow <- fieldMask(f(4), 0, 6, v => if (v == 7) 0 else v)
    } yield CronMasks(min, hr, dom, mon, dow,
      domRestricted = f(2) != "*", dowRestricted = f(4) != "*")
  }

  /** Spec rows with parsed masks + validity flag. Runs the parse at
    * spec grain through a typed map — never per tick. */
  def resolve(spark: SparkSession, specs: Seq[TimerSpec]): DataFrame = {
    import spark.implicits._
    specs.map { sp =>
      val m = sp.cron.flatMap(parseCron)
      (sp.entryPointId, sp.cron, sp.intervalMinutes, sp.runImmediately,
        sp.cron.isDefined && m.isEmpty,
        m.map(_.minute), m.map(_.hour), m.map(_.dom), m.map(_.month),
        m.map(_.dow), m.map(_.domRestricted), m.map(_.dowRestricted))
    }.toDF("entry_point_id", "cron", "interval_minutes", "run_immediately",
      "invalid", "m_min", "m_hour", "m_dom", "m_month", "m_dow",
      "dom_restricted", "dow_restricted")
  }

  /** Does minute-grain tick `t` match the mask columns? Pure bitwise
    * builtins — stays in whole-stage codegen on the tick grid. */
  def matchesCron(t: Column, mMin: Column, mHour: Column, mDom: Column,
      mMonth: Column, mDow: Column, domR: Column, dowR: Column): Column = {
    def bit(mask: Column, v: Column) =
      call_function("shiftright", mask, v.cast("int")) % 2 === 1
    val dom = bit(mDom, dayofmonth(t))
    val dow = bit(mDow, dayofweek(t) - 1) // Spark: 1=Sunday → cron 0
    bit(mMin, minute(t)) && bit(mHour, hour(t)) && bit(mMonth, month(t)) &&
      (when(domR && dowR, dom || dow).otherwise(dom && dow))
  }

  /** Every fire instant in `[from, to]` for every resolved spec.
    *
    * Cron: ticks strictly after `from` at matching minutes (+ `from`
    * itself when `run_immediately`, matching the skipped initial sleep).
    * Interval: the undrifted grid from the first fire (`from` when
    * immediate, else `from + interval`).
    * Output: (entry_point_id, fire_at_ms, source, reason) — the
    * reference's trigger payload coordinates at epoch-ms precision.
    */
  def ticks(resolved: DataFrame, from: Timestamp, to: Timestamp): DataFrame = {
    val lo = lit(from).cast("timestamp")
    val hi = lit(to).cast("timestamp")

    val cron = resolved.filter(col("cron").isNotNull && !col("invalid"))
    val cronDays = cron.select(
      col("entry_point_id"), col("m_min"), col("m_hour"), col("m_dom"),
      col("m_month"), col("m_dow"), col("dom_restricted"),
      col("dow_restricted"), col("run_immediately"),
      explode(sequence(date_trunc("DAY", lo), date_trunc("DAY", hi),
        expr("interval 1 day"))).as("day"))
    val cronTicks = cronDays
      .select(col("*"),
        explode(sequence(lit(0), lit(1439))).as("mod"))
      .select(col("entry_point_id"), col("run_immediately"),
        (col("day") + make_dt_interval(
          lit(0), lit(0), col("mod"), lit(0))).as("fire_at"),
        matchesCron(col("day") + make_dt_interval(
            lit(0), lit(0), col("mod"), lit(0)),
          col("m_min"), col("m_hour"), col("m_dom"), col("m_month"),
          col("m_dow"), col("dom_restricted"), col("dow_restricted"))
          .as("hit"))
      .filter(col("hit") && col("fire_at") > lo && col("fire_at") <= hi)
      .select(col("entry_point_id"), col("fire_at"))
    val cronImmediate = cron
      .filter(col("run_immediately"))
      .select(col("entry_point_id"), lo.as("fire_at"))

    // interval_minutes may be fractional (reference takes float
    // minutes) — route it through the seconds arg, which is DECIMAL
    val step = make_dt_interval(lit(0), lit(0), lit(0),
      (col("interval_minutes") * 60).cast("decimal(18,6)"))
    val firstFire = when(col("run_immediately"), lo).otherwise(lo + step)
    // sequence() rejects start > stop with a positive step — a spec
    // whose first fire lands past the window must yield zero rows,
    // not poison the whole batch (explode drops the null)
    val interval = resolved
      .filter(col("interval_minutes").isNotNull &&
        col("interval_minutes") > 0)
      .select(col("entry_point_id"),
        explode(when(firstFire <= hi, sequence(firstFire, hi, step)))
          .as("fire_at"))

    cronTicks.unionByName(cronImmediate).unionByName(interval)
      .select(col("entry_point_id"),
        (unix_millis(col("fire_at"))).as("fire_at_ms"),
        lit("timer").as("source"), lit("scheduled").as("reason"))
  }

  /** Live trigger stream: a 1 Hz rate source reduced to minute ticks,
    * cross-filtered against the resolved cron specs. The reference's
    * pause / already-running gates are runtime state, applied by the
    * consumer (see [[applyGates]]). */
  def streamingTicks(spark: SparkSession, resolved: DataFrame): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
      .withColumn("tick", date_trunc("MINUTE", col("timestamp")))
      .filter(second(col("timestamp")) === 0) // one row per minute
    rate.join(broadcast(
        resolved.filter(col("cron").isNotNull && !col("invalid"))),
        matchesCron(col("tick"), col("m_min"), col("m_hour"), col("m_dom"),
          col("m_month"), col("m_dow"), col("dom_restricted"),
          col("dow_restricted")))
      .select(col("entry_point_id"), col("tick").as("fire_at"),
        lit("timer").as("source"), lit("scheduled").as("reason"))
  }

  /** The reference's skip gates (`agent_runtime.py:428-457`): a tick is
    * skipped (not queued) while timers are paused or the entry point
    * still has an active execution. `busy` = (entry_point_id,
    * busy_from_ms, busy_to_ms) intervals. Banded range join — the same
    * shape as e13, safe at scale because busy intervals are bounded by
    * wall-clock × entry points. */
  def applyGates(ticks: DataFrame, busy: DataFrame): DataFrame = {
    val band = 86400000L // 1-day bands bound the join fan-out
    val t = ticks.withColumn("band", col("fire_at_ms") / band cast "long")
    val b = busy.select(col("entry_point_id").as("ep"),
        col("busy_from_ms"), col("busy_to_ms"),
        explode(sequence(col("busy_from_ms") / band cast "long",
          col("busy_to_ms") / band cast "long")).as("band"))
    t.join(b,
        t("entry_point_id") === b("ep") && t("band") === b("band") &&
          t("fire_at_ms") >= b("busy_from_ms") &&
          t("fire_at_ms") < b("busy_to_ms"), "left")
      .groupBy(t("entry_point_id"), col("fire_at_ms"), col("source"),
        col("reason"))
      .agg(max(b("ep").isNotNull).as("skipped_busy"))
  }
}
