package graft

import java.sql.Timestamp

import graft.sources.TimerSource
import graft.sources.TimerSource.TimerSpec
import org.apache.spark.sql.functions._

class TimerSourceSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fires(specs: Seq[TimerSpec], from: String, to: String):
      Seq[(String, Long)] =
    TimerSource.ticks(TimerSource.resolve(spark, specs), ts(from), ts(to))
      .select("entry_point_id", "fire_at_ms").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

  private def ms(s: String) = ts(s).getTime

  test("cron parse: fields, ranges, steps, lists, dow 7=0") {
    val m = TimerSource.parseCron("*/15 9-17 1,15 * 1-5").get
    assert(m.minute === (1L | (1L << 15) | (1L << 30) | (1L << 45)))
    assert(m.hour === (9 to 17).map(1L << _).reduce(_ | _))
    assert(m.dom === ((1L << 1) | (1L << 15)))
    assert(m.month === (1 to 12).map(1L << _).reduce(_ | _))
    assert(m.dow === (1 to 5).map(1L << _).reduce(_ | _))
    assert(m.domRestricted && m.dowRestricted)
    // dow 7 aliases Sunday (bit 0), croniter-style
    assert((TimerSource.parseCron("0 0 * * 7").get.dow & 1L) === 1L)
    assert(TimerSource.parseCron("0 0 * * 5-7").get.dow ===
      ((1L << 5) | (1L << 6) | 1L))
  }

  test("cron parse: invalid expressions rejected (agent_runtime.py:405)") {
    for (bad <- Seq("* * * *", "60 * * * *", "* 24 * * *", "x * * * *",
        "*/0 * * * *", "5-2 * * * *", "1,,2 * * * *", "* * 0 * *"))
      assert(TimerSource.parseCron(bad).isEmpty, bad)
    // resolve keeps the row but flags it; ticks drops it
    val r = TimerSource.resolve(spark,
      Seq(TimerSpec("bad", Some("not a cron"), None, false)))
    assert(r.filter(col("invalid")).count() === 1)
    assert(fires(Seq(TimerSpec("bad", Some("not a cron"), None, false)),
      "2025-06-02 00:00:00", "2025-06-03 00:00:00").isEmpty)
  }

  test("cron ticks: */30 over 2h, first fire after start unless immediate") {
    // 2025-06-02 is a Monday
    val lazySpec = TimerSpec("ep", Some("*/30 * * * *"), None, false)
    assert(fires(Seq(lazySpec), "2025-06-02 10:00:00", "2025-06-02 12:00:00")
      === Seq("ep" -> ms("2025-06-02 10:30:00"),
        "ep" -> ms("2025-06-02 11:00:00"),
        "ep" -> ms("2025-06-02 11:30:00"),
        "ep" -> ms("2025-06-02 12:00:00")))
    // immediate adds the start instant (skipped initial sleep)
    val eager = TimerSpec("ep", Some("*/30 * * * *"), None, true)
    assert(fires(Seq(eager), "2025-06-02 10:00:00", "2025-06-02 11:00:00")
      === Seq("ep" -> ms("2025-06-02 10:00:00"),
        "ep" -> ms("2025-06-02 10:30:00"),
        "ep" -> ms("2025-06-02 11:00:00")))
  }

  test("cron dom/dow: OR when both restricted, AND otherwise (vixie)") {
    // 2025-07-13 is a Sunday; "0 0 13 * 5" fires on the 13th OR Fridays
    val both = TimerSpec("b", Some("0 0 13 * 5"), None, false)
    val got = fires(Seq(both), "2025-07-01 00:00:00", "2025-07-31 23:59:00")
    val days = got.map(t => new Timestamp(t._2).toString.take(10))
    assert(days === Seq("2025-07-04", "2025-07-11", "2025-07-13",
      "2025-07-18", "2025-07-25")) // 4 Fridays OR the 13th
    // dom-only restriction: AND with the unrestricted dow — 13th only
    val domOnly = TimerSpec("d", Some("0 0 13 * *"), None, false)
    assert(fires(Seq(domOnly), "2025-07-01 00:00:00", "2025-07-31 23:59:00")
      .map(t => new Timestamp(t._2).toString.take(10)) ===
      Seq("2025-07-13"))
  }

  test("interval ticks: undrifted grid, fractional minutes, immediate") {
    val sp = TimerSpec("i", None, Some(1.5), false)
    assert(fires(Seq(sp), "2025-06-02 00:00:00", "2025-06-02 00:06:00")
      === Seq("i" -> ms("2025-06-02 00:01:30"),
        "i" -> ms("2025-06-02 00:03:00"),
        "i" -> ms("2025-06-02 00:04:30"),
        "i" -> ms("2025-06-02 00:06:00")))
  }

  test("interval ticks: first fire past the window end yields zero rows, " +
      "not a sequence error, and leaves other specs intact") {
    val specs = Seq(
      TimerSpec("late", None, Some(10), false),  // first fire 12:10 > end
      TimerSpec("ok", None, Some(2), false))
    assert(fires(specs, "2025-06-02 12:00:00", "2025-06-02 12:05:00")
      === Seq("ok" -> ms("2025-06-02 12:02:00"),
        "ok" -> ms("2025-06-02 12:04:00")))
  }

  test("property: bitmask cron matching agrees with a naive field-by-field " +
      "matcher over random expressions and minutes") {
    val rnd = new scala.util.Random(20260812L)
    def field(lo: Int, hi: Int): String = rnd.nextInt(4) match {
      case 0 => "*"
      case 1 => (lo + rnd.nextInt(hi - lo + 1)).toString
      case 2 =>
        val a = lo + rnd.nextInt(hi - lo + 1)
        val b = a + rnd.nextInt(hi - a + 1)
        s"$a-$b"
      case 3 => s"*/${1 + rnd.nextInt(9)}"
    }
    // independent matcher: expand each field to the allowed value set
    def naiveSet(spec: String, lo: Int, hi: Int): Set[Int] =
      spec.split(",").flatMap { part =>
        val (r, step) = part.split("/") match {
          case Array(a, s) => (a, s.toInt)
          case Array(a) => (a, 1)
        }
        val (f, t) = r match {
          case "*" => (lo, hi)
          case x if x.contains("-") =>
            val Array(a, b) = x.split("-"); (a.toInt, b.toInt)
          case x => if (part.contains("/")) (x.toInt, hi)
            else (x.toInt, x.toInt)
        }
        (f to t by step)
      }.toSet
    for (_ <- 1 to 200) {
      val Seq(fm, fh, fdom, fmon, fdow) = Seq(
        field(0, 59), field(0, 23), field(1, 31), field(1, 12), field(0, 6))
      val exprStr = s"$fm $fh $fdom $fmon $fdow"
      val m = TimerSource.parseCron(exprStr).get
      val base = ts("2025-01-01 00:00:00").getTime
      for (_ <- 1 to 25) {
        val t = new Timestamp(base + rnd.nextLong(366L * 86400000L))
        val cal = java.util.Calendar.getInstance(
          java.util.TimeZone.getTimeZone("UTC"))
        cal.setTimeInMillis(t.getTime - t.getTime % 60000)
        val (mi, h, dom, mon, dow) = (
          cal.get(java.util.Calendar.MINUTE),
          cal.get(java.util.Calendar.HOUR_OF_DAY),
          cal.get(java.util.Calendar.DAY_OF_MONTH),
          cal.get(java.util.Calendar.MONTH) + 1,
          cal.get(java.util.Calendar.DAY_OF_WEEK) - 1)
        val domMatch = naiveSet(fdom, 1, 31)(dom)
        val dowMatch = naiveSet(fdow, 0, 6)(dow)
        val expected = naiveSet(fm, 0, 59)(mi) && naiveSet(fh, 0, 23)(h) &&
          naiveSet(fmon, 1, 12)(mon) &&
          (if (fdom != "*" && fdow != "*") domMatch || dowMatch
           else domMatch && dowMatch)
        def bit(mask: Long, v: Int) = ((mask >> v) & 1L) == 1L
        val got = bit(m.minute, mi) && bit(m.hour, h) && bit(m.month, mon) &&
          (if (m.domRestricted && m.dowRestricted)
            bit(m.dom, dom) || bit(m.dow, dow)
           else bit(m.dom, dom) && bit(m.dow, dow))
        assert(got === expected, s"'$exprStr' at $t (UTC min=$mi h=$h " +
          s"dom=$dom mon=$mon dow=$dow)")
      }
    }
  }

  test("plan shape: tick expansion is shuffle-free (narrow explode over " +
      "the spec frame — no Exchange at any scale)") {
    import spark.implicits._
    val r = TimerSource.resolve(spark, Seq(
      TimerSpec("c", Some("*/5 * * * *"), None, false),
      TimerSpec("i", None, Some(3), true)))
    val plan = TimerSource.ticks(r, ts("2025-06-02 00:00:00"),
      ts("2025-06-03 00:00:00")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("applyGates marks ticks inside busy intervals (skip-not-queue)") {
    import spark.implicits._
    val t = TimerSource.ticks(
      TimerSource.resolve(spark, Seq(TimerSpec("g", None, Some(10), true))),
      ts("2025-06-02 00:00:00"), ts("2025-06-02 01:00:00"))
    val busy = Seq(("g", ms("2025-06-02 00:15:00"), ms("2025-06-02 00:35:00")))
      .toDF("entry_point_id", "busy_from_ms", "busy_to_ms")
    val gated = TimerSource.applyGates(t, busy)
      .orderBy("fire_at_ms")
      .select("fire_at_ms", "skipped_busy").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(gated === Seq(
      ms("2025-06-02 00:00:00") -> false,
      ms("2025-06-02 00:10:00") -> false,
      ms("2025-06-02 00:20:00") -> true,
      ms("2025-06-02 00:30:00") -> true,
      ms("2025-06-02 00:40:00") -> false,
      ms("2025-06-02 00:50:00") -> false,
      ms("2025-06-02 01:00:00") -> false))
  }
}
