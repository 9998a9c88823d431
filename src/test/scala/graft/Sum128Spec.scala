package graft

import graft.functions.Sum128
import org.apache.spark.sql.functions._

class Sum128Spec extends SparkTestBase {
  import spark.implicits._

  private def total(vs: Seq[Long], parts: Int = 4): java.math.BigDecimal = {
    val r = vs.toDF("v").repartition(parts)
      .agg(Sum128.sum128(col("v")).as("s")).head()
    if (r.isNullAt(0)) null else r.getDecimal(0)
  }

  private def big(vs: Seq[Long]): java.math.BigDecimal =
    new java.math.BigDecimal(vs.map(v => BigInt(v)).sum.bigInteger)

  test("matches BigInt sums, including values past the long range " +
      "(the accumulator is genuinely 128-bit)") {
    val cases = Seq(
      Seq(1L, 2L, 3L),
      Seq(Long.MaxValue, Long.MaxValue, Long.MaxValue), // > 2^63
      Seq(Long.MinValue, Long.MinValue),                // < -2^63
      Seq(Long.MaxValue, Long.MinValue, -1L),
      Seq(Long.MaxValue, 1L),                           // classic overflow
      Seq(-1L, 1L, 0L),
      (1L to 1000L).toSeq,
      Seq.fill(100)(Long.MaxValue) ++ Seq.fill(50)(Long.MinValue))
    for (c <- cases)
      assert(total(c).compareTo(big(c)) === 0, c.take(5))
  }

  test("property: random long sums match BigInt across partition merges") {
    val rnd = new scala.util.Random(128L)
    for (_ <- 1 to 20) {
      val vs = Seq.fill(200)(rnd.nextLong())
      for (parts <- Seq(1, 7))
        assert(total(vs, parts).compareTo(big(vs)) === 0)
    }
  }

  test("null semantics match sum(): nulls skipped, all-null/empty → null") {
    val withNulls = Seq(Some(5L), None, Some(7L)).toDF("v")
      .agg(Sum128.sum128(col("v"))).head().getDecimal(0)
    assert(withNulls.longValueExact() === 12L)
    assert(Seq.empty[Long].toDF("v")
      .agg(Sum128.sum128(col("v"))).head().isNullAt(0))
    assert(Seq[Option[Long]](None, None).toDF("v")
      .agg(Sum128.sum128(col("v"))).head().isNullAt(0))
  }

  test("graft_sum128 registers on the SQL surface (SparkSessionExtensions)") {
    graft.plans.GraftExtensions.register(spark)
    Seq(Long.MaxValue, Long.MaxValue).toDF("v")
      .createOrReplaceTempView("s128_t")
    val got = spark.sql("SELECT graft_sum128(v) AS s FROM s128_t")
      .head().getDecimal(0)
    assert(got.toString === "18446744073709551614")
    // the builder returns the bare AggregateFunction, so the analyzer
    // can wrap DISTINCT / FILTER around it like any built-in aggregate
    assert(spark.sql("SELECT graft_sum128(DISTINCT v) FROM s128_t")
      .head().getDecimal(0).toString === Long.MaxValue.toString)
    assert(spark.sql(
      "SELECT graft_sum128(v) FILTER (WHERE v > 0) FROM s128_t")
      .head().getDecimal(0).toString === "18446744073709551614")
  }

  test("grouped aggregation under whole-stage codegen (q01 shape)") {
    val df = (1L to 10000L).map(i => (i % 3, i * 1000003L)).toDF("g", "v")
    val got = df.groupBy("g").agg(Sum128.sum128(col("v")).as("s"))
      .orderBy("g").collect()
      .map(r => (r.getLong(0), BigInt(r.getDecimal(1).toBigInteger)))
    val want = (1L to 10000L).map(i => (i % 3, BigInt(i) * 1000003))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    for ((g, s) <- got) assert(s === want(g), g)
    // the agg plan stays in whole-stage codegen (compact long buffers)
    val plan = df.groupBy("g").agg(Sum128.sum128(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
  }
}
