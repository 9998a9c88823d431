package graft

import graft.functions.Fns
import org.apache.spark.sql.functions._

class FnsSpec extends SparkTestBase {
  import spark.implicits._

  test("kInt: anchored single-regex payload extraction — valid payloads " +
      "extract, shape violations (incl. trailing newline and >18 digits) " +
      "are NULL, never an ANSI cast error") {
    val got = Seq(
      """{"k": 42}""",          // valid
      """{"k": -7}""",          // valid negative
      "{\"k\": 5}\n",           // trailing newline: Java $ would match,
                                // RE2 would not — \z rejects on both
      """{"k": 99999999999999999999}""", // 20 digits: BIGINT overflow
      """{"k": 5, "j": 1}""",   // extra key
      "not json")
      .toDF("props").select(Fns.kInt.as("k")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got === Seq(Some(42L), Some(-7L), None, None, None, None))
  }

  test("hash60 matches the DuckDB construction bit-for-bit") {
    // DuckDB: SELECT ('0x'||substr(md5('hello'),1,15))::BIGINT
    val got = Seq("hello").toDF("s")
      .select(Fns.hash60(col("s"))).head().getLong(0)
    assert(got === 419982666956583591L)
  }

  test("shingles3 yields distinct word 3-grams, empty under 3 tokens") {
    val df = Seq("a b c d", "a b", "x y z x y z").toDF("t")
      .select(Fns.shingles3(Fns.tokens(col("t"))).as("g"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) === Seq("a b c", "b c d"))
    assert(rows(1).isEmpty)
    assert(rows(2).toSet === Set("x y z", "y z x", "z x y"))
  }

  test("dotScaled is the exact scaled integer dot product") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val got = df.select(Fns.dotScaled(col("a"), col("b"))).head().getLong(0)
    assert(got === 11000000000000L) // (1*3 + 2*4) * 1e12
  }

  test("cosineFromScaled is plain IEEE double arithmetic") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val cos = df.select(Fns.cosineFromScaled(
      Fns.dotScaled(col("a"), col("b")),
      Fns.normSqScaled(col("a")), Fns.normSqScaled(col("b"))))
      .head().getDouble(0)
    assert(cos === 1.0)
  }
}
