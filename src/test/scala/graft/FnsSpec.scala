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

  test("morton8: seeded property — column algebra equals bit-by-bit " +
      "interleave; corners pin the nu-odd/nh-even layout") {
    def ref(nu: Long, nh: Long): Long =
      (0 until 8).map(i =>
        (((nu >> i) & 1L) << (2 * i + 1)) |
          (((nh >> i) & 1L) << (2 * i))).sum
    val rng = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L)) ++
      Seq.fill(200)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got = cases.toDF("nu", "nh")
      .select(col("nu"), col("nh"),
        Fns.morton8(col("nu"), col("nh")).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (nu, nh) =>
      assert(got((nu, nh)) === ref(nu, nh), s"nu=$nu nh=$nh")
    }
    assert(got((255L, 0L)) === 0xAAAAL)  // odd bits = nu
    assert(got((0L, 255L)) === 0x5555L)  // even bits = nh
  }
}
