package graft

import graft.functions.{Fns, LongArrayDot, VectorExprs}
import graft.plans.GraftExtensions
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class VectorExprsSpec extends SparkTestBase {
  import spark.implicits._

  test("native dot ≡ HOF dot on random long arrays (codegen path)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      (i, Seq.fill(64)(rnd.nextInt(2000001).toLong - 1000000),
        Seq.fill(64)(rnd.nextInt(2000001).toLong - 1000000))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      VectorExprs.dotIntNative(col("a"), col("b")).as("native"),
      Fns.dotInt(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"row ${r.getInt(0)}"))
  }

  test("Shingle3Hash60 ≡ hash60(shingles3) composed path, both " +
      "distinct modes") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c a b c a b c", // repeated grams: distinct matters
      "one two", // under 3 tokens -> empty
      "x y z",
      "unicode tökens mätch bytes tökens mätch bytes")
      .zipWithIndex.map(_.swap).toDF("id", "t")
      .select(col("id"), Fns.tokens(col("t")).as("ws"))
    val got = docs.select(col("id"),
      VectorExprs.shingleHash60(col("ws"), distinct = false).as("raw"),
      VectorExprs.shingleHash60(col("ws"), distinct = true).as("dst"),
      transform(Fns.shingles3Raw(col("ws")), g => Fns.hash60(g)).as("refRaw"),
      array_distinct(transform(Fns.shingles3(col("ws")),
        g => Fns.hash60(g))).as("refDst"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](3), s"raw id ${r.getInt(0)}")
      assert(r.getSeq[Long](2).sorted === r.getSeq[Long](4).sorted,
        s"distinct id ${r.getInt(0)}")
    }
  }

  test("property: Shingle3Hash60 ≡ composed path on random docs " +
      "(seeded, 200 docs)") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("alpha", "beta", "gamma", "δδ", "x", "", "a b",
      "longer-token-value", "7", "ümlaut")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens, covers the <3 edge
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("id", "ws")
    val got = df.select(col("id"),
      VectorExprs.shingleHash60(col("ws"), distinct = false).as("native"),
      transform(Fns.shingles3Raw(col("ws")), g => Fns.hash60(g)).as("ref"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
      s"doc ${r.getInt(0)}: ${docs(r.getInt(0))._2}"))
  }

  test("interpreted eval path matches (nullSafeEval)") {
    val a = Literal.create(Seq(1L, 2L, 3L), ArrayType(LongType))
    val b = Literal.create(Seq(4L, 5L, 6L), ArrayType(LongType))
    assert(LongArrayDot(a, b).eval(InternalRow.empty) === 32L)
    // null input → null
    val n = Literal.create(null, ArrayType(LongType))
    assert(LongArrayDot(a, n).eval(InternalRow.empty) === null)
  }

  test("type check rejects non-bigint arrays") {
    val bad = Literal.create(Seq(1.0), ArrayType(DoubleType))
    val ok = Literal.create(Seq(1L), ArrayType(LongType))
    assert(!LongArrayDot(bad, ok).checkInputDataTypes().isSuccess)
    assert(LongArrayDot(ok, ok).checkInputDataTypes().isSuccess)
  }

  test("graft_dot registers on the SQL surface (SparkSessionExtensions)") {
    GraftExtensions.register(spark)
    Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .createOrReplaceTempView("ve_t")
    val got = spark.sql("SELECT graft_dot(a, b) AS d FROM ve_t")
      .head().getLong(0)
    assert(got === 11L)
  }

  test("graft_scale_vec and graft_rolling_fp60 register on the SQL " +
      "surface and match the Column-side natives") {
    GraftExtensions.register(spark)
    Seq((Seq(0.25f, -1.5f), "a b c d"))
      .toDF("v", "text").createOrReplaceTempView("sv_t")
    val sql = spark.sql(
      """SELECT graft_scale_vec(v) AS sx,
        |  graft_rolling_fp60(split(text, ' ')) AS fp FROM sv_t""".stripMargin)
      .head()
    assert(sql.getSeq[Long](0) === Seq(250000L, -1500000L))
    val col0 = Seq((Seq(0.25f, -1.5f), "a b c d")).toDF("v", "text")
      .select(Fns.scaleVec(col("v")).as("sx"),
        VectorExprs.rollingFp60(split(col("text"), " ")).as("fp"))
      .head()
    assert(sql.getSeq[Long](0) === col0.getSeq[Long](0))
    assert(sql.get(1) === col0.get(1))
  }

  test("graft_cms_estimate registers on the SQL surface, matches the " +
      "Column-side native, and never undercounts an inserted item") {
    GraftExtensions.register(spark)
    val df = Seq("x", "x", "x", "y").toDF("tok")
      .agg(count_min_sketch(col("tok"), lit(1e-4), lit(0.99),
        lit(42)).as("cms"))
      .crossJoin(Seq("x", "y", "z").toDF("probe"))
    df.createOrReplaceTempView("cms_t")
    val sql = spark.sql(
      "SELECT probe, graft_cms_estimate(cms, probe) AS est FROM cms_t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val col0 = df.select(col("probe"),
      VectorExprs.cmsEstimate(col("cms"), col("probe")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sql === col0)
    assert(sql("x") >= 3L && sql("y") >= 1L,
      s"CMS undercounted an inserted item: $sql")
  }

  test("graft_shingle60 registers on the SQL surface and matches the " +
      "Column-side native pass") {
    GraftExtensions.register(spark)
    Seq("a b c d").toDF("text").createOrReplaceTempView("sh_t")
    val sql = spark.sql(
      "SELECT graft_shingle60(split(text, ' ')) AS g FROM sh_t")
      .head().getSeq[Long](0)
    val col0 = Seq("a b c d").toDF("text")
      .select(VectorExprs.shingleHash60(
        split(col("text"), " "), distinct = false).as("g"))
      .head().getSeq[Long](0)
    assert(sql === col0 && sql.length === 2) // shingles: "a b c", "b c d"
    // distinct flag must be a boolean literal
    assert(spark.sql(
      "SELECT graft_shingle60(split(text, ' '), true) AS g FROM sh_t")
      .head().getSeq[Long](0).length === 2)
  }

  test("property: Gram2PairHash60 ≡ composed hash60 (head, bigram) " +
      "pairs on random docs (seeded, incl. <2-token edge)") {
    val rnd = new scala.util.Random(4321)
    val vocab = Vector("alpha", "beta", "gamma", "δδ", "x", "", "7",
      "ümlaut", "longer-token-value")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(8) // 0..7 tokens, covers the <2 edge
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("id", "ws")
    val positions = when(size(col("ws")) >= 2,
      sequence(lit(1), size(col("ws")) - 1))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val got = df.select(col("id"),
      VectorExprs.gram2PairHash60(col("ws")).as("native"),
      transform(positions, i => struct(
        Fns.hash60(element_at(col("ws"), i)).as("u"),
        Fns.hash60(concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1))).as("b"))).as("ref"))
      .collect()
    def pairs(r: org.apache.spark.sql.Row, idx: Int): Seq[(Long, Long)] =
      r.getSeq[org.apache.spark.sql.Row](idx)
        .map(p => (p.getLong(0), p.getLong(1)))
    got.foreach { r =>
      assert(pairs(r, 1) === pairs(r, 2),
        s"doc ${r.getInt(0)}: ${docs(r.getInt(0))._2}")
    }
  }

  test("graft_gram2pair60 registers on the SQL surface and matches " +
      "the Column-side native pass") {
    GraftExtensions.register(spark)
    Seq("a b c").toDF("text").createOrReplaceTempView("g2p_t")
    val sql = spark.sql(
      "SELECT graft_gram2pair60(split(text, ' ')) AS p FROM g2p_t")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(p => (p.getLong(0), p.getLong(1)))
    val col0 = Seq("a b c").toDF("text")
      .select(VectorExprs.gram2PairHash60(split(col("text"), " ")).as("p"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(sql === col0 && sql.length === 2) // pairs: (a,"a b"), (b,"b c")
  }

  test("normSqIntNative = dot with itself") {
    val df = Seq(Seq(3L, 4L)).toDF("a")
    assert(df.select(VectorExprs.normSqIntNative(col("a")))
      .head().getLong(0) === 25L)
  }

  test("property: Quant8Stats ≡ composed HOF path on random scaled " +
      "vectors (seeded, incl. negative halves and zero vector)") {
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextGaussian() * 1e6).toLong))
    } :+ (98L, Seq.fill(16)(0L)) :+
      // exact negative half-step: sx·127/mx = -63.5 — the rounding
      // mode trap (half away from zero, not banker's / Math.round)
      (99L, Seq(1000000L, -500000L, 0L, 250000L))
    val df = vecs.toDF("id", "sx")
    val native = df
      .select(col("id"), VectorExprs.quant8Stats(col("sx")).as("f"))
      .select(col("id"), col("f.scale"), col("f.sq_err"),
        col("f.n_zero"), col("f.n_sat"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // composed reference path (the original v05 Column pipeline);
    // like the query it filters zero vectors BEFORE quantizing (the
    // ANSI divide-by-zero guard)
    val composed = df
      .withColumn("mx",
        array_max(transform(col("sx"), x => abs(x))).cast("long"))
      .filter(col("mx") > 0)
      .withColumn("qv", transform(col("sx"), x =>
        round(x * lit(127.0) / col("mx")).cast("long")))
      .select(col("id"), col("mx"),
        aggregate(
          zip_with(col("sx"), col("qv"), (sx, qc) => {
            val d = sx.cast("double") -
              qc.cast("double") * col("mx") / lit(127.0)
            round(d * d).cast("long")
          }),
          lit(0L), (acc, v) => acc + v).as("sq_err"),
        size(filter(col("qv"), x => x === 0L)).as("n_zero"),
        size(filter(col("qv"), x => abs(x) === 127L)).as("n_sat"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3).toLong,
          r.getInt(4).toLong)).toMap
    vecs.foreach { case (id, sx) =>
      if (sx.forall(_ == 0L))
        assert(native(id) === ((0L, 0L, sx.size.toLong, 0L)))
      else assert(native(id) === composed(id), s"vec $id sx=$sx")
    }
    // the -63.5 half rounds AWAY (to -64): asserted via the composed
    // path equality plus an explicit probe
    assert(native(99L)._4 === 1L) // one saturated code (the max)
  }

  test("property: RollingFp60 ≡ composed transform+aggregate fold on " +
      "random docs (seeded); empty tokens → null") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("a", "bb", "ccc", "dddd", "ee")
    val docsSeq = (1 to 40).map { _ =>
      (1 to (1 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size)))
    }
    val df = docsSeq.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws) }.toDF("id", "ws")
    val native = df
      .select(col("id"), VectorExprs.rollingFp60(col("ws")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hs = transform(col("ws"), w => Fns.hash60(w) % 1000003L)
    val composed = df.withColumn("hs", hs)
      .select(col("id"),
        aggregate(
          slice(col("hs"), lit(2), greatest(size(col("hs")) - 1, lit(0))),
          element_at(col("hs"), 1),
          (acc, h) => (acc * 31 + h) % 1000003L).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === composed)
    val empty = Seq((0L, Seq.empty[String])).toDF("id", "ws")
      .select(VectorExprs.rollingFp60(col("ws"))).head()
    assert(empty.isNullAt(0))
    // null token → null fingerprint, matching the composed path
    // (md5(NULL) is NULL and the fold propagates it)
    val withNull = Seq((0L, Seq("a", null, "b"))).toDF("id", "ws")
      .select(VectorExprs.rollingFp60(col("ws"))).head()
    assert(withNull.isNullAt(0))
  }

  test("property: Gram2Stats ≡ plain gram-frequency reference on " +
      "random docs (seeded)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "a", "dd") // dup "a": collisions
    val docsSeq = (1 to 50).map { _ =>
      (0 until (rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size)))
    } :+ Seq.empty :+ Seq("solo") :+ Seq("x", "x", "x", "x")
    val df = docsSeq.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "ws")
      .select(col("id"), VectorExprs.gram2Stats(col("ws")).as("f"))
      .select(col("id"), col("f.n_grams"), col("f.n_distinct"),
        col("f.top"), col("f.dup"))
    val got = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    docsSeq.zipWithIndex.foreach { case (ws, i) =>
      val grams = ws.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val freq = grams.groupBy(identity).map { case (_, v) => v.size.toLong }
      val expect = (
        grams.size.toLong,
        freq.size.toLong,
        if (freq.isEmpty) 0L else freq.max,
        freq.filter(_ >= 2).sum)
      assert(got(i.toLong) === expect, s"doc $i tokens=$ws")
    }
  }

  test("property: CentroidArgmin ≡ composed zip_with/aggregate/" +
      "array_min path on random float vectors; ties break to the " +
      "smaller cell; null elements are skipped like the oracle's SUM") {
    val rnd = new scala.util.Random(47)
    val cells = Seq(3, 7, 11)
    val cens: Seq[Seq[Double]] =
      cells.map(_ => Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(8)((rnd.nextFloat() * 2 - 1)))
    }
    val df = vecs.toDF("id", "x")
    val native = df.select(col("id"),
        VectorExprs.centroidArgmin(col("x"), cells, cens).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // composed reference: the original v07 column pipeline
    def dsFor(m: Seq[Double]) = aggregate(
      zip_with(col("x"), typedlit(m), (x, mm) => {
        val d = x.cast("double") - mm
        round(d * d * lit(1e12)).cast("long")
      }), lit(0L), (acc, t) => acc + t)
    val composed = df.select(col("id"),
        array_min(array(cells.zip(cens).map { case (l, m) =>
          struct(dsFor(m).as("ds"), lit(l).as("cell"))
        }: _*)).getField("cell").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, _) =>
      assert(native(id) === composed(id), s"vec $id")
    }
    // tie: two identical centroids -> the smaller cell id wins, no
    // matter the declaration order
    val tied = Seq((1L, Array(0.5f, 0.5f))).toDF("id", "x")
      .select(VectorExprs.centroidArgmin(col("x"),
        Seq(9, 2), Seq(Seq(0.0, 0.0), Seq(0.0, 0.0))).as("cell"))
      .collect().head.getInt(0)
    assert(tied === 2)
    // null element contributes no term (oracle parity: the exploded
    // join drops the position), so [null, 1.0] scores like [1.0] at
    // pos 1 — nearer the (_, 1) centroid than (_, 9)
    val withNull = Seq((1L, Array[java.lang.Float](null, 1.0f)))
      .toDF("id", "x")
      .select(VectorExprs.centroidArgmin(col("x"),
        Seq(0, 1), Seq(Seq(5.0, 9.0), Seq(5.0, 1.0))).as("cell"))
      .collect().head.getInt(0)
    assert(withNull === 1)
  }

  test("ExactRound fast path ≡ shortest-decimal BigDecimal HALF_UP " +
      "(magnitude sweep, signs, ±k·ulp half-boundary neighborhoods)") {
    import graft.functions.ExactRound
    def check(x: Double): Unit = {
      val want =
        try Some(ExactRound.slow(x)) catch { case _: Throwable => None }
      want.foreach { w =>
        assert(ExactRound.halfUp(x) === w, s"x=$x (${x.toString})")
      }
    }
    // the documented traps
    check(0.49999999999999994) // one ulp below 0.5: must round to 0
    check(-63.5) // half away from zero, not Math.round's ceiling
    check(2.5); check(-2.5); check(0.5); check(-0.5)
    // exact half boundaries and their ±k·ulp neighbors across the
    // magnitudes the natives actually produce (1e12-scaled terms)
    for (mag <- Seq(1.0, 1e3, 1e6, 1e9, 1e12, 4e12, 1.6e13, 1e15);
         k <- -5 to 5) {
      val half = math.floor(mag) + 0.5
      var v = half
      if (k < 0) (1 to -k).foreach(_ => v = math.nextDown(v))
      if (k > 0) (1 to k).foreach(_ => v = math.nextUp(v))
      check(v); check(-v)
    }
    // seeded random sweep at mixed magnitudes (the property body)
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) *
        math.pow(10, rnd.nextInt(16).toDouble)
      check(x)
    }
    // squared-diff·1e12 shapes exactly as PqEncodeStats computes them
    (1 to 50000).foreach { _ =>
      val d = (rnd.nextFloat() - rnd.nextFloat()).toDouble
      check(d * d * 1e12)
    }
  }

  test("property: ScaleVec1e6 ≡ composed transform(round(x*1e6)) on " +
      "random float and double vectors; null elements map to null " +
      "elements; empty stays empty") {
    val rnd = new scala.util.Random(83)
    val vecs = (0 until 300).map { i =>
      val arr: Array[java.lang.Float] = Array.tabulate(16) { j =>
        if (i % 17 == 0 && j == 3) null
        else java.lang.Float.valueOf(rnd.nextFloat() * 4 - 2)
      }
      (i.toLong, arr)
    } :+ (999L, Array.empty[java.lang.Float])
    val df = vecs.toDF("id", "x")
    val both = df.select(col("id"),
        Fns.scaleVec(col("x")).as("native"),
        transform(col("x"),
          x => round(x.cast(DoubleType) * lit(1e6)).cast(LongType))
          .as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Any](1).toSeq === r.getSeq[Any](2).toSeq,
        s"id ${r.getLong(0)}")
    }
    // double-typed input takes the same path
    val d2 = Seq((1L, Array(0.1234565, -0.9999995, 2.5e-7)))
      .toDF("id", "x")
      .select(Fns.scaleVec(col("x")).as("native"),
        transform(col("x"),
          x => round(x.cast(DoubleType) * lit(1e6)).cast(LongType))
          .as("composed")).collect().head
    assert(d2.getSeq[Any](0).toSeq === d2.getSeq[Any](1).toSeq)
  }

  test("property: L2RoundE12 ≡ a driver replay of the exact rounded-" +
      "term distance on random vectors (seeded); length mismatch " +
      "sums the shared prefix; null elements contribute no term") {
    import graft.functions.L2RoundE12
    val rnd = new scala.util.Random(29)
    def vec(n: Int): Array[Double] = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    def dist(x: Array[Double], m: Array[Double]): Long = {
      var s = 0L
      var i = 0
      val n = math.min(x.length, m.length)
      while (i < n) {
        val d = x(i) - m(i)
        s += graft.functions.ExactRound.halfUp(d * d * 1e12)
        i += 1
      }
      s
    }
    val expr = L2RoundE12(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true))
    (0 until 400).foreach { i =>
      val x = vec(12)
      val y = vec(12)
      val got = expr.eval(InternalRow(
        ArrayData.toArrayData(x), ArrayData.toArrayData(y)))
        .asInstanceOf[Long]
      assert(got === dist(x, y), s"vec $i")
    }
    // shared-prefix semantics (the oracle's per-position join emits
    // rows only for positions present on BOTH sides)
    val a = vec(12)
    val b = vec(8)
    val gotShort = expr.eval(InternalRow(
      ArrayData.toArrayData(a), ArrayData.toArrayData(b)))
      .asInstanceOf[Long]
    assert(gotShort === dist(a, b))
    // a null ELEMENT contributes no term (oracle: NULL product, SUM
    // skips); identical vectors are at distance 0
    val withNull: Array[Any] = Array(0.5, null, -0.25)
    val other = Array(0.5, 0.9, -0.25)
    val gotNull = expr.eval(InternalRow(
      ArrayData.toArrayData(withNull), ArrayData.toArrayData(other)))
      .asInstanceOf[Long]
    assert(gotNull === 0L)
    assert(expr.eval(InternalRow(
      ArrayData.toArrayData(a), ArrayData.toArrayData(a))) === 0L)
  }
}
