package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

/** Native Catalyst expression for the integer dot product — the hot
  * inner loop of the similarity-search family (SURVEY §4.2c; the
  * custom-Expression tier of the builder contract: compose builtins →
  * custom Expression → custom plan).
  *
  * `Fns.dotInt` (`aggregate(zip_with(a, b, _*_), 0, _+_)`) is
  * correct but interpreted: higher-order functions are CodegenFallback,
  * so every element pays lambda-variable binding and boxing — measured
  * ~6× slower than this expression on the v01 2M-pair scan. Here
  * `doGenCode` emits a primitive `long` loop over the two `ArrayData`
  * (no boxing, no per-element virtual calls) inside whole-stage
  * codegen; `nullSafeEval` provides the identical interpreted path.
  *
  * Contract: both inputs are non-null-element BIGINT arrays of equal
  * length (the pre-scaled vectors of [[Fns.scaleVec]]); elements beyond
  * the shorter length are ignored.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Word-3-gram shingle hashes in one native pass per document.
  *
  * Replaces the interpreted chain `transform(sequence(...), concat_ws)`
  * → `explode` → `md5` → `substring` → `conv` that dominated the dedup
  * family's data path: higher-order functions are CodegenFallback (per
  * element lambda binding + boxing), `md5` goes through commons-codec
  * hex strings, and `conv` re-parses that hex. Here each document pays
  * one interpreted call (CodegenFallback at DOCUMENT granularity, ~400
  * grams per call) and the inner loop is tight Java: token bytes are
  * materialized once, each gram digests `w_i ' ' w_{i+1} ' ' w_{i+2}`
  * through a thread-local reused MessageDigest, and the value is the
  * first 15 hex nibbles of the md5 read directly from the digest bytes
  * (first 8 bytes as unsigned big-endian >>> 4) — bit-identical to
  * `('0x'||substr(md5(gram),1,15))::BIGINT` on the DuckDB side.
  *
  * `distinct = true` dedups hashes per document (the relational twin of
  * `list_distinct` over gram strings, applied post-hash on both engines
  * so any 60-bit collision collapses identically).
  */
case class Shingle3Hash60(child: Expression, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle3_hash60"

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val t = ws.getUTF8String(i)
      toks(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    val md = Shingle3Hash60.md5.get()
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      md.reset()
      md.update(toks(i)); md.update(' '.toByte)
      md.update(toks(i + 1)); md.update(' '.toByte)
      md.update(toks(i + 2))
      out(i) = Shingle3Hash60.top60(md.digest())
      i += 1
    }
    if (!distinct) new GenericArrayData(out)
    else {
      val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
      val kept = new Array[Long](out.length)
      var k = 0
      i = 0
      while (i < out.length) {
        if (seen.add(out(i))) { kept(k) = out(i); k += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(kept, k))
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object Shingle3Hash60 {
  private val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Shared thread-local digest for the hashing natives. */
  private[functions] def digest(): java.security.MessageDigest = md5.get()

  /** First 15 hex nibbles of an md5 digest as a 60-bit long — the
    * hash60 read, shared so the hashing natives can never drift. */
  private[functions] def top60(d: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v >>> 4
  }
}

/** Per-position (head, bigram) 60-bit hash pairs in one native pass
  * (t13's tokenize-once relation): for each adjacent token pair emit
  * struct(u = hash60(wᵢ), b = hash60(wᵢ ⌴ wᵢ₊₁)), so the bigram-LM
  * model tables key on 8-byte longs instead of strings — the pinned
  * scoring relation is 32 B/row at any vocabulary size, and a 60-bit
  * collision collapses identically in both engines (d02's contract).
  * Docs with <2 tokens emit an empty array. The md5 read is shared
  * with [[Shingle3Hash60]] (`digest`/`top60`) so the hashing natives
  * cannot drift; DuckDB twin: `Fns.hash60Sql` over `t[i]` and
  * `t[i] || ' ' || t[i+1]`. Interpreted like Shingle3Hash60
  * (CodegenFallback at DOCUMENT granularity — one call per row, the
  * inner loop is tight Java over materialized token bytes).
  */
case class Gram2PairHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("u", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_gram2pair60"

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val t = ws.getUTF8String(i)
      toks(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    val md = Shingle3Hash60.digest()
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      md.reset()
      md.update(toks(i))
      val u = Shingle3Hash60.top60(md.digest())
      md.reset()
      md.update(toks(i)); md.update(' '.toByte); md.update(toks(i + 1))
      val b = Shingle3Hash60.top60(md.digest())
      out(i) = new GenericInternalRow(Array[Any](u, b))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Word-2-gram repetition statistics in ONE native pass per document
  * (t07's inner loop): given the token array, returns
  * struct(n_grams, n_distinct, top, dup) where `top` is the count of
  * the most frequent 2-gram and `dup` the total occurrences of grams
  * appearing ≥2 times (Gopher §A1.1 shapes). Pairs containing a null
  * token are skipped — the same rows concat's null propagation drops
  * in the composed explode/concat path — so `n_grams` counts VALID
  * adjacent pairs, not `len - 1`.
  *
  * The composed alternatives both lose at scale: explode →
  * groupBy(doc, gram) → groupBy(doc) shuffles the corpus × gram-count
  * rows twice for a per-row statistic; an `aggregate` fold over
  * `array_sort` keeps it narrow but pays interpreted per-element
  * struct construction (HOFs are CodegenFallback). Here the gram
  * frequency map is one JVM HashMap per row — no Catalyst per-element
  * dispatch, no shuffle.
  */
case class Gram2Stats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  override def prettyName: String = "graft_gram2_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < 2)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))
    // count each adjacent token pair; UTF8String.toString is cheap
    // relative to a Catalyst per-element lambda dispatch. A pair with
    // a null token is SKIPPED entirely (not counted in n_grams) —
    // mirroring the composed explode/concat path, where concat's null
    // propagation makes the gram NULL and the count aggregations drop
    // it. Unreachable from t07 (split() never emits nulls) but
    // observable through the registered graft_gram2_stats SQL function
    // with hand-built arrays.
    val counts = new java.util.HashMap[String, Long]((n - 1) * 2)
    var nPairs = 0L
    var i = 0
    var prev: String = {
      val t = ws.getUTF8String(0)
      if (t == null) null else t.toString
    }
    while (i < n - 1) {
      val t = ws.getUTF8String(i + 1)
      val cur = if (t == null) null else t.toString
      if (prev != null && cur != null) {
        counts.merge(prev + " " + cur, 1L, (a, b) => a + b)
        nPairs += 1L
      }
      prev = cur
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c >= 2) dup += c
    }
    new GenericInternalRow(
      Array[Any](nPairs, counts.size().toLong, top, dup))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Int8 scalar-quantization report in ONE native pass per vector
  * (v05's inner loop): given the 1e6-scaled integer vector
  * ([[Fns.scaleVec]]), returns struct(scale, sq_err, n_zero, n_sat)
  * where scale = max|sx| (the symmetric range), sq_err = Σ round(e_i²)
  * of the scaled reconstruction errors, and n_zero/n_sat count q=0 /
  * |q|=127 codes. A zero vector reports scale=0 (callers filter it —
  * quantization is undefined there).
  *
  * Arithmetic reproduces the composed Column path EXACTLY (same
  * operation order, half-away-from-zero rounding like Spark's round()
  * and DuckDB's round()), so swapping it under v05 cannot move the
  * oracle hash. The composed path pays five interpreted HOF passes
  * per row (CodegenFallback) — measured ~13× DuckDB; this is one JVM
  * loop.
  */
case class Quant8Stats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", LongType, nullable = false),
    StructField("sq_err", LongType, nullable = false),
    StructField("n_zero", LongType, nullable = false),
    StructField("n_sat", LongType, nullable = false)))

  override def prettyName: String = "graft_quant8_stats"

  private def roundAway(x: Double): Long = ExactRound.halfUp(x)

  override protected def nullSafeEval(input: Any): Any = {
    val sx = input.asInstanceOf[ArrayData]
    val n = sx.numElements()
    var mx = 0L
    var i = 0
    while (i < n) {
      val v = math.abs(sx.getLong(i))
      if (v > mx) mx = v
      i += 1
    }
    if (mx == 0L)
      return new GenericInternalRow(Array[Any](0L, 0L, n.toLong, 0L))
    var sqErr = 0L
    var nZero = 0L
    var nSat = 0L
    i = 0
    while (i < n) {
      val s = sx.getLong(i)
      // identical op order to the Column path: (s·127.0)/mx, then
      // e = s − (q·mx)/127.0
      val q = roundAway(s.toDouble * 127.0 / mx)
      if (q == 0L) nZero += 1
      if (q == 127L || q == -127L) nSat += 1
      val e = s.toDouble - q.toDouble * mx.toDouble / 127.0
      sqErr += roundAway(e * e)
      i += 1
    }
    new GenericInternalRow(Array[Any](mx, sqErr, nZero, nSat))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** round() parity helper for the natives that reproduce composed
  * Column arithmetic (Spark HALF_UP on doubles ≡ DuckDB std::round,
  * both decided on the EXACT double value): Math.round would round
  * -63.5 up to -63, and floor(x+0.5) misrounds doubles one ulp below
  * a half boundary (0.49999999999999994 + 0.5 == 1.0 in IEEE → 1,
  * where both engines return 0). BigDecimal.valueOf preserves the
  * shortest decimal form of the exact double, so HALF_UP here equals
  * Spark's own Round expression bit-for-bit.
  *
  * Perf: BigDecimal.valueOf goes through Double.toString — ~1 µs per
  * call, and the PQ/k-means natives round millions of terms per pass
  * (measured ~0.8 s of v08's 1.1 s at sf0.1). The decision only ever
  * DIFFERS from pure-double floor/compare inside a band around the
  * half boundary narrower than the shortest-decimal error (≤ ulp/2),
  * so everything outside a 4·ulp guard band takes the primitive path
  * and only near-half values pay the BigDecimal; the results are
  * bit-identical (property-sweep spec over magnitudes, signs, and
  * ±k·ulp half-boundary neighborhoods). Correctness of the guard:
  * the fraction f = x − floor(x) is exact for |x| < 2^53, and for
  * |f − 0.5| > 4·ulp(x) the shortest decimal of x (error ≤ ulp/2)
  * lies strictly on the same side of the representable half boundary,
  * so the HALF_UP decision matches; at ulp ≥ 0.5 fractions are
  * exactly 0 or 0.5, both handled (integral fast path / slow path). */
private[graft] object ExactRound {
  def halfUp(x: Double): Long =
    if (x == math.floor(x)) x.toLong
    else if (x < 0) -halfUp(-x) // HALF_UP is away-from-zero symmetric
    else {
      val fl = math.floor(x)
      val f = x - fl
      val guard = math.max(1e-9, 4 * math.ulp(x))
      if (f >= 0.5 + guard) fl.toLong + 1L
      else if (f <= 0.5 - guard) fl.toLong
      else slow(x)
    }

  /** The reference semantics (kept verbatim): shortest-decimal
    * HALF_UP — also the property-spec's oracle for the fast path. */
  def slow(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
}

/** k-means assignment in ONE native pass per vector (v07's inner
  * loop): squared distance of the float embedding to each of k
  * LITERAL centroids as v02's rounded-term sum
  * Σ round((xᵢ−mᵢ)²·1e12) in BIGINT, returning the argmin cell id
  * (ties → smallest cell, the oracle's ORDER BY ds, cell).
  *
  * The composed path — k `aggregate(zip_with(...))` columns folded
  * through `array_min(array(struct(ds, cell)))` — is interpreted end
  * to end (HOFs are CodegenFallback) and measured ~1.2 s/rep on the
  * sf0.1 corpus; this is one JVM loop over k·d primitive doubles.
  * Null ELEMENTS are skipped (SUM semantics, matching the oracle's
  * per-position join where a null x contributes no term); a null
  * vector yields a null cell (the oracle never sees the vector —
  * callers filter).
  */
case class CentroidArgmin(child: Expression, cells: Seq[Int],
    centroids: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  require(cells.length == centroids.length,
    s"${cells.length} cell ids for ${centroids.length} centroids")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $t")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_centroid_argmin"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val cellArr: Array[Int] = cells.toArray
  @transient private lazy val cenArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var bestDs = Long.MaxValue
    var bestCell = Int.MaxValue
    var k = 0
    while (k < cenArr.length) {
      val m = cenArr(k)
      val n = math.min(x.numElements(), m.length)
      var s = 0L
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          val diff = xi - m(i)
          s += ExactRound.halfUp(diff * diff * 1e12)
        }
        i += 1
      }
      if (s < bestDs || (s == bestDs && cellArr(k) < bestCell)) {
        bestDs = s
        bestCell = cellArr(k)
      }
      k += 1
    }
    bestCell
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** The vector tier's 1e6 integer scaling — `transform(a, x ->
  * round(x*1e6)::bigint)` — as ONE native pass. The composed HOF is
  * interpreted (CodegenFallback) and its per-element `round` on
  * DOUBLE goes through BigDecimal.valueOf (a Double.toString per
  * element!): measured ~30-100 µs/row on 64-dim vectors, the
  * dominant cost of every scaled-vector cache build at the 100×
  * corpus. [[ExactRound.halfUp]] is the property-proven fast path
  * for exactly those BigDecimal HALF_UP semantics (and DuckDB's
  * round), so the hash contract is unchanged. Null elements map to
  * null elements, a null vector to null — transform's contract.
  */
case class ScaleVec1e6(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_scale_vec"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = x.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        val xd = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = ExactRound.halfUp(xd * 1e6)
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val xd = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          out(i) = ExactRound.halfUp(xd * 1e6)
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Exact rounded squared L2 distance between two vector COLUMNS —
  * Σ round((xᵢ−yᵢ)²·1e12) in BIGINT over the shared prefix, the same
  * per-term arithmetic as [[CentroidArgmin]] but with both sides as
  * runtime columns instead of literals. This is d14's member-seed
  * distance computed INSIDE the coarse-cell join (the round-9
  * replacement for the O(k·d) literal seed table HierArgmin baked
  * into the task binary — the seed table is now a distributed
  * relation and only the √k coarse centroids are driver state). A
  * term where either side is a null element contributes nothing (the
  * oracle's per-position join yields a NULL product there and SUM
  * skips it); a null vector on either side yields null (callers
  * filter). */
case class L2RoundE12(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double>, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_l2_round_e12"

  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
        val diff = xi - yi
        s += ExactRound.halfUp(diff * diff * 1e12)
      }
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** v08's product-quantization encoder in ONE native pass (FAISS `PQ`
  * shape, Jégou et al. 2011): the vector is split into `subDims`-wide
  * subvectors and each is assigned independently to its nearest
  * codebook entry — the entries being the matching slices of the k
  * driver-collected coarse centroids (v07's `cm` relation). Per
  * subspace the distance is [[CentroidArgmin]]'s exact arithmetic —
  * Σ round((xᵢ−mᵢ)²·1e12) in BIGINT over the slice, ties → smallest
  * code — and the reconstruction error is the SUM of the chosen
  * minima, so `sq_err` needs no second pass. Returns
  * struct(codes array<int>, sq_err bigint).
  *
  * The composed path would be M×k `aggregate(slice(...))` columns —
  * interpreted (HOFs are CodegenFallback) and re-slicing the vector
  * M·k times; this is one JVM loop over k·d primitive doubles. Null
  * ELEMENTS contribute no term (oracle parity: the per-position join
  * drops the row); a null vector yields null (callers filter).
  */
case class PqEncodeStats(child: Expression, subDims: Int,
    cells: Seq[Int], centroids: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  require(subDims > 0, s"subDims must be positive, got $subDims")
  require(cells.length == centroids.length,
    s"${cells.length} code ids for ${centroids.length} codebook rows")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false)),
    StructField("sq_err", LongType)))

  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val cellArr: Array[Int] = cells.toArray
  @transient private lazy val cenArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val nSubs = (n + subDims - 1) / subDims
    val codes = new Array[Int](nSubs)
    var total = 0L
    var sub = 0
    while (sub < nSubs) {
      val lo = sub * subDims
      val hi = math.min(n, lo + subDims)
      var bestDs = Long.MaxValue
      var bestCode = Int.MaxValue
      var k = 0
      while (k < cenArr.length) {
        val m = cenArr(k)
        var s = 0L
        var i = lo
        while (i < hi) {
          if (!x.isNullAt(i) && i < m.length) {
            val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
            val diff = xi - m(i)
            s += ExactRound.halfUp(diff * diff * 1e12)
          }
          i += 1
        }
        if (s < bestDs || (s == bestDs && cellArr(k) < bestCode)) {
          bestDs = s
          bestCode = cellArr(k)
        }
        k += 1
      }
      codes(sub) = bestCode
      total += bestDs
      sub += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), total))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** The ADC table-lookup scan (Jégou et al. 2011 §IV) in ONE native
  * pass per corpus vector: given the vector's PQ code word
  * ([[PqEncodeStats]] `codes`, array<int>) and the per-query lookup
  * tables as LITERALS (queries × (subspaces·codes) scaled squared
  * distances — driver state bounded by the query-set contract, the
  * same sync point the codebook already is), emit the per-query ADC
  * distance array: adc[q] = Σ_sub lut[q][sub·k + idx(code_sub)].
  * Integer sums of the oracle's own rounded per-(q, sub, code) terms,
  * in a fixed order — order-independent, bit-identical.
  *
  * This replaces the (sub, code) equi-join + re-aggregation shape:
  * the corpus relation is scanned ONCE and never joins — the fan-out
  * to queries exists only as the emitted array, consumed by
  * posexplode in the same stage. JOIN semantics are preserved
  * exactly: a (sub, code) pair with no LUT entry — a corpus vector
  * with more subspaces than the query's LUT covers, or a code id the
  * LUT never saw — contributes NOTHING to that query's sum (the
  * oracle's equi-join simply has no matching row), yielding the same
  * partial sum, never a null or a poisoned total.
  */
case class PqAdcLut(child: Expression, codeIds: Seq[Int],
    lut: Seq[Seq[Long]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int> codes, got $t")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_pq_adc"

  @transient private lazy val idx
      : java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    codeIds.zipWithIndex.foreach { case (c, i) =>
      m.put(Integer.valueOf(c), Integer.valueOf(i))
    }
    m
  }
  @transient private lazy val k = codeIds.length
  @transient private lazy val lutArr: Array[Array[Long]] =
    lut.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val nSubs = codes.numElements()
    val out = new Array[Any](lutArr.length)
    var q = 0
    while (q < lutArr.length) {
      val t = lutArr(q)
      var s = 0L
      var sub = 0
      while (sub < nSubs) {
        val ci = idx.get(codes.getInt(sub))
        if (ci != null) {
          val pos = sub * k + ci.intValue()
          if (pos < t.length) s += t(pos) // absent pair: join no-match
        }
        sub += 1
      }
      out(q) = s
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** t05's rolling document fingerprint in ONE native pass: the
  * order-sensitive Karp–Rabin fold h ← (h·31 + hash60(wᵢ) mod 1000003)
  * mod 1000003, seeded with the first token's hash. The composed path
  * (md5-per-token transform + HOF aggregate) is inherently interpreted
  * — an order-sensitive fold can't codegen — and pays per-element
  * Catalyst dispatch on top; here both the hashing and the fold run in
  * one JVM loop. Arithmetic is identical (60-bit md5 prefix, same
  * modulus), so the oracle hash cannot move. Returns null for an empty
  * token array (no tokens → no fingerprint).
  */
case class RollingFp60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_fp60"

  private val Mod = 1000003L

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n == 0) return null
    val md = Shingle3Hash60.digest()
    var h = 0L
    var i = 0
    while (i < n) {
      val t = ws.getUTF8String(i)
      // composed-path parity: md5(NULL) is NULL and the fold
      // propagates it — a null token nulls the whole fingerprint
      if (t == null) return null
      md.reset()
      md.update(t.getBytes)
      val hv = Shingle3Hash60.top60(md.digest()) % Mod
      h = if (i == 0) hv else (h * 31 + hv) % Mod
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Native Count–Min-Sketch probe (t16; the last closure UDF on a
  * query path, retired per VERDICT r9 wrong #1). The sketch child is
  * a serialized `org.apache.spark.util.sketch.CountMinSketch` — the
  * binary the built-in `count_min_sketch` aggregate emits; the item
  * child is the probed token. Deserialization is memoized per
  * distinct byte image (the per-source sketches arrive as
  * ≤|sources| distinct blobs through a broadcast join), so the
  * per-row cost is the O(depth) probe alone. `doGenCode` calls the
  * memoizing probe directly — no ScalaUDF, no interpreted hop; the
  * anchor spec asserts the executed plan carries no ScalaUDF.
  * Estimate semantics are exactly the previous closure's:
  * `CountMinSketch.estimateCount(token: String)`. */
case class CmsEstimate(sketch: Expression, item: Expression)
    extends BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = item

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType == BinaryType && item.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, string), got " +
        s"${sketch.dataType} / ${item.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_cms_estimate"

  // per-instance, per-JVM memo: key = full byte image (ByteBuffer
  // equality is a memcmp — exact, no hash-collision risk); bounded by
  // the number of DISTINCT sketches this operator ever sees, which is
  // the grouping cardinality of the sketch side (|sources|)
  @transient private lazy val memo = new java.util.concurrent.ConcurrentHashMap[
    java.nio.ByteBuffer, org.apache.spark.util.sketch.CountMinSketch]()

  def probe(bytes: Array[Byte],
      tok: org.apache.spark.unsafe.types.UTF8String): Long = {
    val key = java.nio.ByteBuffer.wrap(bytes)
    var s = memo.get(key)
    if (s == null) {
      s = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
      memo.putIfAbsent(key, s)
    }
    s.estimateCount(tok.toString)
  }

  override protected def nullSafeEval(b: Any, t: Any): Any =
    probe(b.asInstanceOf[Array[Byte]],
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this,
      classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev,
      (b, t) => s"${ev.value} = $ref.probe($b, $t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, item = newRight)
}

/** The per-source CMS probe (t16): like [[CentroidArgmin]], born from
  * a driver-collected parameter — here the |sources|-bounded sketch
  * map, shipped as a BROADCAST handle so the megabyte sketch binaries
  * never travel through row data at all (a (binary, string) probe
  * behind a broadcast join measured 2× t16's whole runtime in pure
  * per-row UnsafeRow copies of the sketch bytes — the binary column
  * was copied into every joined output row). Deserialization is
  * memoized per source per JVM; the probe itself is codegen'd — no
  * ScalaUDF (VERDICT r9 wrong #1). An unknown source yields null
  * (callers join on the sketch side's own grouping keys, so this is
  * defensive). */
case class CmsProbeBySource(source: Expression, item: Expression,
    sketches: org.apache.spark.broadcast.Broadcast[Map[String, Array[Byte]]])
    extends BinaryExpression {

  override def left: Expression = source
  override def right: Expression = item

  override def checkInputDataTypes(): TypeCheckResult =
    if (source.dataType == StringType && item.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"${source.dataType} / ${item.dataType}")

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_cms_probe"

  @transient private lazy val memo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.util.sketch.CountMinSketch]()

  def probe(src: org.apache.spark.unsafe.types.UTF8String,
      tok: org.apache.spark.unsafe.types.UTF8String): Any = {
    val key = src.toString
    var s = memo.get(key)
    if (s == null) {
      sketches.value.get(key) match {
        case Some(bytes) =>
          s = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
          memo.putIfAbsent(key, s)
        case None => return null
      }
    }
    java.lang.Long.valueOf(s.estimateCount(tok.toString))
  }

  override protected def nullSafeEval(src: Any, tok: Any): Any =
    probe(src.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      tok.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this,
      classOf[CmsProbeBySource].getName)
    nullSafeCodeGen(ctx, ev, (s, t) => s"""
      |Object r = $ref.probe($s, $t);
      |if (r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ((java.lang.Long) r).longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(source = newLeft, item = newRight)
}

object VectorExprs {

  /** Column wrapper: native integer dot product. */
  def dotIntNative(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column wrapper: native integer squared norm (dot with itself). */
  def normSqIntNative(sx: Column): Column = dotIntNative(sx, sx)

  /** Column wrapper: native word-3-gram shingle 60-bit md5 hashes. */
  def shingleHash60(ws: Column, distinct: Boolean): Column =
    GraftColumnBridge.column(Shingle3Hash60(
      GraftColumnBridge.expression(ws), distinct))

  /** Column wrapper: native (head, bigram) 60-bit hash pairs. */
  def gram2PairHash60(ws: Column): Column =
    GraftColumnBridge.column(Gram2PairHash60(
      GraftColumnBridge.expression(ws)))

  /** Column wrapper: native word-2-gram repetition statistics. */
  def gram2Stats(ws: Column): Column =
    GraftColumnBridge.column(Gram2Stats(
      GraftColumnBridge.expression(ws)))

  /** Column wrapper: native int8 scalar-quantization report. */
  def quant8Stats(sx: Column): Column =
    GraftColumnBridge.column(Quant8Stats(
      GraftColumnBridge.expression(sx)))

  /** Column wrapper: native k-means centroid argmin. Literal
    * centroid parameters, so (unlike the other natives) there is no
    * SQL-surface registration — the function is born from a collected
    * centroid table, not a column expression. */
  def centroidArgmin(x: Column, cells: Seq[Int],
      centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(CentroidArgmin(
      GraftColumnBridge.expression(x), cells, centroids))

  /** Column wrapper: native Count–Min-Sketch probe (serialized
    * sketch column × token column → estimate). */
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftColumnBridge.column(CmsEstimate(
      GraftColumnBridge.expression(sketch),
      GraftColumnBridge.expression(item)))

  /** Column wrapper: native per-source CMS probe over a broadcast
    * sketch map (t16's shape — the sketch bytes stay out of rows). */
  def cmsProbeBySource(source: Column, item: Column,
      sketches: org.apache.spark.broadcast.Broadcast[Map[String, Array[Byte]]])
      : Column =
    GraftColumnBridge.column(CmsProbeBySource(
      GraftColumnBridge.expression(source),
      GraftColumnBridge.expression(item), sketches))

  /** Column wrapper: native exact rounded pairwise L2 distance
    * between two vector columns (d14's in-join member distance). */
  def l2RoundE12(x: Column, y: Column): Column =
    GraftColumnBridge.column(L2RoundE12(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))

  /** Column wrapper: native ADC table-lookup scan over a PQ code
    * word. Like [[centroidArgmin]], the per-query LUTs are literals
    * born from driver state — no SQL-surface registration. */
  def pqAdcLut(codes: Column, codeIds: Seq[Int],
      lut: Seq[Seq[Long]]): Column =
    GraftColumnBridge.column(PqAdcLut(
      GraftColumnBridge.expression(codes), codeIds, lut))

  /** Column wrapper: native product-quantization encode. Like
    * [[centroidArgmin]], codebook parameters are literals born from a
    * collected centroid table — no SQL-surface registration. */
  def pqEncodeStats(x: Column, subDims: Int, cells: Seq[Int],
      centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(PqEncodeStats(
      GraftColumnBridge.expression(x), subDims, cells, centroids))

  /** Column wrapper: native rolling 60-bit document fingerprint. */
  def rollingFp60(ws: Column): Column =
    GraftColumnBridge.column(RollingFp60(
      GraftColumnBridge.expression(ws)))
}
