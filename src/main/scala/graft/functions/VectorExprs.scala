package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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

object VectorExprs {

  /** Column wrapper: native integer dot product. */
  def dotIntNative(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column wrapper: native integer squared norm (dot with itself). */
  def normSqIntNative(sx: Column): Column = dotIntNative(sx, sx)
}
