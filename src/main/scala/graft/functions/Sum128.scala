package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Exact 128-bit integer sum of a LongType column.
  *
  * The engine's money pipeline keeps values as integer cents
  * (`Relational.cents`), so exact aggregation needs an integer sum
  * that cannot overflow at 100 TB. `sum(CAST(x AS DECIMAL(18,0)))`
  * delivers that but its >18-precision accumulator stores a boxed
  * BigDecimal byte array per group — measured ~2.5× slower than a
  * long sum on a 600 k-row aggregate. DuckDB's answer is HUGEINT
  * (int128) accumulation; this is the same answer as a Catalyst
  * `DeclarativeAggregate`: the accumulator is two compact LongType
  * buffer slots (128-bit two's complement), every update/merge is
  * wrapping 64-bit arithmetic with the classic carry-out trick
  * `((a & b) | ((a | b) & ~s)) >>> 63` — all primitive ops inside
  * whole-stage codegen, no allocation per row. The final value
  * materializes as DECIMAL(38,0) once per group.
  *
  * Wrapping adds are constructed with `EvalMode.LEGACY` explicitly so
  * ANSI mode cannot turn an intended 64-bit wrap into an overflow
  * error — correctness of the 128-bit result depends on lo-word wrap.
  */
case class Sum128(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sum128 requires BIGINT input, got ${child.dataType.sql}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val nonEmpty =
    AttributeReference("nonEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, nonEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  private def wAdd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Carry-out of the unsigned 64-bit add a + b = s. */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val v = Coalesce(Seq(child, Literal(0L)))
    val newLo = wAdd(lo, v)
    // hi += sign-extension of v (0 or -1) + carry-out of the lo add
    val newHi = wAdd(wAdd(hi, ShiftRight(v, Literal(63))), carry(lo, v, newLo))
    Seq(newHi, newLo, Or(nonEmpty, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = wAdd(lo.left, lo.right)
    val newHi = wAdd(wAdd(hi.left, hi.right),
      carry(lo.left, lo.right, newLo))
    Seq(newHi, newLo, Or(nonEmpty.left, nonEmpty.right))
  }

  override lazy val evaluateExpression: Expression = {
    val dec = DecimalType(38, 0)
    // value fits in one signed long iff hi is pure sign extension
    val fits = EqualTo(hi, ShiftRight(lo, Literal(63)))
    val two64 = Literal(Decimal(BigDecimal("18446744073709551616")), dec)
    val two63 = Literal(Decimal(BigDecimal("9223372036854775808")), dec)
    val big = Add(
      Add(Multiply(Cast(hi, dec), two64),
        Multiply(Cast(ShiftRightUnsigned(lo, Literal(63)), dec), two63)),
      Cast(BitwiseAnd(lo, Literal(Long.MaxValue)), dec))
    If(Not(nonEmpty), Literal(null, dec),
      If(fits, Cast(lo, dec), big))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sum128 =
    copy(child = newChildren.head)

  override def prettyName: String = "sum128"
}

object Sum128 {
  /** Column wrapper: exact integer sum as DECIMAL(38,0). */
  def sum128(c: Column): Column =
    GraftColumnBridge.column(
      Sum128(GraftColumnBridge.expression(c)).toAggregateExpression())
}
