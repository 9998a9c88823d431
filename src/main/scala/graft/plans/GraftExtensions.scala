package graft.plans

import graft.functions.{CmsEstimate, Gram2PairHash60, Gram2Stats, LongArrayDot, Quant8Stats, RollingFp60, ScaleVec1e6, Shingle3Hash60, Sum128}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.BooleanType

/** SparkSessionExtensions entry point (SURVEY §4.2) registering the
  * engine's native expressions on the SQL surface, so
  * `SELECT graft_dot(a, b)` works from plain SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // new sessions
  * GraftExtensions.register(spark)          // an existing session
  * }}}
  *
  * Config alternative: `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.sum128Function)
    ext.injectFunction(GraftExtensions.shingleFunction)
    ext.injectFunction(GraftExtensions.gram2Function)
    ext.injectFunction(GraftExtensions.quant8Function)
    ext.injectFunction(GraftExtensions.gram2PairFunction)
    ext.injectFunction(GraftExtensions.scaleVecFunction)
    ext.injectFunction(GraftExtensions.rollingFpFunction)
    ext.injectFunction(GraftExtensions.cmsEstimateFunction)
  }
}

object GraftExtensions {

  private[plans] val dotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 arguments")
        LongArrayDot(args.head, args(1))
      })

  private[plans] val sum128Function
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_sum128"),
      new ExpressionInfo(classOf[Sum128].getName, "graft_sum128"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_sum128 takes exactly 1 argument")
        // return the bare AggregateFunction (the built-in pattern): the
        // analyzer wraps it itself, so DISTINCT / FILTER clauses work
        Sum128(args.head)
      })

  private[plans] val shingleFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_shingle60"),
      new ExpressionInfo(classOf[Shingle3Hash60].getName, "graft_shingle60"),
      (args: Seq[Expression]) => args match {
        case Seq(ws) => Shingle3Hash60(ws, distinct = false)
        // the dedup flag shapes the plan, so it must be a literal —
        // same restriction the built-ins place on e.g. format strings
        case Seq(ws, d @ Literal(_, BooleanType)) =>
          Shingle3Hash60(ws, d.value.asInstanceOf[Boolean])
        case _ => throw new IllegalArgumentException(
          "graft_shingle60(tokens array<string>[, distinct boolean literal])")
      })

  private[plans] val gram2Function
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_gram2_stats"),
      new ExpressionInfo(classOf[Gram2Stats].getName, "graft_gram2_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_gram2_stats takes exactly 1 argument")
        Gram2Stats(args.head)
      })

  private[plans] val quant8Function
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_quant8_stats"),
      new ExpressionInfo(classOf[Quant8Stats].getName, "graft_quant8_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_quant8_stats takes exactly 1 argument")
        Quant8Stats(args.head)
      })

  private[plans] val gram2PairFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_gram2pair60"),
      new ExpressionInfo(classOf[Gram2PairHash60].getName,
        "graft_gram2pair60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_gram2pair60 takes exactly 1 argument")
        Gram2PairHash60(args.head)
      })

  private[plans] val scaleVecFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_scale_vec"),
      new ExpressionInfo(classOf[ScaleVec1e6].getName, "graft_scale_vec"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_scale_vec takes exactly 1 argument")
        ScaleVec1e6(args.head)
      })

  private[plans] val rollingFpFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_rolling_fp60"),
      new ExpressionInfo(classOf[RollingFp60].getName,
        "graft_rolling_fp60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_rolling_fp60 takes exactly 1 argument")
        RollingFp60(args.head)
      })

  private[plans] val cmsEstimateFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName,
        "graft_cms_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_cms_estimate takes exactly 2 arguments")
        CmsEstimate(args.head, args(1))
      })

  /** Register the functions into an already-running session. */
  def register(spark: SparkSession): Unit =
    Seq(dotFunction, sum128Function, shingleFunction, gram2Function,
      quant8Function, gram2PairFunction, scaleVecFunction,
      rollingFpFunction, cmsEstimateFunction)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(id, info, builder)
      }
}
