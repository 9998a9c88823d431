package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Streaming column profiler — q26's data-quality pass applied at the
  * ingest boundary (Deequ's "incremental metrics" shape): per column,
  * running row/null counts, min/max, and the DECIMAL-exact mean,
  * updated per microbatch with O(columns) state.
  *
  * Only MERGEABLE statistics stream: count, null count, min/max and
  * an exact 6-decimal sum fold associatively, so the running value
  * after N microbatches equals the batch q26 answer on the union of
  * those batches — the batch-fold ≡ streaming-twin contract
  * (SharedState / IngestDedup precedent), asserted by spec. Exact
  * COUNT(DISTINCT) is deliberately absent: its state is
  * value-cardinality-bounded, not column-bounded — the streaming
  * answer to distinct counting is e14's HLL sketch, not this state.
  *
  * The mean accumulates each value's HALF_UP 6-decimal rounding
  * (exactly Spark's double→DECIMAL(38,6) cast and DuckDB's) as
  * scale-6 unscaled units in a Long — exact while |Σ| < 9.2e12
  * (longValueExact throws past it rather than wrapping) — and
  * divides in double at read time, bit-identical to q26's
  * `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / n`.
  *
  * Fields use nullable boxed types, not Option: Option-typed product
  * fields fail the state encoder's generated code.
  */
object ProfileStream {

  /** One profiled value: exactly one of numV/strV is non-null when
    * the source cell is non-null. */
  case class ColEntry(colName: String, numV: java.lang.Double,
      strV: String)

  /** The running per-column report row (null = no value seen yet /
    * wrong type for the column). */
  case class ColStats(colName: String, nRows: Long, nNull: Long,
      minNum: java.lang.Double, maxNum: java.lang.Double,
      meanNum: java.lang.Double, minStr: String, maxStr: String)

  case class St(nRows: Long, nNull: Long, nNum: Long,
      mn: Double, mx: Double, sumScaled6: Long,
      mnS: String, mxS: String)

  /** Explode a frame (streaming or batch) into [[ColEntry]] rows —
    * the same reshape q26's oracle states per column. */
  def entries(df: DataFrame, numCols: Seq[String],
      strCols: Seq[String]): Dataset[ColEntry] = {
    val spark = df.sparkSession
    import spark.implicits._
    val es =
      numCols.map(c => struct(lit(c).as("colName"),
        col(c).cast(DoubleType).as("numV"),
        lit(null).cast(StringType).as("strV"))) ++
      strCols.map(c => struct(lit(c).as("colName"),
        lit(null).cast(DoubleType).as("numV"),
        col(c).as("strV")))
    df.select(explode(array(es: _*)).as("e"))
      .select(col("e.colName"), col("e.numV"), col("e.strV"))
      .as[ColEntry]
  }

  /** q26's HALF_UP 6-decimal quantization, as scale-6 unscaled units
    * (BigDecimal.valueOf(x).setScale(6) — NOT round(x·1e6), whose
    * pre-rounding double multiply can land on a different ulp). */
  private def dec6Units(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def fold(s: St, e: ColEntry): St =
    if (e.numV != null) {
      val x = e.numV.doubleValue()
      St(s.nRows + 1, s.nNull, s.nNum + 1,
        if (s.nNum == 0) x else math.min(s.mn, x),
        if (s.nNum == 0) x else math.max(s.mx, x),
        math.addExact(s.sumScaled6, dec6Units(x)), s.mnS, s.mxS)
    } else if (e.strV != null) {
      val v = e.strV
      s.copy(nRows = s.nRows + 1,
        mnS = if (s.mnS == null || v < s.mnS) v else s.mnS,
        mxS = if (s.mxS == null || v > s.mxS) v else s.mxS)
    } else s.copy(nRows = s.nRows + 1, nNull = s.nNull + 1)

  private def report(key: String, s: St): ColStats = {
    val mean: java.lang.Double =
      if (s.nNum == 0) null
      else java.math.BigDecimal.valueOf(s.sumScaled6, 6)
        .doubleValue() / s.nNum
    ColStats(key, s.nRows, s.nNull,
      if (s.nNum == 0) null else java.lang.Double.valueOf(s.mn),
      if (s.nNum == 0) null else java.lang.Double.valueOf(s.mx),
      mean, s.mnS, s.mxS)
  }

  /** Running stats per column, one updated row per column per
    * microbatch. State is O(1) per column regardless of row volume —
    * the property that lets this ride next to IngestDedup on the same
    * intake stream at any scale. */
  def profile(es: Dataset[ColEntry])(
      implicit spark: SparkSession): Dataset[ColStats] = {
    import spark.implicits._
    val zero = St(0L, 0L, 0L, 0.0, 0.0, 0L, null, null)
    es.groupByKey(_.colName)
      .mapGroupsWithState[St, ColStats](GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[St]) =>
          val s = it.foldLeft(state.getOption.getOrElse(zero))(fold)
          state.update(s)
          report(key, s)
      }
  }
}
