package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Family-A tabular file sources with the reference's csv-tool
  * semantics (`tools/src/aden_tools/tools/csv_tool/csv_tool.py`).
  *
  *  - `read`: header-derived columns, offset/limit pagination, total
  *    row count alongside the page (`csv_tool.py:14-88`);
  *  - `write`/`append`: project to the declared column list only
  *    (`:133`, `:192`);
  *  - `info`: schema + row count without materializing data
  *    (`:214-271`).
  *
  * Pagination note: CSV has an inherent file order but Spark scans are
  * parallel; the deterministic page is defined by an explicit sort key
  * when given, else by file order reconstructed per-split — at 100 TB
  * you paginate on a key column (predicate pushdown), never by global
  * row offset, so `read` takes an optional `orderBy`.
  */
object CsvSource {

  final case class Page(rows: DataFrame, totalCount: Long,
      offset: Long, limit: Option[Long])

  def read(spark: SparkSession, path: String, offset: Long = 0,
      limit: Option[Long] = None,
      orderBy: Option[String] = None): Page = {
    val df = spark.read.option("header", "true").csv(path)
    val total = df.count()
    val page =
      if (offset == 0 && limit.isEmpty) df
      else {
        // explicit key when provided; else stable file order
        val keyed = orderBy match {
          case Some(k) =>
            // tie-break duplicates of the key on stable file position —
            // an unstable sort could overlap/drop rows at a page
            // boundary between two paginate() calls
            val w = Window.orderBy(col(k), input_file_name(),
              monotonically_increasing_id())
            df.withColumn("_rn", row_number().over(w))
          case None =>
            // fallback order = (file name, split position): Spark
            // packs splits into partitions by SIZE, so a bare
            // monotonically_increasing_id ranking would follow size
            // order, not file order. The single-task window is fine at
            // this operator's scale — the reference paginates small
            // CSVs; large data paginates on a key column (header note).
            val w = Window.orderBy(input_file_name(),
              monotonically_increasing_id())
            df.withColumn("_rn", row_number().over(w))
        }
        val upper = limit.map(offset + _).getOrElse(Long.MaxValue)
        keyed.filter(col("_rn") > offset && col("_rn") <= upper)
          .drop("_rn")
      }
    Page(page, total, offset, limit)
  }

  /** Write rows, projecting to the declared columns only
    * (`csv_tool.py:133`): undeclared input columns are dropped,
    * declared-but-missing raise (same as DictWriter). */
  def write(df: DataFrame, path: String, columns: Seq[String],
      append: Boolean = false): Unit = {
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing declared columns: $missing")
    df.select(columns.map(col): _*)
      .write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)
  }

  final case class Info(columns: Seq[(String, String)], rowCount: Long)

  /** Schema + row count (`csv_tool.py:214-271`); the count is a
    * column-pruned scan, not a materialization. */
  def info(spark: SparkSession, path: String): Info = {
    val df = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    Info(df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString),
      df.count())
  }

  /** Tolerant JSONL reader (`runtime_log_store.py:265-289`): corrupt
    * lines are dropped, not fatal. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mode", "DROPMALFORMED").json(path)

  /** Dual old/new layout union (`runtime_logs_tool.py:49-77`,
    * `runtime_log_store.py:190-231`): schemas may differ per layout;
    * missing columns null-fill. */
  def unionLayouts(dfs: Seq[DataFrame]): DataFrame =
    dfs.filter(_.columns.nonEmpty)
      .reduce(_.unionByName(_, allowMissingColumns = true))
}
