package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named blob store for large intermediates (SURVEY §2.1; reference
  * `file_system_toolkits/data_tools/data_tools.py:24-355`:
  * save/load/append/list with pagination on load — the spillover
  * target for oversized tool results, `event_loop_node.py:95-96`).
  *
  * Blobs are line-oriented text under `root/<name>/`; load pagination
  * is the same deterministic offset/limit window the reference
  * documents (line order = file order, made explicit here with a
  * line-number sort key so it is stable across partitioned reads).
  */
object DataStore {

  def save(spark: SparkSession, root: String, name: String,
      lines: Seq[String]): Unit = {
    import spark.implicits._
    lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("line_no", "value")
      .coalesce(1)
      .write.mode("overwrite").json(s"$root/$name")
  }

  def append(spark: SparkSession, root: String, name: String,
      lines: Seq[String]): Unit = {
    import spark.implicits._
    val base = try {
      spark.read.json(s"$root/$name")
        .agg(max("line_no")).head().getLong(0) + 1
    } catch { case _: Exception => 0L }
    lines.zipWithIndex.map { case (l, i) => (base + i, l) }
      .toDF("line_no", "value")
      .coalesce(1)
      .write.mode("append").json(s"$root/$name")
  }

  /** Paginated load (`data_tools.py:68+`): offset/limit over the
    * stable line order, plus the total for the caller's paging UI. */
  def load(spark: SparkSession, root: String, name: String,
      offset: Long = 0, limit: Option[Int] = None): (DataFrame, Long) = {
    val df = spark.read.json(s"$root/$name")
    val total = df.count()
    val page = df.filter(col("line_no") >= offset).orderBy("line_no")
    (limit.fold(page)(page.limit), total)
  }

  /** Outcome of [[edit]] — the reference returns an error dict rather
    * than raising (`data_tools.py:313-355`); mirrored as a value. */
  final case class EditOutcome(success: Boolean, error: Option[String],
      sizeBytes: Long, replacements: Int)

  /** `edit_data` (`data_tools.py:313-355`): surgical find-replace over
    * a saved blob. `oldText` must match EXACTLY ONCE in the
    * line-joined document (whitespace and newlines included); zero or
    * multiple matches reject the edit with the reference's error
    * semantics. On success the blob is rewritten in place. */
  def edit(spark: SparkSession, root: String, name: String,
      oldText: String, newText: String): EditOutcome = {
    if (!exists(spark, s"$root/$name"))
      return EditOutcome(success = false,
        Some(s"File not found: $name"), 0L, 0)
    // one scan, already ordered — load() would pay an extra count()
    // job for a total this path discards
    val content = spark.read.json(s"$root/$name")
      .orderBy("line_no").collect()
      .map(_.getAs[String]("value")).mkString("\n")
    // occurrence count with overlap semantics identical to
    // str.count for non-overlapping scans
    def count(hay: String, needle: String): Int =
      if (needle.isEmpty) 0
      else Iterator.iterate(hay.indexOf(needle))(i =>
        hay.indexOf(needle, i + needle.length))
        .takeWhile(_ >= 0).size
    count(content, oldText) match {
      case 0 => EditOutcome(success = false,
        Some("old_text not found in the file. Make sure you're " +
          "matching the exact text, including whitespace and newlines."),
        0L, 0)
      case n if n > 1 => EditOutcome(success = false,
        Some(s"old_text found $n times — it must be unique. Include " +
          "more surrounding context to match exactly once."), 0L, 0)
      case _ =>
        val i = content.indexOf(oldText)
        val updated = content.substring(0, i) + newText +
          content.substring(i + oldText.length)
        save(spark, root, name, updated.split("\n", -1).toSeq)
        EditOutcome(success = true, None,
          updated.getBytes("UTF-8").length.toLong, 1)
    }
  }

  /** Existence through the Hadoop filesystem API, so the store works
    * against any configured scheme (hdfs://, s3a://, local) — a
    * java.io.File check silently answers for the driver's local disk
    * only. */
  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** `list_data_files`: names + line counts. */
  def list(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(rootPath)) Seq.empty[String]
      else fs.listStatus(rootPath).filter(_.isDirectory)
        .map(_.getPath.getName).toSeq
    val counts = dirs.map(n =>
      (n, spark.read.json(s"$root/$n").count()))
    counts.toDF("name", "n_lines")
  }
}
