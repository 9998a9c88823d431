package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // match Verify's config
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: first touch of the parquet reader, shuffle
    // machinery, window exec, and the Janino codegen pipeline costs
    // seconds of JVM/JIT time that would otherwise be billed to
    // whichever query happens to run first.
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
      val o = Tables.load(spark, sfDir, "orders")
      val c = Tables.load(spark, sfDir, "customer")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(sum("o_totalprice").as("s"),
          countDistinct("o_custkey").as("d"))
        .withColumn("r", row_number().over(Window.orderBy("s")))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      System.gc() // isolate queries from each other's garbage
      val t0 = System.nanoTime()
      // noop sink: computes every output column (count() would let
      // Catalyst prune per-row work), writes nothing
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // a failing query must be VISIBLE, not a silently-fast entry
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // times at ms precision — keeps the detail line short enough that
    // the driver's output capture never truncates it mid-JSON
    def ms(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // compact suite-total line FIRST (always parseable even if the
    // driver's capture clips the long detail line), then the full
    // contract line with per-query times; both are one-line JSON
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}""")
    Console.out.flush()
    spark.stop()
  }
}
