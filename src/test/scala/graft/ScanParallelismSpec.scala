package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** VERDICT r10 ask #2 — scan parallelism on few-large-files layouts.
  *
  * The round-10 campaign's d02 tokenize read 207 s at Heaps-100x
  * because the whole 82 MB documents.parquet landed on ONE task. The
  * root cause is subtler than `maxPartitionBytes`: Spark's bin
  * packing already caps split size at max(openCost, bytes/
  * defaultParallelism), so the FILE was split — but parquet assigns a
  * row group to the split containing its midpoint, and pyarrow's
  * default row group is 1Mi rows, so the 500k-doc corpus was ONE row
  * group and every split but one carried zero rows. Two fixes, both
  * asserted here:
  *  - gen_scale.py / gen_sf1.py cap row_group_size (65536 rows) so
  *    single-file fixtures are splittable end to end;
  *  - Sessions.local pins `spark.sql.files.maxPartitionBytes` at 16m
  *    so split count does not collapse to defaultParallelism-sized
  *    chunks on wide-core boxes (finer splits -> better balance for
  *    CPU-bound tokenize scans).
  */
class ScanParallelismSpec extends SparkTestBase {

  private def writeFixture(path: String, blockSize: Long): Long = {
    // ~36 MB single parquet FILE: sha2 hex is incompressible enough
    // that on-disk size is real; uncompressed keeps it deterministic;
    // coalesce(1) makes it genuinely single-file like gen_scale.py.
    spark.range(200000L)
      .select(col("id"), concat_ws("", (1 to 3).map(i =>
        sha2(concat(col("id").cast("string"), lit(i)), 256)): _*)
        .as("text"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("compression", "uncompressed")
      .option("parquet.block.size", blockSize.toString)
      .parquet(path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, "fixture must be a single parquet file")
    files.head.length()
  }

  /** Partitions that actually carry rows — the number that bounds
    * wall-clock for a CPU-bound scan (FilePartition count alone
    * over-reports: empty byte-range splits finish instantly). */
  private def nonEmptyScanTasks(path: String): Long =
    spark.read.parquet(path)
      .select(spark_partition_id().as("p"))
      .distinct().count()

  test("single-row-group single file collapses to one task — the " +
      "documented failure mode the generators' row-group cap prevents") {
    val dir = Files.createTempDirectory("graft-scanpar-1rg").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/docs"
    writeFixture(path, blockSize = 1L << 30) // one giant row group
    assert(nonEmptyScanTasks(path) == 1L,
      "a 36 MB file with one row group must land on exactly one task " +
        "regardless of split config — if this starts passing >1, the " +
        "generators' row-group cap may no longer be load-bearing")
  }

  test("capped-row-group single file parallelizes to >= min(cores, " +
      "splits) under the Sessions.local 16m floor") {
    val dir = Files.createTempDirectory("graft-scanpar-rg").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/docs"
    val bytes = writeFixture(path, blockSize = 256 * 1024)
    assert(bytes > 2 * 16 * 1024 * 1024,
      s"fixture must span >2 splits at the 16m floor, got $bytes bytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    try {
      val cores = spark.sparkContext.defaultParallelism
      val splits = math.ceil(bytes / (16.0 * 1024 * 1024)).toInt
      val got = nonEmptyScanTasks(path)
      assert(got >= math.min(cores, splits),
        s"16m floor: got $got non-empty scan tasks, want >= " +
          s"min($cores cores, $splits splits)")
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("Sessions.local pins the 16m scan floor") {
    assert(Sessions.local("2")
      .conf.get("spark.sql.files.maxPartitionBytes") == "16m")
  }
}
