package graft

import org.apache.spark.sql.SparkSession

/** ONE local-session builder + JSON escaper for the driver mains.
  *
  * The bench/verify config parity (UTC timezone, shuffle partitions,
  * size-first AQE coalescing) is load-bearing for the oracle compare —
  * it lived as three hand-synced copies across Bench/Verify/
  * BenchProfile, where adding a config to one main silently benches a
  * different engine than the one verified.
  */
object Sessions {

  def local(cpus: String,
      extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // size-first AQE coalescing (the production-recommended setting):
      // post-shuffle partitions merge to the advisory size instead of
      // fanning out to maximum parallelism — at 100 TB it is exactly
      // the config you'd run with (parallelism comes from data volume)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL (or a quoted path
    * in an env var) would otherwise make the driver's json.load fail
    * and silently zero the round. */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
