package graft
import org.apache.spark.sql.SparkSession

/** Local profiling aid (not part of the driver contract): runs each
  * query N times in one session and prints per-run times, separating
  * one-shot cost (Catalyst analysis + Janino codegen + AQE re-plan)
  * from steady-state data-path time. */
object BenchProfile {
  // Locale.ROOT: bench_guard.py parses these lines with a dot-decimal
  // regex; a comma-decimal JVM locale would make every time parse as 0
  // and the regression gate silently pass (same reason Bench.scala
  // formats its JSON with Locale.ROOT)
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val spark = Sessions.local(cpus, Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" ->
        sys.env.getOrElse("SPARK_GRAFT_PARFIRST", "false"),
      "spark.sql.adaptive.enabled" ->
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"),
      graft.operators.Pin.Key ->
        sys.env.getOrElse("SPARK_GRAFT_PIN", "localCheckpoint"),
      // spill/shuffle codec knob: lz4 (the Spark default) for parity
      // with every committed bench reference; zstd trades ~2x better
      // spill compression for some CPU — the production choice when
      // shuffle volume is the binding constraint, and the escape
      // hatch when a frontier tier's per-rep spill outgrows local
      // scratch (any run using it must say so in its regime note)
      "spark.io.compression.codec" ->
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4")))
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // optional: untimed pass over the whole suite at a (small) warm
    // dir first — measures how much of the per-query cost is
    // plan-shape-keyed cache (Janino codegen, parquet footers, JIT)
    sys.env.get("SPARK_GRAFT_WARM_DIR").foreach { wd =>
      val t0 = System.nanoTime()
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, wd).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      println(s"WARMPASS ${fmt((System.nanoTime() - t0) / 1e9)} s")
    }
    // SPARK_GRAFT_ISOLATE=true: drop all cache entries AFTER each
    // query so reps measure the query alone. Without it a long multi-
    // query profile accumulates every query's persist pins in one JVM
    // until storage memory saturates and later queries' reps inflate
    // from eviction/disk churn (observed at Heaps-100x with 29
    // queries: the s-family's rep 3 ran 2-4x rep 1). Isolation is the
    // honest per-query steady state for campaign tables; the default
    // (accumulate) matches a long-lived shared session and is what
    // the bench_guard references were recorded with.
    val isolate = sys.env.get("SPARK_GRAFT_ISOLATE").contains("true")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        val times = (1 to reps).map { i =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // ONE query's reps can ENOSPC the scratch disk before the
          // post-query cleanup below ever runs: every rep re-shuffles
          // (a fresh action = fresh shuffle IDs — nothing is reused
          // across reps), and a finished rep's files stay on disk
          // until its ShuffleDependency is GC'd. At the 1000x tier
          // d02's per-rep spill is tens of GB, so three reps
          // accumulate past the box's scratch space (observed r11:
          // the tier died at stage 89 of a d02 rep with the disk
          // full). Nudge the cleaner BETWEEN reps — after the clock
          // stops, so the pause is untimed; the persist pin is
          // registry-held and survives GC.
          if (isolate && i < reps) System.gc()
          dt
        }
        println(f"PROFILE $name%-28s ${times.map(fmt).mkString(" ")}")
        if (isolate) {
          // clearCache() only drops CacheManager (persist) entries;
          // under PIN=localCheckpoint the checkpointed-RDD blocks are
          // NOT catalog-tracked (ADVICE r10) — unpersist them through
          // the context's persistent-RDD registry so isolation frees
          // storage under every pin mode, not just the campaign's
          // persist regime.
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          // shuffle FILES are only deleted when the ContextCleaner
          // sees their ShuffleDependency get GC'd — a 29-query
          // campaign at the 1000x tier otherwise accumulates every
          // query's spill on disk until ENOSPC (observed r11: 56 GB
          // of blockmgr files killed the tier at d02). The pause
          // lands before the NEXT query's rep 1, which steady state
          // (min of reps 2+) already excludes.
          System.gc()
        }
      }
    }
    spark.stop()
  }
}
