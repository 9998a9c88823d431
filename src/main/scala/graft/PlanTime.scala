package graft

/** Profiling aid (not part of the driver contract): splits a query's
  * per-invocation cost into DataFrame construction + Catalyst
  * analysis/optimization/physical planning (driver-side,
  * single-threaded) vs execution (jobs). At MB-scale SFs the bench
  * floor is mostly the former two; this separates them so
  * optimization effort lands on the real component. Usage:
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PlanTime q1,q2" }}}
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        val rows = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)        // construction (may run jobs:
          val t1 = System.nanoTime()       //   collects/counts inside run)
          df.queryExecution.executedPlan   // analysis+optimize+planning
          val t2 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save() // execution
          val t3 = System.nanoTime()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        }
        def fmt(v: Double): String =
          String.format(java.util.Locale.ROOT, "%7.3f", Double.box(v))
        println(s"PLANTIME $name " + rows.map { case (a, b, c) =>
          s"[build=${fmt(a)} plan=${fmt(b)} exec=${fmt(c)}]"
        }.mkString(" "))
      }
    }
    spark.stop()
  }
}
