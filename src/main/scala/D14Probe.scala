import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

object D14Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("8")
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        println(f"STAGE ${si.stageId}%3d tasks=${si.numTasks}%4d " +
          f"time=${ms / 1000.0}%8.1fs  in=${si.taskMetrics.inputMetrics.recordsRead}%12d " +
          f"shufR=${si.taskMetrics.shuffleReadMetrics.recordsRead}%12d " +
          f"shufW=${si.taskMetrics.shuffleWriteMetrics.recordsWritten}%12d  ${si.name.take(60)}")
      }
    })
    val t0 = System.nanoTime()
    val n = graft.queries.VectorSearch.d14.run(spark, "/tmp/heaps_100x")
      .write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
