package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: splits a registered query's wall time into plan-build /
  * physical-planning / first-execution / re-execution of the same DataFrame,
  * to attribute bench seconds to driver-side compilation vs cluster work.
  * Usage: sbt 'Test/runMain graft.PlanProbe q_dedup_minhash [sfDir]'.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_minhash")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val parts = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$parts]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)
    if (sys.env.contains("SPARK_GRAFT_NOAQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60),
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L)))
      }
    })
    SparkEntry.queries(name)(spark, d).count() // full warm-up
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      var df: org.apache.spark.sql.DataFrame = null
      t(s"build$i") { df = SparkEntry.queries(name)(spark, d) }
      t(s"plan$i") { df.queryExecution.executedPlan }
      t(s"exec$i") { df.count() }
      spark.catalog.clearCache()
      stages.clear()
      t(s"reexec$i") { df.count() }
      val base = stages.map(_._3).minOption.getOrElse(0L)
      stages.sortBy(_._3).foreach { case (id, nm, s0, s1) =>
        println(f"PROBE   stage $id%3d +${s0 - base}%5d ms dur ${s1 - s0}%5d ms  $nm")
      }
    }
    spark.stop()
  }
}
