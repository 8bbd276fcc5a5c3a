package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the local-mode per-query floor: splits a registered query's
  * warm time into (plan construction incl. table resolution) / (analysis +
  * optimization + physical planning) / (execution). Run:
  *
  *   sbt "runMain graft.FloorProbe q_anomaly_zscore q_cube ..."
  *
  * The driver never runs this; it informs where the sub-second-query floor
  * lives (see BASELINE.md bench-floor notes).
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tune(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val verbose = sys.env.contains("SPARK_GRAFT_FLOOR_JOBS")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); jobStart.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(j.jobId)
        if (verbose && t0 != 0L) {
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 30) println(f"[floor]   job ${j.jobId} ${ms}%.0fms")
        }
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        if (verbose && s.stageInfo.taskMetrics != null) {
          val si = s.stageInfo
          val rt = si.taskMetrics.executorRunTime
          if (rt > 30) println(f"[floor]   stage ${si.stageId} '${si.name.take(60)}' tasks=${si.numTasks} execRunMs=$rt")
        }
      }
    })
    // raw scheduler floor: an empty RDD job and a trivial SQL shuffle job
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      spark.sparkContext.parallelize(1 to 32, 32).count()
      val rddMs = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 10)).count().count()
      val sqlMs = (System.nanoTime() - t0) / 1e6
      println(f"[floor] nulljob pass$i rdd32=${rddMs}%.0fms sqlshuffle=${sqlMs}%.0fms")
    }
    if (args.contains("bfsbuild")) {
      import org.apache.spark.sql.functions._
      for (i <- 1 to 3) {
        var t0 = System.nanoTime()
        val e0 = graft.operators.Graph.copurchaseEdges(spark, sfDir)
        val tRead = (System.nanoTime() - t0) / 1e6
        t0 = System.nanoTime()
        val cnt = e0.count()
        val tCount = (System.nanoTime() - t0) / 1e6
        t0 = System.nanoTime()
        val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
          .repartition(col("u"))
          .localCheckpoint()
        val tCkpt = (System.nanoTime() - t0) / 1e6
        t0 = System.nanoTime()
        SparkEntry.queries("q_bfs")(spark, sfDir).count()
        val tQ = (System.nanoTime() - t0) / 1e6
        println(f"[floor] bfsbuild pass$i read=${tRead}%.0fms count($cnt)=${tCount}%.0fms sym+repart+ckpt=${tCkpt}%.0fms q_bfs_full=${tQ}%.0fms")
        e.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = false); ()
          case _ => ()
        }
      }
      spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("q_anomaly_zscore")
    for (n <- names) {
      // one cold pass to warm codegen/JIT
      SparkEntry.queries(n)(spark, sfDir).count()
      for (i <- 1 to 3) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        val plan = df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        jobs.set(0); stages.set(0); tasks.set(0)
        df.count()
        val t3 = System.nanoTime()
        Thread.sleep(50) // let listener events drain
        println(f"[floor] $n pass$i construct=${(t1 - t0) / 1e3}%.0fus " +
          f"plan=${(t2 - t1) / 1e3}%.0fus exec=${(t3 - t2) / 1e3}%.0fus " +
          f"total=${(t3 - t0) / 1e6}%.0fms jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      }
    }
    spark.stop()
  }
}
