package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan experiments; never run by the driver. */
object Scratch {
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
    val qs = Seq("q_mad", "q_triangles", "q_kl_drift", "q_gini", "q_active_users",
      "q_tpch_q11", "q_degree_dist", "q_moving_avg", "q_histogram", "q_corr")
    def runAll(): Double = {
      var tot = 0.0
      qs.foreach { n =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        tot += (System.nanoTime() - t0) / 1e9
      }
      tot
    }
    runAll() // warm
    for (pass <- 1 to 4) {
      val t = runAll()
      println(f"[scratch] pass$pass openCost=${spark.conf.get("spark.sql.files.openCostInBytes")} total=${t}%.2fs")
    }
    spark.stop()
  }
}
