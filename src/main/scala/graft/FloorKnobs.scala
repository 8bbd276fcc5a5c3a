package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B harness for the local-mode per-query floor knobs (round-16
  * verdict item: "try pre-resolved plan reuse and AQE-off for sub-threshold
  * inputs"). Measures a trivial-but-real shuffle query and a couple of
  * registered sub-floor queries under AQE on/off × shuffle-partition counts.
  * The driver never runs this.
  */
object FloorKnobs {
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
    val names = Seq("q_redact", "q_full_outer", "q_mad", "q_histogram", "q_moving_avg", "q_bfs", "q_pagerank")
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6 }
    def sqlshuffle(): Unit =
      spark.range(1000).groupBy(col("id") % 10).count().count()
    // warm codegen for all shapes first
    sqlshuffle(); names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    for {
      (aqe, parts, pfirst, minSize) <- Seq(
        ("true", "32", "true", "1MB"),   // stock default
        ("true", "32", "false", "1MB"),  // size-first to 64MB advisory
        ("true", "32", "true", "4MB"),   // parallelism-first, bigger floor
        ("true", "32", "true", "8MB"))
    } {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", pfirst)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", minSize)
      // best-of-3 per config, queries re-CONSTRUCTED each pass (real protocol)
      val trivial = (1 to 3).map(_ => time(sqlshuffle())).min
      val qs = names.map { n =>
        val t = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          time(SparkEntry.queries(n)(spark, sfDir).count())
        }.min
        f"$n=${t}%.0f"
      }
      println(f"[knobs] aqe=$aqe parts=$parts pfirst=$pfirst min=$minSize trivial=${trivial}%.0fms " + qs.mkString(" "))
    }
    spark.stop()
  }
}
