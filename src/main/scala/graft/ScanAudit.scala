package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: flag queries whose EXECUTED plan scans the same fact
  * table more than once. Repeated scans are often legitimate (self-joins,
  * train/eval subsets, boundary models, cached signature relations) but
  * this list is where the scan-count defects hide — round 11's
  * q_assoc_rules (3 lineitem passes for relations the basket build already
  * held) and q_source_overlap (uncheckpointed two-shuffle shingle relation
  * computed twice) both surfaced here. Run:
  * `sbt "runMain graft.ScanAudit" | grep MULTI`, then judge each hit
  * against the legitimate-pattern list above before touching it.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)
    val facts = Seq("lineitem", "events", "documents", "embeddings", "orders")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.count() // force AQE finalization so reused exchanges are visible
        val plan = df.queryExecution.executedPlan.toString
        val counts = facts.map(f => f -> s"/$f.parquet".r.findAllIn(plan).length)
          .filter(_._2 > 1)
        if (counts.nonEmpty)
          println(s"MULTI $name ${counts.map { case (f, c) => s"$f=$c" }.mkString(",")}")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      } catch { case e: Throwable => println(s"ERR $name ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
