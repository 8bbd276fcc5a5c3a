package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    def time(label: String)(fn: => Unit): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn
        println(f"[scratch] $label pass$i ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }
    val docs = Tables.documents(spark, sfDir)
    time("novelty-current") {
      operators.Dedup.ngramNoveltyReport(docs).count()
    }
    time("novelty-shingles-only") {
      functions.TextFns.shingles(docs, 3).localCheckpoint().count()
    }
    def noveltyV2(): Unit = {
      val sh = functions.TextFns.shingles(docs, 3)
        .repartition(col("sh")).localCheckpoint()
      val first = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
      sh.join(first, Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
        .select(col("doc_id"), col("n_shingles"), col("n_seen"),
          round(lit(1.0) - col("n_seen").cast("double") / col("n_shingles"), 6).as("novelty"))
        .orderBy("doc_id").count()
    }
    time("novelty-repart-sh") { noveltyV2() }
    def noveltyV3(): Unit = {
      val sh = docs
        .select(col("doc_id"),
          explode(expr("graft_shingle_hashes(split(text, ' '), 3)")).as("h"))
        .repartition(col("h")).localCheckpoint()
      val first = sh.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      sh.join(first, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
        .select(col("doc_id"), col("n_shingles"), col("n_seen"),
          round(lit(1.0) - col("n_seen").cast("double") / col("n_shingles"), 6).as("novelty"))
        .orderBy("doc_id").count()
    }
    time("novelty-hashgrain") { noveltyV3() }
    spark.stop()
  }
}
