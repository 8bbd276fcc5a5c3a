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
    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val supplier = Tables.supplier(spark, sfDir)
    time("q21-current") {
      operators.Analytics.suppliersKeptWaiting(li, orders, supplier).count()
    }
    def q21v2(repart: Boolean): Unit = {
      val fOrders = orders.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val liSel = li.select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("r"))
      val lf0 = liSel.join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      val lf = if (repart) lf0.repartition(col("l_orderkey")) else lf0
      val perPair = lf.groupBy(col("l_orderkey").as("g_orderkey"), col("l_suppkey").as("g_suppkey"))
        .agg(max(col("r")).as("had_r"), sum(col("r").cast("long")).as("n_r"))
      val perOrder = perPair.groupBy(col("g_orderkey").as("o_key"))
        .agg(count(lit(1)).as("n_supp"), sum(col("had_r")).as("n_r_supp"))
        .filter(col("n_supp") > 1 && col("n_r_supp") === 1)
      val sup = supplier.select(col("s_suppkey"), col("s_name"))
      perPair.filter(col("had_r") === 1)
        .join(perOrder, col("g_orderkey") === col("o_key"))
        .join(broadcast(sup), col("g_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_r")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100).count()
    }
    time("q21-semi-norepart") { q21v2(false) }
    time("q21-semi-repart") { q21v2(true) }
    spark.stop()
  }
}
