package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only plan experiments; never run by the driver. Round 16: A/B the
  * TPC-H Q5 join order — broadcast dim probed below vs above the fact-fact
  * exchange — on the same session, alternating, min-of-3 per shape.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tuneFor(spark, sfDir)

    def dim(s: SparkSession, d: String): DataFrame =
      Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))

    // shape A (current): dim probed below the fact-fact exchange
    def q5below(s: SparkSession, d: String): DataFrame = {
      val dm = dim(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
        .join(broadcast(dm), col("o_custkey") === dm("c_custkey"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey") && sup("s_nationkey") === dm("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }

    // shape B (pre-round-16): dims probed above it
    def q5above(s: SparkSession, d: String): DataFrame = {
      val dm = dim(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(dm), o("o_custkey") === dm("c_custkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey") && sup("s_nationkey") === dm("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }

    def time(fn: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    time(q5below(spark, sfDir).count()); time(q5above(spark, sfDir).count()) // warm
    val as = (1 to 3).map(_ => time(q5below(spark, sfDir).count()))
    val bs = (1 to 3).map(_ => time(q5above(spark, sfDir).count()))
    println(f"[scratch] q5 below-exchange min=${as.min}%.2fs samples=${as.map(x => f"$x%.2f").mkString(",")}")
    println(f"[scratch] q5 above-exchange min=${bs.min}%.2fs samples=${bs.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
