package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only plan experiments; never run by the driver. Round 16 (resumed
  * session): A/B q_assoc_rules' report-side shape — the full 200k-key item
  * aggregate + two broadcast joins (current) vs computing supports only for
  * the 40 keys the top-20 report needs (sequential two-phase with a 20-row
  * checkpoint). Same session, alternating, min-of-3 per shape.
  *
  * Earlier experiments this round (kept in git history): TPC-H Q5 broadcast
  * dim below vs above the fact-fact exchange — "below" only pays when the
  * fact side carries its own filter; Q5 reverted with the receipt.
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

    def baskets(s: SparkSession, d: String): DataFrame =
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .localCheckpoint()

    // shape A (current): full item aggregate, two broadcast joins
    def assocA(s: SparkSession, d: String): DataFrame = {
      val bk = baskets(s, d)
      val pairs = bk
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))")).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .repartition(col("u"), col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("n_uv"))
        .orderBy(col("n_uv").desc, col("u"), col("v"))
        .limit(20)
      val item = bk
        .select(explode(col("ps")).as("l_partkey"))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_i"))
      val nOrders = bk.agg(count(lit(1)).as("n_orders"))
      pairs
        .join(broadcast(item.select(col("l_partkey").as("u"), col("n_i").as("n_u"))), Seq("u"))
        .join(broadcast(item.select(col("l_partkey").as("v"), col("n_i").as("n_v"))), Seq("v"))
        .crossJoin(broadcast(nOrders))
        .select(col("u"), col("v"), col("n_uv"), col("n_u"), col("n_v"),
          round(col("n_uv").cast("double") / col("n_orders").cast("double"), 6).as("support"),
          round(col("n_uv").cast("double") / col("n_u").cast("double"), 6).as("confidence"),
          round((col("n_uv").cast("double") * col("n_orders").cast("double"))
            / (col("n_u").cast("double") * col("n_v").cast("double")), 6).as("lift"))
        .orderBy(col("n_uv").desc, col("u"), col("v"))
    }

    // shape B: top-20 first (20-row checkpoint), then supports for ONLY the
    // ≤40 referenced items — the item explode still scans the baskets but
    // its aggregate shuffles ~40 keys instead of 200k, and the two 200k-row
    // broadcast builds disappear (the 40-row support table broadcasts free)
    def assocB(s: SparkSession, d: String): DataFrame = {
      val bk = baskets(s, d)
      val pairs = bk
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))")).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .repartition(col("u"), col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("n_uv"))
        .orderBy(col("n_uv").desc, col("u"), col("v"))
        .limit(20)
        .localCheckpoint()
      val keys = pairs.select(explode(array(col("u"), col("v"))).as("l_partkey")).distinct()
      val item = bk
        .select(explode(col("ps")).as("l_partkey"))
        .join(broadcast(keys), Seq("l_partkey"))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_i"))
      val nOrders = bk.agg(count(lit(1)).as("n_orders"))
      pairs
        .join(broadcast(item.select(col("l_partkey").as("u"), col("n_i").as("n_u"))), Seq("u"))
        .join(broadcast(item.select(col("l_partkey").as("v"), col("n_i").as("n_v"))), Seq("v"))
        .crossJoin(broadcast(nOrders))
        .select(col("u"), col("v"), col("n_uv"), col("n_u"), col("n_v"),
          round(col("n_uv").cast("double") / col("n_orders").cast("double"), 6).as("support"),
          round(col("n_uv").cast("double") / col("n_u").cast("double"), 6).as("confidence"),
          round((col("n_uv").cast("double") * col("n_orders").cast("double"))
            / (col("n_u").cast("double") * col("n_v").cast("double")), 6).as("lift"))
        .orderBy(col("n_uv").desc, col("u"), col("v"))
    }

    def time(fn: => Unit): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    time(assocA(spark, sfDir).count()); time(assocB(spark, sfDir).count()) // warm
    val as = (1 to 3).map(_ => time(assocA(spark, sfDir).count()))
    val bs = (1 to 3).map(_ => time(assocB(spark, sfDir).count()))
    println(f"[scratch] assoc A full-item-agg min=${as.min}%.2fs samples=${as.map(x => f"$x%.2f").mkString(",")}")
    println(f"[scratch] assoc B filtered-supports min=${bs.min}%.2fs samples=${bs.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
