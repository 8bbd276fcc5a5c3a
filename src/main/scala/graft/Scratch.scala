package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only plan experiments; never run by the driver. Round 16 (resumed
  * session): A/B q_assoc_rules' report-side shape — the full 200k-key item
  * aggregate + two broadcast joins (current) vs computing supports only for
  * the 40 keys the top-20 report needs (sequential two-phase with a 20-row
  * checkpoint). Same session, alternating (B,D,B,D,…), one warm run then
  * min-of-4 per shape.
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

    // shape D: no basket arrays at all — the oracle's own algebra. ONE hash
    // exchange of (ok, pk) + partition-local dedup, checkpointed STILL
    // PARTITIONED by ok; the pair generation is a zero-exchange
    // partition-local self-join (a.pk < b.pk), and supports/order-count ride
    // the same materialized relation. Replaces the collect_set basket build
    // (the FloorProbe-measured hot stage: ~128 CPU-s building+serializing
    // 1.5M sorted arrays) with a plain join.
    def assocD(s: SparkSession, d: String): DataFrame = {
      val pl = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .repartition(col("ok"))
        .dropDuplicates("ok", "pk")
        .localCheckpoint()
      val pairs = pl.as("a").join(pl.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
        .repartition(col("u"), col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("n_uv"))
        .orderBy(col("n_uv").desc, col("u"), col("v"))
        .limit(20)
        .localCheckpoint()
      val keys = pairs.select(explode(array(col("u"), col("v"))).as("pk")).distinct()
      val item = pl.join(broadcast(keys), Seq("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n_i"))
      val nOrders = pl.select(col("ok")).distinct().agg(count(lit(1)).as("n_orders"))
      pairs
        .join(broadcast(item.select(col("pk").as("u"), col("n_i").as("n_u"))), Seq("u"))
        .join(broadcast(item.select(col("pk").as("v"), col("n_i").as("n_v"))), Seq("v"))
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
    val _ = assocA(spark, sfDir) // keep shape A compiled/referenced for history
    time(assocB(spark, sfDir).count()); time(assocD(spark, sfDir).count()) // warm
    // ALTERNATE the samples (B,D,B,D,...) so a drifting host load penalizes
    // both shapes equally — sequential blocks mis-credited the first run of
    // this A/B when the window cooled mid-session.
    val pairs = (1 to 4).map(_ =>
      (time(assocB(spark, sfDir).count()), time(assocD(spark, sfDir).count())))
    val bs = pairs.map(_._1)
    val ds = pairs.map(_._2)
    println(f"[scratch] assoc B basket-arrays min=${bs.min}%.2fs samples=${bs.map(x => f"$x%.2f").mkString(",")}")
    println(f"[scratch] assoc D dedup-self-join min=${ds.min}%.2fs samples=${ds.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
