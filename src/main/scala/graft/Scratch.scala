package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only plan experiments; never run by the driver. Round 17: A/B
  * q_assoc_rules' pair-generation tier — the interpreted higher-order
  * transform/slice/flatten pair explode (current) vs the native
  * single-loop `graft_pairs` expression (shape E), and additionally the
  * basket build as codegen dedup + collect_list instead of collect_set
  * (shape F). Same session, alternating (B,E,F,B,E,F,…), one warm run then
  * min-of-4 per shape.
  *
  * Earlier experiments (kept in git history): r16 report-side shapes A/B/D
  * (full item aggregate vs keys-filtered vs dedup-self-join — D measured
  * equivalent to B and the basket convention stood); TPC-H Q5 broadcast dim
  * below vs above the fact-fact exchange — "below" only pays when the fact
  * side carries its own filter; Q5 reverted with the receipt.
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

    // report tier shared by every shape (the r16 keys-filtered form)
    def report(baskets: DataFrame, pairsRaw: DataFrame): DataFrame = {
      val pairs = pairsRaw
        .repartition(col("u"), col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("n_uv"))
        .orderBy(col("n_uv").desc, col("u"), col("v"))
        .limit(20)
        .localCheckpoint()
      val keys = pairs.select(explode(array(col("u"), col("v"))).as("l_partkey")).distinct()
      val item = baskets
        .select(explode(col("ps")).as("l_partkey"))
        .join(broadcast(keys), Seq("l_partkey"))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_i"))
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
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

    def basketsSet(s: SparkSession, d: String): DataFrame =
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .localCheckpoint()

    // shape B (current registered): collect_set baskets + interpreted
    // higher-order pair explode
    def assocB(s: SparkSession, d: String): DataFrame = {
      val bk = basketsSet(s, d)
      report(bk, bk.select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))")).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v")))
    }

    // shape E: same baskets, native graft_pairs explode
    def assocE(s: SparkSession, d: String): DataFrame = {
      val bk = basketsSet(s, d)
      report(bk, bk.select(explode(expr("graft_pairs(ps)")).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v")))
    }

    // shape F: basket build as codegen dedup + collect_list (no per-group
    // hash set), native graft_pairs explode
    def assocF(s: SparkSession, d: String): DataFrame = {
      val bk = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(col("l_orderkey"))
        .dropDuplicates("l_orderkey", "l_partkey")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
        .localCheckpoint()
      report(bk, bk.select(explode(expr("graft_pairs(ps)")).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v")))
    }

    def time(fn: => Unit): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    time(assocB(spark, sfDir).count()); time(assocE(spark, sfDir).count())
    time(assocF(spark, sfDir).count()) // warm
    // ALTERNATE the samples so a drifting host load penalizes every shape
    // equally (sequential blocks mis-credited a r16 A/B).
    val trips = (1 to 4).map(_ =>
      (time(assocB(spark, sfDir).count()), time(assocE(spark, sfDir).count()),
        time(assocF(spark, sfDir).count())))
    def fmt(xs: Seq[Double]) =
      f"min=${xs.min}%.2fs samples=${xs.map(x => f"$x%.2f").mkString(",")}"
    println(s"[scratch] assoc B hof-pairs        ${fmt(trips.map(_._1))}")
    println(s"[scratch] assoc E graft_pairs      ${fmt(trips.map(_._2))}")
    println(s"[scratch] assoc F dedup+list+pairs ${fmt(trips.map(_._3))}")
    spark.stop()
  }
}
