package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  *
  * `queries` maps every implemented operator to its Spark plan builder;
  * `oracleSql` carries the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01. Registration is assembled from the operator modules so
  * each module owns its query + oracle side by side.
  */
object SparkEntry {

  /** Pin semantics our oracles rely on, regardless of how the session was built
    * (Spark 4 defaults ANSI on; our arithmetic is overflow-safe by construction
    * but non-ANSI casting is part of the pinned contract).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by default;
    // read it as epoch-nanos BIGINT and convert explicitly where needed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the reprojection query is a ~50-layer nested projection chain (see
    // functions/Osgb.scala); the default 100 analyzer iterations are too few
    spark.conf.set("spark.sql.analyzer.maxIterations", "1000")
    // cached (persist-marked) plan fragments — the iterative graph/CC loops
    // lean on them for lazy lineage truncation — must still get AQE's
    // partition coalescing when materialized: the default pins a cached
    // plan's output partitioning to the static shuffle.partitions, which
    // turns every tiny per-round aggregate into a full-width task wave
    // (measured: q_sssp 965 tasks vs ~60 with the flag)
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // Text corpora compress 10-50× relative to their EXPLODED work (tokens,
    // shingles, bigrams), and Spark sizes splits by file bytes:
    // maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    // bytes/parallelism)). The 4 MB openCost default floors the split size,
    // so a 6 MB documents file scans as 2 tasks while its explode produces
    // millions of rows — the whole text family ran 2-way parallel on a
    // 32-core session (measured: the corpus-scan stage of q_lm_bigram was
    // 2 tasks × 2.5 s). 128 KB keeps split count tracking the available
    // parallelism for small-but-dense inputs; large fact files are
    // unaffected (their bytes/parallelism term already dominates), and the
    // extra task-launch cost on genuinely tiny files is microseconds.
    // (SPARK_GRAFT_OPENCOST is a dev A/B knob; the driver never sets it)
    spark.conf.set("spark.sql.files.openCostInBytes",
      sys.env.getOrElse("SPARK_GRAFT_OPENCOST", (128 * 1024).toString))
    // AQE's default coalescing is parallelism-first: it splits small
    // shuffles down to minPartitionSize to keep every core busy, which on
    // sub-second inputs just multiplies task-scheduling floor (measured
    // FloorKnobs A/B: ~25% off the sub-floor query family with pfirst=false,
    // trivial shuffle 280→223 ms). Size-first coalescing to the 64 MB
    // advisory is also the correct 100 TB posture — a wave of
    // advisory-sized tasks beats core-count-many slivers at any scale.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark
  }

  private val dirBytesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Input-stats tier of [[tune]]: size the AQE coalescing advisory to the
    * DATASET, not a constant. Size-first coalescing to a fixed 64 MB
    * advisory is right when shuffles dwarf the cluster (100 TB: thousands of
    * advisory-sized tasks per wave) but over-merges mid-size shuffles on a
    * small corpus — at sf1 a 40–150 MB exchange collapsed to 1–2 tasks and
    * ran one-core (measured round 16: q_assoc_rules 7.9→23.3 s,
    * q_tpch_q18 2.7→5.1 s from the constant advisory alone). The rule a
    * deployment's catalog stats would drive: target ~4 task waves over the
    * whole input (`totalBytes / (4·cores)`), floored at 1 MB so sub-floor
    * shuffles still coalesce to single tasks (the pfirst=false win stands),
    * capped at the 64 MB advisory, which any corpus ≥ `256 MB·cores`
    * saturates — so at scale this IS the constant-advisory posture.
    */
  def tuneFor(spark: SparkSession, dir: String): SparkSession = {
    tune(spark)
    // Resolve through the Hadoop FileSystem API so the rule works on any
    // storage the session can read (file:, hdfs:, s3a:, ...), not just the
    // local filesystem — a `java.io.File` walk returns 0 on remote URIs and
    // silently pinned the fallback advisory there (round-16 verdict item 2).
    // An unreachable/unknown URI still degrades to 0 bytes → advisory left at
    // the session default, the documented at-scale posture.
    val bytes = dirBytesMemo.computeIfAbsent(dir, d => {
      try {
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      } catch { case scala.util.control.NonFatal(_) => 0L }
    })
    if (bytes > 0L) {
      val cores = spark.sparkContext.defaultParallelism.toLong.max(1L)
      val advisory = (bytes / (4L * cores)).max(1L << 20).min(64L << 20)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        advisory.toString)
    }
    spark
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join: fact `orders` joined to broadcast dims — the 100 TB shape
    * (fact table is never shuffled for the join).
    */
  def entry(spark: SparkSession): DataFrame = {
    tune(spark)
    val d = "/root/testdata/sf0.001"
    val orders   = Tables.orders(spark, d)
    val customer = Tables.customer(spark, d)
    val nation   = Tables.nation(spark, d)
    val region   = Tables.region(spark, d)
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("revenue"))
      .orderBy("r_name", "n_name")
  }

  private def registry: Seq[Q] =
    operators.Relational.all ++ operators.Routes.all ++
      operators.TextAnalysis.all ++ operators.Dedup.all ++
      operators.Similarity.all ++ operators.Pq.all ++ operators.Multimodal.all ++
      operators.Analytics.all ++ operators.Tpch.all ++
      operators.Skew.all ++ operators.Aggregates.all ++
      operators.Sampling.all ++ operators.Behavior.all ++ operators.Graph.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> ((s: SparkSession, d: String) => q.fn(tuneFor(s, d), d))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables.
    */
  def oracleSql: Map[String, String] =
    registry.map(q => q.name -> q.oracle).toMap
}
