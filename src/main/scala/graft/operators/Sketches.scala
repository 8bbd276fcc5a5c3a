package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketches that replace exact distinct/quantile
  * at 100 TB, where `count_distinct` shuffles every distinct value and exact
  * percentiles sort whole partitions:
  *
  *  - HyperLogLog++ distinct counts (`approx_count_distinct`): fixed-size
  *    sketch per group, map-side combinable, relative error set by `rsd`;
  *  - approximate percentiles (`approx_percentile`): Greenwald-Khanna style
  *    mergeable summaries with a bounded rank error;
  *  - count-min sketch (`count_min_sketch`): mergeable frequency table for
  *    heavy-hitter estimation over unbounded key domains.
  *
  * No DuckDB oracle: the sketch algorithms (and therefore the estimates)
  * are engine-specific, so cross-engine hashes can never match. Verification
  * is the algebraic error bound instead — SketchesSpec checks every estimate
  * against the exact answer within the configured tolerance, which is the
  * contract a production pipeline relies on.
  */
object Sketches {

  /** Per-user-segment distinct event counts: exact vs HLL++ side by side. */
  def distinctEvents(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count_distinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Value percentiles: exact interpolated vs approximate with accuracy
    * parameter (rank error ≤ 1/accuracy).
    */
  def valuePercentiles(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(0.5)).as("exact_p50"),
        approx_percentile(col("value"), lit(0.5), lit(accuracy)).as("approx_p50"),
        percentile(col("value"), lit(0.95)).as("exact_p95"),
        approx_percentile(col("value"), lit(0.95), lit(accuracy)).as("approx_p95"))
      .orderBy("event_type")

  /** Count-min sketch over user_id, built distributed (map-side partial
    * sketches merged by the aggregate) and returned as the serialized sketch —
    * small index metadata, like IVF centroids, probed wherever needed via
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom`. Estimates never
    * undercount and overcount by at most eps·N with confidence `confidence`.
    */
  def userFrequencySketch(spark: SparkSession, dir: String,
                          eps: Double = 0.0001,
                          confidence: Double = 0.99): org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = graft.Tables.events(spark, dir)
      .agg(count_min_sketch(col("user_id"), lit(eps), lit(confidence), lit(42)).as("cms"))
      .head().getAs[Array[Byte]](0)
    org.apache.spark.util.sketch.CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** SKETCH ROLLUP — the re-aggregation pattern that makes sketches the
    * 100 TB answer to distinct-count CUBES: materialize one Datasketches
    * HLL sketch per (type, day) — a fixed-size binary column, stored like
    * any other — and answer every coarser grain (week here; month, quarter,
    * ad-hoc date ranges identically) by UNIONING the stored sketches
    * instead of rescanning the fact table. HLL union is lossless: the
    * register-wise max of the daily sketches is byte-for-byte the sketch of
    * the union, so the weekly estimate from stored daily sketches is
    * IDENTICAL to the estimate a full weekly rescan would produce
    * (SketchRollupSpec pins this equality exactly, plus the error bound vs
    * exact distinct). An exact-distinct cube cannot do this: distinct
    * counts do not add, so every grain needs its own scan.
    */
  def dailyUserSketches(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n_events"))

  /** Weekly distinct-user estimates derived ONLY from the stored daily
    * sketches (no fact-table access).
    */
  def weeklyFromDaily(daily: DataFrame): DataFrame =
    daily.withColumn("week", expr("day div 7"))
      .groupBy(col("event_type"), col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .orderBy("event_type", "week")

  /** The same weekly grain computed directly from the fact table — the
    * rescan the rollup makes unnecessary; used by the spec as the equality
    * witness.
    */
  def weeklyDirect(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("event_type"), expr("ts div 604800000000000").as("week"), col("user_id"))
      .groupBy(col("event_type"), col("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"))
      .orderBy("event_type", "week")

  /** RETURNING USERS by INCLUSION–EXCLUSION over stored sketches — the
    * question sketch stores are usually accused of not answering:
    * |active(w) ∩ active(w−1)| = |A| + |B| − |A ∪ B|, where all three terms
    * come from the SAME stored weekly sketches (the union term is one more
    * hll_union of them — still no fact rescan). The estimate inherits the
    * error of three estimates, so the spec's tolerance is wider than the
    * single-sketch bound — that trade, stated, is exactly what a metrics
    * pipeline signs up for when it serves retention from a sketch store.
    * Weekly grain is global here (not per type): one row per week pair.
    */
  def weeklyReturning(spark: SparkSession, dir: String): DataFrame = {
    val weekly = graft.Tables.events(spark, dir)
      .select(expr("ts div 604800000000000").as("week"), col("user_id"))
      .groupBy(col("week"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val prev = weekly.select((col("week") + 1).as("week"), col("sk").as("sk_prev"))
    weekly.join(prev, Seq("week"))
      .select(col("week"),
        (hll_sketch_estimate(col("sk")) + hll_sketch_estimate(col("sk_prev"))
          - hll_sketch_estimate(hll_union(col("sk"), col("sk_prev"))))
          .cast("double").as("approx_returning"))
      .orderBy("week")
  }
}
