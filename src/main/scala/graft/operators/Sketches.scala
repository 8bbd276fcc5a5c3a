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
}
