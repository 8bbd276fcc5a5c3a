package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Demonstrates (not just claims) AQE's runtime skew-join mitigation: a
  * shuffled sort-merge join with one pathological key is re-planned at
  * runtime so the hot partition is split across tasks. This is the automatic
  * half of the skew story; `Skew.saltedJoin` is the explicit half for keys
  * AQE can't split.
  *
  * Runs in its own session because skew detection needs thresholds below the
  * defaults at test scale, and broadcast joins must be off so a shuffle join
  * is planned at all.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    // isolated session over the shared context: skew detection needs
    // thresholds below the defaults at test scale (all runtime-settable)
    val s: SparkSession = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    // apply the skew split even where it would add exchanges downstream
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    locally {
      import s.implicits._
      // 200k rows on ONE key + a sprinkle of others: one reducer gets ~all bytes
      val big = s.range(0, 200000).select(
        when(col("id") % 20L === 0L, col("id") % 100L).otherwise(lit(7L)).as("k"),
        concat(lit("payload-payload-payload-"), col("id").cast("string")).as("payload"))
      val small = s.range(0, 100).select(col("id").as("k2"),
        concat(lit("dim-"), col("id").cast("string")).as("name"))
      val joined = big.join(small, col("k") === col("k2"))
      // execute THIS QueryExecution — adaptive re-planning only materializes
      // on the plan that actually ran (count() would spawn its own)
      val n = joined.collect().length
      assert(n == 200000, s"join must be lossless, got $n")

      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, "expected an adaptive plan")
      // query stages hold their plan as a member, not a child, so assert on
      // the rendered final plan rather than a tree collect
      val rendered = adaptive.get.executedPlan.toString
      assert(rendered.contains("SortMergeJoin"), s"expected a sort-merge join in:\n$rendered")
      assert(rendered.contains("skew=true") && rendered.contains("AQEShuffleRead skewed"),
        s"AQE did not mark the join skew-handled:\n$rendered")
    }
  }
}
