package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter SEMI-JOIN REDUCTION — the row-level counterpart to
  * DppSpec's partition pruning: when a selective dimension filters a join,
  * the optimizer can build a Bloom filter over the dim's join keys and
  * inject a `might_contain` probe into the FACT side's scan stage, so
  * non-matching fact rows die before the shuffle instead of after it. At
  * 100 TB this is the difference between shuffling the whole fact table and
  * shuffling the ~matching fraction. Spark gates the injection on creation
  * cost vs selectivity; this spec pins the conditions under which it fires
  * so the engine's posture is a tested fact, not a hope.
  */
class RuntimeBloomJoinSpec extends SparkSpec {

  test("a selective dim join injects a bloom probe on the fact side's pre-shuffle stage") {
    val dir = sf("sf0.01")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // force the shuffle-join path: broadcast joins bypass row-level runtime
    // filtering (the probe exists to save SHUFFLE volume)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // the injection is gated on the APPLICATION side being big enough to be
    // worth saving (default 10GB) — scale the gate to the sf0.01 fixture,
    // exactly like DppSpec scales its pruning conf; at real scale the
    // default threshold is the right guard
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    try {
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      val dim = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") === "Brand#1") // ~1/25 of parts
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") || optimized.contains("BloomFilter"),
        s"no bloom filter built on the dim side:\n${optimized.take(3000)}")
      assert(optimized.contains("might_contain"),
        s"no might_contain probe injected on the fact side:\n${optimized.take(3000)}")
      // and the result is still correct
      val n = joined.collect()
      assert(n.length == 1 && n(0).getLong(1) > 0)
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("broadcastable dims skip the bloom: the probe only pays for shuffle savings") {
    val dir = sf("sf0.01")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    try {
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      val dim = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") === "Brand#1")
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      // default thresholds let the small dim broadcast — no shuffle of the
      // fact for the join, so no bloom is worth building
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("might_contain"),
        "bloom probe injected where the join already broadcasts")
    } finally spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
  }
}
