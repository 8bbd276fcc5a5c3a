package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: both sides bucketed by the join key →
  * the join needs NO shuffle at all. This is the pre-partitioning strategy for
  * repeatedly-joined 100 TB fact tables (bucket once, join many times free).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without an Exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a previously-failed run can leave an orphaned managed-table location
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("li_b", "ord_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) scala.reflect.io.Directory(dir).deleteRecursively()
    }

    Tables.lineitem(spark, sf())
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, sf())
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")

    // sf0.001 tables fit the broadcast threshold, which would bypass the
    // bucketed path entirely — force the shuffle-join planner
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not exchange; only the final tiny agg may
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || plan.contains("SortMergeJoin"), plan.take(1500))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"join should be co-located:\n${plan.take(2000)}")

    // and it returns the same result as the unbucketed join
    val expect = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.orderBy("o_orderpriority").collect().toSeq ==
      expect.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
