package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape pins for the TPC-H additions whose POINT is the plan: Q19's
  * disjunctive residual must not break the equi-join, and each side's OR
  * factor must reach its scan. Scans are inspected as nodes (the rendered
  * plan string truncates long filter lists mid-expression), with AQE off —
  * pushdown and join selection here are static decisions.
  */
class TpchPlanSpec extends SparkSpec {

  private def scansOf(name: String): (String, Seq[FileSourceScanExec]) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries(name)(spark, sf())
      val plan = df.queryExecution.executedPlan
      (plan.toString, plan.collect { case s: FileSourceScanExec => s })
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("Q19 keeps the hash equi-join under the disjunctive residual, with per-side pushdown") {
    val (plan, scans) = scansOf("q_tpch_q19")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast HASH join on l_partkey, plan:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "disjunctive residual degraded the equi-join")
    // each side's factor of the OR must be pushed INTO its parquet scan as a
    // data filter (not evaluated post-join)
    val filters = scans.map(_.dataFilters.mkString(";"))
    assert(filters.exists(f => f.contains("p_brand") && f.contains("OR")),
      s"part-side OR factor not pushed:\n${filters.mkString("\n---\n")}")
    assert(filters.exists(f => f.contains("l_quantity") && f.contains("OR")),
      s"lineitem-side OR factor not pushed:\n${filters.mkString("\n---\n")}")
  }

  test("Q12's date range reaches the lineitem scan; one aggregate pass, no second scan") {
    val (_, scans) = scansOf("q_tpch_q12")
    assert(scans.exists(_.dataFilters.mkString.contains("l_shipdate")),
      s"shipdate range not pushed:\n${scans.map(_.dataFilters.mkString(";")).mkString("\n")}")
    // conditional aggregation = ONE scan of lineitem + one of orders, not a
    // scan per CASE arm
    assert(scans.length == 2, s"expected exactly 2 scans, got ${scans.length}")
  }
}
