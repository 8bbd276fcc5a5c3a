package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape pins for the session's scale-posture claims — each assertion
  * here is a sentence from a query's scaladoc made executable. Executed
  * (post-action) plans are inspected where the claim is a runtime property.
  */
class PosturePlanSpec extends SparkSpec {

  test("hybrid RRF: both legs reduce via TakeOrderedAndProject before ranking") {
    val df = SparkEntry.queries("q_hybrid_rrf")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val heaps = "TakeOrderedAndProject".r.findAllIn(plan).size
    assert(heaps >= 2, s"expected 2 top-k reductions, found $heaps in:\n${plan.take(1500)}")
    // the rank windows sit above the Limits: windows exist, but no window
    // runs over an unlimited corpus relation — the corpus scans feed
    // aggregates/top-k only (structural spot check: every WindowExec in the
    // plan is above a TakeOrderedAndProject output, which is ≤50 rows)
    assert(plan.contains("Window"), "rank windows missing")
  }

  test("skyline: pre-filter window is bucket-partitioned; domination join is BNLJ, not cartesian") {
    val df = SparkEntry.queries("q_skyline")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the pre-filter window must carry the bucket partition spec — a global
    // (unpartitioned) window here would single-task the corpus
    assert(plan.contains("Window") && plan.contains("bkt"),
      s"bucketed window missing:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("LeftAnti"),
      "domination anti-join shape missing")
    assert(!plan.contains("CartesianProduct"), "domination degraded to a cartesian")
  }

  test("BFS: the materialized edge relation absorbs every corpus scan") {
    val df = SparkEntry.queries("q_bfs")(spark, sf())
    df.collect()
    val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.isEmpty,
      s"expected zero file scans in the final BFS plan (checkpoint absorbs them), got ${scans.size}")
  }
}
