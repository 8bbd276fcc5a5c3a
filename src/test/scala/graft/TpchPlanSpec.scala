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

  test("Q6: every predicate pushed to the one lineitem scan; ReadSchema pruned to used columns") {
    val (_, scans) = scansOf("q_tpch_q6")
    assert(scans.length == 1, s"expected exactly 1 scan, got ${scans.length}")
    val f = scans.head.dataFilters.mkString(";")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(f.contains(c), s"$c not pushed to the scan: $f")
    // 4 columns referenced (2 filtered-only + 2 aggregated); nothing else read
    val read = scans.head.requiredSchema.fieldNames.toSet
    assert(read == Set("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"),
      s"scan reads more than the query needs: $read")
  }

  test("Q4's EXISTS runs as a LEFT SEMI join, never a per-row subquery") {
    val (plan, _) = scansOf("q_tpch_q4")
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), "quantifier degraded to a cartesian")
  }

  test("Q15 computes the per-supplier revenue aggregate once (localCheckpoint, one lineitem scan)") {
    // the revs relation feeds both the scalar max and the final join;
    // exchange reuse fails (join-key isnotnull de-canonicalizes the
    // branches), so revs must be materialized once — no lineitem scan may
    // appear in the final plan at all (both consumers read the checkpoint)
    val (_, scans) = scansOf("q_tpch_q15")
    val lineitemScans = scans.count(_.requiredSchema.fieldNames.contains("l_extendedprice"))
    assert(lineitemScans == 0,
      s"expected the revs checkpoint to absorb the lineitem scan, got $lineitemScans scans")
  }

  /** Q9/Q11/Q14 must NOT force a part-side broadcast: at 100 TB part is
    * fact-sized, and the posture decision is hint-free (AQE may still
    * convert at runtime when the filtered side measures small — that's the
    * point). Guard the analyzed plans against the hint creeping back in.
    */
  test("Q9/Q11/Q14 carry no broadcast hint on the part side") {
    for (name <- Seq("q_tpch_q9", "q_tpch_q11", "q_tpch_q14")) {
      val df = SparkEntry.queries(name)(spark, sf())
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.toString.contains("part.parquet") => h
      }
      assert(hinted.isEmpty, s"$name re-acquired a part-side broadcast hint")
    }
  }
}
