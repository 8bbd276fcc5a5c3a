package graft

import graft.operators.Relational

/** The sketch-based profile variant: swapping the exact multi-distinct for
  * HLL++ must remove the Expand from the plan entirely (the exact form's
  * one-scan trade fans every row out #distinct+1 times before the partial
  * aggregate), keep every non-distinct statistic identical, and land each
  * distinct estimate inside the sketch's error contract.
  */
class ProfileApproxSpec extends SparkSpec {

  private def rows(approx: Boolean) =
    Relational.profileTable(Tables.orders(spark, sf("sf0.01")),
      Relational.ordersProfileSpecs, approx = approx)

  test("approx profile plans with NO Expand; exact keeps its one-scan Expand") {
    val approxPlan = rows(approx = true).queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), s"sketch profile must not Expand:\n$approxPlan")
    // contrast pin: the exact form's documented trade really is the Expand
    val exactPlan = rows(approx = false).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact profile plan shape changed — revisit the approx variant's rationale")
  }

  test("approx profile: exact stats identical, distinct inside the 2% rsd contract") {
    val exact = rows(approx = false).collect().map(r => r.getString(0) -> r).toMap
    val approx = rows(approx = true).collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // n, non_null, min_v, max_v are not sketched — must match exactly
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2))
      assert(a.getString(4) == e.getString(4) && a.getString(5) == e.getString(5))
      // HLL++ at rsd=0.02: allow 5 sigma
      val (nd, est) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(est - nd) <= math.max(1.0, 0.10 * nd),
        s"$c: estimate $est too far from exact $nd")
    }
  }
}
