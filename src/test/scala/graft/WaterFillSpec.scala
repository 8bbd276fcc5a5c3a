package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Edge-case gates for the token-budget water-filling solver (budget =
  * ⌊total/2⌋): the allocation must hit the budget exactly when clipping
  * happens, keep small sources whole, clip large ones to a common level,
  * and degrade sanely at the extremes (single source; all sources equal).
  */
class WaterFillSpec extends SparkSpec {

  import spark.implicits._

  private def solve(rows: Seq[(String, Long)]) =
    Sampling.waterFill(rows.toDF("source", "n_tok"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap

  test("mixed sizes: small sources kept whole, total allotted == budget") {
    // total = 1000, budget = 500: a=50 and b=100 fit whole (feasible through
    // i=2: 150 + 100·2 = 350 ≤ 500), c and d clip to the common level
    // tau = (500-150)/2 = 175
    val out = solve(Seq(("a", 50L), ("b", 100L), ("c", 400L), ("d", 450L)))
    assert(out("a")._2 == 50.0 && out("a")._3 == 1.0)
    assert(out("b")._2 == 100.0 && out("b")._3 == 1.0)
    assert(out("c")._2 == 175.0 && out("d")._2 == 175.0)
    assert(math.abs(out.values.map(_._2).sum - 500.0) < 1e-6)
  }

  test("uniform sizes: every source clips to budget/m") {
    // total = 400, budget = 200, no source fits whole under the level test
    // (c_i + n_i(m-i) = 400 > 200 for every i) → j = 0, tau = 200/4 = 50
    val out = solve(Seq(("a", 100L), ("b", 100L), ("c", 100L), ("d", 100L)))
    out.values.foreach { case (_, allotted, rate) =>
      assert(allotted == 50.0 && rate == 0.5)
    }
  }

  test("single source: clipped to half itself") {
    val out = solve(Seq(("only", 999L)))
    assert(out("only")._2 == 499.0) // floor(999/2)
  }

  test("one dominant source absorbs the entire clip") {
    // total = 1010, budget = 505: the 10-token sources stay whole,
    // tau = (505 - 10) / 1 = 495 for the dominant one
    val out = solve(Seq(("tiny", 10L), ("huge", 1000L)))
    assert(out("tiny")._2 == 10.0 && out("tiny")._3 == 1.0)
    assert(out("huge")._2 == 495.0)
    assert(math.abs(out.values.map(_._2).sum - 505.0) < 1e-6)
  }

  test("property: allocation is feasible, budget-exact, and monotone in size") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sizes = Gen.chooseNum(1, 8).flatMap(m =>
      Gen.listOfN(m, Gen.chooseNum(1L, 10000L)))
    val prop = Prop.forAll(sizes) { ns =>
      val rows = ns.zipWithIndex.map { case (n, i) => (f"s$i%02d", n) }
      val out = solve(rows)
      val total = ns.sum
      val budget = total / 2 // floor, matches the solver
      val allotted = rows.map { case (k, _) => out(k)._2 }
      // never exceed the source, never negative
      val bounded = rows.forall { case (k, n) =>
        out(k)._2 >= 0.0 && out(k)._2 <= n + 1e-6 }
      // the allocation spends the budget exactly (1e-4 absorbs the 6-dp
      // rounding of up to 8 allotted values)
      val exact = math.abs(allotted.sum - budget) < 1e-4
      // monotone: a source at least as large never gets less
      val mono = rows.sortBy(_._2).map { case (k, _) => out(k)._2 }
        .sliding(2).forall { case Seq(a, b) => b >= a - 1e-6; case _ => true }
      bounded && exact && mono
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
