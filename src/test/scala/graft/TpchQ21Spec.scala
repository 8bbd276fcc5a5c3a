package graft

import graft.operators.Analytics

/** The Q21 quantifier-to-aggregate equivalence on a hand-built fixture where
  * every EXISTS/NOT EXISTS case is enumerated: the oracle hash pins parity
  * with DuckDB's decorrelator on real data; this pins the boundary cases.
  */
class TpchQ21Spec extends SparkSpec {

  private def li(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_suppkey", "l_returnflag")
  }

  test("each quantifier case resolves like the correlated form") {
    import spark.implicits._
    val lineitem = li(
      // o1 'F': s1 returned, s2 clean -> s1 waits (EXISTS other, NOT EXISTS other-returned)
      (1L, 1L, "R"), (1L, 2L, "N"),
      // o2 'F': BOTH suppliers returned -> nobody counted (NOT EXISTS fails)
      (2L, 1L, "R"), (2L, 2L, "R"),
      // o3 open status: excluded by the orders filter
      (3L, 1L, "R"), (3L, 2L, "N"),
      // o4 'F': single-supplier order -> excluded (EXISTS fails)
      (4L, 1L, "R"),
      // o5 'F': s2 returned TWICE, s3 clean -> s2 counted once per returned
      // LINE (row semantics of the correlated form), and the n_r_supp=1
      // test is on DISTINCT suppliers, not lines
      (5L, 2L, "R"), (5L, 2L, "R"), (5L, 3L, "N"))
    val orders = Seq((1L, "F"), (2L, "F"), (3L, "O"), (4L, "F"), (5L, "F"))
      .toDF("o_orderkey", "o_orderstatus")
    val supplier = Seq((1L, "Supplier#1"), (2L, "Supplier#2"), (3L, "Supplier#3"))
      .toDF("s_suppkey", "s_name")
    val got = Analytics.suppliersKeptWaiting(lineitem, orders, supplier)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("Supplier#2", 2L), ("Supplier#1", 1L)))
  }

  test("an all-clean or all-returned corpus yields no waiters") {
    import spark.implicits._
    val orders = Seq((1L, "F")).toDF("o_orderkey", "o_orderstatus")
    val supplier = Seq((1L, "S1"), (2L, "S2")).toDF("s_suppkey", "s_name")
    assert(Analytics.suppliersKeptWaiting(
      li((1L, 1L, "N"), (1L, 2L, "N")), orders, supplier).count() == 0)
    assert(Analytics.suppliersKeptWaiting(
      li((1L, 1L, "R"), (1L, 2L, "R")), orders, supplier).count() == 0)
  }
}
