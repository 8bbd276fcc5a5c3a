package graft

import graft.operators.Analytics

/** SCD2 history-build semantics on hand-built changelogs: run collapsing,
  * validity stitching, and the deterministic tiebreak. The oracle hash pins
  * parity with DuckDB's window stack on real data; this pins the boundaries.
  */
class Scd2Spec extends SparkSpec {

  private def build(rows: (Long, String, Long, Long)*) = {
    import spark.implicits._
    Analytics.scd2History(
      rows.toDF("user_id", "event_type", "tus", "event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
      .toSeq
  }

  test("re-delivered unchanged state collapses; every change opens a version") {
    // user 1: A A B A — the repeated A must NOT open a version, the return
    // to A after B MUST (SCD2 versions state changes, not state values)
    val got = build(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L))
    assert(got == Seq(
      (1L, 1L, "A", 10L, 30L, 2L),
      (1L, 2L, "B", 30L, 40L, 1L),
      (1L, 3L, "A", 40L, -1L, 1L)))
  }

  test("valid_to chains exactly: each version closes where the next opens, last is open") {
    val got = build((7L, "X", 100L, 1L), (7L, "Y", 200L, 2L), (7L, "Z", 300L, 3L))
    assert(got.map(_._4) == Seq(100L, 200L, 300L))
    assert(got.map(_._5) == Seq(200L, 300L, -1L))
    assert(got.last._3 == "Z")
  }

  test("equal timestamps order by event_id, so late-arriving ties are deterministic") {
    // two deliveries at tus=50: event_id 6 (B) then 5 (A) — the (tus, id)
    // key must order A before B regardless of input order
    val got = build((2L, "B", 50L, 6L), (2L, "A", 50L, 5L), (2L, "C", 60L, 7L))
    assert(got.map(_._3) == Seq("A", "B", "C"))
    assert(got.map(_._2) == Seq(1L, 2L, 3L))
  }

  test("one exchange total: windows and the run aggregate all reuse the user_id shuffle") {
    import spark.implicits._
    val log = (1 to 200).map(i =>
      (i.toLong % 7, if (i % 3 == 0) "A" else "B", i.toLong * 10, i.toLong))
      .toDF("user_id", "event_type", "tus", "event_id")
    val df = Analytics.scd2History(log)
    df.collect() // finalize AQE so the executed plan is the real one
    // the adaptive toString repeats the tree under "== Initial Plan =="; the
    // final plan is everything before that marker
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val windows = "Window \\[".r.findAllIn(plan).length
    // the final orderBy adds a rangepartitioning exchange; the data must be
    // hash-shuffled exactly once, with all three window stages (lag flag,
    // running sum, lead stitch) and the run aggregate on that single shuffle
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
    assert(windows == 3, s"expected 3 Window nodes, plan:\n$plan")
  }

  test("keys never mix: single-event users produce one open version each") {
    val got = build((1L, "A", 1L, 1L), (2L, "B", 1L, 2L), (3L, "A", 5L, 3L))
    assert(got == Seq(
      (1L, 1L, "A", 1L, -1L, 1L),
      (2L, 1L, "B", 1L, -1L, 1L),
      (3L, 1L, "A", 5L, -1L, 1L)))
  }
}
