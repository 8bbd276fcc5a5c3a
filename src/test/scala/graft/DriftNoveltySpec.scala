package graft

import graft.operators.{Behavior, Dedup}

/** Edge-case gates for the round-10 audit operators on crafted fixtures:
  * the binned-KS report's degenerate guard and separation behavior, and the
  * novelty scan's planted-duplicate semantics.
  */
class DriftNoveltySpec extends SparkSpec {

  import spark.implicits._

  test("ks: identical values for every type → KS is exactly 0 (degenerate guard)") {
    // hi == lo would divide by zero in the bin formula; the guard pins
    // everything to bin 0 and every per-type ECDF equals the global one
    val ev = Seq.tabulate(40)(i => (s"t${i % 4}", 5.0)).toDF("event_type", "value")
    val out = Behavior.ksReport(ev).collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.getDouble(2) == 0.0, s"expected 0, got $r"))
  }

  test("ks: disjoint value regimes separate sharply") {
    // type a lives in [0, 1], type b in [99, 100] — each type's ECDF reaches
    // 1.0 while the global sits at its mixture share, so KS ≈ 0.5 for both
    val ev = (Seq.tabulate(50)(i => ("a", i / 50.0)) ++
      Seq.tabulate(50)(i => ("b", 99.0 + i / 50.0))).toDF("event_type", "value")
    val out = Behavior.ksReport(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("a") == 0.5 && out("b") == 0.5, s"expected 0.5/0.5, got $out")
  }

  test("ks: a type matching the global mixture scores near 0") {
    // type c IS the global distribution (uniform over the same range) while
    // a and b split it — c's drift must be far below a's and b's
    val ev = (Seq.tabulate(50)(i => ("a", i / 50.0)) ++
      Seq.tabulate(50)(i => ("b", 1.0 + i / 50.0)) ++
      Seq.tabulate(100)(i => ("c", i / 50.0))).toDF("event_type", "value")
    val out = Behavior.ksReport(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("c") < 0.05, s"uniform type should not drift: $out")
    assert(out("a") > 0.2 && out("b") > 0.2, s"split types should drift: $out")
  }

  test("novelty: an exact copy scores 0, its original scores 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact copy of 1
      (3L, "totally different words in this one here")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNoveltyReport(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0, "first occurrence must be fully novel")
    assert(out(2L) == 0.0, "the exact copy must be fully seen")
    assert(out(3L) == 1.0, "unrelated text must be fully novel")
  }

  test("novelty: a half-quoted document scores its fresh fraction") {
    // doc 2 = 4 shingles from doc 1's text + 4 fresh shingles
    val docs = Seq(
      (1L, "a b c d e f"),          // shingles: abc bcd cde def (4)
      (2L, "a b c d e f w x y z")   // 4 seen + ef w, f w x, w x y, x y z fresh...
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNoveltyReport(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 2 has 8 distinct trigram shingles, 4 of them first seen in doc 1
    assert(out(2L)._1 == 8L && out(2L)._2 == 4L && out(2L)._3 == 0.5, s"got $out")
  }
}
