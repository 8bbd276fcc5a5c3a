package graft

import graft.operators.Dedup

/** Semantics of cross-document duplicated-shingle coverage on a corpus with
  * KNOWN overlap: the oracle hash pins the real-data values; this pins what
  * the numbers mean.
  */
class DupCoverageSpec extends SparkSpec {

  test("coverage counts exactly the bigrams shared with another document") {
    import spark.implicits._
    // d1 bigrams {a b, b c, c d}; d2 {a b, b x, x y}; d3 {p q, q r, r s}.
    // Only "a b" crosses documents, so d1 and d2 each have 1/3 of their
    // shingles duplicated and d3 none.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val rows = Dedup.duplicatedShingleCoverage(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1L, 3L, 1L, 0.333333),
      (2L, 3L, 1L, 0.333333),
      (3L, 3L, 0L, 0.0)))
  }

  test("within-document repeats do not create duplication on their own") {
    import spark.implicits._
    // "a b" appears twice inside d1 but in no other doc: per-doc shingles
    // are a SET, so d1 must report zero duplicated shingles — the signal is
    // cross-document, never self-inflicted (that is q_repetition's job).
    val docs = Seq(
      (1L, "a b a b"), // set {a b, b a}
      (2L, "z1 z2 z3")).toDF("doc_id", "text")
    val rows = Dedup.duplicatedShingleCoverage(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 0L), (2L, 0L)))
  }

  test("a fully boilerplate document reports coverage 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3"),
      (2L, "w1 w2 w3 extra tail")).toDF("doc_id", "text")
    val r1 = Dedup.duplicatedShingleCoverage(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(r1(1L) == 1.0)      // both of d1's bigrams occur in d2
    assert(r1(2L) == 0.5)      // 2 of d2's 4 bigrams are shared
  }
}
