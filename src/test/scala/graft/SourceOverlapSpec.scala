package graft

import graft.operators.Dedup

/** Semantics of the dataset overlap matrix on a corpus engineered to have a
  * KNOWN Jaccard: the oracle hash pins the real-data values; this pins what
  * the numbers mean.
  */
class SourceOverlapSpec extends SparkSpec {

  test("engineered half-overlap comes out at the exact known Jaccard") {
    import spark.implicits._
    // src A holds bigram shingles {w1 w2, w2 w3, w3 w4, w4 w5} (4 shingles),
    // src B holds {w3 w4, w4 w5, w5 x1, x1 x2} (4 shingles), sharing exactly
    // 2 → J = 2 / (4 + 4 - 2) = 1/3; src C overlaps nothing and must
    // produce NO row at all (absent pairs mean zero overlap by contract)
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5", "A"),
      (2L, "w3 w4 w5 x1 x2", "B"),
      (3L, "z1 z2 z3", "C")).toDF("doc_id", "text", "source")

    val rows = Dedup.sourceOverlapMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(("A", "B", 2L, 0.333333)))
  }

  test("duplicate shingles within a source count once: sets, not bags") {
    import spark.implicits._
    // the repeated "w1 w2" inside doc 1 and across docs 1/2 must not
    // inflate A's set size or the intersection
    val docs = Seq(
      (1L, "w1 w2 w1 w2", "A"), // shingles {w1 w2, w2 w1} — set of 2
      (2L, "w1 w2 w9", "A"),    // adds {w2 w9}
      (3L, "w1 w2 w8", "B")     // {w1 w2, w2 w8}
    ).toDF("doc_id", "text", "source")
    val rows = Dedup.sourceOverlapMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // |A| = {w1 w2, w2 w1, w2 w9} = 3, |B| = 2, shared = {w1 w2} = 1
    // J = 1 / (3 + 2 - 1) = 0.25
    assert(rows.toSeq == Seq(("A", "B", 1L, 0.25)))
  }
}
