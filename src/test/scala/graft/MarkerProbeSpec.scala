package graft

import graft.operators.TextAnalysis

/** The closed-form probe on engineered corpora: separable data must be
  * classified perfectly with weights whose SIGNS recover the teacher rule;
  * degenerate (constant-label) data must not blow up the solve.
  */
class MarkerProbeSpec extends SparkSpec {

  private def probe(docs: Seq[(Long, String)]): Map[String, Double] = {
    import spark.implicits._
    TextAnalysis.markerProbe(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("separable corpus: perfect accuracy, boundary signs match the teacher") {
    // 6 common-marker-dominated docs vs 6 relational-marker-dominated docs,
    // with varied filler so the Gram matrix is well-conditioned
    val docs = (0 until 6).map { i =>
      (i.toLong, "the a fast " + Seq.fill(i + 1)("zz").mkString(" "))
    } ++ (6 until 12).map { i =>
      (i.toLong, "table row key " + Seq.fill(i - 5)("zz").mkString(" "))
    }
    val m = probe(docs)
    assert(m("accuracy") == 1.0)
    // the probe must load positively on the common-marker rate and
    // negatively on the relational-marker rate — the distilled teacher rule
    assert(m("w1") > 0.0, s"w1 = ${m("w1")}")
    assert(m("w2") < 0.0, s"w2 = ${m("w2")}")
    assert(m("w1") > m("w2"))
  }

  test("constant-label corpus: ridge keeps the solve finite and accurate") {
    // every doc is common-dominated -> y is all ones; without the λ ridge
    // the normal equations are still solvable here, but the prediction must
    // be the constant class and accuracy exact
    val docs = (0 until 5).map(i => (i.toLong, "the a " + ("f " * (i + 1)).trim))
    val m = probe(docs)
    assert(m("accuracy") == 1.0)
    assert(!m.values.exists(_.isNaN))
  }
}
