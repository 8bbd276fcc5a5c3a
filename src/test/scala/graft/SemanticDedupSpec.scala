package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** SemDeDup policy pins at the threshold extremes, where the expected verdict
  * relation is exact without re-deriving any cosine: at threshold −1 every
  * same-cell pair qualifies (rounded cosine ≥ −1 always), so the survivor set
  * must be EXACTLY the min-vec_id per cell; above +1 no pair qualifies, so
  * everything survives. Together they pin the pair generation (within-cell
  * only, v1 < v2), the keep policy (smaller-id neighbor kills), and the
  * verdict join — the mid-threshold behavior is oracle-checked by
  * q_semantic_dedup itself.
  */
class SemanticDedupSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf("sf0.001"))

  test("threshold -1: exactly the min-id vector of every cell survives") {
    val out = Similarity.semanticDedup(emb, -1.0).cache()
    val cells = out.select("cell").distinct().count()
    val kept = out.filter(col("kept"))
    assert(kept.count() === cells, "one survivor per cell expected")
    val badKeep = kept.as("k").join(out.as("o"),
        col("k.cell") === col("o.cell") && col("o.vec_id") < col("k.vec_id"))
      .count()
    assert(badKeep === 0L, "a survivor had a smaller-id cellmate")
    out.unpersist()
  }

  test("threshold above 1: every corpus vector survives with a cell") {
    val out = Similarity.semanticDedup(emb, 1.01).cache()
    assert(out.filter(!col("kept")).count() === 0L)
    val corpusN = emb.filter(col("vec_id") >= 5).count()
    assert(out.count() === corpusN, "verdict relation must cover the corpus")
    assert(out.select("cell").distinct().count() > 1L, "degenerate single-cell build")
    out.unpersist()
  }
}
