package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native `graft_simhash` expression must be bit-for-bit equal to the
  * aggregate formulation (the DuckDB-oracle-checked value contract) — the
  * implementations may never drift.
  */
class SimhashSigSpec extends SparkSpec {

  test("native expression equals the aggregate form on the sf0.001 corpus") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val native = docs.select(col("doc_id"), expr("graft_simhash(split(text, ' '))").as("s"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val agg = Dedup.simhashAggDf(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native.nonEmpty)
    assert(native == agg)
  }

  test("degenerate token lists: empty string, single token, repeated token, null text") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "word"), (3L, "word word word"), (4L, "a b a b a"))
      .toDF("doc_id", "text")
      .unionByName(Seq(Tuple1(5L)).toDF("doc_id").withColumn("text", lit(null).cast("string")))
    // the DISPATCHING entry point must drop null-text docs on both paths
    val native = Dedup.simhashDf(docs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val agg = Dedup.simhashAggDf(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native == agg)
    assert(!native.exists(_._1 == 5L), "null-text doc must produce no row")
    // repeated single token: every set bit of hash32 must carry through
    assert(native(1)._2 == native(2)._2, "multiplicity must not change a 1-token simhash")
  }

  test("registered simhash queries use the native expression (no exchange in the signature subplan)") {
    val plan = Dedup.simhashDf(Tables.documents(spark, sf("sf0.001")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_simhash"), s"expected native simhash in:\n$plan")
    assert(!plan.contains("Exchange"), s"signature generation must be shuffle-free:\n$plan")
  }
}
