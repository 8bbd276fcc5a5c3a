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

  test("64-bit native expression equals the 64-sum aggregate form; lo equals the 32-bit simhash") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val native = Dedup.simhash64Df(docs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val agg = Dedup.simhash64AggDf(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native.nonEmpty)
    assert(native == agg)
    // lo half must be the exact 32-bit graft_simhash value (same hash family)
    val s32 = Dedup.simhashDf(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native.map(t => (t._1, t._2)) == s32)
    // both halves stay in [0, 2^32): the positive-arithmetic band contract
    assert(native.forall(t => t._2 >= 0L && t._2 < (1L << 32) && t._3 >= 0L && t._3 < (1L << 32)))
  }

  test("simhash64 signature generation is shuffle-free on the native path") {
    val plan = Dedup.simhash64Df(Tables.documents(spark, sf("sf0.001")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_simhash64"), s"expected native simhash64 in:\n$plan")
    assert(!plan.contains("Exchange"), s"signature generation must be shuffle-free:\n$plan")
  }

  test("planted near-dup within hamming 3 is found by the 4x16-bit band join") {
    import spark.implicits._
    // 60 distinct background docs plus one EXACT pair — hamming 0 ≤ 3 must
    // surface through at least one intact 16-bit block (pigeonhole: r=3 < 4)
    val bg = (1L to 60L).map(i => (i, s"background document number $i with token salt ${i * 7}"))
    val docs = (bg :+ (100L, "the quick brown fox jumps over the lazy dog")
      :+ (101L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val hits = Dedup.simhash64Df(docs).localCheckpoint()
      .select(col("doc_id"), col("lo"), col("hi"), explode(sequence(lit(0), lit(3))).as("k"))
      .select(col("doc_id"), col("lo"), col("hi"), col("k"),
        (floor(when(col("k") < 2, col("lo")).otherwise(col("hi")) /
          pow(lit(2.0), (col("k") % 2) * 16)).cast("long") % 65536L).as("bb"))
    val pairs = hits.select(col("doc_id").as("d1"), col("lo").as("lo1"), col("hi").as("hi1"), col("k"), col("bb"))
      .join(hits.select(col("doc_id").as("d2"), col("lo").as("lo2"), col("hi").as("hi2"), col("k"), col("bb")),
        Seq("k", "bb"))
      .filter(col("d1") < col("d2"))
      .filter((bit_count(col("lo1").bitwiseXOR(col("lo2"))) +
        bit_count(col("hi1").bitwiseXOR(col("hi2")))).cast("long") <= 3L)
      .select("d1", "d2").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)), s"planted pair missing from $pairs")
  }

  test("block-width solver: r+1 blocks cover radius r; width tracks log2(n)") {
    // the registered config: 4 blocks × 16 bits over 64 bits covers hamming
    // ≤ 3 by pigeonhole, and 16 bits holds occupancy ~1 up to ~65k docs
    assert(Dedup.simhashBlockBits(50000L) == 16)
    assert(Dedup.simhashBlockBits(65536L) == 16)
    assert(Dedup.simhashBlockBits(1000000L) == 20)   // scale-up: widen blocks
    assert(Dedup.simhashBlockBits(100L) == 8)        // floor
    assert(Dedup.simhashBlockBits(Long.MaxValue) == 32) // cap at half-width
  }
}
