package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** The native `graft_minhash` expression must be bit-for-bit identical to the
  * HOF formulation it replaces — the same contract OsgbExprSpec enforces for
  * the reprojection expression.
  */
class MinhashSigSpec extends SparkSpec {

  test("graft_minhash equals the array_min(transform(...)) form bit for bit") {
    import spark.implicits._
    val P = 4294967311L
    val numPerms = 32
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma delta epsilon zeta") // duplicate of 1
    ).toDF("doc_id", "text")
    val hs = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), TextFns.hash32(col("tok")).as("h"))
      .groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
    val coeffs = (0 until numPerms).map(j =>
      (2L * TextFns.hashN(s"a$j", 7) + 1L, TextFns.hashN(s"b$j", 7)))
    val hof = array(coeffs.map { case (a, b) =>
      array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % P))
    }: _*)
    val rows = hs
      .select(col("doc_id"), expr(s"graft_minhash(hs, $numPerms)").as("native"), hof.as("hof"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Long](1)} != hof ${r.getSeq[Long](2)}")
    }
    assert(rows(0).getSeq[Long](1) == rows(2).getSeq[Long](1),
      "identical docs must have identical signatures")
    assert(rows(0).getSeq[Long](1) != rows(1).getSeq[Long](1),
      "different docs must differ somewhere in 32 permutations")
  }

  test("graft_shingle_hashes equals the explode/DISTINCT/hash pipeline as a SET") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"),              // repeated bigram "a b" must dedup
      (2L, "single"),                  // < n tokens: no shingles
      (3L, "x y"),                     // exactly one shingle
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val native = docs
      .select(col("doc_id"), expr("graft_shingle_hashes(split(text, ' '), 2)").as("hs"))
      .filter(size(col("hs")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val pipeline = TextFns.shingles(docs, 2)
      .select(col("doc_id"), TextFns.hash32(col("sh")).as("h"))
      .groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(native == pipeline)
    assert(!native.contains(2L), "a doc with < n tokens must drop out")
    assert(native(3L).size == 1)
    assert(native(1L).size == 3, "'a b','b c','c a','a b' → 3 distinct shingles")
  }

  test("minhash signature relation is shuffle-free under the native expressions") {
    val plan = graft.operators.Dedup
      .minhashSignatures(Tables.documents(spark, sf("sf0.001")), 2, 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_shingle_hashes") && plan.contains("graft_minhash"),
      s"expected native expressions in:\n$plan")
    assert(!plan.contains("Exchange"), s"signature generation must be shuffle-free:\n$plan")
  }

  test("graft_minhash of an empty hash set is null (array_min semantics)") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq.empty[Long]), Tuple1(Seq(7L)))
      .toDF("hs")
      .select(expr("graft_minhash(hs, 4)").as("sig"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
  }
}
