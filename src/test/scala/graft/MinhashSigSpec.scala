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
