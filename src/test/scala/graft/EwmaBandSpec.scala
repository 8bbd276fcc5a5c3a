package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BLOCK-BANDED trailing-window pair generation (each right row published
  * to its own and the next rank block) — the house technique for bounded
  * rank-range joins when a window frame can't express the computation.
  * q_ewma used this until round 14 (it now folds the trailing 10 values
  * row-locally over a `ROWS BETWEEN 9 PRECEDING` collect_list frame — one
  * shuffle, no join); the banding pattern itself stays load-bearing (the
  * q_range_join bin-and-verify family), so this spec keeps pinning its
  * coverage guarantee on randomized inputs: the candidate set, after the
  * final range filter, is EXACTLY the naive `rb BETWEEN ra-9 AND ra` pair
  * set — no pair lost at block boundaries, none duplicated by the
  * two-block publication.
  */
class EwmaBandSpec extends SparkSpec {

  test("property: banded pair generation equals the naive BETWEEN self-join") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val input = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 1000L))))
    val prop = Prop.forAll(input) { raw =>
      // distinct (user, ts) so row_number is deterministic
      val rows = raw.distinct.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      rows.nonEmpty && {
        val r = rows.toDF("user_id", "ts", "event_id")
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))).cast("long"))
          .localCheckpoint()
        val a = r.select(col("user_id"), col("rn").as("ra"), expr("rn div 10").as("blk"))
        val b0 = r.select(col("user_id"), col("rn").as("rb"))
        val b = b0.withColumn("blk", expr("rb div 10"))
          .unionByName(b0.withColumn("blk", expr("rb div 10 + 1")))
        val banded = a.join(b, Seq("user_id", "blk"))
          .filter(col("rb") <= col("ra") && col("rb") >= col("ra") - 9)
          .select("user_id", "ra", "rb").as[(Long, Long, Long)].collect().toSeq
        val naive = r.select(col("user_id"), col("rn").as("ra"))
          .join(r.select(col("user_id"), col("rn").as("rb")), Seq("user_id"))
          .filter(col("rb") <= col("ra") && col("rb") >= col("ra") - 9)
          .select("user_id", "ra", "rb").as[(Long, Long, Long)].collect().toSeq
        // set equality AND multiplicity equality (no boundary duplicates)
        banded.sorted == naive.sorted
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
