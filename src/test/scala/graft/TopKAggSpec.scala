package graft

import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {

  test("graft_topk matches the window top-k exactly") {
    val viaAgg = SparkEntry.queries("q_topk_agg")(spark, sf()).collect().toSeq
    val viaWindow = SparkEntry.queries("q_window_topk")(spark, sf()).collect().toSeq
    assert(viaAgg.map(_.toSeq) == viaWindow.map(_.toSeq))
  }

  test("the aggregate is partial: both halves appear in the plan") {
    val plan = SparkEntry.queries("q_topk_agg")(spark, sf())
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a partial
    // stage below the exchange and a merge stage above it
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    assert(plan.contains("partial_graft_topk") || plan.contains("partial"), plan.take(1500))
  }

  test("property: random tied data matches a reference top-k at any partitioning") {
    // the risk area is the MERGE half of the partial aggregate: heaps built
    // on different partitions combine in arbitrary order, and ties (score
    // desc, then id asc) must still resolve identically to a global sort.
    // Scores are drawn from 4 values so collisions are dense.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rows: Gen[List[(Long, Double, Long)]] = Gen.listOfN(60, for {
      k  <- Gen.choose(1L, 3L)
      sc <- Gen.oneOf(1.0, 2.0, 3.0, 4.0)
      id <- Gen.choose(1L, 500L)
    } yield (k, sc, id))
    val prop = Prop.forAll(rows, Gen.oneOf(1, 3, 7)) { (data, nPart) =>
      val dedup = data.distinct // duplicate (k,score,id) rows are legal but
      val df = dedup.toDF("k", "score", "id").repartition(nPart) // ref below dedups
      df.createOrReplaceTempView("tk_prop")
      val got = spark.sql(
        "SELECT k, graft_topk(score, id, 5) AS t FROM tk_prop GROUP BY k")
        .select(col("k"), expr("t.id").as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = dedup.groupBy(_._1).map { case (k, rs) =>
        k -> rs.sortBy { case (_, sc, id) => (-sc, id) }.map(_._3).take(5)
      }
      got.keySet == want.keySet && want.forall { case (k, ids) => got(k) == ids }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"top-k merge property failed: ${res.status}")
  }

  test("ties break toward the smaller id, like ROW_NUMBER") {
    import spark.implicits._
    Seq((1L, 10.0, 100L), (1L, 10.0, 50L), (1L, 10.0, 70L), (1L, 5.0, 1L))
      .toDF("k", "score", "id").createOrReplaceTempView("tk")
    val got = spark.sql("SELECT k, graft_topk(score, id, 2) AS t FROM tk GROUP BY k")
      .select(expr("t.id").as("ids")).head().getSeq[Long](0)
    assert(got == Seq(50L, 70L), got)
  }
}
