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

  test("ties break toward the smaller id, like ROW_NUMBER") {
    import spark.implicits._
    Seq((1L, 10.0, 100L), (1L, 10.0, 50L), (1L, 10.0, 70L), (1L, 5.0, 1L))
      .toDF("k", "score", "id").createOrReplaceTempView("tk")
    val got = spark.sql("SELECT k, graft_topk(score, id, 2) AS t FROM tk GROUP BY k")
      .select(expr("t.id").as("ids")).head().getSeq[Long](0)
    assert(got == Seq(50L, 70L), got)
  }
}
