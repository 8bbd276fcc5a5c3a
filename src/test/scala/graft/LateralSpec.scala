package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

/** q_lateral states a correlated LATERAL subquery with ORDER BY + LIMIT in
  * literal SQL; these tests pin that Catalyst DECORRELATES it — one windowed
  * top-k over a single shuffle of the inner side — instead of re-executing
  * the subquery per outer row, and that the rows match the hand-written
  * window form (q_window_topk's shape with k=2).
  */
class LateralSpec extends SparkSpec {

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectPlan(a.executedPlan)
      case other                    => Seq(other)
    }
    self ++ p.children.flatMap(collectPlan) ++
      p.subqueries.flatMap(collectPlan)
  }

  test("correlated LATERAL + LIMIT decorrelates to one window, no per-row subquery") {
    val df = SparkEntry.queries("q_lateral")(spark, sf())
    df.count()
    val nodes = collectPlan(df.queryExecution.executedPlan)
    val windows = nodes.count(_.isInstanceOf[WindowExec])
    assert(windows >= 1, "expected the LIMIT-per-key to plan as a window top-k")
    // the decorrelated plan must not contain a nested-loop of subquery
    // re-executions: no CartesianProduct, no BroadcastNestedLoop
    val bad = nodes.map(_.nodeName).filter(n =>
      n.contains("CartesianProduct") || n.contains("BroadcastNestedLoop"))
    assert(bad.isEmpty, s"per-row shapes in plan: $bad")
  }

  test("LATERAL rows equal the hand-written window top-k at k=2") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = sf()
    val got = SparkEntry.queries("q_lateral")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = Tables.orders(spark, d)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }
}
