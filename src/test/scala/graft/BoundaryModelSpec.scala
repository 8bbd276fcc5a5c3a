package graft

import org.apache.spark.sql.functions._

/** Acceptance harness for the broadcast percentile-boundary-model contract
  * (q_rfm / q_lorenz / q_equidepth_bins / q_winsorize): those queries
  * document that at 100 TB the EXACT percentile in the one-row model swaps
  * for `approx_percentile` without touching the row-local assignment side.
  * This spec certifies that swap the same way q_ann_recall certifies ANN and
  * q_minhash_error certifies the sketch: run both models on real data and
  * measure the disagreement, so the claim is a number, not a comment.
  */
class BoundaryModelSpec extends SparkSpec {

  private def userGrain(d: String) =
    Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("freq"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("monetary"))

  private val cuts = "array(0.2D, 0.4D, 0.6D, 0.8D)"

  // the PRODUCTION assignment expression, not a copy — the spec certifies
  // what q_rfm/q_lorenz/q_gini actually execute
  private def quint(x: org.apache.spark.sql.Column, bs: String) =
    operators.Behavior.boundaryBin(x, col(bs), 4)

  test("approx_percentile boundary model reproduces the exact model's quintiles") {
    val g = userGrain(sf("sf0.01")).localCheckpoint()
    val bounds = g.agg(
      expr(s"transform(percentile(monetary, $cuts), p -> round(p, 4))").as("eb"),
      expr(s"transform(approx_percentile(monetary, $cuts, 10000), p -> round(p, 4))").as("ab"))
    val assigned = g.crossJoin(broadcast(bounds))
      .select(quint(col("monetary"), "eb").as("qe"), quint(col("monetary"), "ab").as("qa"))
      .groupBy().agg(count(lit(1)).as("n"),
        sum(when(col("qe") === col("qa"), 1L).otherwise(0L)).as("agree"))
      .head()
    val (n, agree) = (assigned.getLong(0), assigned.getLong(1))
    assert(n > 0)
    // at the default 10k accuracy the sketch is exact up to interpolation on
    // this grain; tolerate <1% boundary-straddlers before calling the swap
    // broken
    assert(agree.toDouble / n >= 0.99,
      s"approx boundary model disagrees on ${n - agree} of $n users")
  }

  test("boundary-exclusive bins stay balanced (each quintile within 2x of ideal)") {
    val g = userGrain(sf("sf0.01")).localCheckpoint()
    val bounds = g.agg(
      expr(s"transform(percentile(monetary, $cuts), p -> round(p, 4))").as("eb"))
    val pops = g.crossJoin(broadcast(bounds))
      .groupBy(quint(col("monetary"), "eb").as("q")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(pops.keySet == Set(1, 2, 3, 4, 5), s"missing quintiles: $pops")
    val ideal = pops.values.sum.toDouble / 5
    pops.foreach { case (q, n) =>
      assert(n <= ideal * 2 && n >= ideal / 2,
        s"quintile $q population $n vs ideal $ideal — equi-depth property lost: $pops")
    }
  }
}
