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

  // local exact type-7 reference: cutm_j = m·s_k + ((n−1)·j mod m)·(s_{k+1}−s_k)
  private def refCutsM(xs: Seq[Long], m: Int): Seq[Long] = {
    val s = xs.sorted.toIndexedSeq
    val n1 = (s.length - 1).toLong
    (1 until m).map { j =>
      val k = (n1 * j / m).toInt
      val r = n1 * j % m
      val sk1 = s(math.min(k + 1, s.length - 1))
      m * s(k) + r * (sk1 - s(k))
    }
  }

  test("exactCutsM matches the local type-7 reference on a heavy-tie fixture") {
    import spark.implicits._
    // 90% of mass tied on three values, a continuous tail, n not divisible
    // by m — exercises tie collapse, bucket offsets AND the r != 0 arm
    val xs: Seq[Long] =
      Seq.fill(300)(1000L) ++ Seq.fill(250)(2000L) ++ Seq.fill(250)(7000L) ++
        (1L to 123L).map(i => 7000L + i * 13)
    val got = operators.Behavior.exactCutsM(xs.toDF("x"), 5)
      .head().getSeq[Long](0)
    assert(got == refCutsM(xs, 5), s"got $got want ${refCutsM(xs, 5)}")
  }

  test("exactCutsM matches the reference on the real monetary-micros grain") {
    val g = userGrain(sf("sf0.01"))
      .select((col("monetary") * 1000000).cast("long").as("x"))
    val xs = g.collect().map(_.getLong(0)).toSeq
    val got = operators.Behavior.exactCutsM(g, 10).head().getSeq[Long](0)
    assert(got == refCutsM(xs, 10), s"got $got want ${refCutsM(xs, 10)}")
  }

  test("exactCutsM quintiles are a pure function of the metric value (ties share a bin)") {
    import spark.implicits._
    val xs = (Seq.fill(77)(5L) ++ Seq.fill(23)(9L) ++ (10L to 40L)).toDF("x")
      .localCheckpoint()
    val bounds = operators.Behavior.exactCutsM(xs, 5)
    val assigned = xs.crossJoin(broadcast(bounds))
      .select(col("x"),
        operators.Behavior.boundaryBin(col("x") * 5, col("bs"), 4).as("q"))
    val perValue = assigned.groupBy("x").agg(countDistinct(col("q")).as("nq"))
      .filter(col("nq") > 1).count()
    assert(perValue == 0, "tied values were split across quintiles")
  }
}
