package graft

import graft.operators.Sketches

/** The sketch-rollup contract: weekly distinct-user estimates derived by
  * UNIONING stored per-day HLL sketches must equal the estimates of a full
  * weekly rescan EXACTLY (HLL union is lossless — register-wise max), and
  * both must sit within the sketch's error envelope of the exact distinct.
  * This is what makes per-grain sketch materialization the 100 TB answer to
  * distinct-count cubes: coarser grains come from stored sketches, never
  * another fact-table scan.
  */
class SketchRollupSpec extends SparkSpec {

  test("weekly estimates from stored daily sketches equal the direct rescan") {
    val dir = sf("sf0.01")
    // "stored": materialized once, weekly answers must not touch the facts
    val daily = Sketches.dailyUserSketches(spark, dir).localCheckpoint()
    assert(daily.count() > 10, "fixture must span multiple (type, day) cells")
    val fromDaily = Sketches.weeklyFromDaily(daily).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Number]("approx_users").doubleValue()).toMap
    val direct = Sketches.weeklyDirect(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Number]("approx_users").doubleValue(), r.getAs[Long]("exact_users"))).toMap
    assert(fromDaily.keySet == direct.keySet, "grain mismatch between rollup and rescan")
    fromDaily.foreach { case (k, est) =>
      assert(est == direct(k)._1,
        s"$k: merged-sketch estimate $est != direct-rescan estimate ${direct(k)._1}")
      val exact = direct(k)._2.toDouble
      assert(math.abs(est - exact) / exact <= 0.05,
        s"$k: estimate $est outside 5% of exact $exact")
    }
  }

  test("returning users by inclusion-exclusion over stored weekly sketches") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.01")
    val got = Sketches.weeklyReturning(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty, "fixture must span consecutive weeks")
    // exact witness computed here, NOT in the production helper (collecting
    // per-week user sets is a test-only luxury)
    val weeklySets = Tables.events(spark, dir)
      .select(expr("ts div 604800000000000").as("week"), col("user_id"))
      .groupBy("week").agg(collect_set(col("user_id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    got.foreach { case (w, est) =>
      val exact = weeklySets(w).intersect(weeklySets(w - 1)).size.toDouble
      // three estimates compose, so the envelope is wider than the
      // single-sketch bound; 10% on a ~1000-user intersection
      assert(exact > 0 && math.abs(est - exact) / exact <= 0.10,
        s"week $w: returning estimate $est vs exact $exact")
    }
  }
}
