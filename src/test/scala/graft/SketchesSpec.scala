package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Approximate aggregates verified against their algebraic error contracts —
  * the correctness gate for sketches, whose estimates can never hash-match a
  * different engine's implementation.
  */
class SketchesSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("HLL++ distinct counts are within the configured relative error") {
    val rows = Sketches.distinctEvents(spark, dir, rsd = 0.02).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      // rsd is a standard deviation; 5x gives a comfortable deterministic bound
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getAs[String]("event_type")}: approx $approx vs exact $exact")
    }
  }

  test("approximate percentiles respect the rank-error bound") {
    val rows = Sketches.valuePercentiles(spark, dir, accuracy = 10000).collect()
    rows.foreach { r =>
      val e50 = r.getAs[Double]("exact_p50"); val a50 = r.getAs[Double]("approx_p50")
      val e95 = r.getAs[Double]("exact_p95"); val a95 = r.getAs[Double]("approx_p95")
      assert(math.abs(a50 - e50) <= math.max(0.05 * math.abs(e50), 1e-6))
      assert(math.abs(a95 - e95) <= math.max(0.05 * math.abs(e95), 1e-6))
    }
  }

  test("count-min sketch never undercounts and overcounts within eps*N") {
    val cms = Sketches.userFrequencySketch(spark, dir, eps = 0.0001, confidence = 0.99)
    val exact = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val totalN = exact.map(_._2).sum
    val slack = math.ceil(0.0001 * totalN).toLong + 1
    var overshoots = 0
    exact.foreach { case (uid, n) =>
      val est = cms.estimateCount(uid)
      assert(est >= n, s"CMS undercounted user $uid: $est < $n")
      if (est > n + slack) overshoots += 1
    }
    // confidence 0.99 → at most ~1% of keys may exceed the eps*N bound
    assert(overshoots <= math.max(1, exact.length / 50),
      s"$overshoots of ${exact.length} keys exceeded the error bound")
  }
}
