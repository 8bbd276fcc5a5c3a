package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

/** The bucketed-rank Gini must equal a local exact reference on inputs that
  * stress BOTH structural tails the plan claims to survive:
  *  - heavy ties (90% of users share one value — value-range buckets
  *    collapse onto one cut, and only the tie-collapsed grain keeps the
  *    within-bucket window small);
  *  - a continuous spread (every value distinct — buckets do the work).
  */
class GiniSpec extends SparkSpec {

  /** Exact reference: ascending sort, G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n. */
  private def referenceGini(xs: Seq[BigDecimal]): Double = {
    val sorted = xs.sorted
    val n = sorted.size
    val sx = sorted.sum
    val sxi = sorted.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
    (2.0 * sxi.toDouble) / (n * sx.toDouble) - (n + 1.0) / n
  }

  private def run(vals: Seq[BigDecimal]): (Long, Double) = {
    import spark.implicits._
    val g = vals.zipWithIndex
      .map { case (v, i) => ("t", i.toLong, v) }
      .toDF("event_type", "user_id", "xd")
      .select(col("event_type"), col("user_id"),
        col("xd").cast("decimal(18,6)").as("xd"))
    val r = Behavior.giniOf(g).head()
    (r.getLong(1), r.getDouble(3))
  }

  test("heavy-tie tail: 90% of users share one value") {
    val vals = Seq.fill(900)(BigDecimal("1.00")) ++
      (1 to 100).map(i => BigDecimal(i) * BigDecimal("3.17"))
    val (n, g) = run(vals)
    assert(n == 1000L)
    assert(math.abs(g - referenceGini(vals)) < 1e-6, s"gini $g")
  }

  test("continuous tail: all values distinct") {
    val vals = (1 to 500).map(i => BigDecimal(i * i) * BigDecimal("0.01"))
    val (n, g) = run(vals)
    assert(n == 500L)
    assert(math.abs(g - referenceGini(vals)) < 1e-6, s"gini $g")
  }

  test("degenerate: every user identical — gini exactly 0") {
    val (n, g) = run(Seq.fill(64)(BigDecimal("2.50")))
    assert(n == 64L && math.abs(g) < 1e-9, s"gini $g")
  }
}
