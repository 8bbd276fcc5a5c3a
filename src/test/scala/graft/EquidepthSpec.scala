package graft

import org.apache.spark.sql.functions._

/** Equi-depth means equi-depth: on a (near-)continuous column the ten decile
  * bins must come out essentially equal — the defining property, and the one
  * `ntile` buys with a global sort that this plan gets from a broadcast
  * boundary model.
  */
class EquidepthSpec extends SparkSpec {

  test("decile bins hold ~10% of the rows each on a continuous column") {
    val rows = SparkEntry.queries("q_equidepth_bins")(spark, sf("sf0.01")).collect()
    assert(rows.length == 10, s"expected 10 bins, got ${rows.length}")
    val counts = rows.map(_.getLong(1))
    val total = counts.sum
    // exact interpolated deciles over distinct-ish doubles: every bin within
    // 2% of the ideal tenth (ties at a boundary shift at most a handful)
    counts.foreach(c =>
      assert(math.abs(c - total / 10.0) <= total * 0.02,
        s"unbalanced bins: ${counts.mkString(",")}"))
    // bins are ordered and contiguous: each bin's lo is above the previous hi
    val los = rows.map(_.getDouble(2))
    val his = rows.map(_.getDouble(3))
    (1 until 10).foreach(i => assert(los(i) >= his(i - 1),
      s"bins overlap at $i: lo=${los(i)} prev hi=${his(i - 1)}"))
  }
}
