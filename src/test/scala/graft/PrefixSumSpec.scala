package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

/** The distributed two-level scan must equal a sequential fold exactly, and
  * its only window must partition on the data-dependent bucket key (the
  * whole point is NOT running the oracle's single-task global window).
  */
class PrefixSumSpec extends SparkSpec {

  test("two-level scan equals the sequential fold, across bucket boundaries") {
    import spark.implicits._
    // 50 events spread over 5 hourly buckets, shuffled input order, values
    // with 6-decimal parts so decimal exactness is actually exercised
    val hour = 3600000000L
    val rows = (0 until 50).map { i =>
      (i.toLong, (i % 5) * hour + (i / 5) * 60000000L, i * 0.123456 - 3.0)
    }
    val df = new scala.util.Random(7).shuffle(rows).toDF("event_id", "tus", "value")
    val got = Behavior.prefixSum(df).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // sequential oracle: fold in (tus, event_id) order with BigDecimal
    var acc = BigDecimal(0)
    val want = rows.sortBy(r => (r._2, r._1)).map { r =>
      acc += BigDecimal(r._3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (r._1, acc.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.toSeq == want)
  }

  test("ties on tus resolve by event_id, deterministically") {
    import spark.implicits._
    val df = Seq((2L, 100L, 10.0), (1L, 100L, 1.0), (3L, 100L, 100.0))
      .toDF("event_id", "tus", "value")
    val got = Behavior.prefixSum(df).collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1.0), (2L, 11.0), (3L, 111.0)))
  }

  test("the executed plan's only window partitions on the bucket key") {
    import spark.implicits._
    val hour = 3600000000L
    val df = (0 until 2000)
      .map(i => (i.toLong, (i % 7) * hour + i * 1000L, i * 0.5))
      .toDF("event_id", "tus", "value")
    val res = Behavior.prefixSum(df)
    res.collect() // finalize AQE
    val plan = res.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val windows = "Window \\[".r.findAllIn(plan).toList
    assert(windows.nonEmpty, s"expected a Window node, plan:\n$plan")
    // every Window must carry the bucket partition column — a global window
    // would list an empty partition spec
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(plan).toList
    assert(specs.nonEmpty && specs.forall(_.contains("b#")),
      s"window not partitioned by bucket:\n${specs.mkString("\n")}")
  }
}
