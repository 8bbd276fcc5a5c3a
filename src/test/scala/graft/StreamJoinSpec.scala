package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamJoinSpec extends SparkSpec {

  test("watermark delay tracks the attribution window (window + 1h slack)") {
    assert(StreamJoin.watermarkFor("INTERVAL 1 HOUR") == "7200 seconds")
    assert(StreamJoin.watermarkFor("INTERVAL 30 MINUTES") == "5400 seconds")
    // the round-10 defect shape: a window LONGER than the old fixed 2h
    // watermark must widen the delay, not silently under-cover
    assert(StreamJoin.watermarkFor("INTERVAL 1 DAY") == s"${86400 + 3600} seconds")
    intercept[IllegalArgumentException](StreamJoin.watermarkFor("INTERVAL 1 MONTH"))
    intercept[IllegalArgumentException](StreamJoin.watermarkFor("not an interval"))
  }

  test("stream-stream interval join attributes purchases to preceding views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val views = MemoryStream[(Long, Long)]      // (user_id, view epoch sec)
    val purchases = MemoryStream[(Long, Long, Double)] // (user_id, purchase sec, value)

    val vDf = views.toDF().toDF("user_id", "vsec").withColumn("vt", timestamp_seconds(col("vsec"))).drop("vsec")
    val pDf = purchases.toDF().toDF("user_id", "psec", "value").withColumn("pt", timestamp_seconds(col("psec"))).drop("psec")

    val q = StreamJoin.attributePurchases(vDf, pDf)
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      views.addData((1L, 1000L), (2L, 1000L))
      purchases.addData(
        (1L, 2000L, 9.99),   // 1000s after the view → attributed
        (2L, 9000L, 5.00),   // >1h after the view → NOT attributed
        (3L, 2000L, 1.00))   // no view at all → NOT attributed
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user_id", "value").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 9.99)), s"got $got")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null rows once the watermark closes the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val views = MemoryStream[(Long, Long)]
    val purchases = MemoryStream[(Long, Long, Double)]
    val vDf = views.toDF().toDF("user_id", "vsec").withColumn("vt", timestamp_seconds(col("vsec"))).drop("vsec")
    val pDf = purchases.toDF().toDF("user_id", "psec", "value").withColumn("pt", timestamp_seconds(col("psec"))).drop("psec")

    val q = StreamJoin.attributionOutcome(vDf, pDf)
      .writeStream.format("memory").queryName("outcome").outputMode("append").start()
    try {
      // user 1 converts inside the window; user 2 never converts
      views.addData((1L, 1000L), (2L, 1000L))
      purchases.addData((1L, 2000L, 9.99))
      q.processAllAvailable()
      val early = spark.table("outcome")
        .select("user_id").as[Long].collect().toSet
      // user 2's null row must NOT have been emitted yet — a matching
      // purchase could still arrive before its window closes
      assert(early == Set(1L), s"unmatched row emitted before the watermark: $early")

      // advance BOTH watermarks far past view 2's window (wm = max t − 2 h;
      // eviction happens on the following trigger)
      views.addData((90L, 200000L))
      purchases.addData((91L, 200000L, 1.0))
      q.processAllAvailable()
      views.addData((92L, 200001L))
      purchases.addData((93L, 200001L, 1.0))
      q.processAllAvailable()

      val rows = spark.table("outcome")
        .select(col("user_id"), col("value")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
      assert(rows.contains((2L, None)),
        s"expected the non-converting view to emit a null-extended row, got $rows")
      assert(rows.contains((1L, Some(9.99))))
    } finally q.stop()
  }

  test("full-outer ledger surfaces both orphan kinds once watermarks close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val views = MemoryStream[(Long, Long)]
    val purchases = MemoryStream[(Long, Long, Double)]
    val vDf = views.toDF().toDF("user_id", "vsec").withColumn("vt", timestamp_seconds(col("vsec"))).drop("vsec")
    val pDf = purchases.toDF().toDF("user_id", "psec", "value").withColumn("pt", timestamp_seconds(col("psec"))).drop("psec")

    val q = StreamJoin.attributionLedger(vDf, pDf)
      .writeStream.format("memory").queryName("ledger").outputMode("append").start()
    try {
      // user 1: view + purchase (matched); user 2: view, never converts;
      // user 3: purchase with NO view — the direct conversion the
      // left-outer form silently drops
      views.addData((1L, 1000L), (2L, 1000L))
      purchases.addData((1L, 2000L, 9.99), (3L, 2000L, 1.00))
      q.processAllAvailable()
      // advance both watermarks past every open window (eviction fires on
      // the trigger after the watermark moves)
      views.addData((90L, 200000L)); purchases.addData((91L, 200000L, 0.0))
      q.processAllAvailable()
      views.addData((92L, 200001L)); purchases.addData((93L, 200001L, 0.0))
      q.processAllAvailable()

      val rows = spark.table("ledger")
        .select(col("user_id"), col("vt").isNull.as("noView"),
          col("value")).collect()
        .map(r => (r.getLong(0), r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(rows.contains((1L, false, Some(9.99))), s"matched row missing: $rows")
      assert(rows.contains((2L, false, None)), s"view orphan missing: $rows")
      assert(rows.contains((3L, true, Some(1.0))), s"purchase orphan missing: $rows")
    } finally q.stop()
  }
}
