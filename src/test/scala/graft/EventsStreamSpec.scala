package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkSpec {

  test("streaming hourly agg matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // epoch seconds within two distinct hours
    val rows = Seq(
      (3600L, "click", 1.0), (3700L, "click", 2.0), (3800L, "view", 10.0),
      (7300L, "click", 5.0), (7400L, "view", 0.5))

    val ms = MemoryStream[(Long, String, Double)]
    val streamDf = ms.toDF().toDF("sec", "event_type", "value")
      .withColumn("t", timestamp_seconds(col("sec")))
    val q = EventsStream.hourlyAgg(streamDf)
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("hourly")
        .orderBy("window_start", "event_type")
        .collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq

      val batchDf = rows.toDF("sec", "event_type", "value")
        .withColumn("t", timestamp_seconds(col("sec")))
      val want = EventsStream.hourlyAgg(batchDf)
        .orderBy("window_start", "event_type")
        .collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq

      assert(got == want)
      assert(got == Seq(
        (3600L, "click", 2L, 3.0), (3600L, "view", 1L, 10.0),
        (7200L, "click", 1L, 5.0), (7200L, "view", 1L, 0.5)))
    } finally q.stop()
  }
}
