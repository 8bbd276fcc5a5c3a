package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamJoinSpec extends SparkSpec {

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
}
