package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming HLL++ distinct-count parity. The claim under test is stronger
  * than "approximately right": HLL registers depend only on the SET of
  * hashed inputs (merge is commutative + idempotent), so the streaming
  * estimate must equal the batch twin EXACTLY — bit-for-bit — no matter how
  * the rows are split across micro-batches. The second test bounds the
  * estimate against the true distinct count (the sketch's own contract).
  */
class StreamSketchSpec extends SparkSpec {

  // two hours; duplicated users within and ACROSS micro-batch boundaries
  private val batch1 = Seq(
    (3600L, 1L), (3650L, 2L), (3700L, 1L), (3800L, 3L),
    (7200L, 10L), (7300L, 11L))
  private val batch2 = Seq(
    (3900L, 2L), (3950L, 4L), // hour-1 state re-opened: users 2 (dup) and 4 (new)
    (7400L, 10L), (7500L, 12L), (7600L, 11L))

  test("streaming HLL distinct equals the batch twin exactly, across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ms = MemoryStream[(Long, Long)]
    val streamDf = ms.toDF().toDF("sec", "user_id")
      .withColumn("t", timestamp_seconds(col("sec")))
    val q = EventsStream.distinctUsersApprox(streamDf)
      .writeStream.format("memory").queryName("hll").outputMode("complete").start()
    try {
      // deliberate two-round arrival: the same windows receive rows in both
      // rounds, so the final state is a MERGE of per-batch partial sketches
      ms.addData(batch1: _*)
      q.processAllAvailable()
      ms.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("hll").orderBy("window_start")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toSeq

      val batchDf = (batch1 ++ batch2).toDF("sec", "user_id")
        .withColumn("t", timestamp_seconds(col("sec")))
      val want = EventsStream.distinctUsersApprox(batchDf)
        .orderBy("window_start")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toSeq

      assert(got == want, s"stream $got != batch $want")
    } finally q.stop()
  }

  test("the estimate honors the rsd contract against true distincts") {
    import spark.implicits._
    val batchDf = (batch1 ++ batch2).toDF("sec", "user_id")
      .withColumn("t", timestamp_seconds(col("sec")))
    val est = EventsStream.distinctUsersApprox(batchDf)
      .orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toMap
    val exact = batchDf
      .groupBy(window(col("t"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toMap
    assert(est.keySet == exact.keySet)
    // tiny cardinalities sit in HLL++'s exact sparse regime, and 2% rsd
    // leaves no room for drift at n<=5 — the counts must match outright
    exact.foreach { case (w, n) =>
      assert(est(w) == n, s"window $w: estimate ${est(w)} vs exact $n")
    }
  }
}
