package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamDedupSpec extends SparkSpec {

  test("watermarked streaming dedup suppresses in-horizon duplicates, keeps state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ms = MemoryStream[(Long, Long, String)] // (doc_id, epoch-sec, text)
    val stream = ms.toDF().toDF("doc_id", "sec", "text")
      .withColumn("t", timestamp_seconds(col("sec")))
    val q = StreamDedup.dedup(stream, horizon = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // batch 1: two distinct texts + one duplicate (same text, different case)
      ms.addData((1L, 1000L, "The Quick Fox"), (2L, 1010L, "lazy dog"),
        (3L, 1020L, "the quick fox"))
      q.processAllAvailable()
      // batch 2: duplicate within horizon dropped, fresh text kept
      ms.addData((4L, 1100L, "LAZY DOG"), (5L, 1110L, "new document"))
      q.processAllAvailable()

      val out = spark.table("dedup_out").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out.contains(1L) && out.contains(2L) && out.contains(5L))
      assert(!out.contains(3L), "same-normalized-text duplicate in batch 1 must be dropped")
      assert(!out.contains(4L), "in-horizon duplicate across batches must be dropped")

      // state is keyed per digest and bounded by the watermark
      val progress = q.lastProgress
      assert(progress.stateOperators.nonEmpty)
    } finally q.stop()
  }
}
