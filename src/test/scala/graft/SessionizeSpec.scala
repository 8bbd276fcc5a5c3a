package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session, SessionState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionizeSpec extends SparkSpec {

  private val M = 60L * 1000 * 1000 // one minute in micros

  test("advance folds events into sessions (pure)") {
    val (open, closed) = Sessionize.advance(
      None,
      Seq(Event(1, 0, 1.0), Event(1, 5 * M, 2.0), Event(1, 100 * M, 3.0)),
      Sessionize.DefaultGapUs)
    assert(closed == Seq(Session(1, 0, 5 * M, 2, 3.0)))
    assert(open.contains(SessionState(100 * M, 100 * M, 1, 3.0)))
  }

  test("streaming sessionization emits closed sessions across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Sessionize.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // batch 1: one session for user 1, opened not closed
      ms.addData(Event(1, 0, 1.0), Event(1, 2 * M, 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0)
      // batch 2: event past the gap closes session 1
      ms.addData(Event(1, 90 * M, 5.0))
      q.processAllAvailable()
      val got = spark.table("sessions").as[Session].collect().toSeq
      assert(got == Seq(Session(1, 0, 2 * M, 2, 2.0)))
    } finally q.stop()
  }
}
