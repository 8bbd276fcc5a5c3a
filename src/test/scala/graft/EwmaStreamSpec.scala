package graft

import graft.streaming.Ewma
import graft.streaming.Ewma.{Event, EwmaState, Scored}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class EwmaStreamSpec extends SparkSpec {

  test("advance folds the recursive average in ts order (pure)") {
    val (st, out) = Ewma.advance(None,
      // delivered out of order on purpose — advance must process by ts
      Seq(Event(1, 30, 4.0), Event(1, 10, 8.0), Event(1, 20, 0.0)))
    // ts=10: 8.0; ts=20: .5*0 + .5*8 = 4.0; ts=30: .5*4 + .5*4 = 4.0
    assert(out.map(_.ewma) == Seq(8.0, 4.0, 4.0))
    assert(st.contains(EwmaState(30, 4.0, 3)))
  }

  test("state carries the average across micro-batches per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Ewma.ewma(ms.toDS())
      .writeStream.format("memory").queryName("ewma_out").outputMode("append").start()
    try {
      ms.addData(Event(1, 10, 8.0), Event(2, 10, 100.0))
      q.processAllAvailable()
      ms.addData(Event(1, 20, 0.0)) // continues from user 1's avg of 8.0
      q.processAllAvailable()
      val got = spark.table("ewma_out").as[Scored].collect()
        .map(s => (s.user_id, s.ts_us) -> (s.ewma, s.n_seen)).toMap
      assert(got((1L, 10L)) == (8.0, 1L))
      assert(got((2L, 10L)) == (100.0, 1L))
      // the cross-batch recursion: .5*0 + .5*8 — state survived the batch gap
      assert(got((1L, 20L)) == (4.0, 2L))
      // append contract: every input row scored exactly once
      assert(got.size == 3)
    } finally q.stop()
  }

  test("replaying the same events reproduces identical doubles") {
    val events = (1 to 50).map(i => Event(7, i.toLong, math.sin(i) * 10))
    val a = Ewma.advance(None, events)._2.map(_.ewma)
    val b = Ewma.advance(None, events)._2.map(_.ewma)
    assert(a == b)
    // n_seen counts monotonically
    assert(Ewma.advance(None, events)._2.map(_.n_seen) == (1L to 50L))
  }
}
