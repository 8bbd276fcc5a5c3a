package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit state — the custom-state twin of the
  * batch `q_sessionize` window query.
  *
  * State per user is the (at most one) open session; arriving events either
  * extend it or close it and open a new one. Closed sessions are emitted
  * downstream (Append mode). This is the `flatMapGroupsWithState` shape the
  * brief calls out for operators Spark's declarative surface can't express.
  */
object Sessionize {

  /** One event on the wire: epoch-micros timestamp. */
  final case class Event(user_id: Long, ts_us: Long, value: Double)

  /** Open-session state carried between micro-batches. */
  final case class SessionState(start_us: Long, last_us: Long, n: Long, value_sum: Double)

  /** A closed session. */
  final case class Session(user_id: Long, session_start_us: Long, session_end_us: Long,
                           n_events: Long, value_sum: Double)

  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000 // 30 min

  /** Fold a user's new events (any order) into the open session, emitting the
    * sessions that closed. Pure function — unit-testable without a stream.
    */
  def advance(state: Option[SessionState], events: Seq[Event], gapUs: Long)
      : (Option[SessionState], Seq[Session]) = {
    val sorted = events.sortBy(_.ts_us)
    var open = state
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.last_us <= gapUs =>
          open = Some(s.copy(last_us = math.max(s.last_us, e.ts_us), n = s.n + 1,
            value_sum = s.value_sum + e.value))
        case Some(s) =>
          closed += Session(e.user_id, s.start_us, s.last_us, s.n, s.value_sum)
          open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    (open, closed.result())
  }

  /** Streaming operator: sessions close when a later event arrives past the
    * gap. (A timeout-based close of idle sessions would use
    * ProcessingTimeTimeout — but with it, MicroBatchExecution schedules
    * continuous timeout-check batches, so `processAllAvailable` never settles;
    * for a pipeline that needs idle flush, run with a processing-time trigger
    * and accept the steady batch cadence.)
    */
  def sessionize(events: Dataset[Event], gapUs: Long = DefaultGapUs): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val (open, closed) = advance(state.getOption, it.toSeq, gapUs)
          open match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          closed.iterator
      }(Encoders.product[SessionState], sessionEnc)
  }
}
