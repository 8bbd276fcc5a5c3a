package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key EWMA with O(1) state — the live twin of the batch
  * `q_ewma` report (operators/Behavior.scala). The batch form re-derives the
  * decayed average from the trailing window of each event; the streaming
  * form carries the single recursive accumulator y ← α·x + (1−α)·y per key
  * across micro-batches — constant state per key forever, the property that
  * makes EWMA the monitoring smoother of choice at any scale (a state store
  * holding one double per user, not a window of events).
  *
  * α is pinned to 1/2 like the batch query: every update is an exact
  * dyadic-scaled add, so there is no libm and no summation-order
  * sensitivity inside one fold. Determinism is GIVEN IDENTICAL BATCHING
  * (or in-order arrival per key): [[advance]] sorts by ts only WITHIN a
  * micro-batch, so an event that arrives in a later batch than a
  * larger-ts sibling is folded after it — replaying the same events
  * with different batch boundaries can produce different doubles for
  * the rows after the inversion. The recursive accumulator cannot
  * retro-insert without keeping the event history that O(1) state
  * exists to avoid; late events needing exact placement belong to the
  * batch `q_ewma` form (or an upstream watermark + sort stage).
  */
object Ewma {

  /** One event on the wire: epoch-micros timestamp. */
  final case class Event(user_id: Long, ts_us: Long, value: Double)

  /** Carried state: the running average and how many events shaped it. */
  final case class EwmaState(last_us: Long, avg: Double, n: Long)

  /** One scored event out (Append mode — each input row emits exactly once). */
  final case class Scored(user_id: Long, ts_us: Long, value: Double,
                          ewma: Double, n_seen: Long)

  val Alpha = 0.5

  /** Fold a key's new events (any arrival order; processed in ts order) into
    * the running average. Pure — unit-testable without a stream.
    */
  def advance(state: Option[EwmaState], events: Seq[Event])
      : (Option[EwmaState], Seq[Scored]) = {
    val sorted = events.sortBy(e => (e.ts_us, e.value))
    var st = state
    val out = Seq.newBuilder[Scored]
    sorted.foreach { e =>
      val next = st match {
        case Some(s) => EwmaState(e.ts_us, Alpha * e.value + (1 - Alpha) * s.avg, s.n + 1)
        case None    => EwmaState(e.ts_us, e.value, 1)
      }
      st = Some(next)
      out += Scored(e.user_id, e.ts_us, e.value, next.avg, next.n)
    }
    (st, out.result())
  }

  def ewma(events: Dataset[Event]): Dataset[Scored] = {
    implicit val scoredEnc = Encoders.product[Scored]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, Scored](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_: Long, it: Iterator[Event], state: GroupState[EwmaState]) =>
          val (next, scored) = advance(state.getOption, it.toSeq)
          next match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          scored.iterator
      }(Encoders.product[EwmaState], scoredEnc)
  }
}
