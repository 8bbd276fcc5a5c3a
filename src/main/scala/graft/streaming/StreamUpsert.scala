package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MERGE/upsert with tombstones — the stateful-streaming twin of
  * the batch `q_merge_upsert` operator: a changelog stream folds into one
  * state row per key, and a delete-marker event REMOVES the key (Spark's
  * declarative streaming aggregates can update state but never retract a
  * key, so this is genuinely `mapGroupsWithState` territory).
  *
  * State per key is the (latest_us, latest_event_id, type) triple — bytes per
  * key, keyed-store-partitioned, the only shape that survives an unbounded
  * changelog. Each micro-batch emits the key's CURRENT state (or an explicit
  * tombstone row) in Update mode; a downstream sink keyed on user_id applies
  * them as upserts/deletes — exactly the Kafka-compacted-topic /
  * Delta-CDF consumer contract.
  */
object StreamUpsert {

  /** One changelog record; `tombstone` marks a delete (here: 'error'). */
  final case class Change(user_id: Long, ts_us: Long, event_id: Long, event_type: String)

  /** Emitted per key per micro-batch: the post-merge state, or a tombstone
    * (`deleted = true`, state fields nulled-out semantics via sentinels).
    */
  final case class Upsert(user_id: Long, event_type: String, ts_us: Long, deleted: Boolean)

  final case class KeyState(ts_us: Long, event_id: Long, event_type: String)

  val Tombstone = "error"

  /** Pure per-key fold: the newest change (by ts, then event_id — the batch
    * operator's exact tiebreak) wins; a tombstone-typed winner deletes.
    * Unit-testable without a stream.
    *
    * A delete RETAINS state — a `KeyState` whose `event_type` is the
    * tombstone marker, carrying the delete's (ts_us, event_id). Removing the
    * key instead (the pre-round-10 form) loses the deletion's position in
    * the change order: an OLDER out-of-order change arriving in a later
    * micro-batch would compare against Long.MinValue and resurrect the
    * deleted key, diverging from the batch q_merge_upsert latest-wins
    * semantics. This is the Kafka-compacted-topic contract — tombstones are
    * retained (there: for delete.retention.ms; here: for the run — a
    * deployment that must bound state pairs this with a state TTL timeout
    * longer than its max expected disorder).
    */
  def advance(state: Option[KeyState], changes: Seq[Change])
      : (Option[KeyState], Option[Upsert]) = {
    if (changes.isEmpty) return (state, None)
    val newest = changes.maxBy(c => (c.ts_us, c.event_id))
    val incumbent = state.map(s => (s.ts_us, s.event_id)).getOrElse((Long.MinValue, Long.MinValue))
    if (Ordering[(Long, Long)].lteq((newest.ts_us, newest.event_id), incumbent)) (state, None)
    else {
      val ns = KeyState(newest.ts_us, newest.event_id, newest.event_type)
      (Some(ns),
        Some(Upsert(newest.user_id, ns.event_type, ns.ts_us,
          deleted = ns.event_type == Tombstone)))
    }
  }

  def upserts(changes: Dataset[Change]): Dataset[Upsert] = {
    implicit val upsertEnc = Encoders.product[Upsert]
    implicit val ksEnc = Encoders.product[KeyState]
    implicit val longEnc = Encoders.scalaLong
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyState, Upsert](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (_: Long, it: Iterator[Change], state: GroupState[KeyState]) =>
          val (ns, out) = advance(state.getOption, it.toSeq)
          ns.foreach(state.update)
          out.iterator
      }
  }
}
