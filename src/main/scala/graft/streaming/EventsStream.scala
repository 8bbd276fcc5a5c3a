package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface over the events stream.
  *
  * The same tumbling-window aggregate as the batch query `q_time_window`
  * (operators/Analytics.scala), with a watermark for state cleanup — the
  * standard batch/streaming twin pair. Input must expose `t: timestamp`,
  * `event_type`, `value`; conversion from raw epoch-nanos happens at the edge
  * (see SparkEntry.tune notes).
  */
object EventsStream {

  /** One watermarked windowed aggregate body serves both window shapes —
    * the decimal-sum cast, watermark bound, and output projection must stay
    * identical for both parity specs, so they live once.
    */
  private def windowedAgg(events: DataFrame,
                          win: org.apache.spark.sql.Column): DataFrame =
    events
      .withWatermark("t", "2 hours")
      .groupBy(win, col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("value_sum"))

  /** Hourly tumbling-window counts + decimal-stable sums per event_type.
    * Works on both a batch DataFrame and a streaming one (watermark is a
    * no-op in batch).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    windowedAgg(events, window(col("t"), "1 hour"))

  /** HOPPING-window twin of the oracle-checked batch `q_hop_window`: 1-hour
    * windows sliding every 15 minutes, so each event feeds exactly 4 window
    * states. Same watermark-bounded state discipline as [[hourlyAgg]] — the
    * overlap multiplies live state ×(length/slide), not unboundedly.
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    windowedAgg(events, window(col("t"), "1 hour", "15 minutes"))

  /** SESSION-window twin of the oracle-checked batch `q_session_window`:
    * per-user 30-minute-gap sessions through Spark's own gap-merge operator,
    * which maintains MERGEABLE session state under a watermark in streaming
    * (late events extend or fuse sessions until the watermark closes them).
    * Identical aggregate body and decimal-sum cast as the batch query, so
    * the parity spec compares exact micros, not a reformulation.
    */
  /** STREAM-STATIC enrichment — the production pattern of joining a live
    * event stream against a slowly-changing dimension table: the static side
    * is explicitly broadcast, so each micro-batch is a map-side hash probe
    * with NO stream shuffle and no state store (an inner join against a
    * static side needs neither watermark nor buffering). Works identically
    * on a batch DataFrame, which is what the parity spec compares against.
    */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("c_nationkey"), col("c_mktsegment"))

  /** STREAM-STATIC POINT-IN-TIME enrichment — the temporal upgrade of
    * [[enriched]]: each streamed fact picks the SCD2 dimension version whose
    * validity interval contains the fact's time (state-at-event-time with no
    * leakage). The dimension broadcasts, so every micro-batch is a row-local
    * probe — no stream shuffle, no state store, no watermark: against a
    * static side at most one version can match because SCD2 intervals tile
    * each key's timeline, and facts before a key's first version keep NULL
    * state (LEFT). The batch `q_pit_join` computes the same relation through
    * the native as-of merge; StreamBatchParitySpec pins the two shapes
    * row-equal. Broadcast is the right posture while the compacted dimension
    * fits an executor (runs-per-key, far smaller than the log); a
    * partitioned stream-static join is the fallback when it does not.
    */
  def pitEnriched(facts: DataFrame, dim: DataFrame): DataFrame =
    facts.join(broadcast(dim),
        facts("user_id") === dim("d_uid") &&
          facts("tus") >= dim("valid_from") &&
          (dim("valid_to").isNull || facts("tus") < dim("valid_to")),
        "left_outer")
      .select(facts("user_id"), col("event_id"), col("tus"),
        col("state"), col("valid_from").as("state_since"))

  /** Streaming CDC COMPACTION — the live materialized "latest state per
    * key" table: the SAME partial-aggregable argmax body as the batch
    * `q_latest_per_key` (operators/Analytics.latestState), run as a
    * streaming aggregate. State is ONE small row per key — the compacted
    * table itself — updated map-side per micro-batch; no watermark is
    * needed because the state never grows past the key cardinality.
    */
  def latestState(events: DataFrame): DataFrame =
    graft.operators.Analytics.latestState(events)

  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("t", "2 hours")
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("value_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))

  /** STREAMING approximate distinct users per hourly window — the live
    * audience/reach counter, and the sketch counterpart of the exact
    * streaming dedup (whose state is one row PER KEY — here the state is a
    * fixed-size HLL++ register array PER WINDOW, regardless of how many
    * users arrive; ~KB per window at rsd=0.02 vs GBs of exact keys at
    * 100 TB stream rates). Correctness property the parity spec pins: HLL++
    * registers depend only on the SET of hashed inputs — the merge is
    * commutative and idempotent — so micro-batch arrival order and batch
    * boundaries cannot change the final registers, and the streaming
    * estimate equals the batch twin EXACTLY, not approximately.
    */
  def distinctUsersApprox(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events
      .withWatermark("t", "2 hours")
      .groupBy(window(col("t"), "1 hour"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("window.start").as("window_start"), col("approx_users"))
}
