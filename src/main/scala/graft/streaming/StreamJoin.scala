package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: purchase attribution to a preceding view.
  *
  * Both sides carry watermarks so the join state is bounded: a view can only
  * match purchases within the attribution window, after which its state is
  * dropped. This is the third streaming shape (after windowed agg and custom
  * state) — the one that needs state on BOTH inputs.
  */
object StreamJoin {

  /** Watermark delay DERIVED from the attribution window: the window length
    * plus a 1-hour late-arrival slack. A fixed delay shorter than the window
    * would evict a view's state while partners could still legally arrive,
    * silently emitting false orphans in the outer forms — so the delay must
    * track `windowSpec`, whatever the caller passes. Day/time intervals
    * only (a month has no fixed microsecond length to bound state by).
    */
  private[graft] def watermarkFor(windowSpec: String): String = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.safeStringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(windowSpec))
    require(iv != null && iv.months == 0,
      s"attribution window must be a day/time interval: $windowSpec")
    val seconds = iv.days * 86400L + iv.microseconds / 1000000L
    require(seconds > 0, s"attribution window must be positive: $windowSpec")
    s"${seconds + 3600L} seconds"
  }

  /** Join purchases to views of the same user where the purchase happens
    * within `windowSpec` (SQL interval, e.g. "INTERVAL 1 HOUR") after the
    * view. Inputs: views(user_id, vt), purchases(user_id, pt, value).
    * Both watermarks ride [[watermarkFor]] so state eviction always covers
    * the attribution window regardless of its length.
    */
  def attributePurchases(views: DataFrame, purchases: DataFrame,
                         windowSpec: String = "INTERVAL 1 HOUR",
                         joinType: String = "inner"): DataFrame = {
    val v = views
      .withColumnRenamed("user_id", "v_user")
      .withWatermark("vt", watermarkFor(windowSpec))
    val p = purchases
      .withColumnRenamed("user_id", "p_user")
      .withWatermark("pt", watermarkFor(windowSpec))
    v.join(p, expr(s"v_user = p_user AND pt >= vt AND pt <= vt + $windowSpec"), joinType)
      .select(col("v_user").as("user_id"), col("vt"), col("pt"), col("value"))
  }

  /** LEFT OUTER attribution: views that convert emit immediately; views that
    * DON'T convert emit a null-extended row — but only once the purchase
    * watermark has passed the view's whole attribution window (until then a
    * matching purchase could still arrive, so the engine must hold the
    * decision). The time-bound join condition is what makes the outer form
    * legal in streaming: it gives state eviction a horizon, and null
    * emission rides the same horizon — unmatched rows surface in the FIRST
    * micro-batch after their window closes, not at end-of-stream.
    */
  def attributionOutcome(views: DataFrame, purchases: DataFrame,
                         windowSpec: String = "INTERVAL 1 HOUR"): DataFrame =
    attributePurchases(views, purchases, windowSpec, joinType = "left_outer")

  /** FULL OUTER attribution ledger — both orphan kinds surface: views that
    * never converted (null purchase side, the left-outer case) AND
    * purchases with no preceding view (null view side — direct conversions,
    * the rows a marketing ledger must still account for). Each unmatched
    * row emits once the OTHER side's watermark has passed the window in
    * which a partner could still arrive — the same horizon that bounds the
    * join state. `user_id` coalesces across sides so orphans keep their
    * key.
    */
  def attributionLedger(views: DataFrame, purchases: DataFrame,
                        windowSpec: String = "INTERVAL 1 HOUR"): DataFrame = {
    val v = views
      .withColumnRenamed("user_id", "v_user")
      .withWatermark("vt", watermarkFor(windowSpec))
    val p = purchases
      .withColumnRenamed("user_id", "p_user")
      .withWatermark("pt", watermarkFor(windowSpec))
    v.join(p, expr(s"v_user = p_user AND pt >= vt AND pt <= vt + $windowSpec"), "full_outer")
      .select(coalesce(col("v_user"), col("p_user")).as("user_id"),
        col("vt"), col("pt"), col("value"))
  }
}
