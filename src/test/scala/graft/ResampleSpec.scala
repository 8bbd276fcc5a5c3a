package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** Forward-fill semantics pinned on a hand-computable series: hourly grid
  * from the hour-floor of the first event, each grid point carrying the most
  * recent observation at-or-before it, NULL before the first event.
  */
class ResampleSpec extends SparkSpec {

  test("synthetic series forward-fills exactly as computed by hand") {
    import spark.implicits._
    val H = 3600000000L // one hour in micros
    // events for one user at 00:10, 02:30, 02:45 (values 1, 2, 3)
    val ev = Seq(
      (7L, H / 6, 101L, 1.0),
      (7L, 2 * H + H / 2, 102L, 2.0),
      (7L, 2 * H + H * 3 / 4, 103L, 3.0))
      .toDF("e_uid", "e_tus", "event_id", "value")
    val grid = ev.groupBy(col("e_uid").as("user_id"))
      .agg(min(col("e_tus")).as("mn"), max(col("e_tus")).as("mx"))
      .select(col("user_id"), explode(expr(
        "sequence(mn - mn % 3600000000, mx, 3600000000)")).as("grid_tus"))
    val out = AsOfJoin(grid, ev, "user_id", "e_uid", "grid_tus", "e_tus",
        rightTiebreak = Seq("event_id"))
      .select(col("grid_tus"), col("value"))
      .orderBy("grid_tus").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    // grid: 00:00 (before first event → NULL), 01:00 (last = v1),
    // 02:00 (still v1; the 02:30/02:45 events are in the future)
    assert(out.toSeq == Seq(
      (0L, None),
      (H, Some(1.0)),
      (2 * H, Some(1.0))))
  }
}
