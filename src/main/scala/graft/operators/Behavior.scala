package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Behavioral analytics over the events stream: cohort retention, sliding
  * time-range aggregates, and statistical anomaly flagging. Each query is a
  * single-shuffle-per-key plan (window partitioned by user, or one grouped
  * aggregate) — no global windows, no inequality joins, so every shape holds
  * at cluster scale. Reference scope: the reference's per-entity derived
  * metrics (process_cycle_networks.py) generalized to event streams.
  */
object Behavior {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))

  /** Row-local boundary-exclusive bin assignment against a broadcast cut
    * array: bin = 1 + |{k : x > bs[k]}|, unrolled to nCuts codegen'd
    * comparisons. The ONE definition of the boundary-model semantics
    * (strict `>`, pre-rounded cuts) shared by [[rfm]], [[gini]], [[lorenz]]
    * and the BoundaryModelSpec acceptance harness — so the spec certifies
    * exactly the production expression, not a copy that can drift.
    */
  def boundaryBin(x: org.apache.spark.sql.Column, bs: org.apache.spark.sql.Column,
                  nCuts: Int): org.apache.spark.sql.Column =
    (lit(1) +: (0 until nCuts).map(k =>
      when(x > bs.getItem(k), 1).otherwise(0))).reduce(_ + _)

  /** EXACT INTEGER rank-based quantile boundary model over an INTEGER
    * metric — the all-BIGINT replacement for `percentile`-derived cuts in
    * [[rfm]] and [[lorenz]]. The round-11 advisory's point: when the bin IS
    * the output, cross-engine equality must not rest on two engines
    * producing bit-identical interpolated doubles plus agreeing 4/6-dp
    * rounds at half-boundaries (the failure class the EWMA rewrite
    * eliminated). Here the type-7 cut at q = j/m over n sorted values
    * s₀ ≤ … ≤ s₍ₙ₋₁₎ is h = (n−1)·j/m, k = ⌊h⌋, and the boundary SCALED BY
    * m is the exact BIGINT  cutm_j = m·s_k + ((n−1)·j mod m)·(s_{k+1} − s_k).
    * Assignment compares m·x > cutm_j — pure integer comparisons, no
    * floating point anywhere, so the engines agree by construction.
    *
    * Order statistics s_k/s_{k+1} come from the [[giniOf]] TWO-LEVEL
    * BUCKETED RANK, never a global sort: ties collapse to the distinct-value
    * grain, an `approx_percentile` model (bucketing ONLY — exactness is
    * unaffected by its error) splits that grain into 16 rank-offset
    * buckets, within-bucket windows assign each distinct value its global
    * rank RANGE, and the ≤ 2(m−1) needed positions join against those
    * ranges as a broadcast nested loop. Returns one row, `bs` =
    * array<long> of cutm_j ordered by j.
    */
  private[graft] def exactCutsM(gx: DataFrame, m: Int): DataFrame =
    exactCutsByMetric(gx.withColumn("metric", lit("_")), m).select(col("bs"))

  /** [[exactCutsM]] for SEVERAL metrics in one pass over a (metric, x)
    * relation — returns one (metric, bs) row per metric. [[rfm]] previously
    * ran the single-metric form three times (6 eager localCheckpoints = 6
    * blocking stage floors on a sub-second input); the metric key folds the
    * three models into the same two checkpoints, every aggregate/window/
    * join just gaining `metric` in its key. All model relations stay
    * bounded (≤ 16·metrics bucket rows, ≤ 2(m−1)·metrics positions), so
    * every model join still broadcasts.
    */
  private[graft] def exactCutsByMetric(gxm: DataFrame, m: Int): DataFrame = {
    val tied = gxm.groupBy(col("metric"), col("x")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds per-bucket counts AND within-bucket ranks
    val b15 = (1 to 15).map(k => s"${k / 16.0}D").mkString("array(", ", ", ")")
    val bcuts = gxm.groupBy(col("metric"))
      .agg(expr(s"approx_percentile(CAST(x AS DOUBLE), $b15)").as("bs15"))
    val a = tied.join(broadcast(bcuts), Seq("metric"))
      .select(col("metric"), col("x"), col("c"),
        boundaryBin(col("x").cast("double"), col("bs15"), 15).as("bkt"))
      .localCheckpoint()
    // level 1: bucket counts → exclusive offsets via a broadcast non-equi
    // self-join over the bounded ≤16-row-per-metric grain (no global window)
    val per = a.groupBy(col("metric"), col("bkt")).agg(sum(col("c")).as("cnt"))
    val off = per
      .join(broadcast(per.select(col("metric").as("m2"), col("bkt").as("b2"),
          col("cnt").as("c2"))),
        col("m2") === col("metric") && col("b2") < col("bkt"), "left")
      .groupBy(col("metric"), col("bkt"))
      .agg(coalesce(sum(col("c2")), lit(0L)).as("off"))
    // level 2: within-bucket exclusive cumulative count → each distinct
    // value's global 0-indexed rank range [rlo, rhi]
    val wIn = Window.partitionBy("metric", "bkt").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = a.withColumn("cb", coalesce(sum(col("c")).over(wIn), lit(0L)))
      .join(broadcast(off), Seq("metric", "bkt"))
      .select(col("metric"), col("x"), (col("off") + col("cb")).as("rlo"),
        (col("off") + col("cb") + col("c") - 1).as("rhi"))
    // the ≤ 2(m−1) order-statistic positions per metric, derived from n
    // without any driver-side collect
    val nDf = per.groupBy(col("metric")).agg(sum(col("cnt")).as("n"))
    val pos = gxm.sparkSession.range(1, m.toLong).toDF("j")
      .crossJoin(broadcast(nDf))
      .select(col("metric"), col("j"), expr(s"(n - 1) * j div $m").as("k"),
        expr(s"(n - 1) * j % $m").as("r"), (col("n") - 1).as("n1"))
      .select(col("metric").as("pm"), col("j"), col("k"), col("r"),
        explode(array(col("k"), least(col("k") + 1, col("n1")))).as("p"))
    val sv = ranked.join(broadcast(pos),
        col("pm") === col("metric") &&
          col("p") >= col("rlo") && col("p") <= col("rhi"))
      .groupBy(col("metric"), col("j"), col("k"), col("r"))
      .agg(max(when(col("p") === col("k"), col("x"))).as("sk"),
        max(when(col("p") =!= col("k"), col("x"))).as("sk1"))
    sv.select(col("metric"), col("j"), (lit(m.toLong) * col("sk")
        + col("r") * (coalesce(col("sk1"), col("sk")) - col("sk"))).as("cutm"))
      .groupBy(col("metric"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cutm))), s -> s.cutm)")
        .as("bs"))
  }

  /** Cohort retention matrix: users bucketed by their first-active week, then
    * distinct-user counts per (cohort week, active week). Plan: one shuffle on
    * user_id for the min-week window, then a standard two-phase distinct
    * aggregate — both partitioned, both skew-free (cohort keys are weeks).
    * `ts` is epoch nanos (SparkEntry.tune).
    */
  val cohortRetention = Q(
    "q_cohort_retention",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("week", timestamp_micros(expr("ts DIV 1000"))).as("wk"))
      val w = Window.partitionBy("user_id")
      ev.withColumn("cohort_week", min(col("wk")).over(w))
        .groupBy(col("cohort_week"), col("wk").as("active_week"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .withColumn("week_no", expr("datediff(active_week, cohort_week) DIV 7"))
        .select("cohort_week", "active_week", "week_no", "n_users")
        .orderBy("cohort_week", "active_week")
    },
    """WITH ev AS (
      |  SELECT user_id, date_trunc('week', ts) AS wk FROM events),
      |coh AS (
      |  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_week FROM ev)
      |SELECT cohort_week, wk AS active_week,
      |       CAST(datediff('day', cohort_week, wk) AS BIGINT) // 7 AS week_no,
      |       count(DISTINCT user_id) AS n_users
      |FROM coh GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin
  )

  /** Per-user 7-day sliding average of event value: a RANGE window over epoch
    * seconds — one shuffle on user_id, then a linear frame scan. The running
    * sum is DECIMAL so the result is order-independent (a double running sum
    * would depend on the frame's internal add order); the average is derived
    * from (exact sum, count) at the end.
    */
  val movingAvg = Q(
    "q_moving_avg",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("ts DIV 1000000000").as("tsec"))
      val w = Window.partitionBy("user_id").orderBy("tsec")
        .rangeBetween(-604800L, Window.currentRow)
      ev.select(col("event_id"), col("user_id"), col("tsec"),
          sum(dec(col("value"))).over(w).as("sum_dec"),
          count(lit(1)).over(w).as("n_7d"))
        .select(col("event_id"), col("user_id"), col("tsec"), col("n_7d"),
          (col("sum_dec").cast("double") / col("n_7d")).as("avg_7d"))
        .orderBy("event_id")
    },
    """WITH ev AS (
      |  SELECT event_id, user_id, value, epoch_ns(ts) // 1000000000 AS tsec FROM events),
      |w AS (
      |  SELECT event_id, user_id, tsec,
      |    sum(CAST(value AS DECIMAL(18,6))) OVER
      |      (PARTITION BY user_id ORDER BY tsec RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS sum_dec,
      |    count(*) OVER
      |      (PARTITION BY user_id ORDER BY tsec RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS n_7d
      |  FROM ev)
      |SELECT event_id, user_id, tsec, n_7d, CAST(sum_dec AS DOUBLE) / n_7d AS avg_7d
      |FROM w ORDER BY event_id""".stripMargin
  )

  /** Per-type (n, mean, std) model from the exact decimal moment sums —
    * trained batch, applied batch or streaming. The variance is clamped to 0
    * with greatest() before sqrt on BOTH engines: a zero-variance type can
    * compute a few ulps negative in doubles, and while Spark's sqrt would
    * quietly return NaN, DuckDB's RAISES — the clamp keeps the engines
    * row-identical (std = 0 → filtered by the scorer) instead of one erroring.
    */
  def typeStats(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(dec(col("value"))).as("s1"),
      sum(dec(col("value")) * dec(col("value"))).as("s2"))
      .select(col("event_type"), col("n"),
        (col("s1").cast("double") / col("n")).as("mean"),
        sqrt(greatest(col("s2").cast("double") / col("n") -
          (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n")),
          lit(0.0))).as("std"))

  /** The stateless scorer: broadcast model join + rounded z + threshold.
    * Works unchanged on a batch relation or a structured stream (stream ⋈
    * static broadcast, no watermark, no state store) — StreamAnomalySpec
    * pins the parity.
    */
  def scoreAnomalies(ev: org.apache.spark.sql.DataFrame,
                     model: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.join(broadcast(model), Seq("event_type"))
      .withColumn("z", round((col("value") - col("mean")) / col("std"), 6))
      .filter(col("std") > 0 && abs(col("z")) > lit(2.0))
      .select("event_id", "event_type", "value", "z")

  /** Z-score anomaly flagging: per-event-type mean/stddev from exact decimal
    * moment sums (sum, sum-of-squares — order-independent), then each event
    * scored against its type's distribution. The per-type model is a handful
    * of rows → broadcast joined back to the stream; the fact table is never
    * shuffled. z is rounded to 6 dp on both sides (the engines' decimal→double
    * casts can differ in the last ulp) and the threshold filter runs on the
    * ROUNDED score so row membership agrees at the boundary.
    */
  val anomalyZscore = Q(
    "q_anomaly_zscore",
    (s, d) => {
      val ev = Tables.events(s, d)
      scoreAnomalies(ev, typeStats(ev)).orderBy("event_id")
    },
    """WITH stats AS (
      |  SELECT event_type, count(*) AS n,
      |         sum(CAST(value AS DECIMAL(18,6))) AS s1,
      |         sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT event_type,
      |         CAST(s1 AS DOUBLE) / n AS mean,
      |         sqrt(greatest(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 0.0)) AS std
      |  FROM stats)
      |SELECT event_id, e.event_type, value, round((value - mean) / std, 6) AS z
      |FROM events e JOIN m ON e.event_type = m.event_type
      |WHERE std > 0 AND abs(round((value - mean) / std, 6)) > 2.0
      |ORDER BY event_id""".stripMargin
  )

  /** PER-KEY TREND — closed-form OLS slope/intercept of value over time for
    * every user, the drift/trend detector behind engagement and metric-
    * regression monitors. The fit is pure MOMENTS: one hash aggregate
    * computes (n, Σx, Σy, Σx², Σxy) per key with map-side combine — exact
    * DECIMAL products so partial-aggregation order cannot move a bit — and
    * the slope/intercept algebra is a row-local projection on the tiny
    * per-key result. No window, no sort, no iteration: the whole query is
    * one shuffle of 9-number rows, the same shape at any scale. Time is
    * re-based to hours since 2024-01-01 — an offset INSIDE the data's range,
    * so x is O(activity span) and the Gram denominator n·Σx² − (Σx)² loses
    * only ~1 digit to cancellation (an epoch far outside the range made x
    * offset-dominated and amplified the engines' 1-ulp decimal→double cast
    * disagreement on 20+-digit moments into the 6th decimal — measured, the
    * round-8 lesson); with hour-scale x the moments stay ≤ 20 significant
    * digits and cast noise stays at 1e-16 relative. The oracle's product
    * casts are DECIMAL(19,6) — int128 storage — because DuckDB multiplies
    * int64-backed DECIMAL(18) pairs in int64 and overflows; zero-variance
    * keys (single event or identical timestamps) yield NULL fits via the
    * shared denominator guard, mirrored in the oracle's CASE.
    */
  val trend = Q(
    "q_trend",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"),
        round((expr("ts DIV 1000000000") - lit(1704067200L)) / 3600.0, 6).as("x"),
        col("value").as("y"))
      val m = ev.groupBy("user_id").agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("x")) * dec(col("x"))).cast("double").as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).cast("double").as("sxy"))
      val denom = col("n") * col("sxx") - col("sx") * col("sx")
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / denom
      m.select(
          col("user_id"), col("n").cast("long").as("n_events"),
          round(when(denom === 0, lit(null)).otherwise(slope), 6).as("slope"),
          round(when(denom === 0, lit(null))
            .otherwise((col("sy") - slope * col("sx")) / col("n")), 6).as("intercept"))
        .orderBy("user_id")
    },
    """WITH ev AS (
      |  SELECT user_id,
      |         round((epoch_ns(ts) // 1000000000 - 1704067200) / 3600.0, 6) AS x,
      |         value AS y
      |  FROM events),
      |m AS (
      |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(CAST(sum(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(CAST(y AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM ev GROUP BY 1)
      |SELECT user_id, CAST(n AS BIGINT) AS n_events,
      |  round(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |             ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
      |  round(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |             ELSE (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
      |        END, 6) AS intercept
      |FROM m ORDER BY user_id""".stripMargin
  )

  /** DISTRIBUTED PREFIX SUM — a global running total in event-time order,
    * the operator behind balance ledgers, cumulative-traffic curves, and
    * monotone-counter backfills. The oracle states the textbook global
    * window (`SUM(...) OVER (ORDER BY k)`) — a single-task, single-pass scan
    * no cluster engine should execute. The engine runs the classic TWO-LEVEL
    * SCAN instead: (1) per-hour-bucket exact-decimal sums — one small
    * aggregate; (2) exclusive per-bucket offsets accumulated driver-side
    * over that bucket relation ("collect only the model": the offset table
    * is one row per hour, bounded by time range ÷ granularity, never by
    * data volume — the BPE/IVF/classifier contract); (3) offsets broadcast
    * back, running sum WITHIN each bucket (a window partitioned by bucket —
    * ~n/buckets rows per partition, evenly spread), plus the bucket's
    * offset. Every arithmetic step is exact DECIMAL until the final
    * cast+round, so the distributed scan equals the oracle's sequential one
    * bit for bit. ContractSpec's no-global-window gate passes structurally:
    * the only Window partitions on the data-dependent bucket key.
    */
  /** The two-level-scan body, reusable on any relation exposing
    * (event_id, tus, value); see the Q's doc for the plan argument.
    */
  def prefixSum(ev0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // numeric-pair window order == the oracle's zero-padded printf key
    // (non-negative, fixed width) without formatting a string per row
    val ev = ev0.select(
      col("event_id"), col("tus"), col("value"),
      expr("tus DIV 3600000000").as("b"))
    val bsums = ev.groupBy(col("b")).agg(sum(dec(col("value"))).as("bs"))
      .orderBy("b").collect()
    var acc = java.math.BigDecimal.ZERO
    val offsets = bsums.map { r =>
      val o = acc; acc = acc.add(r.getDecimal(1)); (r.getLong(0), o)
    }.toSeq
    val s = ev0.sparkSession
    import s.implicits._
    val off = offsets.toDF("b", "off")
      .select(col("b"), col("off").cast(DecimalType(28, 6)).as("off"))
    val w = Window.partitionBy("b").orderBy("tus", "event_id")
    ev.join(broadcast(off), Seq("b"))
      .withColumn("cum", sum(dec(col("value"))).over(w))
      .select(col("event_id"), col("tus"), col("value"),
        round((col("off") + col("cum")).cast("double"), 6).as("running_total"))
      .orderBy("tus", "event_id")
  }

  val runningTotal = Q(
    "q_running_total",
    (s, d) => prefixSum(Tables.events(s, d).select(
      col("event_id"), expr("ts DIV 1000").as("tus"), col("value"))),
    """WITH ev AS (
      |  SELECT event_id, epoch_ns(ts) // 1000 AS tus, value,
      |         printf('%020d-%020d', epoch_ns(ts) // 1000, event_id) AS k
      |  FROM events)
      |SELECT event_id, tus, value,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6)))
      |               OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6)
      |    AS running_total
      |FROM ev ORDER BY tus, event_id""".stripMargin
  )

  /** SEQUENCE GAP DETECTION — the data-quality REPORT counterpart to
    * `q_resample`'s forward-fill: instead of repairing missing periods, name
    * them. Per key, the distinct active hours collapse to one row per hour
    * (row-local hour truncation + one distinct aggregate), and a lag window
    * over that ALREADY-REDUCED relation emits a row per gap (prev+1 ..
    * hr−1). The window runs over hours-per-user — bounded by the calendar,
    * not the event volume — so the plan's wide work is just the distinct's
    * one shuffle; pure integer hour indices end to end, nothing to round.
    */
  val gaps = Q(
    "q_gaps",
    (s, d) => {
      val hrs = Tables.events(s, d)
        .select(col("user_id"), expr("ts DIV 1000 DIV 3600000000").as("hr"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("hr")
      hrs.withColumn("prev", lag(col("hr"), 1).over(w))
        .filter(col("prev").isNotNull && col("hr") - col("prev") > 1)
        .select(col("user_id"), (col("prev") + 1).as("gap_start_hr"),
          (col("hr") - 1).as("gap_end_hr"), (col("hr") - col("prev") - 1).as("gap_hours"))
        .orderBy("user_id", "gap_start_hr")
    },
    """WITH hrs AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 3600000000 AS hr
      |  FROM events),
      |lagged AS (
      |  SELECT user_id, hr,
      |         lag(hr) OVER (PARTITION BY user_id ORDER BY hr) AS prev
      |  FROM hrs)
      |SELECT user_id, prev + 1 AS gap_start_hr, hr - 1 AS gap_end_hr,
      |       hr - prev - 1 AS gap_hours
      |FROM lagged WHERE prev IS NOT NULL AND hr - prev > 1
      |ORDER BY user_id, gap_start_hr""".stripMargin
  )

  /** Rolling 7-day MEDIAN per user (RANGE frame) — the robust counterpart to
    * q_moving_avg's mean: medians shrug off the value spikes that drag a
    * mean, which is why monitoring pipelines prefer them. Same scale shape
    * as the moving average (one shuffle on user_id, linear frame walk), but
    * the aggregate is the exact interpolated percentile over the frame —
    * order-insensitive by construction (a multiset statistic), so no
    * decimal-sum contract is needed; the interpolation result is rounded to
    * 6 dp on both engines. At 100 TB grain the frame percentile recomputes
    * per row — the documented trade for exactness; an approx-sketch frame
    * (22h machinery) slots into the same window when that is acceptable.
    * Event stream thinned by the deterministic user sample so the fixture
    * keeps multi-row frames without 60k output rows.
    */
  val rollingMedian = Q(
    "q_rolling_median",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id") % 7 === 0)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("ts DIV 1000000000").as("tsec"))
      val w = Window.partitionBy("user_id").orderBy("tsec")
        .rangeBetween(-604800L, Window.currentRow)
      ev.select(col("event_id"), col("user_id"), col("tsec"),
          round(expr("percentile(value, 0.5)").over(w), 6).as("med_7d"))
        .orderBy("event_id")
    },
    """WITH ev AS (
      |  SELECT event_id, user_id, value, epoch_ns(ts) // 1000000000 AS tsec
      |  FROM events WHERE user_id % 7 = 0),
      |w AS (
      |  SELECT event_id, user_id, tsec,
      |    quantile_cont(value, 0.5) OVER
      |      (PARTITION BY user_id ORDER BY tsec RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS med
      |  FROM ev)
      |SELECT event_id, user_id, tsec, round(med, 6) AS med_7d
      |FROM w ORDER BY event_id""".stripMargin
  )

  /** Per-type PEARSON CORRELATION between event value and time-of-day — the
    * "is this metric diurnal?" screen. Same exact-decimal moment discipline
    * as q_trend (one hash aggregate of 6 numbers per group, map-side
    * combine, corpus never shuffled at row grain), extended with Σy²; the
    * correlation algebra runs on the tiny per-group result with IDENTICAL
    * association on both engines, sqrt of a clamped non-negative product
    * (zero-variance groups → NULL through the shared guard, like q_trend's
    * denominator). Built-in corr() is deliberately NOT used on either side:
    * its streaming co-moment updates are summation-order-dependent, the
    * exact failure mode the decimal-moments pattern exists to remove.
    */
  val corr_ = Q(
    "q_corr",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_type"),
        round((expr("ts DIV 1000000000") % 86400) / 3600.0, 6).as("x"),
        col("value").as("y"))
      val m = ev.groupBy("event_type").agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("x")) * dec(col("x"))).cast("double").as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).cast("double").as("syy"),
        sum(dec(col("x")) * dec(col("y"))).cast("double").as("sxy"))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      val r = (col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt(greatest(vx * vy, lit(0.0)))
      m.select(col("event_type"), col("n").cast("long").as("n_events"),
          round(when(vx === 0 || vy === 0, lit(null)).otherwise(r), 6).as("corr"))
        .orderBy("event_type")
    },
    """WITH ev AS (
      |  SELECT event_type,
      |         round((epoch_ns(ts) // 1000000000 % 86400) / 3600.0, 6) AS x,
      |         value AS y
      |  FROM events),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(CAST(sum(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(CAST(y AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(sum(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM ev GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_events,
      |  round(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      |             ELSE (n * sxy - sx * sy) /
      |                  sqrt(greatest((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0))
      |        END, 6) AS corr
      |FROM m ORDER BY event_type""".stripMargin
  )

  /** EXPONENTIALLY-WEIGHTED MOVING AVERAGE per user over the trailing 10
    * events (pandas `ewm` with a hard truncation) — the decay-smoothed
    * counterpart of [[movingAvg]]'s flat window: recent events dominate,
    * history fades geometrically. The whole statistic is PURE INTEGER
    * arithmetic end to end, which is what makes it hash-comparable across
    * engines where a naive EWMA is not:
    *  - values are exact cents (the generator writes 2-dp prices), so
    *    v100 = round(value·100) recovers the integer on both engines;
    *  - decay 1/2 with a k ≤ 9 truncation means every weight scales to the
    *    integer 2^(9−k) — the weighted sum N = Σ v100·2^(9−k) and weight
    *    sum D = Σ 2^(9−k) are exact BIGINTs;
    *  - the 6-dp result is the sign-correct half-away-from-zero integer
    *    division E = (2·N·10⁴ + sign(N)·D) div (2·D), and E/10⁶ is one
    *    exact double conversion + one IEEE division — bit-identical
    *    everywhere. The sign term matters: Spark's `div` AND DuckDB's
    *    integer `//` both truncate toward zero (measured: -7//2 = -3 in
    *    DuckDB 1.0, not the floored -4), so a bare `+D` bias would turn
    *    half-up into half-down for negative numerators. The generator
    *    currently writes only non-negative cents, but the statistic no
    *    longer leans on that invariant — refund/adjustment rows with
    *    negative values round identically on both engines.
    * (The previous DECIMAL(28,9) formulation rounded each double term to
    * 9 dp first, and at sf0.1 one term landed on the shortest-repr
    * half-boundary where Spark's HALF_UP and DuckDB's binary round
    * disagree — found by the full sf0.1 certification, round 11. Integer
    * math has no such boundary anywhere.)
    *
    * Scale shape (round 14): ONE window shuffle, zero joins. The trailing
    * 10 values arrive as a `collect_list` over a `ROWS BETWEEN 9 PRECEDING
    * AND CURRENT ROW` frame (≤ 10 elements, frame order = (ts, event_id)
    * order, deterministic), and the weighted integer sums fold row-locally
    * over that array — element i of an m-element frame lags the current row
    * by m−1−i, so its weight is 2^(9−(m−1−i)). The previous form published
    * each row into two rn-blocks and re-joined at (user, block) grain: a
    * second fact-sized shuffle, a ~10× row fan-out through the join, and a
    * third shuffle to re-aggregate — all replaced by the frame the window
    * already holds. The oracle keeps the plain BETWEEN self-join — the
    * declarative spec; the frame fold is the plan.
    */
  val ewma = Q(
    "q_ewma",
    (s, d) => {
      val frame = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
      // collect_list silently DROPS null elements, which would shift frame
      // indices (and so weights) relative to the oracle's rn arithmetic if
      // events.value were ever null. Pin the semantics instead of relying on
      // the data: null-value rows are excluded from the series up front, in
      // BOTH engines, so frame order and rn order stay the same sequence.
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("value"),
          collect_list(round(col("value") * 100).cast("long")).over(frame).as("xs"))
        .select(col("user_id"), col("event_id"), col("value"),
          size(col("xs")).cast("long").as("n_terms"),
          expr("""aggregate(
                 |  transform(xs, (x, i) -> named_struct(
                 |    't', x * shiftleft(CAST(1 AS BIGINT), 9 - (size(xs) - 1 - i)),
                 |    'w', shiftleft(CAST(1 AS BIGINT), 9 - (size(xs) - 1 - i)))),
                 |  named_struct('t', CAST(0 AS BIGINT), 'w', CAST(0 AS BIGINT)),
                 |  (acc, e) -> named_struct('t', acc.t + e.t, 'w', acc.w + e.w))""".stripMargin.replace("\n", " ")).as("sw"))
        .select(col("user_id"), col("event_id"), col("value"), col("n_terms"),
          (expr("(2 * sw.t * 10000 + CASE WHEN sw.t < 0 THEN -sw.w ELSE sw.w END) div (2 * sw.w)")
            .cast("double") / lit(1000000.0d)).as("ewma"))
        .orderBy("user_id", "event_id")
    },
    """WITH r AS (SELECT event_id, user_id, value,
      |             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
      |           FROM events WHERE value IS NOT NULL),
      |p AS (SELECT a.user_id, a.event_id, a.value AS xa,
      |        CAST(round(b.value * 100) AS BIGINT)
      |          * (CAST(1 AS BIGINT) << CAST(9 - (a.rn - b.rn) AS INT)) AS ti,
      |        CAST(1 AS BIGINT) << CAST(9 - (a.rn - b.rn) AS INT) AS wi
      |      FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 9 AND a.rn)
      |SELECT user_id, event_id, max(xa) AS value, count(*) AS n_terms,
      |  CAST((2 * sum(ti) * 10000 +
      |        CASE WHEN sum(ti) < 0 THEN -sum(wi) ELSE sum(wi) END)
      |       // (2 * sum(wi)) AS DOUBLE) / 1000000.0 AS ewma
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  /** BINNED KOLMOGOROV–SMIRNOV DRIFT per event type — the NUMERIC
    * distribution-shift audit beside q_kl_drift's categorical one: for each
    * event type, the two-sample KS distance max|F_type − F_global| between
    * its `value` distribution and the whole stream's, over a fixed 64-bin
    * grid spanning the global [min, max]. A type whose KS jumps between
    * windows changed its value regime (pricing shift, sensor drift, bot
    * traffic) before any single-point z-score fires. Binning is what makes
    * this scale-clean AND engine-deterministic: the exact KS needs a global
    * sort of the combined samples; the binned form needs one conditional
    * count to a (|types| × 64)-row grain and pure algebra after — and every
    * bin edge, cumulative count and fraction is an exact integer or a
    * single double division, so the statistic cannot drift between engines.
    *
    * Scale shape: one scan → broadcast (lo, hi, n) bounds → one counted
    * aggregate at the bounded grain (map-side partial); the dense grid,
    * cumsums (per-type window; constant-partition trick for the global
    * one) and the max-diff all live on ≤ 64·|types| rows.
    */
  /** The binned-KS computation behind `q_ks_drift`, reusable on any
    * (event_type, value) relation — factored so the degenerate guard
    * (all values identical → every KS is exactly 0) and a planted
    * regime-shift fixture are unit-testable (KsDriftSpec).
    */
  def ksReport(evIn: DataFrame): DataFrame = {
      val s = evIn.sparkSession
      val ev = evIn.select(col("event_type"), col("value"))
      val bounds = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        count(lit(1)).as("n_tot"))
      val bin = when(col("hi") === col("lo"), lit(0L)).otherwise(
        least(floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 64)
          .cast("long"), lit(63L)))
      val binned = ev.crossJoin(broadcast(bounds))
        .select(col("event_type"), bin.as("bin"), col("n_tot"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("c"), max(col("n_tot")).as("n_tot"))
        .localCheckpoint() // bounded grain; feeds the per-type AND global legs
      val binIds = s.range(64).select(col("id").as("bin"))
      val perType = binned.groupBy("event_type").agg(sum(col("c")).as("n_t"))
      val globalC = binned.groupBy("bin").agg(sum(col("c")).as("g"), max(col("n_tot")).as("n_tot"))
        .withColumn("gcum", sum(col("g")).over(
          Window.partitionBy(col("n_tot")).orderBy(col("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val grid = perType.crossJoin(broadcast(binIds))
        .join(binned.select(col("event_type"), col("bin"), col("c")), Seq("event_type", "bin"), "left")
        .withColumn("ct", sum(coalesce(col("c"), lit(0L))).over(
          Window.partitionBy("event_type").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      grid.join(broadcast(globalC.select(col("bin"), col("gcum"), col("n_tot"))), Seq("bin"))
        .groupBy(col("event_type"))
        .agg(max(col("n_t")).as("n_events"),
          round(max(abs(col("ct").cast("double") / col("n_t").cast("double")
            - col("gcum").cast("double") / col("n_tot").cast("double"))), 6).as("ks"))
        .orderBy("event_type")
  }

  val ksDrift = Q(
    "q_ks_drift",
    (s, d) => ksReport(Tables.events(s, d)),
    """WITH b AS (SELECT min(value) AS lo, max(value) AS hi, count(*) AS n_tot FROM events),
      |binned AS (
      |  SELECT event_type,
      |    CASE WHEN hi = lo THEN 0
      |         ELSE least(CAST(floor((value - lo)/(hi - lo)*64) AS BIGINT), 63) END AS bin,
      |    count(*) AS c
      |  FROM events, b GROUP BY 1, 2),
      |ptype AS (SELECT event_type, sum(c) AS n_t FROM binned GROUP BY 1),
      |gcum AS (
      |  SELECT bin, sum(sum(c)) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS gcum
      |  FROM binned GROUP BY bin),
      |grid AS (
      |  SELECT p.event_type, p.n_t, t.i AS bin,
      |    sum(coalesce(bn.c, 0)) OVER (PARTITION BY p.event_type ORDER BY t.i
      |                                 ROWS UNBOUNDED PRECEDING) AS ct
      |  FROM ptype p CROSS JOIN unnest(range(64)) AS t(i)
      |  LEFT JOIN binned bn ON bn.event_type = p.event_type AND bn.bin = t.i)
      |SELECT g.event_type, CAST(max(g.n_t) AS BIGINT) AS n_events,
      |  round(max(abs(CAST(g.ct AS DOUBLE)/CAST(g.n_t AS DOUBLE)
      |        - CAST(c.gcum AS DOUBLE)/CAST(b.n_tot AS DOUBLE))), 6) AS ks
      |FROM grid g JOIN gcum c ON g.bin = c.bin CROSS JOIN b
      |GROUP BY g.event_type ORDER BY g.event_type""".stripMargin
  )

  /** TOP EVENT-TYPE TRIGRAMS — sequence MOTIF mining one order above
    * q_transitions' first-order matrix: the (t₁→t₂→t₃) consecutive triples
    * across all user timelines, global top-20. Second-order structure is
    * what the transition matrix cannot see (a→b→c frequent while a→b→d
    * never happens is invisible at bigram grain) — the signal behind
    * next-event models and funnel redesigns. Shape: per-user window leads
    * (row-local after the per-user sort), one partial-aggregated count at
    * trigram grain — bounded by |types|³ — and a TakeOrdered top-20 with
    * the tie broken by the triple itself, so the cut is deterministic.
    */
  val eventTrigrams = Q(
    "q_event_trigrams",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("t1"),
          lead(col("event_type"), 1).over(w).as("t2"),
          lead(col("event_type"), 2).over(w).as("t3"))
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(20)
    },
    """WITH tri AS (
      |  SELECT event_type AS t1,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
      |  FROM events)
      |SELECT t1, t2, t3, count(*) AS n
      |FROM tri WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin
  )

  /** LAST-TOUCH ATTRIBUTION — the BATCH twin of the streaming
    * stream-stream attribution join (streaming/StreamJoin.scala): every
    * purchase is attributed to the user's most recent preceding `view`
    * within 1 hour, with the view→purchase lag; purchases outside any
    * window are kept with attributed = 0 (the ledger contract — direct
    * conversions stay accountable, exactly the rows the streaming
    * full-outer form surfaces). One per-user running window computes
    * "latest view so far" as a conditional MAX — engine-identical where
    * last(ignoreNulls) frame semantics can drift — so no join at all: the
    * same-relation case of an as-of join collapses into a window.
    */
  val attribution = Q(
    "q_attribution",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
        .withColumn("lv", max(when(col("event_type") === "view", col("ts"))).over(w))
      val valid = col("lv").isNotNull && col("ts") - col("lv") <= 3600000000000L
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000000").as("psec"), col("value"),
          when(valid, expr("(ts - lv) div 1000000000")).otherwise(lit(null))
            .cast("long").as("view_lag_s"),
          when(valid, 1L).otherwise(0L).as("attributed"))
        .orderBy("event_id")
    },
    """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns, value FROM events),
      |w AS (SELECT *, max(CASE WHEN event_type = 'view' THEN tns END) OVER (
      |        PARTITION BY user_id ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS lv
      |      FROM ev)
      |SELECT event_id, user_id, tns // 1000000000 AS psec, value,
      |  CAST(CASE WHEN lv IS NOT NULL AND tns - lv <= 3600000000000 THEN (tns - lv) // 1000000000 END AS BIGINT) AS view_lag_s,
      |  CAST(CASE WHEN lv IS NOT NULL AND tns - lv <= 3600000000000 THEN 1 ELSE 0 END AS BIGINT) AS attributed
      |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin
  )

  /** RFM SEGMENTATION — the classic customer-value grid: per user, recency
    * (latest purchase time), frequency (purchase count) and monetary value
    * (purchase sum), each cut into quintiles, concatenated into the
    * three-digit segment label ("555" = bought recently, often, big).
    * Quintiles come from a BROADCAST BOUNDARY MODEL, not ntile: one exact-
    * percentile aggregate emits the 4 cut points per metric as a single
    * tiny row, and each user's quintile is a row-local count of boundaries
    * below its metric — the `q_equidepth_bins` contract. The round-10 form
    * ran three ntile windows over the full user-grain relation under a
    * constant partition key: a single-task global sort of every user,
    * invisible at sf0.1 and fatal at 10⁹ users. Boundary-exclusive bins
    * change the tie semantics (tied metric values share a quintile instead
    * of splitting by user id) — stated identically in the oracle, and the
    * right contract anyway: a segment label should be a function of the
    * metric VALUE, not of which side of an ntile seam a tie lands on.
    * Quintile boundaries are the [[exactCutsM]] EXACT-BIGINT rank model —
    * all three metrics are integral (seconds, counts, and monetary scaled
    * to exact micros off the DECIMAL(18,6) sum of exact-cent values), the
    * scaled cut m·q_j is an exact integer, and assignment compares
    * 5·x > cut — NO floating-point interpolation or rounding anywhere, so
    * the round-11 advisory's half-boundary failure class (Spark
    * `percentile` vs DuckDB `quantile_cont` last-ulp divergence, HALF_UP vs
    * binary rounding at 4-dp boundaries) cannot occur by construction.
    * The oracle states the same cuts with the textbook row_number order
    * statistics — the declarative spec; the bucketed rank is the plan. At
    * 100 TB the bucketing model inside [[exactCutsM]] is already
    * `approx_percentile` (mergeable sketch); only the ≤ 8 exact order
    * statistics per metric ride the two-level rank. The fully-approx
    * boundary-model path is a REGISTERED, oracle-checked query of its own:
    * `q_equidepth_approx` (Aggregates.scala).
    */
  val rfm = Q(
    "q_rfm",
    (s, d) => {
      val g = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
          sum(dec(col("value"))).as("mon_dec"))
        .select(col("user_id"), expr("last_ts div 1000000000").as("recency_s"),
          col("freq"), col("mon_dec").cast("double").as("monetary"),
          (col("mon_dec") * 1000000).cast("long").as("mon6"))
        .localCheckpoint() // feeds the boundary models AND the assignment scan
      // all three metric models in ONE exactCutsByMetric pass (two eager
      // checkpoints instead of six — the sub-floor stage-count fix)
      val gm = g.select(explode(array(
          struct(lit("r").as("metric"), col("recency_s").cast("long").as("x")),
          struct(lit("f").as("metric"), col("freq").cast("long").as("x")),
          struct(lit("m").as("metric"), col("mon6").as("x")))).as("s"))
        .select(col("s.metric").as("metric"), col("s.x").as("x"))
      val bounds = exactCutsByMetric(gm, 5).groupBy()
        .agg(max(when(col("metric") === "r", col("bs"))).as("rb"),
          max(when(col("metric") === "f", col("bs"))).as("fb"),
          max(when(col("metric") === "m", col("bs"))).as("mb"))
      def quint(x: org.apache.spark.sql.Column, bs: String) =
        boundaryBin(x * 5, col(bs), 4).cast("long")
      g.crossJoin(broadcast(bounds))
        .select(col("user_id"), col("recency_s"), col("freq"),
          round(col("monetary"), 6).as("monetary"),
          quint(col("recency_s"), "rb").as("r_q"),
          quint(col("freq"), "fb").as("f_q"),
          quint(col("mon6"), "mb").as("m_q"))
        .withColumn("segment",
          concat(col("r_q").cast("string"), col("f_q").cast("string"),
            col("m_q").cast("string")))
        .orderBy("user_id")
    }, {
      // exact type-7 cut scaled by 5: cutm_j = 5·s_k + r·(s_{k+1} − s_k),
      // k = (n−1)·j // 5, r = (n−1)·j % 5 — textbook order statistics via
      // row_number (the declarative spec of exactCutsM's bucketed rank)
      def cutsSql(metric: String): String =
        s"""(WITH rr AS (SELECT $metric AS x,
           |               row_number() OVER (ORDER BY $metric) - 1 AS p FROM g),
           |  nn AS (SELECT count(*) - 1 AS n1 FROM g),
           |  rc AS (SELECT j, n1 * j // 5 AS k, n1 * j % 5 AS r, n1
           |         FROM (SELECT unnest([1, 2, 3, 4]) AS j), nn),
           |  rcut AS (SELECT c.j, 5 * a.x + c.r * (b.x - a.x) AS cutm
           |           FROM rc c JOIN rr a ON a.p = c.k
           |                     JOIN rr b ON b.p = least(c.k + 1, c.n1))
           |  SELECT list(cutm ORDER BY j) FROM rcut)""".stripMargin
      s"""WITH g AS (
         |  SELECT user_id, epoch_ns(max(ts)) // 1000000000 AS recency_s,
         |         count(*) AS freq,
         |         CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS monetary,
         |         CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS mon6
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |b AS (SELECT ${cutsSql("recency_s")} AS rb,
         |             ${cutsSql("freq")} AS fb,
         |             ${cutsSql("mon6")} AS mb),
         |a AS (SELECT user_id, recency_s, freq, monetary,
         |        1 + (CASE WHEN 5 * recency_s > rb[1] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * recency_s > rb[2] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * recency_s > rb[3] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * recency_s > rb[4] THEN 1 ELSE 0 END) AS r_q,
         |        1 + (CASE WHEN 5 * freq > fb[1] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * freq > fb[2] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * freq > fb[3] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * freq > fb[4] THEN 1 ELSE 0 END) AS f_q,
         |        1 + (CASE WHEN 5 * mon6 > mb[1] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * mon6 > mb[2] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * mon6 > mb[3] THEN 1 ELSE 0 END
         |           + CASE WHEN 5 * mon6 > mb[4] THEN 1 ELSE 0 END) AS m_q
         |      FROM g, b)
         |SELECT user_id, recency_s, freq, round(monetary, 6) AS monetary,
         |  CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q, CAST(m_q AS BIGINT) AS m_q,
         |  CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR) AS segment
         |FROM a ORDER BY user_id""".stripMargin
    }
  )

  /** GINI CONCENTRATION INDEX of per-user value within each event type —
    * the inequality audit behind "do 1% of users drive 90% of the spend":
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the ascending-sorted per-user
    * sums (the closed form of the Lorenz-curve area). Engine determinism by
    * construction: per-user sums go through the exact-decimal convention,
    * the rank moment Σ i·xᵢ is a DECIMAL×BIGINT sum (exact at any
    * parallelism; ties in x contribute x·Σi whichever tied user takes
    * which rank), and the one double formula is applied to the exact
    * moments.
    *
    * The global rank runs as a TWO-LEVEL BUCKETED RANK over the
    * TIE-COLLAPSED value grain, never a per-type single-task sort:
    *
    *  1. ties collapse FIRST — Σ i·xᵢ is tie-permutation-invariant, so a
    *     group of c users sharing one xd contributes
    *     xd·(c·start + c(c+1)/2) whatever order they take, and the scan
    *     reduces to (event_type, xd, c) rows. This is what makes the plan
    *     robust to BOTH tails: heavily tied data (many identical spends —
    *     where value-range buckets would collapse onto one cut) shrinks to
    *     a few rows per value, while continuous data leaves ties ≈ 1 and
    *     relies on the buckets instead;
    *  2. a per-type percentile boundary model (15 cuts, broadcast) buckets
    *     the distinct values row-locally ([[boundaryBin]] — ties always
    *     share a bucket since bucketing is a function of xd alone);
    *  3. within-bucket cumulative counts rank the ≤1/16-of-distinct-values
    *     grain; exclusive bucket offsets live on the bounded
    *     (|types| × 16) grain; the tied-group closed form assembles the
    *     exact moment.
    *
    * The bucketed moment equals the oracle's sequential row_number form
    * exactly — the oracle below deliberately keeps the textbook global
    * window an engine at scale must NOT execute. At 100 TB, widen the cut
    * array and swap the boundary model to `approx_percentile`; assignment
    * and moment algebra are unchanged. Shape: events → user grain (one
    * shuffle) → distinct-value grain, bounded boundary aggregate,
    * bucket-partitioned windows over collapsed rows, one moment aggregate
    * per type — scan → 5 rows.
    */
  /** The bucketed-rank Gini body over a (event_type, xd DECIMAL) user-grain
    * relation — factored from the Q so the heavy-tie tail is unit-testable
    * on crafted inputs (GiniSpec: 90%-tied fixture vs a local exact
    * reference).
    */
  def giniOf(g: DataFrame): DataFrame = {
      // ties collapse before anything else — the distinct-value grain
      val tied = g.groupBy(col("event_type"), col("xd"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds the boundary model AND the ranked scan
      val cuts = (1 to 15).map(k => s"${k / 16.0}D").mkString("array(", ", ", ")")
      // weighted percentiles over the collapsed grain = percentiles of the
      // underlying user multiset (frequency argument), so the cut points
      // bucket values exactly as a user-grain model would
      val bounds = tied.groupBy(col("event_type")).agg(expr(
        s"transform(percentile(CAST(xd AS DOUBLE), $cuts, c), p -> round(p, 6))").as("bs"))
      val a = tied.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_type"), col("xd"), col("c"),
          boundaryBin(col("xd").cast("double"), col("bs"), 15).as("bkt"))
      // level 1: bucket user-counts → exclusive rank offsets, bounded grain
      val per = a.groupBy(col("event_type"), col("bkt"))
        .agg(sum(col("c")).as("cnt"), sum(col("xd") * col("c")).as("sxb"))
      val withOff = per.withColumn("off", coalesce(
        sum(col("cnt")).over(Window.partitionBy("event_type").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // level 2: within-bucket exclusive user-count before each distinct
      // value; tied-group moment xd·(c·cb + c(c+1)/2) with bucket-local cb
      val wIn = Window.partitionBy("event_type", "bkt").orderBy(col("xd"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val inner = a.withColumn("cb", coalesce(sum(col("c")).over(wIn), lit(0L)))
        .groupBy(col("event_type"), col("bkt"))
        .agg(sum(col("xd") * (col("c") * col("cb") + expr("c * (c + 1) div 2")))
          .as("sxj"))
      val m = inner.join(withOff, Seq("event_type", "bkt"))
        .groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("n"), sum(col("sxb")).as("sx"),
          sum(col("sxj") + col("sxb") * col("off")).as("sxi"))
      val nD = col("n").cast("double")
      m.select(col("event_type"), col("n").as("n_users"),
          round(col("sx").cast("double"), 6).as("total"),
          round((lit(2.0) * col("sxi").cast("double")) / (nD * col("sx").cast("double"))
            - (nD + 1.0) / nD, 6).as("gini"))
        .orderBy("event_type")
  }

  val gini = Q(
    "q_gini",
    (s, d) => giniOf(
      Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(dec(col("value"))).as("xd"))),
    """WITH g AS (SELECT event_type, user_id,
      |             sum(CAST(value AS DECIMAL(18,6))) AS xd
      |           FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, xd,
      |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY xd, user_id) AS BIGINT) AS i
      |      FROM g),
      |m AS (SELECT event_type, count(*) AS n, sum(xd) AS sx, sum(xd * i) AS sxi
      |      FROM r GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_users,
      |  round(CAST(sx AS DOUBLE), 6) AS total,
      |  round((2.0 * CAST(sxi AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
      |        - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
      |FROM m ORDER BY event_type""".stripMargin
  )

  /** SEASONALITY MATRIX — activity share per (day-of-week × hour-of-day),
    * the diurnality heatmap behind capacity planning and bot detection (a
    * human audience has a strong matrix structure; uniform cells are a red
    * flag — the report-level companion to q_corr's per-type diurnality
    * coefficient). Time cells come from PURE INTEGER epoch math in UTC
    * (hour = (ts/3600 s) mod 24, dow anchored to the epoch's Thursday) —
    * no calendar/timezone functions, so the two engines cannot disagree on
    * a boundary timestamp. One partial-aggregated count to the fixed
    * 168-cell grain, one broadcast total for the shares.
    */
  val seasonality = Q(
    "q_seasonality",
    (s, d) => {
      val cells = Tables.events(s, d)
        .select(expr("((ts div 86400000000000) + 4) % 7").as("dow"),
          expr("(ts div 3600000000000) % 24").as("hour"))
        .groupBy("dow", "hour").agg(count(lit(1)).as("n"))
      val t = cells.agg(sum(col("n")).as("total"))
      cells.crossJoin(broadcast(t))
        .select(col("dow"), col("hour"), col("n"),
          round(col("n").cast("double") / col("total").cast("double"), 6).as("share"))
        .orderBy("dow", "hour")
    },
    """WITH c AS (
      |  SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
      |         (epoch_ns(ts) // 3600000000000) % 24 AS hour,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT sum(n) AS total FROM c)
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
      |  CAST(n AS BIGINT) AS n,
      |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
      |FROM c, t ORDER BY dow, hour""".stripMargin
  )

  /** MUTUAL INFORMATION between event type and hour-of-day — the
    * categorical DEPENDENCE audit completing the drift family: KL asks "did
    * a marginal move", MI asks "are two dimensions entangled" (types firing
    * at characteristic hours ⇒ MI > 0; a bot re-playing uniformly ⇒ MI ≈ 0).
    * I(T;H) = Σ p(t,h)·ln(p(t,h)/(p(t)p(h))) over the fixed 5×24 grain —
    * joint and marginals are exact integer counts off ONE aggregate
    * (checkpointed, three consumers), the log terms are pre-rounded to
    * DECIMAL(28,9) before the sum (the q_kl_drift convention), and the
    * whole statistic is one row out of a corpus-sized scan.
    */
  val mutualInfo = Q(
    "q_mutual_info",
    (s, d) => {
      val jt = Tables.events(s, d)
        .select(col("event_type"), expr("(ts div 3600000000000) % 24").as("hour"))
        .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val pt = jt.groupBy("event_type").agg(sum(col("n")).as("n_t"))
      val ph = jt.groupBy("hour").agg(sum(col("n")).as("n_h"))
      val tot = jt.agg(sum(col("n")).as("n_all"))
      val term9 = round((col("n").cast("double") / col("n_all").cast("double"))
        * log((col("n").cast("double") * col("n_all").cast("double"))
          / (col("n_t").cast("double") * col("n_h").cast("double"))), 9)
        .cast(org.apache.spark.sql.types.DecimalType(28, 9))
      jt.join(broadcast(pt), Seq("event_type"))
        .join(broadcast(ph), Seq("hour"))
        .crossJoin(broadcast(tot))
        .agg(max(col("n_all")).as("n_events"),
          round(sum(term9).cast("double"), 6).as("mi_nats"))
        .select(col("n_events"), col("mi_nats"))
    },
    """WITH jt AS (SELECT event_type, (epoch_ns(ts) // 3600000000000) % 24 AS hour,
      |              count(*) AS n
      |            FROM events GROUP BY 1, 2),
      |pt AS (SELECT event_type, sum(n) AS n_t FROM jt GROUP BY 1),
      |ph AS (SELECT hour, sum(n) AS n_h FROM jt GROUP BY 1),
      |t AS (SELECT sum(n) AS n_all FROM jt)
      |SELECT CAST(max(n_all) AS BIGINT) AS n_events,
      |  round(CAST(sum(CAST(round(
      |    (CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE))
      |    * ln((CAST(n AS DOUBLE) * CAST(n_all AS DOUBLE))
      |         / (CAST(n_t AS DOUBLE) * CAST(n_h AS DOUBLE))), 9)
      |    AS DECIMAL(28,9))) AS DOUBLE), 6) AS mi_nats
      |FROM jt JOIN pt USING (event_type) JOIN ph USING (hour) CROSS JOIN t""".stripMargin
  )

  /** WEEK-OVER-WEEK CHANGEPOINT — per event type, the largest absolute jump
    * between consecutive OBSERVED weeks (volume regression/spike detection,
    * the report a monitoring pipeline pages on). One count to the
    * (type × week) grain, a per-type lag over that bounded grain, and the
    * winning week per type via a deterministic rank (|Δ| desc, then week) —
    * never a sort of the event stream.
    */
  val changepoint = Q(
    "q_changepoint",
    (s, d) => {
      val weekly = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts div 604800000000000").as("week"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("week")
      val lagged = weekly
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .filter(col("prev_n").isNotNull)
        .withColumn("delta", col("n") - col("prev_n"))
      lagged
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(abs(col("delta")).desc, col("week"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("week"), col("prev_n"), col("n"), col("delta"))
        .orderBy("event_type")
    },
    """WITH weekly AS (
      |  SELECT event_type, epoch_ns(ts) // 604800000000000 AS week, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT event_type, week, lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n, n
      |  FROM weekly),
      |d AS (SELECT event_type, CAST(week AS BIGINT) AS week, CAST(prev_n AS BIGINT) AS prev_n,
      |        CAST(n AS BIGINT) AS n, CAST(n - prev_n AS BIGINT) AS delta,
      |        row_number() OVER (PARTITION BY event_type ORDER BY abs(n - prev_n) DESC, week) AS rk
      |      FROM lagged WHERE prev_n IS NOT NULL)
      |SELECT event_type, week, prev_n, n, delta FROM d WHERE rk = 1
      |ORDER BY event_type""".stripMargin
  )

  /** LORENZ DECILE TABLE — the tabulated curve behind [[gini]]'s single
    * number: users cut into spend deciles (ascending), each decile's share
    * and the cumulative share of total value. "The top decile owns 34% of
    * the spend" is this table's last row gap; the Gini is its integral.
    * Deciles come from the [[exactCutsM]] EXACT-BIGINT rank model — spend
    * scaled to exact micros off the DECIMAL(18,6) sum of exact-cent values,
    * decile = row-local count of scaled integer boundaries below 10·spend —
    * replacing round 10's ntile under a constant partition key (a
    * single-task sort of every user; see [[rfm]] for why boundary-
    * exclusive bins are also the better tie contract, and for why the
    * integer cuts remove the percentile/round half-boundary failure class
    * entirely). The ≤10-row decile
    * rollup gets its cumulative sums from a broadcast non-equi self-join,
    * so the plan has NO window at all; decile sums stay exact decimal
    * moments, shares are single divisions. At 100 TB the bucketing model
    * inside [[exactCutsM]] is already `approx_percentile`.
    */
  val lorenz = Q(
    "q_lorenz",
    (s, d) => {
      val g = Tables.events(s, d)
        .groupBy(col("user_id")).agg(sum(dec(col("value"))).as("xd"))
        .select(col("xd"), (col("xd") * 1000000).cast("long").as("x6"))
        .localCheckpoint() // feeds the boundary model AND the assignment scan
      val bounds = exactCutsM(g.select(col("x6").as("x")), 10)
      val decile = boundaryBin(col("x6") * 10, col("bs"), 9).cast("long")
      val byDecile = g.crossJoin(broadcast(bounds))
        .select(decile.as("decile"), col("xd"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("xd")).as("sx"))
      val tot = byDecile.agg(sum(col("sx")).as("stot"))
      val cum = byDecile
        .join(broadcast(byDecile.select(col("decile").as("d2"), col("sx").as("sx2"))),
          col("d2") <= col("decile"))
        .groupBy(col("decile"), col("n_users"), col("sx"))
        .agg(sum(col("sx2")).as("cum"))
      cum.crossJoin(broadcast(tot))
        .select(col("decile"), col("n_users"),
          round(col("sx").cast("double"), 6).as("decile_value"),
          round(col("sx").cast("double") / col("stot").cast("double"), 6).as("share"),
          round(col("cum").cast("double") / col("stot").cast("double"), 6).as("cum_share"))
        .orderBy("decile")
    },
    """WITH g AS (SELECT user_id, sum(CAST(value AS DECIMAL(18,6))) AS xd,
      |             CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x6
      |           FROM events GROUP BY 1),
      |q AS (WITH rr AS (SELECT x6 AS x, row_number() OVER (ORDER BY x6) - 1 AS p FROM g),
      |        nn AS (SELECT count(*) - 1 AS n1 FROM g),
      |        rc AS (SELECT j, n1 * j // 10 AS k, n1 * j % 10 AS r, n1
      |               FROM (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS j), nn),
      |        rcut AS (SELECT c.j, 10 * a.x + c.r * (b.x - a.x) AS cutm
      |                 FROM rc c JOIN rr a ON a.p = c.k
      |                           JOIN rr b ON b.p = least(c.k + 1, c.n1))
      |      SELECT list(cutm ORDER BY j) AS bs FROM rcut),
      |a AS (SELECT xd,
      |        1 + (CASE WHEN 10 * x6 > bs[1] THEN 1 ELSE 0 END
      |           + CASE WHEN 10 * x6 > bs[2] THEN 1 ELSE 0 END
      |           + CASE WHEN 10 * x6 > bs[3] THEN 1 ELSE 0 END
      |           + CASE WHEN 10 * x6 > bs[4] THEN 1 ELSE 0 END
      |           + CASE WHEN 10 * x6 > bs[5] THEN 1 ELSE 0 END
      |           + CASE WHEN 10 * x6 > bs[6] THEN 1 ELSE 0 END
      |           + CASE WHEN 10 * x6 > bs[7] THEN 1 ELSE 0 END
      |           + CASE WHEN 10 * x6 > bs[8] THEN 1 ELSE 0 END
      |           + CASE WHEN 10 * x6 > bs[9] THEN 1 ELSE 0 END) AS decile
      |      FROM g, q),
      |b AS (SELECT decile, count(*) AS n_users, sum(xd) AS sx FROM a GROUP BY 1),
      |t AS (SELECT sum(sx) AS stot FROM b),
      |c AS (SELECT x.decile, x.n_users, x.sx, sum(y.sx) AS cum
      |      FROM b x JOIN b y ON y.decile <= x.decile GROUP BY 1, 2, 3)
      |SELECT CAST(decile AS BIGINT) AS decile, CAST(n_users AS BIGINT) AS n_users,
      |  round(CAST(sx AS DOUBLE), 6) AS decile_value,
      |  round(CAST(sx AS DOUBLE) / CAST(stot AS DOUBLE), 6) AS share,
      |  round(CAST(cum AS DOUBLE) / CAST(stot AS DOUBLE), 6) AS cum_share
      |FROM c, t ORDER BY decile""".stripMargin
  )

  /** WAU / rolling-MAU STICKINESS — the engagement ratio product teams
    * track weekly: per observed week, distinct weekly actives and distinct
    * actives over the trailing 4 weeks, plus wau/mau. The rolling distinct
    * CANNOT be summed from weekly counts (users overlap) — it is re-derived
    * exactly from the (user, week) grain: that bounded relation joins a
    * 4-row-per-week window spine (row-local explode, the hop-window
    * pattern) and deduplicates per target week. Everything after the one
    * events→(user, week) aggregate runs at user-week grain, never the
    * event stream.
    */
  val activeUsers = Q(
    "q_active_users",
    (s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 604800000000000").as("week"))
        .distinct()
        .localCheckpoint() // feeds the weekly counts AND the rolling spine
      val wau = uw.groupBy("week").agg(count(lit(1)).as("wau"))
      // publish each (user, week) row to the 4 target weeks it supports —
      // bounded fan-out, then exact distinct per target week
      val mau = uw
        .select(col("user_id"), explode(expr(
          "transform(sequence(0, 3), k -> week + k)")).as("tweek"))
        .join(broadcast(wau.select(col("week").as("tweek"))), Seq("tweek"))
        .select(col("tweek").as("week"), col("user_id")).distinct()
        .groupBy("week").agg(count(lit(1)).as("mau4"))
      wau.join(mau, Seq("week"))
        .select(col("week"), col("wau"), col("mau4"),
          round(col("wau").cast("double") / col("mau4").cast("double"), 6).as("stickiness"))
        .orderBy("week")
    },
    """WITH uw AS (SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS week FROM events),
      |wau AS (SELECT week, count(*) AS wau FROM uw GROUP BY 1),
      |mau AS (
      |  SELECT w.week, count(DISTINCT u.user_id) AS mau4
      |  FROM wau w JOIN uw u ON u.week BETWEEN w.week - 3 AND w.week
      |  GROUP BY 1)
      |SELECT CAST(w.week AS BIGINT) AS week, CAST(w.wau AS BIGINT) AS wau,
      |  CAST(m.mau4 AS BIGINT) AS mau4,
      |  round(CAST(w.wau AS DOUBLE) / CAST(m.mau4 AS DOUBLE), 6) AS stickiness
      |FROM wau w JOIN mau m ON w.week = m.week ORDER BY week""".stripMargin
  )

  /** GROWTH ACCOUNTING — the weekly active-user ledger (new / retained /
    * resurrected / churned) that decomposes every WAU movement: new = first
    * week ever, retained = also active the previous week, resurrected =
    * active before but not last week, churned(w) = active at w−1 but not
    * at w (so wau(w) − wau(w−1) = new + resurrected − churned, the identity
    * growth teams reconcile against). Everything derives from the bounded
    * (user, week) grain: per-user first week and previous-active-week via
    * one user-partitioned window, the weekly rollup one aggregate, churn a
    * self-join of the weekly counts on (week−1). Exact integers
    * throughout — nothing to round, nothing engine-divergent.
    */
  val growthAccounting = Q(
    "q_growth_accounting",
    (s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 604800000000000").as("week"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("week")
      val tagged = uw
        .withColumn("first_w", min(col("week")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_w", lag(col("week"), 1).over(w))
      val weekly = tagged.groupBy(col("week")).agg(
        count(lit(1)).as("wau"),
        sum(when(col("week") === col("first_w"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev_w") === col("week") - 1, 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("prev_w").isNotNull && col("prev_w") < col("week") - 1, 1L)
          .otherwise(0L)).as("n_resurrected"))
      weekly.join(
          weekly.select((col("week") + 1).as("week"), col("wau").as("prev_wau")),
          Seq("week"), "left")
        .select(col("week"), col("wau"), col("n_new"), col("n_retained"),
          col("n_resurrected"),
          coalesce(col("prev_wau") - col("n_retained"), lit(0L)).as("n_churned"))
        .orderBy("week")
    },
    """WITH uw AS (SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS week FROM events),
      |tagged AS (
      |  SELECT week,
      |    min(week) OVER (PARTITION BY user_id ORDER BY week ROWS UNBOUNDED PRECEDING) AS first_w,
      |    lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_w
      |  FROM uw),
      |weekly AS (
      |  SELECT week, count(*) AS wau,
      |    sum(CASE WHEN week = first_w THEN 1 ELSE 0 END) AS n_new,
      |    sum(CASE WHEN prev_w = week - 1 THEN 1 ELSE 0 END) AS n_retained,
      |    sum(CASE WHEN prev_w IS NOT NULL AND prev_w < week - 1 THEN 1 ELSE 0 END) AS n_resurrected
      |  FROM tagged GROUP BY 1)
      |SELECT CAST(a.week AS BIGINT) AS week, CAST(a.wau AS BIGINT) AS wau,
      |  CAST(a.n_new AS BIGINT) AS n_new, CAST(a.n_retained AS BIGINT) AS n_retained,
      |  CAST(a.n_resurrected AS BIGINT) AS n_resurrected,
      |  CAST(coalesce(b.wau - a.n_retained, 0) AS BIGINT) AS n_churned
      |FROM weekly a LEFT JOIN weekly b ON b.week = a.week - 1
      |ORDER BY a.week""".stripMargin
  )

  val all: Seq[Q] = Seq(cohortRetention, movingAvg, anomalyZscore, trend, runningTotal,
    gaps, rollingMedian, corr_, ewma, ksDrift, eventTrigrams, attribution, rfm, gini,
    seasonality, mutualInfo, changepoint, lorenz, activeUsers, growthAccounting)
}
