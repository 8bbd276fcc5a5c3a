package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Bridge

/** The native as-of join operator (logical node + rule + strategy + physical
  * merge) must agree row-for-row with the oracle-checked union+running-last
  * composition, and its custom pushdown rule must move left-only filters
  * below the join.
  */
class AsOfJoinSpec extends SparkSpec {

  private def sides(dir: String): (DataFrame, DataFrame) = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        timestamp_micros(expr("ts DIV 1000")).as("t"))
    val orders = Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey", "o_orderdate").orderBy(col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ot"),
        col("o_orderkey"), col("o_totalprice"))
    (events, orders)
  }

  test("native as-of join matches the union+window composition row for row") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    val native = AsOfJoin(events, orders, "user_id", "o_custkey", "t", "ot")
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
      .orderBy("event_id")
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq
    val composed = SparkEntry.queries("q_asof_join")(spark, dir)
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("physical plan is the custom sort-merge operator, no cartesian") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    val df = AsOfJoin(events, orders, "user_id", "o_custkey", "t", "ot")
    // physical nodes render without the Exec suffix (and AQE hides the tree
    // from `exists`, so assert on the rendered plan)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin "), s"expected AsOfJoin operator in:\n$physical")
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
  }

  test("planner picks broadcast under the threshold, shuffled merge above; both paths agree") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    def run(): DataFrame = AsOfJoin(events, orders, "user_id", "o_custkey", "t", "ot")
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    // default threshold (10 MB) >> sf0.001 orders: broadcast variant planned
    val bPlan = run().queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastAsOfJoin"), s"expected broadcast as-of in:\n$bPlan")
    assert(bPlan.contains("BroadcastExchange"), s"expected a standard BroadcastExchange in:\n$bPlan")
    val bRows = run().orderBy("event_id").collect().map(_.toSeq).toSeq
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val mPlan = run().queryExecution.executedPlan.toString
      assert(!mPlan.contains("BroadcastAsOfJoin"),
        s"threshold -1 must fall back to the shuffled merge:\n$mPlan")
      assert(mPlan.contains("AsOfJoin "), s"expected merge as-of in:\n$mPlan")
      val mRows = run().orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(bRows == mRows, "broadcast and merge paths disagree")
    } finally spark.conf.set(key, saved)
  }

  test("binary keys match by value on both physical paths, not by reference") {
    // Array[Byte] equals/hashCode are identity-based, so a boxed-key index
    // would silently match nothing on the broadcast path; the UnsafeRow-keyed
    // index must compare key BYTES. Key both sides by md5 digest of user_id.
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    val le = events.withColumn("k", expr("unhex(md5(cast(user_id AS string)))"))
    val re = orders.withColumn("rk", expr("unhex(md5(cast(o_custkey AS string)))"))
      .drop("o_custkey")
    def run(): DataFrame = AsOfJoin(le, re, "k", "rk", "t", "ot")
      .select("event_id", "o_orderkey")
    val bPlan = run().queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastAsOfJoin"), s"expected broadcast as-of in:\n$bPlan")
    val bRows = run().orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(bRows.exists(_(1) != null), "binary-keyed broadcast probe matched nothing")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val mPlan = run().queryExecution.executedPlan.toString
      assert(!mPlan.contains("BroadcastAsOfJoin"),
        s"threshold -1 must fall back to the shuffled merge:\n$mPlan")
      val mRows = run().orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(bRows.map(_.toList) == mRows.map(_.toList),
        "binary-keyed broadcast and merge paths disagree")
    } finally spark.conf.set(key, saved)
  }

  test("null right-side times are skipped, not allowed to stall the merge") {
    import spark.implicits._
    val left = Seq((1L, Some(20L), "e1"), (1L, Some(30L), "e2"), (2L, Some(5L), "e3"),
      (1L, Option.empty[Long], "e4"))
      .toDF("user_id", "t", "tag")
    val right = Seq(
      (1L, Option.empty[Long], "null-time"), (1L, Some(10L), "match"),
      (2L, Some(50L), "future"))
      .toDF("o_custkey", "ot", "name")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    // same null semantics on BOTH physical paths (default → broadcast,
    // -1 → shuffled merge)
    for (threshold <- Seq(saved, "-1")) {
      spark.conf.set(key, threshold)
      try {
        val out = AsOfJoin(left, right, "user_id", "o_custkey", "t", "ot")
          .select("tag", "name").collect().map(r => r.getString(0) -> r.getString(1)).toMap
        // the null-time row sorts NULLS FIRST at the key-group head; both left
        // rows of key 1 must still reach the t=10 match behind it
        assert(out("e1") == "match" && out("e2") == "match")
        assert(out("e3") == null, "future-time right row must not match")
        assert(out("e4") == null, "null LEFT time can never satisfy t >= ot")
      } finally spark.conf.set(key, saved)
    }
  }

  test("tolerance nulls out stale matches identically on both physical paths") {
    import spark.implicits._
    val left = Seq((1L, 100L, "fresh"), (1L, 150L, "stale"), (2L, 100L, "exact"))
      .toDF("user_id", "t", "tag")
    val right = Seq((1L, 90L, "a"), (2L, 50L, "b"))
      .toDF("o_custkey", "ot", "name")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    for (threshold <- Seq(saved, "-1")) {
      spark.conf.set(key, threshold)
      try {
        val out = AsOfJoin(left, right, "user_id", "o_custkey", "t", "ot",
            tolerance = Some(50L))
          .select("tag", "name").collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(out("fresh") == "a", "within tolerance (100-90=10 <= 50) must match")
        assert(out("stale") == null, "beyond tolerance (150-90=60 > 50) must null out")
        assert(out("exact") == "b", "boundary (100-50=50 <= 50) is inclusive")
      } finally spark.conf.set(key, saved)
    }
    // non-integral time types reject tolerance at build time
    val badTime = Seq((1L, "x")).toDF("o_custkey", "ot")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(left.select(col("user_id"), col("t").cast("string").as("t")),
        badTime, "user_id", "o_custkey", "t", "ot", tolerance = Some(1L))
    }
    assert(e.getMessage.contains("integral-physical") || e.getMessage.contains("time types"))
  }

  test("mismatched key or time types fail at build time, not in executors") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("user_id", "t")
    val rightIntKey = Seq((1, 5L)).toDF("o_custkey", "ot")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin(left, rightIntKey, "user_id", "o_custkey", "t", "ot")
    }
    assert(e1.getMessage.contains("key types differ"))
    val rightStrTime = Seq((1L, "2024")).toDF("o_custkey", "ot")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin(left, rightStrTime, "user_id", "o_custkey", "t", "ot")
    }
    assert(e2.getMessage.contains("time types differ"))
  }

  test("left-only filters push below the as-of join and reach the scan") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    val df = AsOfJoin(events, orders, "user_id", "o_custkey", "t", "ot")
      .filter(col("user_id") < 100L)
    val optimized = Bridge.optimized(df)
    // no Filter remains above the join node...
    val filterAboveJoin = optimized.collect {
      case f @ Filter(_, _: AsOfJoin.AsOfJoinPlan) => f
    }
    assert(filterAboveJoin.isEmpty, s"filter not pushed:\n$optimized")
    // ...and the standard rules carried it all the way into the parquet scan
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(user_id), LessThan(user_id,100)]")
      || physical.contains("LessThan(user_id,100)"), s"scan pushdown missing:\n$physical")
    // results still correct under the pushed plan
    assert(df.count() ==
      SparkEntry.queries("q_asof_join")(spark, dir).filter(col("user_id") < 100L).count())
  }

  test("column pruning pushes through the join: scans read only needed columns") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    // project 2 output columns; the pruning rule must keep only
    // (referenced ∪ key ∪ time) per side and the scans must shrink
    val df = AsOfJoin(events, orders, "user_id", "o_custkey", "t", "ot")
      .select("event_id", "o_orderkey")
    val physical = df.queryExecution.executedPlan.toString
    // events scan: event_id, user_id (key), ts (time source) — never
    // event_type/value/props; orders scan: no o_totalprice
    assert(!physical.contains("event_type"), s"events scan not pruned:\n$physical")
    assert(!physical.contains("o_totalprice"), s"orders scan not pruned:\n$physical")
    // pruned plan still matches the composition's projection
    val want = SparkEntry.queries("q_asof_join")(spark, dir)
      .select("event_id", "o_orderkey").orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(df.orderBy("event_id").collect().map(_.toSeq).toSeq == want)
  }

  test("column pruning still applies through a retained right-side filter") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    // a right-referencing predicate is deliberately NOT pushed below the join
    // (a pre-time row may still be some later row's match), so the optimized
    // shape is Project(Filter(asof)) — the pruning rule must see through the
    // retained Filter or the scans read everything
    val df = AsOfJoin(events, orders, "user_id", "o_custkey", "t", "ot")
      .filter(col("o_orderkey").isNotNull)
      .select("event_id", "o_orderkey")
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("o_totalprice"), s"orders scan not pruned:\n$physical")
    assert(!physical.contains("event_type"), s"events scan not pruned:\n$physical")
    // pruned-through-filter plan still matches the composition's rows
    val want = SparkEntry.queries("q_asof_join")(spark, dir)
      .filter(col("o_orderkey").isNotNull)
      .select("event_id", "o_orderkey").orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(df.orderBy("event_id").collect().map(_.toSeq).toSeq == want)
  }

  test("q_resample's forward-fill executes through the native as-of operator") {
    val df = SparkEntry.queries("q_resample")(spark, sf("sf0.001"))
    val n = df.collect().length
    assert(n > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native as-of missing from the resample plan:\n$plan")
    // every grid row appears exactly once (LEFT semantics: no fan-out, no loss)
    val grid = df.selectExpr("user_id", "grid_tus").distinct().count()
    assert(grid.toInt == n, s"as-of fill changed grid cardinality: $grid vs $n")
  }

  test("broadcast as-of probe runs inside whole-stage codegen, fused with the scan") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    val df = AsOfJoin(events, orders, "user_id", "o_custkey", "t", "ot")
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    // codegen collapse happens per AQE query stage at execution — run first,
    // then assert on the FINAL rendered plan
    val nRows = df.collect().length
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"expected the broadcast variant in:\n$plan")
    // a codegen'd node renders with a `*(n)` stage prefix
    assert("""\*\(\d+\) BroadcastAsOfJoin""".r.findFirstIn(plan).nonEmpty,
      s"broadcast as-of probe fell out of whole-stage codegen:\n$plan")
    // and the fused plan still produces the composition's rows
    assert(nRows.toLong == SparkEntry.queries("q_asof_join")(spark, dir).count())
  }

  test("sort-merge as-of runs inside whole-stage codegen and matches the composition") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    def run(): DataFrame = AsOfJoin(events, orders, "user_id", "o_custkey", "t", "ot")
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // force the shuffled merge variant
      val df = run()
      // execute df ITSELF first — AQE finalizes codegen stages per query
      // stage at execution, so the pre-execution plan carries no `*(n)`
      val rows = df.collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin ") && !plan.contains("BroadcastAsOfJoin"),
        s"expected the merge variant in:\n$plan")
      // the generated merge loop renders with a `*(n)` stage prefix — and
      // spark.sql.codegen.fallback=false (SparkSpec) means this executed the
      // Janino loop, not a silent interpreted fallback
      assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).nonEmpty,
        s"sort-merge as-of fell out of whole-stage codegen:\n$plan")
      val composed = SparkEntry.queries("q_asof_join")(spark, dir)
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
      assert(rows == composed, "codegen'd merge disagrees with the composition")
    } finally spark.conf.set(key, saved)
  }

  test("non-integral (binary) keys take the interpreted merge, not codegen") {
    val dir = sf("sf0.001")
    val (events, orders) = sides(dir)
    val le = events.withColumn("k", expr("unhex(md5(cast(user_id AS string)))"))
    val re = orders.withColumn("rk", expr("unhex(md5(cast(o_custkey AS string)))"))
      .drop("o_custkey")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = AsOfJoin(le, re, "k", "rk", "t", "ot").select("event_id", "o_orderkey")
      val n = df.collect().length // executes fine through the interpreted path
      assert(n > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isEmpty,
        s"binary keys must not enter the primitive-field codegen merge:\n$plan")
    } finally spark.conf.set(key, saved)
  }
}
