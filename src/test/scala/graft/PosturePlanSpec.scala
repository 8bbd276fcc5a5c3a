package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape pins for the session's scale-posture claims — each assertion
  * here is a sentence from a query's scaladoc made executable. Executed
  * (post-action) plans are inspected where the claim is a runtime property.
  */
class PosturePlanSpec extends SparkSpec {

  /** Flatten an executed plan THROUGH AQE wrappers (and reused-exchange /
    * query-stage indirection): `plan.collect` alone stops at
    * AdaptiveSparkPlanExec's leaf.
    */
  private def nodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec        => q +: nodes(q.plan)
      case other                    => other +: other.children.flatMap(nodes)
    }
  }

  test("hybrid RRF: both legs reduce via TakeOrderedAndProject before ranking") {
    val df = SparkEntry.queries("q_hybrid_rrf")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val heaps = "TakeOrderedAndProject".r.findAllIn(plan).size
    assert(heaps >= 2, s"expected 2 top-k reductions, found $heaps in:\n${plan.take(1500)}")
    // the rank windows sit above the Limits: windows exist, but no window
    // runs over an unlimited corpus relation — the corpus scans feed
    // aggregates/top-k only (structural spot check: every WindowExec in the
    // plan is above a TakeOrderedAndProject output, which is ≤50 rows)
    assert(plan.contains("Window"), "rank windows missing")
  }

  test("skyline: pre-filter window is bucket-partitioned; domination join is BNLJ, not cartesian") {
    val df = SparkEntry.queries("q_skyline")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the pre-filter window must carry the bucket partition spec — a global
    // (unpartitioned) window here would single-task the corpus
    assert(plan.contains("Window") && plan.contains("bkt"),
      s"bucketed window missing:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("LeftAnti"),
      "domination anti-join shape missing")
    assert(!plan.contains("CartesianProduct"), "domination degraded to a cartesian")
  }

  test("BFS: the materialized edge relation absorbs every corpus scan") {
    val df = SparkEntry.queries("q_bfs")(spark, sf())
    df.collect()
    val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.isEmpty,
      s"expected zero file scans in the final BFS plan (checkpoint absorbs them), got ${scans.size}")
  }

  test("mode: the argmax window runs over the aggregated grain, not the event scan") {
    val df = SparkEntry.queries("q_mode")(spark, sf())
    df.collect()
    val all = nodes(df.queryExecution.executedPlan)
    // the window's child subtree must contain the (user, type) aggregate —
    // i.e. the corpus is reduced BEFORE any sort-for-window happens
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "argmax window missing")
    assert(windows.forall(w => nodes(w.child).exists(_.nodeName.contains("HashAggregate"))),
      "window is not above the count aggregate — it would sort raw events")
  }

  test("shuffle shards: ranking windows run on the (shard, obkt) grain, never shard alone") {
    // 8 shards is a low-cardinality partition key; the two-level rank keeps
    // every corpus-grain window on (shard, order-bucket) — ~1/256 of a shard
    // per task — with only the bounded 8×256 offset grain allowed narrower
    val df = SparkEntry.queries("q_shuffle_shards")(spark, sf())
    df.collect()
    val wins = nodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.size < 2).foreach { w =>
      val hasAgg = nodes(w.child).exists {
        case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
        case _ => false
      }
      assert(hasAgg,
        s"shard-partitioned window over the raw corpus grain:\n${w.simpleStringWithNodeId()}")
    }
  }

  test("merge upsert: both sides reduce per-key before the full-outer join") {
    val df = SparkEntry.queries("q_merge_upsert")(spark, sf())
    df.collect()
    val joins = nodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
    val outer = joins.filter(_.joinType.toString.contains("FullOuter"))
    assert(outer.size == 1, s"expected one full-outer join, got ${joins.map(_.joinType)}")
    // each side of the merge join must contain its own top-1 window (the
    // per-key reduction) — the join never sees the raw log
    assert(outer.head.children.forall(c => nodes(c).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])),
      "a merge side reached the join unreduced")
  }

  test("rfm and lorenz: every window partitions on the data-dependent bucket key") {
    // round-11 removed the sort-based ntile cut (broadcast boundary model +
    // row-local comparisons); round-12's exactCutsM rewrite computes the
    // boundary model's order statistics via the gini-style two-level
    // bucketed rank, whose only windows partition on the approx-model
    // bucket key — same contract as the q_gini gate below. A window with a
    // FOLDABLE (constant) partition key would be the round-10 single-task
    // sort sneaking back in.
    Seq("q_rfm", "q_lorenz").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf())
      df.collect()
      val wins = nodes(df.queryExecution.executedPlan).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      wins.foreach { w =>
        assert(w.partitionSpec.nonEmpty && w.partitionSpec.forall(!_.foldable),
          s"$q window lost its data-dependent partitioning: ${w.partitionSpec}")
      }
    }
  }

  test("gini: every window partitions on the data-dependent (type, bucket) key") {
    val df = SparkEntry.queries("q_gini")(spark, sf())
    df.collect()
    val wins = nodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty && w.partitionSpec.forall(!_.foldable),
        s"gini window lost its data-dependent partitioning: ${w.partitionSpec}")
    }
  }

  test("ranking family: every window partitions by (nation, bucket), never nation alone") {
    // 25 nations over an unbounded customer table is a low-cardinality
    // partition key — the two-level bucketed rank must keep every window on
    // the (n_name, bkt) grain
    val df = SparkEntry.queries("q_ranking_family")(spark, sf())
    df.collect()
    val wins = nodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    val rowLevel = wins.filter(_.partitionSpec.size < 2)
    // the only sub-2-column windows allowed are the bounded offset grain
    // (≤ nations × 16 rows); those sit under an Exchange reading the
    // aggregated `per` relation, never the customer scan
    rowLevel.foreach { w =>
      val hasAgg = nodes(w.child).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]) ||
        nodes(w.child).exists(
          _.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec]) ||
        nodes(w.child).exists(
          _.isInstanceOf[org.apache.spark.sql.execution.aggregate.SortAggregateExec])
      assert(hasAgg,
        s"nation-partitioned window over the raw customer grain:\n${w.simpleStringWithNodeId()}")
    }
  }

  test("seq_pack: the packing window partitions by (source, shard)") {
    val df = SparkEntry.queries("q_seq_pack")(spark, sf())
    df.collect()
    val wins = nodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.size == 2),
      s"packing window no longer sharded: ${wins.map(_.partitionSpec)}")
  }
}
