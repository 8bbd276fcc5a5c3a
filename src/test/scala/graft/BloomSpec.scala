package graft

import org.apache.spark.sql.functions._

/** Contracts for the Bloom-filter pair (plans/BloomFilter.scala):
  * no false negatives, bounded false positives, partitioning-invariant
  * serialized state, and end-to-end prefilter exactness vs the
  * un-prefiltered decontamination query.
  */
class BloomSpec extends SparkSpec {

  private def buildBloom(values: Seq[Long], parts: Int, n: Int = 10000): Array[Byte] = {
    import spark.implicits._
    values.toDF("h").repartition(parts)
      .agg(expr(s"graft_bloom(h, $n, CAST(0.01 AS DOUBLE))").as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  test("no false negatives; false positives bounded near the requested fpp") {
    val inserted = (0L until 10000L).map(_ * 7919L)
    val bytes = buildBloom(inserted, 8)
    val f = graft.plans.Bloom.deserialize(bytes)
    assert(inserted.forall(f.mightContain), "a Bloom filter must never drop an inserted value")
    val probes = (1L to 20000L).map(v => 1000000007L * v + 3L)
    val fps = probes.count(f.mightContain).toDouble / probes.size
    assert(fps < 0.03, s"false-positive rate $fps far exceeds the requested 0.01")
  }

  test("serialized filter is identical under 1 vs 8 input partitions (OR-merge invariance)") {
    val values = (0L until 5000L).map(graft.plans.Bloom.mix64)
    assert(java.util.Arrays.equals(buildBloom(values, 1), buildBloom(values, 8)),
      "bitset OR is commutative — partitioning must not change the serialized filter")
  }

  test("probe expression stays inside whole-stage codegen") {
    val bytes = buildBloom(Seq(1L, 2L, 3L), 1)
    val hex = bytes.map("%02X".format(_)).mkString
    // probe over a range scan, not an in-memory Seq: a deterministic filter
    // over a LocalRelation is constant-folded away by ConvertToLocalRelation,
    // leaving no codegen stage to observe
    val result = spark.range(1L, 6L).toDF("h")
      .filter(expr(s"graft_might_contain(X'$hex', h)"))
    val plan = result.queryExecution.executedPlan.toString
    // codegen stages render as a `*(n)` prefix on each fused node
    assert(plan.contains("*(1) Filter") || plan.contains("WholeStageCodegen"),
      s"might_contain filter fell out of whole-stage codegen:\n$plan")
    assert(result.collect().map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
    assert(Set(1L, 2L, 3L).forall(result.collect().map(_.getLong(0)).toSet.contains),
      "inserted values must survive the probe filter")
  }

  test("bloom-prefiltered decontamination equals the exact query") {
    val exact = SparkEntry.queries("q_decontaminate")(spark, sf()).collect()
    val bloom = SparkEntry.queries("q_decontaminate_bloom")(spark, sf()).collect()
    assert(exact.nonEmpty, "decontamination fixture must produce rows")
    assert(exact.map(_.toString).toSeq == bloom.map(_.toString).toSeq,
      "bloom prefilter must be result-invariant (no false negatives + exact verify join)")
  }

  test("the registered query's plan probes the filter via a scalar subquery, not a per-row column") {
    val df = SparkEntry.queries("q_decontaminate_bloom")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    // the filter value must reach the probe as a once-evaluated CONSTANT
    // (scalar subquery → one decode per task); routing it through a join
    // column would copy + decode the bitset per row — row accessors copy
    // binary values (measured 100× at sf0.1)
    assert(plan.contains("graft_might_contain(Subquery subquery"),
      s"expected the probe to take the bloom as a scalar subquery:\n$plan")
  }

  test("type errors are rejected at analysis, not in executors") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("s", "x")
    val e = intercept[Exception] {
      df.agg(expr("graft_bloom(s, 100, CAST(0.01 AS DOUBLE))")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint") ||
      e.getMessage.contains("graft_bloom"))
    val e2 = intercept[Exception] {
      df.select(expr("graft_might_contain(s, 1L)")).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("binary") ||
      e2.getMessage.contains("graft_might_contain"))
  }
}
