package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Demonstrates dynamic partition pruning (DPP): a fact table laid out as
  * hive-style partitions on its join key is scanned ONLY for the partitions
  * the filtered dimension actually selects — the scan's partition filter is
  * injected at runtime from the dim side's build. This is the table-layout
  * complement to q_zorder's file-level stats pruning: at 100 TB the fact
  * table is partitioned by date/region and a dim filter must prune the scan
  * BEFORE it reads, not after.
  */
class DppSpec extends SparkSpec {

  test("a filtered dim join prunes the partitioned fact scan at runtime") {
    val s: SparkSession = spark.newSession()
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // the dim side is tiny; let DPP reuse its broadcast as the pruning filter
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "true")

    val dir = Files.createTempDirectory("graft-dpp").toFile
    dir.deleteOnExit()
    val factPath = s"${dir.getAbsolutePath}/orders_by_nation"
    try {
      // fact: orders keyed to a nation via customer, partitioned on n_nationkey
      val d = sf("sf0.001")
      val fact = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("c_nationkey").cast("int").as("nationkey"))
      fact.write.partitionBy("nationkey").mode("overwrite").parquet(factPath)

      val partitioned = s.read.parquet(factPath)
      val dim = Tables.nation(s, d).filter(col("n_name") === "NATION_7")
      val joined = partitioned
        .join(dim, col("nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))

      val rows = joined.collect()
      assert(rows.length == 1 && rows(0).getString(0) == "NATION_7")

      // the optimized plan must carry a dynamicpruning subquery on the
      // fact scan's partition column — i.e. the pruning predicate exists
      // BEFORE execution and is fed from the dim side at runtime
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dynamicpruning"),
        s"expected a dynamicpruning predicate on the partitioned scan:\n$optimized")

      // and the EXECUTED scan must have read strictly fewer partitions than
      // exist on disk (25 nations written, 1 selected) — this is the runtime
      // behavior the spec exists to pin; the plan-string check above alone
      // would stay green if pruning degraded to a no-op predicate
      def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            leaves(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            leaves(q.plan)
          case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        }.flatten
      val factScans = leaves(joined.queryExecution.executedPlan)
        .filter(_.toString.contains("orders_by_nation"))
      assert(factScans.nonEmpty, "expected a parquet scan of the partitioned fact")
      val partsRead = factScans.map(s =>
        s.metrics.get("numPartitions").map(_.value).getOrElse(-1L)).max
      assert(partsRead == 1L,
        s"DPP must prune the scan to the 1 selected partition of 25, read $partsRead")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
