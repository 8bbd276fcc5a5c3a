package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair relations (e.g. the near-dup pair
  * graph) — the same distributed-iteration discipline as
  * [[Dedup.connectedComponents]]: all state stays in DataFrames partitioned
  * by vertex, every round is a bounded number of hash joins + aggregates,
  * lineage is truncated per round with localCheckpoint so plan analysis is
  * O(1) per iteration, and the only driver-side values are scalars (the
  * vertex count here — the "collect only the model" contract).
  */
object Graph {

  /** Undirected PageRank by power iteration: `iters` fixed rounds at the
    * given damping. Returns (v, rank). Ranks over the undirected pair graph
    * rank cluster "hubs" — e.g. which document sits at the center of a
    * near-dup cluster, a better keep-policy signal than min-id.
    */
  def pageRank(pairs: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
    // out-degree rides with each edge so the per-round contribution is one
    // join + one aggregate; materialized once
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesWithDeg = edges.join(deg, Seq("src")).localCheckpoint()
    val nodes = edgesWithDeg.select(col("src").as("v")).distinct().localCheckpoint()
    val n = nodes.count() // ONE scalar to the driver
    require(n > 0, "pageRank: empty graph")
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var i = 0
    while (i < iters) {
      val contribs = edgesWithDeg
        .join(ranks, edgesWithDeg("src") === ranks("v"))
        .select(col("dst").as("v"), (col("rank") / col("deg")).as("c"))
        .groupBy("v").agg(sum(col("c")).as("in"))
      ranks = nodes.join(contribs, Seq("v"), "left")
        .select(col("v"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("in"), lit(0.0))).as("rank"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }
}
