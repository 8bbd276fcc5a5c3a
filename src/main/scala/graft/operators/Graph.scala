package graft.operators

import graft.{Q, Tables}
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

  /** Distributed triangle count over the co-purchase graph (parts appearing in
    * the same order). Edge construction is a self-join on l_orderkey — bounded
    * fan-out (TPC-H orders have ≤ 7 lines), so it is linear, never cartesian.
    * Triangles are counted with the oriented node-iterator join: every edge is
    * stored once as u < v, and a triangle (u < v < w) is found exactly once as
    * e1=(u,v) ⋈ e2=(v,w) ⋈ e3=(u,w) — three equi-joins, no inequality join in
    * the probe. At cluster scale the orientation key would be (degree, id)
    * instead of raw id so high-degree hubs don't own O(deg²) wedges; id-order
    * keeps the oracle expressible and the plan shape identical.
    */
  val triangles = Q(
    "q_triangles",
    (s, d) => {
      val pl = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val e = pl.as("a").join(pl.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
      e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .join(e.as("e3"),
          col("e2.v") === col("e3.v") && col("e1.u") === col("e3.u"))
        .agg(count(lit(1)).as("n_triangles"))
    },
    """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p)
      |SELECT count(*) AS n_triangles
      |FROM e e1 JOIN e e2 ON e1.v = e2.u
      |JOIN e e3 ON e2.v = e3.v AND e1.u = e3.u""".stripMargin
  )

  val all: Seq[Q] = Seq(triangles)
}
