package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair relations (e.g. the near-dup pair
  * graph) — the same distributed-iteration discipline as
  * [[Dedup.connectedComponents]]: all state stays in DataFrames partitioned
  * by vertex, every round is a bounded number of hash joins + aggregates,
  * lineage is truncated with localCheckpoint every few rounds so plan
  * analysis stays O(1) per iteration, and the only driver-side values are
  * scalars (the vertex count here — the "collect only the model" contract).
  * Queries persist() shared subplans without unpersisting — the
  * Bench/Verify harness clears cache and persistent RDDs between queries
  * (the house convention; see Bench.time).
  */
object Graph {

  /** Undirected PageRank by power iteration: `iters` fixed rounds at the
    * given damping. Returns (v, rank). Ranks over the undirected pair graph
    * rank cluster "hubs" — e.g. which document sits at the center of a
    * near-dup cluster, a better keep-policy signal than min-id. Lineage is
    * truncated every 3rd round (NOT per round — an eager materialization per
    * iteration is a job storm); intermediate rounds stay lazy.
    */
  def pageRank(pairs: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
    // adjacency-list form: one row per VERTEX (not per edge), degree is the
    // list size — so the per-round join touches |V| rows, not |E|, and no
    // separate degree join exists. Persisted LAZILY — the n count below is
    // the one materialization, no extra eager checkpoint job. Skew note: a
    // hub's list is its degree; at cluster scale cap it by splitting hub
    // vertices (salt + merge), same treatment the triangle adjacency needs.
    val adj = edges.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("ns")).persist()
    val n = adj.count() // ONE scalar to the driver
    require(n > 0, "pageRank: empty graph")
    var ranks = adj.select(col("src").as("v"), lit(1.0 / n).as("rank"))
    var i = 0
    while (i < iters) {
      // after symmetrization every vertex has deg >= 1, so every vertex
      // receives at least one contribution: no dangling-mass re-join against
      // the node set is needed — the contribution aggregate IS the next rank
      // relation. Explode fans the tiny joined relation back to |E| rows
      // map-side; partial aggregation collapses them before the shuffle.
      ranks = adj
        .join(ranks, adj("src") === ranks("v"))
        .select(explode(col("ns")).as("v"), (col("rank") / size(col("ns"))).as("c"))
        .groupBy("v").agg(
          (lit((1.0 - damping) / n) + lit(damping) * sum(col("c"))).as("rank"))
      i += 1
      // truncate lineage every 3rd round so plan analysis stays O(1) per
      // round on long runs, without paying an eager materialization job per
      // iteration (the q_ann_ivf job-storm lesson)
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Oriented (u < v), distinct co-purchase edges: parts appearing in the
    * same order. Row-local pair generation from per-order sorted part arrays
    * (bounded fan-out, ≤7 lines/order) — the shingle-array pair-gen pattern
    * from q_ngram_jaccard, no self-join on the order key.
    */
  private def copurchaseEdges(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))")).as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()

  /** Distributed triangle count over the co-purchase graph (parts appearing in
    * the same order), by the EDGE-ITERATOR algorithm: orient every edge u < v,
    * build each node's out-neighbor list once, and count a triangle (u<v<w) at
    * its lowest edge (u,v) as w ∈ N⁺(u) ∩ N⁺(v) — a row-local intersection,
    * so the per-edge work is bounded by the two degrees and NO wedge relation
    * ever materializes (this graph has 49M wedges at sf0.1 but only 1.2M
    * edges; the wedge-join formulation measured 3× slower). Edge construction
    * is row-local (see [[copurchaseEdges]]). Shuffles:
    * one groupBy(order), one distinct(edge), one groupBy(u), two 1.2M-row
    * adjacency equi-joins — everything else is map-side. At cluster scale the
    * orientation key becomes (degree, id) so hub nodes don't own O(deg²)
    * intersections; id-order keeps the oracle expressible, same plan shape.
    * The oracle states the same count as a 3-equi-join over the edge CTE —
    * the declarative spec, not the plan.
    */
  val triangles = Q(
    "q_triangles",
    (s, d) => {
      val e = copurchaseEdges(s, d)
        .persist() // one honest materialization: e feeds adj and both joins
      val adj = e.groupBy(col("u")).agg(collect_list(col("v")).as("ns"))
      e.join(adj.select(col("u").as("a1"), col("ns").as("nu")), col("u") === col("a1"))
        .join(adj.select(col("u").as("a2"), col("ns").as("nv")), col("v") === col("a2"))
        .select(size(array_intersect(col("nu"), col("nv"))).as("t"))
        // coalesce: an edgeless graph must report 0 like the oracle's
        // count(*), not sum()'s NULL
        .agg(coalesce(sum(col("t")), lit(0L)).cast("long").as("n_triangles"))
    },
    """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p)
      |SELECT count(*) AS n_triangles
      |FROM e e1 JOIN e e2 ON e1.v = e2.u
      |JOIN e e3 ON e2.v = e3.v AND e1.u = e3.u""".stripMargin
  )

  /** PageRank over the co-purchase graph — 5 damped power iterations via
    * [[pageRank]] (per round: one |V|-row join, a map-side explode to
    * contributions, one partial-aggregated shuffle; lineage truncated every
    * 3rd round), top-20 hubs. The training-pipeline use is crawl
    * quality weighting: rank pages by link centrality and weight sampling by
    * it. Ranks are rounded to 10 decimals (~6 significant digits at the
    * 1/n ≈ 5e-5 magnitude) so double summation order — across engines AND
    * across partitionings — can't flip the hash; ORDER BY uses the rounded
    * value so the top-20 cut is deterministic too. The oracle states the
    * same five iterations as chained CTEs — the declarative spec of the
    * fixed-point step, not the plan.
    */
  val pagerank = Q(
    "q_pagerank",
    (s, d) => {
      val e = copurchaseEdges(s, d)
      val ranks = pageRank(e.select(col("u").as("d1"), col("v").as("d2")), iters = 5)
      ranks
        .select(col("v"), round(col("rank"), 10).as("rank_r"))
        .orderBy(col("rank_r").desc, col("v"))
        .limit(20)
    }, {
      // one fixed-point step: rK(v) = 0.15/n + 0.85 * Σ_{(u,v)∈e} rK-1(u)/deg(u)
      def step(k: Int): String =
        s"""r$k AS (SELECT deg.u AS v, 0.15 / nn.c + 0.85 * coalesce(s.m, 0) AS rank
           |  FROM deg CROSS JOIN nn
           |  LEFT JOIN (SELECT e.v, sum(r.rank / d.deg) AS m
           |             FROM e JOIN r${k - 1} r ON e.u = r.v JOIN deg d ON e.u = d.u
           |             GROUP BY e.v) s ON deg.u = s.v)""".stripMargin
      s"""WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p),
         |e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
         |deg AS (SELECT u, count(*) AS deg FROM e GROUP BY u),
         |nn AS (SELECT count(*) AS c FROM deg),
         |r0 AS (SELECT u AS v, 1.0 / nn.c AS rank FROM deg CROSS JOIN nn),
         |${(1 to 5).map(step).mkString(",\n")}
         |SELECT v, round(rank, 10) AS rank_r FROM r5
         |ORDER BY rank_r DESC, v LIMIT 20""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(triangles, pagerank)
}
