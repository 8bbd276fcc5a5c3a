package graft.operators

import graft.{Q, Tables, Warehouse}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair relations (e.g. the near-dup pair
  * graph) — the same distributed-iteration discipline as
  * [[Dedup.connectedComponents]]: all state stays in DataFrames partitioned
  * by vertex, every round is a bounded number of hash joins + aggregates,
  * lineage is truncated with localCheckpoint every few rounds so plan
  * analysis stays O(1) per iteration, and the only driver-side values are
  * scalars (the vertex count here — the "collect only the model" contract).
  *
  * HUB SKEW is handled structurally, not by hoping the data is nice: a
  * power-law hub must never own an O(degree) array in a single row or an
  * O(deg²) intersection in a single task. Triangle counting orients every
  * edge by (degree, id) — out-degrees are then bounded by O(√E) regardless
  * of hub size — and PageRank splits each vertex's adjacency into
  * hash-salted chunks of at most `maxChunk` neighbors, merged back by the
  * contribution aggregate (GraphSkewSpec pins both bounds on a 10k-spoke
  * star). The public helpers clean up their persisted state once the result
  * is materialized (`cleanup = true`); the registered queries pass
  * `cleanup = false` and rely on the Bench/Verify harness clearing cache and
  * persistent RDDs between queries, which keeps their returned plans lazy
  * for the ContractSpec plan gates (the house convention; see Bench.time).
  */
object Graph {

  /** Per-chunk cap on the salted adjacency lists in [[pageRank]]. 1024 longs
    * ≈ 8 KB per row — comfortably inside any row-size budget, while ordinary
    * (non-hub) vertices stay in a single chunk.
    */
  val MaxAdjChunk = 1024

  /** Undirected PageRank by power iteration: `iters` fixed rounds at the
    * given damping. Returns (v, rank). Ranks over the undirected pair graph
    * rank cluster "hubs" — e.g. which document sits at the center of a
    * near-dup cluster, a better keep-policy signal than min-id. Lineage is
    * truncated every 3rd round (NOT per round — an eager materialization per
    * iteration is a job storm); intermediate rounds stay lazy.
    *
    * Hub-split adjacency: degrees are counted FIRST (a plain count aggregate,
    * no arrays), then each edge is salted by `hash(dst) mod ceil(deg/maxChunk)`
    * so the per-(src, salt) collect_list is bounded by ~maxChunk whatever the
    * hub's degree — the full neighbor list of a 10M-degree vertex never
    * exists as one row. Each chunk row carries the TOTAL degree, so a chunk
    * contributes `rank/deg` per neighbor exactly as the unsplit form did and
    * the per-vertex contribution aggregate merges the chunks back; the rank
    * values are bit-identical to the unsplit plan (GraphSkewSpec pins this).
    */
  def pageRank(pairs: DataFrame, iters: Int = 10, damping: Double = 0.85,
               maxChunk: Int = MaxAdjChunk, cleanup: Boolean = true): DataFrame = {
    // FUSED single-exchange build (round 10): repartition the symmetrized
    // edge relation by hash(src) ONCE, cache it, and derive EVERYTHING —
    // the degree aggregate, the salted degree attach, and the chunk
    // aggregate — exchange-free on that cache:
    //   - groupBy(src) needs ClusteredDistribution(src): satisfied, no
    //     exchange, final-only hash aggregate;
    //   - the degree attach broadcasts the |V|-row side, streaming the
    //     cached edges through untouched (output partitioning stays
    //     hash(src));
    //   - groupBy(src, salt) needs ClusteredDistribution(src, salt), which
    //     hash(src) ALSO satisfies (partition keys ⊆ grouping keys) — the
    //     chunk aggregate runs single-stage with no shuffle, and its output
    //     partitioning is still hash(src), exactly what every iteration's
    //     adj-side join wants.
    // The pre-round-10 build paid three big exchanges here (degree shuffle,
    // chunk-agg shuffle, and a repartition(src) to pin the cache layout);
    // this one pays exactly one |E|-row exchange. Trade-off, stated
    // honestly: a hub's RAW edges now co-locate in one partition during the
    // build, so its chunk aggregation is O(deg) appends in a single task —
    // bounded WORK any plan pays somewhere (the old plan shuffled those same
    // rows), never a wide row; the chunk rows themselves stay ≤~maxChunk and
    // the hub's chunk rows co-locate under hash(src) in either design
    // (GraphSkewSpec still pins the row bound and split-vs-unsplit rank
    // equality). The blocks are released as soon as the adjacency is
    // materialized.
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .repartition(col("src"))
      .persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // |V|-row degree side: broadcast explicitly (same reasoning as
    // degreeOrientedEdges — skip the AQE runtime conversion pause; the
    // build reads the already-persisted edge blocks)
    val adj = edges.join(broadcast(deg), Seq("src"))
      .withColumn("salt", pmod(hash(col("dst")),
        greatest(lit(1L), ceil(col("deg").cast("double") / maxChunk)).cast("int")))
      .groupBy(col("src"), col("salt"))
      .agg(collect_list(col("dst")).as("ns"), first(col("deg")).as("deg"))
    // Collapse the adjacency to a LogicalRDD LEAF for the iteration loop in
    // ONE eager materialization (round 14: previously persist() + a count to
    // materialize + a second cache-read job to checkpoint — two passes and a
    // duplicate block copy). Every round's logical plan would otherwise
    // embed the full read→union→repartition→join→groupBy build subtree and
    // the analyzer/optimizer re-walk it per round — measured ~1.1 s of pure
    // driver-side planning across 5 rounds at sf0.1. With the leaf,
    // per-round planning is O(round-plan), not O(build-plan). Blocks are
    // released below (cleanup=true) or by the harness's persistent-RDD
    // sweep.
    val adjLeaf = adj.localCheckpoint()
    edges.unpersist(blocking = false)
    // ONE scalar to the driver: |V|, read off the checkpointed chunk leaf.
    val n = adjLeaf.select(col("src")).distinct().count()
    require(n > 0, "pageRank: empty graph")
    var ranks = adjLeaf.select(col("src").as("v")).distinct()
      .select(col("v"), lit(1.0 / n).as("rank"))
    var i = 0
    while (i < iters) {
      // after symmetrization every vertex has deg >= 1, so every vertex
      // receives at least one contribution: no dangling-mass re-join against
      // the node set is needed — the contribution aggregate IS the next rank
      // relation. Explode fans the joined chunk relation back to |E| rows
      // map-side; partial aggregation collapses them before the shuffle. A
      // hub's rank row joins once per chunk — bounded rows, never a bounded
      // task doing unbounded work.
      ranks = adjLeaf
        .join(ranks, adjLeaf("src") === ranks("v"))
        .select(explode(col("ns")).as("v"), (col("rank") / col("deg")).as("c"))
        .groupBy("v").agg(
          (lit((1.0 - damping) / n) + lit(damping) * sum(col("c"))).as("rank"))
      i += 1
      // bound effective plan size every 3rd round with a LAZY persist()
      // mark: later rounds' planning resolves it to an InMemoryRelation
      // leaf, and nothing executes before the final action. A
      // localCheckpoint — even eager=false — is NOT lazy under AQE: its
      // `.rdd` call materializes the round's shuffle stages serially at
      // plan-construction time (the q_bfs lesson, measured ~2.5 s of
      // blocking stage jobs at sf0.1).
      if (i % 3 == 0 && i < iters) ranks = ranks.persist()
    }
    if (cleanup) {
      // materialize the (|V|-row) result, then release the adjacency blocks —
      // the public API must not pin executor memory for the session. The
      // leaf's blocks live on its checkpointed RDD, not in the cache
      // manager, so unpersist via the LogicalRDD handle.
      val out = ranks.localCheckpoint()
      releaseLeaf(adjLeaf)
      out
    } else ranks
  }

  /** Release the checkpointed blocks behind a [[org.apache.spark.sql.Dataset.localCheckpoint]]
    * leaf: localCheckpoint blocks are NOT in the cache manager (Dataset
    * .unpersist can't reach them), but the LogicalRDD leaf holds the
    * persisted RDD handle directly.
    */
  private def releaseLeaf(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Orient each undirected edge from its lower-(degree, id) endpoint to the
    * higher one. Under this total order every vertex's OUT-degree is bounded
    * by O(√E) — a classic arboricity bound: a vertex with out-degree k has k
    * out-neighbors of degree ≥ its own, so out-deg² ≤ 2|E| — which is what
    * makes the edge-iterator triangle count hub-proof: the star graph's hub
    * receives all its edges and owns an EMPTY out-list. Degrees are a count
    * aggregate over both endpoints; the two |E|-row equi-joins that attach
    * them are plain hash joins (skewed hub keys mean more probe rows, never
    * wider rows). The triangle COUNT is invariant under orientation choice,
    * so the declarative oracle doesn't change.
    */
  def degreeOrientedEdges(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("u"), col("v"))
    val deg = e0.select(col("u").as("x")).unionAll(e0.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    // the degree relation is |V| rows of two longs — broadcast it EXPLICITLY
    // so both attaches are map-side from the first plan, not after an AQE
    // runtime conversion (each conversion is a replanning pause between
    // stages; measured ~0.1 s apiece here). At 100 TB |V| still fits the
    // broadcast budget long after |E| stops fitting anything.
    e0.join(broadcast(deg.select(col("x").as("u"), col("d").as("du"))), Seq("u"))
      .join(broadcast(deg.select(col("x").as("v"), col("d").as("dv"))), Seq("v"))
      .select(
        when(fwd, col("u")).otherwise(col("v")).as("s"),
        when(fwd, col("v")).otherwise(col("u")).as("t"))
      .select(col("s").as("u"), col("t").as("v"))
  }

  /** Distributed triangle count by the EDGE-ITERATOR algorithm over
    * degree-ordered edges: orient via [[degreeOrientedEdges]], build each
    * node's out-neighbor list once, and count a triangle at its lowest
    * oriented edge (u,v) as w ∈ N⁺(u) ∩ N⁺(v) — a row-local intersection
    * bounded by the O(√E) out-degree bound, so NO wedge relation ever
    * materializes and no hub owns O(deg²) work. Shuffles: one degree agg,
    * two degree joins, one groupBy(u), two |E|-row adjacency equi-joins —
    * everything else is map-side.
    */
  def triangleCount(edges: DataFrame, cleanup: Boolean = true): DataFrame = {
    // The oriented edge relation feeds THREE consumers (the adjacency build
    // and both probe sides of the joins below), and its lineage contains the
    // input's distinct plus the degree attach — measured (round 8), exchange
    // reuse does NOT collapse those branches here (each re-derivation showed
    // its own co-purchase exchange in the executed plan), so one honest
    // persist of the O(|E|) 2-column relation saves two upstream recomputes:
    // 3.09 s vs 4.35 s unpersisted at sf0.1, matching the pre-orientation
    // round-7 time while keeping the hub-skew bound. At cluster scale the
    // persisted relation is 16 bytes/edge and spills gracefully
    // (MEMORY_AND_DISK default).
    // eager localCheckpoint, not persist: the relation feeds three consumers
    // and two of them are join probe sides — with persist() each consumer's
    // logical plan still embeds the whole orientation build (distinct +
    // degree agg + two broadcast attaches) and the optimizer re-walks it per
    // consumer; the leaf form is planned once (the pageRank adjacency
    // lesson). Blocks released below via the LogicalRDD handle.
    val e = degreeOrientedEdges(edges).localCheckpoint()
    // adjacency lists SORTED once per vertex (O(d log d), amortized over the
    // deg⁺ intersections each list participates in) so the per-edge
    // intersection is the codegen'd two-pointer merge below instead of a
    // hash-set + output-array allocation per row
    val adj = e.groupBy(col("u")).agg(sort_array(collect_list(col("v"))).as("ns"))
    // native allocation-free sorted intersect when the extensions are
    // installed; array_intersect fallback is value-identical on the sorted
    // distinct lists (SortedIntersectSpec pins the equivalence)
    val isect =
      if (edges.sparkSession.catalog.functionExists("graft_sorted_isect"))
        expr("graft_sorted_isect(nu, nv)")
      else size(array_intersect(col("nu"), col("nv")))
    // count each triangle at its lowest oriented edge (u, v): attach N⁺(u)
    // and N⁺(v) by two equi-joins against the adjacency and intersect
    // row-locally. The exploded regenerate-edges-from-adj alternative (carry
    // nu as payload, join only for nv) measured ~1 s SLOWER at sf0.1: the
    // payload-carrying relation is O(Σ deg⁺²) bytes through the second
    // join's exchange, vs O(|E|) probe rows here with both array attaches
    // resolved by the join itself (adj broadcast-converts under AQE when
    // small; skewed hub keys mean more probe ROWS, never wider rows).
    val res = e
      .join(adj.select(col("u").as("a1"), col("ns").as("nu")), col("u") === col("a1"))
      .join(adj.select(col("u").as("a2"), col("ns").as("nv")), col("v") === col("a2"))
      .select(isect.as("t"))
      // coalesce: an edgeless graph must report 0 like the oracle's
      // count(*), not sum()'s NULL
      .agg(coalesce(sum(col("t")), lit(0L)).cast("long").as("n_triangles"))
    if (cleanup) {
      // 1-row result, trivial to materialize; then release the edge blocks —
      // the public API must not pin executor memory for the session
      val out = res.localCheckpoint()
      releaseLeaf(e)
      out
    } else res
  }

  /** Oriented (u < v), distinct co-purchase edges: parts appearing in the
    * same order. Row-local pair generation from per-order sorted part arrays
    * (bounded fan-out, ≤7 lines/order) — the shingle-array pair-gen pattern
    * from q_ngram_jaccard, no self-join on the order key.
    */
  private def copurchaseEdgesBuild(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))")).as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()

  /** MATERIALIZED-ONCE co-purchase edge table. All five graph queries consume
    * the same O(|E|) relation; before round 10 each re-derived it from the
    * lineitem scan (groupBy orderkey → pair explode → distinct, ~2–4 s at
    * sf0.1 — ~40% of the family's bench cost). At 100 TB the edge relation
    * is a materialized table built once and refreshed with the fact table —
    * this seam is that table, under a MANAGED warehouse path:
    *
    *   - Location: `spark.graft.warehouseDir` (any Hadoop-FS URI — HDFS/S3/
    *     local); unset, a per-JVM scratch dir serves demo/test runs. Layout
    *     is `<root>/copurchase_edges/<md5(inputDir)>` — one subdir per
    *     distinct input, so concurrent SFs never collide.
    *   - Refresh: the table is a pure deterministic function of the input
    *     dir; a new/moved input lands in a fresh key and pays one build. To
    *     force a rebuild after in-place fact-table changes, drop the subdir
    *     (or point `spark.graft.warehouseDir` at a new root) — the next
    *     consumer detects absence via the FileSystem and rebuilds.
    *   - Retention: superseded keys are plain parquet dirs; the operator's
    *     cleanup policy (TTL sweep of the warehouse root) applies, nothing
    *     in-engine pins them.
    *
    * First consumer per key pays the build and writes parquet (partitioned
    * by hash(u) at write time so file-group locality mirrors the downstream
    * join keys); every later consumer — including other JVMs sharing the
    * warehouse — reads the 2-column file. In-memory caches are deliberately
    * NOT used: the Bench/Verify harness unpersists everything between
    * queries, and a disk table is the contract a warehouse would actually
    * offer.
    */
  def copurchaseEdges(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    // input fingerprint in the key: a lineitem regenerated in place rebuilds
    // the edge table instead of serving the previous fact table's graph
    Warehouse.table(s, "copurchase_edges",
      s"$d|" + Warehouse.fingerprint(s, s"$d/lineitem.parquet")) {
      // partitioned by hash(u) at write time so file-group locality mirrors
      // the downstream join keys
      copurchaseEdgesBuild(s, d).repartition(col("u"))
    }

  /** Triangle count over the co-purchase graph (parts appearing in the same
    * order) via [[triangleCount]]. The oracle states the same count as a
    * 3-equi-join over the id-oriented edge CTE — the declarative spec, not
    * the plan; the count is orientation-invariant.
    */
  val triangles = Q(
    "q_triangles",
    (s, d) => triangleCount(copurchaseEdges(s, d), cleanup = false),
    """WITH pl AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p)
      |SELECT count(*) AS n_triangles
      |FROM e e1 JOIN e e2 ON e1.v = e2.u
      |JOIN e e3 ON e2.v = e3.v AND e1.u = e3.u""".stripMargin
  )

  /** PageRank over the co-purchase graph — 5 damped power iterations via
    * [[pageRank]] (per round: one chunk-relation join, a map-side explode to
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
      val ranks = pageRank(e.select(col("u").as("d1"), col("v").as("d2")),
        iters = 5, cleanup = false)
      ranks
        .select(col("v"), round(col("rank"), 10).as("rank_r"))
        .orderBy(col("rank_r").desc, col("v"))
        .limit(20)
    }, {
      // one fixed-point step: rK(v) = 0.15/n + 0.85 * Σ_{(u,v)∈e} rK-1(u)/deg(u)
      def step(k: Int): String =
        s"""r$k AS MATERIALIZED (SELECT deg.u AS v, 0.15 / nn.c + 0.85 * coalesce(s.m, 0) AS rank
           |  FROM deg CROSS JOIN nn
           |  LEFT JOIN (SELECT e.v, sum(r.rank / d.deg) AS m
           |             FROM e JOIN r${k - 1} r ON e.u = r.v JOIN deg d ON e.u = d.u
           |             GROUP BY e.v) s ON deg.u = s.v)""".stripMargin
      // MATERIALIZED per the q_sssp precedent: DuckDB inlines plain CTEs,
      // re-executing a CTE once PER REFERENCE — with e referenced every
      // round and each rK feeding rK+1, the sf1 run re-derived the 12M-row
      // edge DISTINCT dozens of times and died spilling >60 GB; the hint
      // states the same relation algebra, it just pins single evaluation
      s"""WITH pl AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p),
         |e AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
         |deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM e GROUP BY u),
         |nn AS (SELECT count(*) AS c FROM deg),
         |r0 AS (SELECT u AS v, 1.0 / nn.c AS rank FROM deg CROSS JOIN nn),
         |${(1 to 5).map(step).mkString(",\n")}
         |SELECT v, round(rank, 10) AS rank_r FROM r5
         |ORDER BY rank_r DESC, v LIMIT 20""".stripMargin
    }
  )

  /** Single-source BFS hop distances by FRONTIER expansion: `rounds` fixed
    * relaxation rounds (the fixed-K twin of the oracle's chained CTEs; K ≥
    * diameter ⟹ the exact distances). Per round only the FRONTIER — the
    * vertices first reached last round — joins the edge relation (the
    * standard optimization over full relaxation; provably equivalent: a
    * vertex with d < k−1 cannot improve any neighbor at round k), and the
    * min-distance aggregate partial-aggregates map-side, so a frontier hub
    * costs O(deg) candidate ROWS through the shuffle, never a wide row.
    * State is the (v, d) relation, vertex-partitioned; rounds are
    * O(diameter) like [[Dedup.connectedComponents]]; each round's distance
    * relation is persist()-marked — the TRULY lazy truncation: the double
    * reference to it (next round's union + the frontier filter) resolves to
    * one InMemoryRelation at final planning instead of re-deriving the whole
    * prefix, and NOTHING executes before the final action. (localCheckpoint
    * — even `eager = false` — is not lazy under AQE: `.rdd` calls
    * `getFinalPhysicalPlan()`, which materializes every shuffle stage of
    * the round SERIALLY at plan-construction time; measured ~2.5 s of
    * blocking stage jobs at sf0.1 vs ~0 for the persist marks.) Cache
    * lifetime follows the house convention: the harness's clearCache
    * between queries, or the caller for library use. Nothing crosses the
    * driver at all: the seed is a one-row DataFrame.
    */
  def bfsDistances(edgesSym: DataFrame, source: Long, rounds: Int): DataFrame =
    bfsDistancesFrom(edgesSym,
      edgesSym.sparkSession.range(1)
        .select(lit(source).as("v"), lit(0).as("d")), rounds)

  /** [[bfsDistances]] with the seed stated as a one-row (v, d=0) RELATION —
    * the registered query derives its seed (min vertex id) lazily from the
    * edge table itself, so the whole BFS is ONE action with zero driver
    * scalars.
    */
  def bfsDistancesFrom(edgesSym: DataFrame, d0: DataFrame, rounds: Int): DataFrame = {
    var dist = d0
    var frontier = dist
    for (k <- 1 to rounds) {
      val cand = frontier.select(col("v").as("fv"))
        .join(edgesSym, col("fv") === col("u"))
        .select(col("v"), lit(k).as("d"))
      dist = dist.unionByName(cand).groupBy(col("v")).agg(min(col("d")).as("d"))
        .persist()
      frontier = dist.filter(col("d") === k)
    }
    dist
  }

  /** BFS level histogram over the co-purchase graph from the minimum vertex
    * id (deterministic seed): how much of the catalog is within K hops of
    * the seed part — the reachability profile that motivates "related
    * products" traversals. 4 rounds ≥ the fixture's diameter (2), so the
    * trailing rounds also witness fixpoint STABILITY. The oracle states the
    * same four rounds as full-relaxation CTEs — the declarative spec of the
    * step; frontier expansion is the plan.
    */
  val bfs = Q(
    "q_bfs",
    (s, d) => {
      // the edge relation is consumed by the seed probe AND by every
      // round's frontier join — without materialization the expensive
      // per-order pair generation re-derives once per consumer (measured:
      // 7.9 s → the dominant cost). One localCheckpoint of the O(|E|)
      // 2-column relation serves all of them (the triangles convention).
      val e0 = copurchaseEdges(s, d)
      // repartition on u BEFORE the checkpoint (the pageRank adjacency
      // lesson): the materialized relation then carries hash(u) output
      // partitioning, so every round's frontier join on u is exchange-free
      // on the big side — only the tiny frontier moves per round.
      val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
        .localCheckpoint()
      // seed = min vertex id, stated as a one-row RELATION (not a collected
      // scalar): the whole BFS is then ONE action — no blocking seed probe
      // job ahead of the rounds (round 14; the seed agg reads the same
      // checkpointed edge leaf the rounds join against)
      val d0 = e.agg(min(col("u")).as("v")).select(col("v"), lit(0).as("d"))
      bfsDistancesFrom(e, d0, rounds = 4)
        .groupBy(col("d").cast("long").as("dist"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    }, {
      // dK is referenced TWICE by dK+1 (carry-forward + relax), so plain
      // inlined CTEs re-execute the whole prefix 2^k times — the sf1 run
      // died spilling >60 GB before MATERIALIZED pinned single evaluation
      // (31.7 s measured at sf1 with the hints; same relation algebra)
      def step(k: Int): String =
        s"""d$k AS MATERIALIZED (SELECT v, min(d) AS d FROM (
           |  SELECT v, d FROM d${k - 1}
           |  UNION ALL SELECT e.v, d${k - 1}.d + 1 FROM e JOIN d${k - 1} ON e.u = d${k - 1}.v
           |) GROUP BY v)""".stripMargin
      s"""WITH pl AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p),
         |e AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
         |d0 AS (SELECT (SELECT min(u) FROM e) AS v, 0 AS d),
         |${(1 to 4).map(step).mkString(",\n")}
         |SELECT CAST(d AS BIGINT) AS dist, count(*) AS n_nodes FROM d4
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }
  )

  /** WEIGHTED single-source shortest paths — the min-plus (Bellman-Ford)
    * completion of the graph family next to BFS's hop distances: 6 fixed
    * relaxation rounds over deterministic integer edge weights
    * (1 + md5-hash(u:v) mod 5, computed once on the oriented edge so both
    * directions share it), distances exact-integer so no float-sum contract
    * is needed. Unlike BFS, a weighted round relaxes the FULL distance
    * relation (a settled vertex can still improve a neighbor via a cheaper
    * longer path), so each round is one |dist|⋈|E| equi-join on the
    * hash(u)-partitioned checkpointed edges — exchange-free on the big
    * side — plus a map-side-combined min aggregate. The oracle states the
    * identical 6 rounds as chained CTEs; 6 ≥ the fixture's weighted-path
    * hop length, and the trailing rounds witness fixpoint stability (the
    * BFS convention).
    */
  val sssp = Q(
    "q_sssp",
    (s, d) => {
      val e0 = copurchaseEdges(s, d)
        .withColumn("w", lit(1L) + pmod(
          graft.functions.TextFns.hash32(
            concat(col("u").cast("string"), lit(":"), col("v").cast("string"))),
          lit(5L)))
      val e = e0.select(col("u"), col("v"), col("w"))
        .unionByName(e0.select(col("v").as("u"), col("u").as("v"), col("w")))
        .repartition(col("u"))
        .localCheckpoint()
      // lazy one-row seed relation (the q_bfs convention): no blocking seed
      // probe job ahead of the relaxation rounds
      var dist = e.agg(min(col("u")).as("v")).select(col("v"), lit(0L).as("d"))
      // DELTA relaxation (queue-based Bellman-Ford, stated relationally):
      // only vertices whose distance IMPROVED last round can improve a
      // neighbor this round, so each round joins the CHANGED subset — not
      // the full distance relation — against the edges. Round-for-round
      // equivalent to full relaxation (an unchanged vertex re-contributes
      // exactly the d(u)+w values already folded into the min), and the
      // candidate volume collapses once the graph settles: rounds past the
      // effective diameter relax a near-empty frontier instead of all |E|.
      // The frontier diff join is |V|-row — noise next to the |E| scan it
      // replaces.
      var frontier = dist
      for (k <- 1 to 6) {
        val cand = frontier.select(col("v").as("dv"), col("d"))
          .join(e, col("dv") === col("u"))
          .select(col("v"), (col("d") + col("w")).as("d"))
        // ONE aggregate carries both the new distance and the PREVIOUS one
        // (min over the src=0 rows — at most one per vertex), so the
        // "improved this round" frontier is a filter over the same cached
        // relation instead of a per-round diff JOIN against the old dist.
        // persist, not localCheckpoint: truly lazy under AQE (the q_bfs
        // lesson — a lazy checkpoint still materializes its shuffle stages
        // serially at .rdd time), and the double reference (dist + frontier)
        // reads one InMemoryRelation.
        val merged = dist.select(col("v"), col("d"), lit(0).as("src"))
          .unionByName(cand.select(col("v"), col("d"), lit(1).as("src")))
          .groupBy(col("v"))
          .agg(min(col("d")).as("d"),
            min(when(col("src") === 0, col("d"))).as("d_prev"))
          .persist()
        dist = merged.select(col("v"), col("d"))
        frontier = merged
          .filter(col("d_prev").isNull || col("d") < col("d_prev"))
          .select(col("v"), col("d"))
      }
      dist.groupBy(col("d").cast("long").as("dist"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    }, {
      def step(k: Int): String =
        s"""d$k AS (SELECT v, min(d) AS d FROM (
           |  SELECT v, d FROM d${k - 1}
           |  UNION ALL SELECT e.v, d${k - 1}.d + e.w FROM e JOIN d${k - 1} ON e.u = d${k - 1}.v
           |) GROUP BY v)""".stripMargin
      val h = graft.functions.TextFns.hash32Sql(
        "CAST(u AS VARCHAR)||':'||CAST(v AS VARCHAR)")
      // MATERIALIZED hints keep the ORACLE honest, not slow: each d_k refers
      // to d_{k-1} twice, so with inlined CTEs the oracle engine re-derives
      // the whole edge pipeline exponentially across the 6 rounds (measured
      // 387 s at sf0.1 vs 6.4 s materialized — the Spark plan checkpoints
      // the edges once and is 5.8 s). The hint states the same relation
      // algebra; it just pins the sane evaluation strategy.
      s"""WITH pl AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p),
         |ew AS MATERIALIZED (SELECT u, v, 1 + $h % 5 AS w FROM e0),
         |e AS MATERIALIZED (SELECT u, v, w FROM ew UNION ALL SELECT v AS u, u AS v, w FROM ew),
         |d0 AS (SELECT (SELECT min(u) FROM e) AS v, 0 AS d),
         |${(1 to 6).map(step).mkString(",\n")}
         |SELECT CAST(d AS BIGINT) AS dist, count(*) AS n_nodes FROM d6
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }
  )

  /** Degree distribution in power-of-two buckets — the graph-health report
    * (a power-law tail here is WHY the hub-skew machinery in this file
    * exists; this query is how you see it coming). Bucket = bit length of
    * the degree minus one ≡ floor(log2(deg)), computed from INTEGER STRING
    * FORMATTING (`length(bin(deg)) − 1`) rather than floor(log2(x)): libm
    * log2 at exact powers of two may return 5.999…, flipping the bucket of
    * every deg = 2^k vertex, and this graph HAS degree-64/128 vertices.
    * One aggregate at vertex grain, one at bucket grain — scan → KB.
    */
  val degreeDist = Q(
    "q_degree_dist",
    (s, d) => {
      val e0 = copurchaseEdges(s, d)
      val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .groupBy((length(bin(col("deg"))) - 1).cast("long").as("deg_bucket"))
        .agg(count(lit(1)).as("n_vertices"),
          min(col("deg")).cast("long").as("min_deg"),
          max(col("deg")).cast("long").as("max_deg"))
        .orderBy("deg_bucket")
    },
    """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p),
      |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |deg AS (SELECT u, count(*) AS deg FROM e GROUP BY 1)
      |SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS deg_bucket,
      |       count(*) AS n_vertices,
      |       CAST(min(deg) AS BIGINT) AS min_deg, CAST(max(deg) AS BIGINT) AS max_deg
      |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** ASSOCIATION RULES over co-purchase baskets — level-2 Apriori stated
    * relationally: for the top-20 item pairs by support, the
    * support / confidence(A→B) / lift report that drives "bought together"
    * recommendations. Pair counts come from the same row-local per-order
    * pair generation as [[copurchaseEdgesBuild]] (sorted distinct item
    * arrays → bounded transform explode — never an order-keyed self-join),
    * aggregated WITH multiplicity this time (one count per order
    * containing the pair); item supports are counted for ONLY the ≤40
    * items the finished top-20 report references (broadcast semi-filter on
    * the support explode), then broadcast into the 20-row report. All ratios are single divisions of exact
    * integer counts, rounded 6 — engine-identical by construction. The
    * top-20 cut breaks ties by the pair itself, so it is deterministic.
    *
    * ONE fact scan total: the basket relation (order grain, localCheckpoint
    * — three consumers, and exchange reuse does not collapse such branches)
    * feeds the pair counts, the item supports (explode of the basket set is
    * exactly one row per distinct (order, item) — the DISTINCT the oracle
    * states) and the order count. The previous form re-scanned lineitem for
    * each — three passes over the fact table at 100 TB for relations the
    * basket build already holds.
    */
  val assocRules = Q(
    "q_assoc_rules",
    (s, d) => {
      // repartition-first (the q_tpch_q18 layout argument): basket keys are
      // unclustered, ~4 rows/order scattered over every split, so the
      // map-side partial collect_set was a corpus-wide hash probe buying no
      // shuffle reduction — ship the raw (orderkey, partkey) pairs straight
      // to the basket build. Same for the pair counts: candidate pairs are
      // ~unique per basket, so they shuffle raw to one 32-way aggregate.
      val baskets = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .localCheckpoint()
      // top-20 FIRST (a 20-row checkpoint), then item supports for ONLY the
      // ≤40 keys the report references: the support explode still scans the
      // baskets once, but its aggregate shuffles ~40 keys instead of every
      // distinct item, and the two item-table broadcast builds (200k rows
      // each at sf1) shrink to a 40-row table. Same-session A/B (Scratch,
      // min-of-3): 11.2 s full-item-agg vs 4.5 s filtered — the broadcast
      // builds, not the aggregate, were the surprise cost. Report values
      // are identical: supports are exact counts either way.
      val pairs = baskets
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))")).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .repartition(col("u"), col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("n_uv"))
        .orderBy(col("n_uv").desc, col("u"), col("v"))
        .limit(20)
        .localCheckpoint()
      val keys = pairs.select(explode(array(col("u"), col("v"))).as("l_partkey")).distinct()
      val item = baskets
        .select(explode(col("ps")).as("l_partkey"))
        .join(broadcast(keys), Seq("l_partkey"))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_i"))
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
      pairs
        .join(broadcast(item.select(col("l_partkey").as("u"), col("n_i").as("n_u"))), Seq("u"))
        .join(broadcast(item.select(col("l_partkey").as("v"), col("n_i").as("n_v"))), Seq("v"))
        .crossJoin(broadcast(nOrders))
        .select(col("u"), col("v"), col("n_uv"), col("n_u"), col("n_v"),
          round(col("n_uv").cast("double") / col("n_orders").cast("double"), 6).as("support"),
          round(col("n_uv").cast("double") / col("n_u").cast("double"), 6).as("confidence"),
          round((col("n_uv").cast("double") * col("n_orders").cast("double"))
            / (col("n_u").cast("double") * col("n_v").cast("double")), 6).as("lift"))
        .orderBy(col("n_uv").desc, col("u"), col("v"))
    },
    """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |pairs AS (
      |  SELECT a.p AS u, b.p AS v, count(*) AS n_uv
      |  FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p
      |  GROUP BY 1, 2 ORDER BY n_uv DESC, u, v LIMIT 20),
      |item AS (SELECT p, count(*) AS n_i FROM pl GROUP BY 1),
      |t AS (SELECT count(DISTINCT ok) AS n_orders FROM pl)
      |SELECT u, v, n_uv,
      |  CAST(iu.n_i AS BIGINT) AS n_u, CAST(iv.n_i AS BIGINT) AS n_v,
      |  round(CAST(n_uv AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS support,
      |  round(CAST(n_uv AS DOUBLE) / CAST(iu.n_i AS DOUBLE), 6) AS confidence,
      |  round((CAST(n_uv AS DOUBLE) * CAST(n_orders AS DOUBLE))
      |        / (CAST(iu.n_i AS DOUBLE) * CAST(iv.n_i AS DOUBLE)), 6) AS lift
      |FROM pairs JOIN item iu ON pairs.u = iu.p JOIN item iv ON pairs.v = iv.p
      |CROSS JOIN t
      |ORDER BY n_uv DESC, u, v""".stripMargin
  )

  val all: Seq[Q] = Seq(triangles, pagerank, bfs, degreeDist, sssp, assocRules)
}
