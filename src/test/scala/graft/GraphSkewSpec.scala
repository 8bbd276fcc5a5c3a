package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Hub-skew gates for the graph family, pinned on a star graph (one hub,
  * 10k spokes) — the adversarial degree distribution where naive per-vertex
  * adjacency puts the whole graph in one row:
  *
  *  - triangle counting's degree-ordered orientation must leave the hub with
  *    an EMPTY out-list (every edge points spoke→hub) and out-degrees
  *    bounded by O(√E) on any graph;
  *  - PageRank's salted adjacency must split the hub across many chunk rows,
  *    each bounded by the chunk cap, while producing EXACTLY the ranks of
  *    the unsplit plan.
  */
class GraphSkewSpec extends SparkSpec {

  private val Spokes = 10000L

  /** star edges (hub 0) as an undirected distinct edge relation (u, v) */
  private def starEdges = spark.range(1, Spokes + 1)
    .select(lit(0L).as("u"), col("id").as("v"))

  test("degree orientation: a 10k-degree hub owns an empty out-list") {
    val oriented = Graph.degreeOrientedEdges(starEdges)
    // every spoke (degree 1) orients toward the hub (degree 10k)
    assert(oriented.filter(col("u") === 0L).count() == 0L)
    assert(oriented.filter(col("v") === 0L).count() == Spokes)
    // so every out-adjacency list is a single element — never O(hub degree)
    val maxOut = oriented.groupBy("u").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(maxOut == 1L, s"star out-degree must be 1, got $maxOut")
    // and the hub triangle count is 0, computed without any wide row
    assert(Graph.triangleCount(starEdges).head().getLong(0) == 0L)
  }

  test("skewed triangles count correctly with bounded out-degrees") {
    // star + 5 spoke-spoke chords: each chord closes exactly one triangle
    // through the hub
    val chords = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L), (9L, 10L))
    import spark.implicits._
    val edges = starEdges.unionByName(chords.toDF("u", "v"))
    assert(Graph.triangleCount(edges).head().getLong(0) == 5L)
    // chord endpoints have degree 2 — out-degree stays ≤ 2 everywhere even
    // though the hub has degree 10k
    val maxOut = Graph.degreeOrientedEdges(edges)
      .groupBy("u").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(maxOut <= 2L, s"expected bounded out-degree, got $maxOut")
  }

  test("pagerank hub-split: chunk rows bounded, ranks identical to unsplit") {
    val pairs = starEdges.select(col("u").as("d1"), col("v").as("d2"))
    val chunk = 256
    val split = Graph.pageRank(pairs, iters = 3, maxChunk = chunk)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val unsplit = Graph.pageRank(pairs, iters = 3, maxChunk = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(split.keySet == unsplit.keySet)
    // chunking only regroups the same per-neighbor contributions (rank/deg);
    // the merged aggregate must reproduce the unsplit ranks to float noise
    split.foreach { case (v, r) =>
      assert(math.abs(r - unsplit(v)) < 1e-12, s"vertex $v: $r vs ${unsplit(v)}")
    }
    // mass check: damped PR over the symmetrized star preserves ~1.0
    assert(math.abs(split.values.sum - 1.0) < 1e-9)
  }

  test("property: degree orientation bounds out-degree by sqrt(2E) on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // the arboricity argument: a vertex with out-degree k has k out-neighbors
    // of degree >= its own, so k(k+1)/2 <= E  =>  k <= sqrt(2E). Check it on
    // arbitrary random edge sets — including heavy-tailed ones.
    val edgeList = Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L))))
    val prop = Prop.forAll(edgeList) { raw =>
      val edges = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      edges.isEmpty || {
        val e = edges.toDF("u", "v")
        val maxOut = Graph.degreeOrientedEdges(e)
          .groupBy("u").agg(count(lit(1)).as("c"))
          .agg(max(col("c"))).head().getLong(0)
        maxOut <= math.sqrt(2.0 * edges.size).toLong + 1
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("pagerank adjacency: no chunk row ever holds more than the cap") {
    // pin the physical bound the salted build promises: the hub's 10k
    // neighbors land in ceil(10000/256)=40 hash-balanced chunks — assert
    // every collect_list row is within 2× the cap (hash balance slack) and
    // that the hub genuinely occupies many rows
    val edges = starEdges.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(starEdges.select(col("v").as("src"), col("u").as("dst")))
    val chunk = 256
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, Seq("src"))
      .withColumn("salt", pmod(hash(col("dst")),
        greatest(lit(1L), ceil(col("deg").cast("double") / chunk)).cast("int")))
      .groupBy(col("src"), col("salt"))
      .agg(collect_list(col("dst")).as("ns"))
    val stats = adj.agg(
      max(size(col("ns"))).as("mx"),
      sum(when(col("src") === 0L, 1L).otherwise(0L)).as("hubRows")).head()
    assert(stats.getAs[Int]("mx") <= 2 * chunk,
      s"chunk row exceeded cap: ${stats.getAs[Int]("mx")}")
    assert(stats.getAs[Long]("hubRows") >= 20L,
      s"hub not split: ${stats.getAs[Long]("hubRows")} rows")
  }
}
