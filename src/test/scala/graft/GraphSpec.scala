package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Distributed PageRank must match an independent single-JVM reference
  * power iteration (same damping, same undirected expansion) to float
  * tolerance, at any partitioning.
  */
class GraphSpec extends SparkSpec {

  private def referencePageRank(pairs: Seq[(Long, Long)], iters: Int,
                                damping: Double): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toDouble }
    val n = nodes.size
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = nodes.map(v => v -> ((1.0 - damping) / n + damping * in.getOrElse(v, 0.0))).toMap
    }
    rank
  }

  // two triangles bridged by one edge + a pendant vertex: asymmetric enough
  // that hubs, bridges and leaves all get distinct ranks
  private val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
    (4L, 5L), (5L, 6L), (4L, 6L), (6L, 7L))

  test("distributed power iteration matches the reference to 1e-9") {
    import spark.implicits._
    val got = Graph.pageRank(pairs.toDF("d1", "d2"), iters = 10, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = referencePageRank(pairs, iters = 10, damping = 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"vertex $v: $r vs ${want(v)}")
    }
    // sanity: ranks form a distribution (sums to ~1 on a graph with no
    // dangling vertices after undirected expansion)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the bridge vertices (3, 4, 6) must out-rank the pendant (7)
    assert(got(4L) > got(7L) && got(3L) > got(7L) && got(6L) > got(7L))
  }

  test("rank over the real near-dup pair graph: every cluster member ranked, no NaN") {
    val pairsDf = graft.operators.Dedup
      .minhashNearDups(Tables.documents(spark, sf("sf0.001")), 2, 32, 4, 0.5)
      .select("d1", "d2")
    val ranks = Graph.pageRank(pairsDf, iters = 5).collect()
    assert(ranks.nonEmpty)
    assert(ranks.forall(r => !r.getDouble(1).isNaN && r.getDouble(1) > 0.0))
  }
}
