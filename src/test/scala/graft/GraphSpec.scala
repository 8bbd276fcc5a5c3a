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

  test("BFS distances: hand-checked hops on the bridged-triangles graph") {
    import spark.implicits._
    // path structure from vertex 1: {2,3} at 1 hop, 4 at 2, {5,6} at 3, 7 at 4
    val sym = pairs.toDF("u", "v")
      .unionByName(pairs.map(_.swap).toDF("u", "v"))
    val got = Graph.bfsDistances(sym, source = 1L, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3, 6L -> 3, 7L -> 4))
    // K smaller than the eccentricity truncates the reach — it must NOT
    // mislabel the unreached vertex with a wrong distance
    val truncated = Graph.bfsDistances(sym, source = 1L, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(!truncated.contains(7L) && truncated(5L) == 3)
    // rounds past the fixpoint leave the distances untouched (stability)
    val extra = Graph.bfsDistances(sym, source = 1L, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(extra == got)
  }

  test("BFS frontier on a star: the hub is one frontier row, spokes arrive in one round") {
    import spark.implicits._
    val n = 2000
    val star = (1L to n.toLong).map(i => (0L, i)).toDF("u", "v")
    val sym = star.unionByName(star.select(col("v").as("u"), col("u").as("v")))
    val got = Graph.bfsDistances(sym, source = 0L, rounds = 2)
    val byDist = got.groupBy("d").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // hub at 0, every spoke at 1 — and round 2 (spokes -> hub) must not
    // regress the hub's distance
    assert(byDist == Map(0 -> 1L, 1 -> n.toLong))
  }

  test("edge table materializes under the managed spark.graft.warehouseDir") {
    val root = java.nio.file.Files.createTempDirectory("graft-wh-test-").toString
    spark.conf.set("spark.graft.warehouseDir", root)
    try {
      val e = Graph.copurchaseEdges(spark, sf())
      assert(e.columns.toSeq == Seq("u", "v") && e.count() > 0)
      val sub = new java.io.File(s"$root/copurchase_edges")
      assert(sub.isDirectory && sub.listFiles().nonEmpty,
        s"edge table not materialized under the configured warehouse: $root")
      // second consumer reads the materialized table (same path, no rebuild)
      assert(Graph.copurchaseEdges(spark, sf()).count() == e.count())
    } finally spark.conf.unset("spark.graft.warehouseDir")
  }

  test("an input rewritten IN PLACE rebuilds the warehouse table (fingerprint key)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-wh-fp-").toString
    val data = java.nio.file.Files.createTempDirectory("graft-wh-fp-data-").toString
    spark.conf.set("spark.graft.warehouseDir", root)
    try {
      def writeLineitem(rows: Seq[(Long, Long)]): Unit =
        rows.toDF("l_orderkey", "l_partkey")
          .withColumn("l_shipdate", org.apache.spark.sql.functions.expr(
            "timestamp '2024-01-01 00:00:00'"))
          .coalesce(1).write.mode("overwrite").parquet(s"$data/lineitem.parquet")
      // order 1 buys parts {10, 20} -> one edge
      writeLineitem(Seq((1L, 10L), (1L, 20L)))
      assert(Graph.copurchaseEdges(spark, data).count() == 1)
      // REWRITE IN PLACE: same path, order 1 now buys {10, 20, 30} -> 3 edges.
      // Without the input fingerprint in the key this would keep serving the
      // stale 1-edge table.
      writeLineitem(Seq((1L, 10L), (1L, 20L), (1L, 30L)))
      assert(Graph.copurchaseEdges(spark, data).count() == 3,
        "in-place input rewrite must rebuild the derived table, not serve stale rows")
    } finally spark.conf.unset("spark.graft.warehouseDir")
  }

  test("publishStrict: a lost race never nests the loser's table inside the winner's") {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val root = java.nio.file.Files.createTempDirectory("graft-pub-race-").toString
    val hp = new Path(s"$root/table")
    val fs = hp.getFileSystem(conf)
    // winner already published: dir with _SUCCESS + one data file
    fs.mkdirs(hp)
    fs.create(new Path(hp, "_SUCCESS")).close()
    fs.create(new Path(hp, "part-winner.parquet")).close()
    // loser finished its build into a temp dir and now tries to publish
    val tmp = new Path(s"$root/table.tmp-loser")
    fs.mkdirs(tmp)
    fs.create(new Path(tmp, "_SUCCESS")).close()
    fs.create(new Path(tmp, "part-loser.parquet")).close()
    graft.Warehouse.publishStrict(conf, tmp, hp)
    // loser's temp dir is gone, winner's table is intact, and — the round-11
    // advisory's exact failure mode — NO subdirectory was nested inside the
    // published dir (FileSystem.rename onto an existing dir would have moved
    // tmp INSIDE hp and returned true)
    assert(!fs.exists(tmp), "loser's temp dir must be cleaned up")
    val entries = fs.listStatus(hp).map(s => (s.getPath.getName, s.isDirectory)).toSeq
    assert(entries.forall(!_._2), s"published dir must contain no nested dirs: $entries")
    assert(entries.map(_._1).contains("part-winner.parquet"))
    assert(!entries.map(_._1).contains("part-loser.parquet"))
  }

  test("publishStrict: a crashed half-write (_SUCCESS-less dir) is replaced") {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val root = java.nio.file.Files.createTempDirectory("graft-pub-crash-").toString
    val hp = new Path(s"$root/table")
    val fs = hp.getFileSystem(conf)
    // crashed build: data file but no _SUCCESS
    fs.mkdirs(hp)
    fs.create(new Path(hp, "part-halfwrite.parquet")).close()
    val tmp = new Path(s"$root/table.tmp-rebuild")
    fs.mkdirs(tmp)
    fs.create(new Path(tmp, "_SUCCESS")).close()
    fs.create(new Path(tmp, "part-rebuild.parquet")).close()
    graft.Warehouse.publishStrict(conf, tmp, hp)
    val names = fs.listStatus(hp).map(_.getPath.getName).toSet
    assert(names == Set("_SUCCESS", "part-rebuild.parquet"),
      s"stale half-write must be replaced by the rebuilt table: $names")
  }
}
