package graft

import graft.operators.Pq

/** Honesty gates for the product-quantization index, mirroring
  * IvfRecallSpec's protocol: (1) re-ranking the FULL corpus reproduces the
  * exact brute-force top-k bit-for-bit — the candidate/re-rank machinery
  * loses nothing; (2) recall does not degrade as the re-rank depth grows;
  * (3) the build is deterministic (two trains → identical codebooks); and
  * (4) the code layout delivers the promised 32× compression. The synthetic
  * embeddings are isotropic, so shallow-depth recall ≈ depth/corpus — the
  * curve is printed for PLANS.md, not asserted against an optimistic bound.
  */
class PqRecallSpec extends SparkSpec {

  test("full-depth re-rank reproduces the exact top-k; recall is monotone in depth") {
    val dir = sf("sf0.001")
    val emb = Tables.embeddings(spark, dir)
    val cb = Pq.train(emb, iters = 2)

    val exact = SparkEntry.queries("q_ann_cosine")(spark, dir)
      .filter("rank <= 3").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Double]("score")))
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def recallAt(depth: Int): Double = {
      val got = Pq.adcTopK(emb, cb, k = 3, rerank = depth).collect()
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exactSets.toSeq.map { case (q, top) =>
        got.getOrElse(q, Set.empty).intersect(top).size.toDouble / top.size
      }
      rs.sum / rs.size
    }

    // full depth = whole corpus: must equal the exact ranking bit-for-bit
    val full = Pq.adcTopK(emb, cb, k = 3, rerank = 1000).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Double]("score")))
    assert(full.toSeq == exact.toSeq,
      "re-ranking the full corpus must reproduce the exact top-k exactly")

    val curve = Seq(10, 50, 200).map(d => d -> recallAt(d))
    curve.foreach { case (d, r) => info(f"rerank=$d%4d mean recall@3 = $r%.3f") }
    // a deeper shortlist is a superset, and anything outranking a true
    // top-3 member is itself a true top-3 member — recall is provably
    // non-decreasing in depth, so a dip means broken candidate generation
    assert(curve.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a; case _ => true },
      "recall must not degrade as re-rank depth grows")
    assert(curve.last._2 > 0.0, "depth-200 must find some exact neighbours")
  }

  test("autoRerank picks the smallest ladder depth meeting the recall target") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cb = Pq.train(emb, iters = 2)
    val target = 0.9
    val (depth, recall) = Pq.autoRerank(emb, cb, k = 3, targetRecall = target)
    info(f"chosen rerank depth=$depth recall@3=$recall%.3f for target $target")
    assert(recall >= target, s"chosen depth $depth missed the target: $recall")
    // minimality on the ladder: the step below (if any) must miss the target
    val n = emb.filter("vec_id >= 5").count().toInt
    val ladder = Pq.ladder(n) // the REAL ladder, not a re-derivation
    val idx = ladder.indexOf(depth)
    assert(idx >= 0, s"chosen depth $depth must sit on the ladder $ladder")
    if (idx > 0) {
      val below = ladder(idx - 1)
      val got = Pq.adcTopK(emb, cb, k = 3, rerank = below).collect()
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = SparkEntry.queries("q_ann_cosine")(spark, sf("sf0.001"))
        .filter("rank <= 3").collect()
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.toSeq.map { case (q, top) =>
        got.getOrElse(q, Set.empty).intersect(top).size.toDouble / top.size
      }
      assert(rs.sum / rs.size < target, s"depth $below should have missed the target")
    }
  }

  test("training is deterministic and codes deliver 32x compression") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cb1 = Pq.train(emb, iters = 2)
    val cb2 = Pq.train(emb, iters = 2)
    assert(cb1.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq,
      "two identical builds must produce identical codebooks")

    val codes = Pq.encode(emb, cb1).collect()
    assert(codes.forall(_.getAs[Array[Byte]](1).length == Pq.M),
      "one byte-code per subspace")
    assert(Pq.compressionRatio == 32.0,
      s"64 fp32 dims -> ${Pq.M} byte codes must be 32x")
    // every code addresses a real centroid
    assert(codes.flatMap(_.getAs[Array[Byte]](1)).forall(c => c >= 0 && c < Pq.Kc))
  }
}
