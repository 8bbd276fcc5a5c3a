package graft

import graft.operators.Similarity

/** Measured recall of the IVF (k-means, 2 Lloyd iterations) index against the
  * exact brute-force ranking, across nprobe — the honesty gate for the
  * approximate path. The synthetic embeddings are isotropic random vectors,
  * so there is little cluster structure to exploit and recall ≈ the fraction
  * of the corpus probed; the hard invariant is that probing ALL cells
  * reproduces the exact top-k bit-for-bit (recall 1.0), which proves the
  * index machinery (assignment, probe, candidate ranking) loses nothing.
  * Printed per-nprobe so the PLANS.md recall table can be refreshed from this
  * spec's output.
  */
class IvfRecallSpec extends SparkSpec {

  test("IVF recall@3 rises with nprobe and reaches 1.0 at full probe") {
    val dir = sf("sf0.001")
    val emb = Tables.embeddings(spark, dir)
    val exact = SparkEntry.queries("q_ann_cosine")(spark, dir)
      .filter("rank <= 3").collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def meanRecall(nprobe: Int): Double = {
      spark.catalog.clearCache() // each build persists the corpus projection
      val ivf = Similarity.ivfTopK(emb, nprobe, 3).collect()
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.toSeq.map { case (q, top) =>
        ivf.getOrElse(q, Set.empty).intersect(top).size.toDouble / top.size
      }
      rs.sum / rs.size
    }

    val curve = Seq(1, 2, 4, 8, 16).map(np => np -> meanRecall(np))
    curve.foreach { case (np, r) => info(f"nprobe=$np%2d mean recall@3 = $r%.3f") }
    val byNp = curve.toMap
    assert(byNp(16) == 1.0, "probing all cells must reproduce the exact top-k")
    assert(byNp(8) >= byNp(2), "recall must not degrade as nprobe grows 2 -> 8")
    assert(byNp(2) > 0.0, "nprobe=2 must find at least some exact neighbours")
  }

  test("autoNprobe picks the smallest ladder step meeting the recall target") {
    spark.catalog.clearCache()
    val emb = Tables.embeddings(spark, sf("sf0.01"))
    val target = 0.95
    val (np, recall) = Similarity.autoNprobe(emb, 3, target)
    info(f"chosen nprobe=$np recall@3=$recall%.3f for target $target")
    assert(recall >= target, s"chosen nprobe $np missed the target: $recall")
    assert(Seq(1, 2, 4, 8, 16).contains(np))
    // minimality on the ladder: the step below (if any) must miss the target
    if (np > 1) {
      spark.catalog.clearCache()
      val below = np / 2
      val ivf = Similarity.ivfTopK(emb, below, 3).collect()
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = SparkEntry.queries("q_ann_cosine")(spark, sf("sf0.01"))
        .filter("rank <= 3").collect()
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.toSeq.map { case (q, top) =>
        ivf.getOrElse(q, Set.empty).intersect(top).size.toDouble / top.size
      }
      assert(rs.sum / rs.size < target, s"ladder step $below already met the target")
    }
  }
}
