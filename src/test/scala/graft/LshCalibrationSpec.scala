package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Acceptance harness for the MinHash S-curve config solver — closes the
  * calibration loop the round-11 verdict asked for: `q_minhash_error`
  * measures per-pair signature error on the live corpus; `Dedup.solveLsh`
  * turns stated operating points into a (numPerms, rowsPerBand) config; and
  * this spec (a) pins the PRODUCTION (32, 4) config as the solver's own
  * output for the planted-near-dup operating points, and (b) re-measures
  * recall and false-positive rate empirically on a corpus with pair grades
  * known by construction — the claim becomes two measured rates, not a
  * comment, the same contract autoNprobe/PqRecallSpec give ANN.
  */
class LshCalibrationSpec extends SparkSpec {

  test("the production (32, 4) config is the solver's output, not folklore") {
    // operating points: catch the planted near-dup grade (J ≈ 0.8, the
    // measured grade of the generator's 20%-mutated copies), ignore the
    // unrelated-doc grade (J ≈ 0.25 word-salad overlap)
    assert(Dedup.solveLsh(jAccept = 0.8, jReject = 0.25) == Some((32, 4)))
  }

  test("solver refuses an unseparable operating window instead of mis-tuning") {
    assert(Dedup.solveLsh(jAccept = 0.55, jReject = 0.45,
      minRecall = 0.99, maxFalsePos = 0.01).isEmpty)
  }

  test("S-curve closed form is monotone the right way on every axis") {
    val js = (1 to 19).map(_ * 0.05)
    // increasing in j
    assert(js.sliding(2).forall { case Seq(a, b) =>
      Dedup.lshCandidateProb(a, 4, 8) <= Dedup.lshCandidateProb(b, 4, 8) })
    // more bands catch more (same r)
    assert(js.forall(j =>
      Dedup.lshCandidateProb(j, 4, 8) <= Dedup.lshCandidateProb(j, 4, 16)))
    // longer rows are stricter (same b)
    assert(js.forall(j =>
      Dedup.lshCandidateProb(j, 8, 8) <= Dedup.lshCandidateProb(j, 4, 8)))
  }

  test("solved config meets its stated recall/fp targets on known pair grades") {
    import spark.implicits._
    val nPairs = 40
    // construction: unique words per pair group, so exact Jaccard is known
    // in closed form. High pair: 90 shared words of 100 → 89 shared
    // 2-shingles of 99 → J = 89/109 ≈ 0.82. Low pair: 40 shared → J =
    // 39/159 ≈ 0.25.
    def doc(tag: String, words: Seq[String]): String = words.mkString(" ")
    def mk(i: Int): Seq[(Long, String)] = {
      val base = (0 until 100).map(k => s"b${i}w$k")
      val hiPartner = base.take(90) ++ (0 until 10).map(k => s"h${i}f$k")
      val lowBase = (0 until 100).map(k => s"c${i}w$k")
      val lowPartner = lowBase.take(40) ++ (0 until 60).map(k => s"l${i}f$k")
      Seq((i.toLong, doc("b", base)), (i + 10000L, doc("h", hiPartner)),
        (i + 20000L, doc("c", lowBase)), (i + 30000L, doc("l", lowPartner)))
    }
    val docs = (0 until nPairs).flatMap(mk).toDF("doc_id", "text")
    val Some((p, r)) = Dedup.solveLsh(jAccept = 0.8, jReject = 0.25)
    val sig = Dedup.minhashSignatures(docs, 2, p)
    val bands = Dedup.lshBands(sig, p, r)
    val cand = bands.select(col("doc_id").as("d1"), col("band"), col("bkey"))
      .join(bands.select(col("doc_id").as("d2"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("d1") < col("d2")).select("d1", "d2").distinct()
      .as[(Long, Long)].collect().toSet
    val hiCaught = (0 until nPairs).count(i => cand.contains((i.toLong, i + 10000L)))
    val lowCaught = (0 until nPairs).count(i => cand.contains((i + 20000L, i + 30000L)))
    // S-curve at J=0.82 with (32,4): ≈ 0.99; at 0.245: ≈ 0.03. Tolerances
    // leave room for 40-trial binomial noise, not for a broken config.
    assert(hiCaught >= (nPairs * 0.9).toInt,
      s"recall ${hiCaught.toDouble / nPairs} below target on J≈0.82 pairs")
    assert(lowCaught <= (nPairs * 0.15).toInt,
      s"false-positive rate ${lowCaught.toDouble / nPairs} above target on J≈0.25 pairs")
  }
}
