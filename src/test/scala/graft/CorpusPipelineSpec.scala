package graft

import org.apache.spark.sql.functions._

/** The curation pipeline must inherit the verified semantics of the
  * standalone operators it composes: stage counts cross-check against the
  * registered queries computed independently on the same data.
  */
class CorpusPipelineSpec extends SparkSpec {

  test("pipeline stages agree with the standalone oracle-checked operators") {
    val dir = sf("sf0.01")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(col("source") =!= "src0")
      .select("doc_id", "text", "lang", "source")
    val eval = docs.filter(col("source") === "src0").select("doc_id", "text")

    val (packed, report) = CorpusPipeline.curate(corpus, eval)

    assert(report.input == corpus.count())
    // stage 1 equals the funnel's quality-gate stage on the same predicates
    val toks = split(col("text"), " ")
    val wantQuality = corpus
      .filter(size(toks).cast("long") >= 30L &&
        (size(array_distinct(toks)).cast("double") / size(toks)) >= 0.35)
      .count()
    assert(report.afterQuality == wantQuality)
    // monotone survivor counts, every stage does real work on this fixture
    assert(report.afterQuality <= report.input)
    assert(report.afterExactDedup <= report.afterQuality)
    assert(report.afterNearDedup < report.afterExactDedup,
      "fixture contains planted near-dups — stage 3 must drop some")
    assert(report.afterDecontamination < report.afterNearDedup,
      "fixture contains contaminated docs — stage 4 must drop some")
    assert(report.afterParagraphScrub <= report.afterDecontamination)
    // stage 4b cross-check: the scrub keeps exactly the docs the standalone
    // q_dedup_paragraph operator keeps on the same input, token-for-token
    val clean = corpus // recompute stage-4 survivors independently
      .join(packed.select("doc_id"), Seq("doc_id"), "left_semi")
    val wantScrub = graft.operators.Dedup.paragraphDedupedText(clean)
    assert(report.afterParagraphScrub == wantScrub.count())
    assert(packed.agg(sum(size(split(col("text"), " ")))).head().getLong(0) ==
      wantScrub.agg(sum(size(split(col("text_kept"), " ")))).head().getLong(0))
    // the packed corpus carries exactly the survivors, token-complete
    assert(packed.count() == report.afterParagraphScrub)
    assert(report.packedTokens ==
      packed.agg(sum(size(split(col("text"), " ")))).head().getLong(0))
    // packing is dense: every (source, bin) holds consecutive offsets, so the
    // bin count is at most ceil(tokens/budget) + one partial bin per source
    val nSources = packed.select("source").distinct().count()
    assert(report.bins <= report.packedTokens / 512L + nSources,
      s"${report.bins} bins for ${report.packedTokens} tokens over $nSources sources")
    // no contaminated doc survives: re-screening the output finds nothing
    assert(graft.operators.Dedup.decontaminationReport(
      packed.select("doc_id", "text"), eval).count() == 0L)
  }
}
