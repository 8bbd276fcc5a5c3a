package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end LLM training-corpus curation: the oracle-checked operators
  * composed the way a production pipeline chains them —
  *
  *   quality filter → exact dedup → MinHash near-dup removal →
  *   benchmark decontamination → paragraph-level span scrub →
  *   sequence packing
  *
  * Every stage is the SAME logic as its registered query (`q_filter_funnel`
  * predicates, `q_dedup_exact` keep-first policy, `q_dedup_keep` pairwise
  * drop policy, `q_decontaminate` overlap report, `q_dedup_paragraph` span
  * rule, `q_pack_sequences` start-offset packing), so the composition
  * inherits their verified semantics; the spec cross-checks stage counts
  * against the standalone operators.
  *
  * Scale shape: stages 1–2 are one scan + one digest-partitioned window;
  * stage 3's pair generation is the banded LSH equi-join (no self-join of
  * the corpus); stage 4's drop list and stage 3's are TINY relations
  * anti-joined against the corpus (AQE broadcasts them — the corpus is
  * never shuffled for a drop); packing is a per-shard window. Nothing in
  * the chain materializes driver-side state that grows with the corpus.
  * Each stage output is `localCheckpoint`ed, so every stage COMPUTES
  * exactly once — the per-stage counts and every downstream consumer read
  * the materialized blocks instead of re-running the upstream chain — and
  * the MinHash signature cache is released as soon as the drop list is
  * materialized. (Checkpoint blocks live until the returned DataFrame is
  * garbage-collected, the usual localCheckpoint lifetime.)
  */
object CorpusPipeline {

  /** Per-stage survivor counts plus the packed-corpus summary. */
  final case class Report(input: Long, afterQuality: Long, afterExactDedup: Long,
                          afterNearDedup: Long, afterDecontamination: Long,
                          afterParagraphScrub: Long,
                          bins: Long, packedTokens: Long)

  /** Curate `docs` (doc_id, text, lang, source) against the held-out `eval`
    * set (doc_id, text). Returns the surviving corpus with packing columns
    * (source, bin_id) and the stage report.
    */
  def curate(docs: DataFrame, eval: DataFrame,
             minTokens: Long = 30L, minUniqRatio: Double = 0.35,
             shingleN: Int = 2, numPerms: Int = 32, rowsPerBand: Int = 4,
             jaccardThreshold: Double = 0.5, decontaminateMinShared: Long = 5L,
             packBudget: Long = 512L): (DataFrame, Report) = {
    val input = docs.count()

    // 1. quality gate — row-local predicates (q_filter_funnel stages b, c)
    val toks = split(col("text"), " ")
    val quality = docs
      .withColumn("n_tok", size(toks).cast("long"))
      .filter(col("n_tok") >= minTokens &&
        (size(array_distinct(toks)).cast("double") / size(toks)) >= minUniqRatio)
    val nQuality = quality.count()

    // 2. exact dedup, keep-first per content digest (q_dedup_exact policy);
    //    the window partitions by digest — bounded groups, never global.
    //    localCheckpoint: stage 2's output feeds its count, the signature
    //    build, the anti-join AND stage 4 — materialize once
    val deduped = quality
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(trim(lower(col("text"))))).orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint()
    val nExact = deduped.count()

    // 3. near-dup removal — drop the higher id of every MinHash pair
    //    (q_dedup_keep policy); the drop list is tiny → AQE broadcasts the
    //    anti-join, the corpus is never shuffled
    val (pairs, releaseSigCache) = Dedup.minhashNearDupsWithCache(
      deduped, shingleN, numPerms, rowsPerBand, jaccardThreshold)
    val nearDrop = pairs.select(col("d2").as("doc_id")).distinct()
    val nearDeduped = deduped.join(nearDrop, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    releaseSigCache() // the checkpoint above consumed the pairs
    val nNear = nearDeduped.count()

    // 4. decontamination — drop training docs sharing >= minShared shingle
    //    hashes with any eval doc (q_decontaminate report as a drop list)
    val contaminated = Dedup.decontaminationReport(nearDeduped, eval,
        shingleN, decontaminateMinShared)
      .select(col("train_doc").as("doc_id"))
    val clean = nearDeduped.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val nClean = clean.count()

    // 4b. paragraph-level scrub (q_dedup_paragraph policy) — exact-span
    //    dedup runs AFTER the fuzzy stages on purpose (the RefinedWeb
    //    ordering): scrubbing shared spans first would strip exactly the
    //    shingles the MinHash and decontamination stages match on. Text is
    //    REWRITTEN (repeated 20-word spans keep one corpus-wide copy), so
    //    n_tok is recomputed; documents that were nothing but duplicated
    //    spans vanish like any other dropped duplicate.
    val scrubbed = clean.drop("text", "n_tok")
      .join(Dedup.paragraphDedupedText(clean)
        .select(col("doc_id"), col("text_kept").as("text")), Seq("doc_id"))
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .localCheckpoint()
    val nScrub = scrubbed.count()

    // 5. sequence packing — start-offset bins per source shard
    //    (q_pack_sequences policy)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = scrubbed
      .withColumn("off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin_id", expr(s"off div $packBudget"))
      .drop("off")
    val (bins, packedTokens) = {
      // coalesce: sum over an empty corpus is null, and a fully-filtered
      // input must report zeros, not NPE
      val r = packed.agg(
        countDistinct(col("source"), col("bin_id")).as("bins"),
        coalesce(sum(col("n_tok")), lit(0L)).as("toks")).head()
      (r.getLong(0), r.getLong(1))
    }

    (packed, Report(input, nQuality, nExact, nNear, nClean, nScrub, bins, packedTokens))
  }
}
