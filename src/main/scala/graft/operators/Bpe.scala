package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer: distributed vocabulary TRAINING as
  * iterative Spark aggregation, plus a native encode expression
  * (plans/BpeEncode.scala, `graft_bpe`).
  *
  * Scale shape: after the initial corpus pass, every Lloyd-style iteration
  * runs over the WORD-FREQUENCY table (|distinct words|, corpus-size-
  * independent) — pair counting is a partial-aggregable hash aggregate over
  * row-locally exploded adjacent pairs, the merge application is a pure map
  * (a higher-order fold per word), and the only thing ever collected is ONE
  * argmax row per iteration (the same "collect only the model" contract as
  * the k-means IVF build). Lineage is truncated per iteration with
  * localCheckpoint so plan analysis stays O(1) per round, exactly like the
  * connected-components loop.
  *
  * Determinism: ties on pair count break by (a, b) lexicographically, so the
  * learned merge list is reproducible at any parallelism — BpeSpec checks the
  * trainer against an independent single-JVM reference implementation.
  */
object Bpe {

  /** One merge step applied to a word's symbol array: leftmost-first,
    * non-overlapping (the fold consumes the merged symbol, so "aaa" under
    * merge (a,a) becomes ["aa","a"]) — the standard BPE application order.
    */
  def applyMerge(a: String, b: String)(syms: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges over the corpus' whitespace words.
    * Returns the merge list in rank order as "a b" strings (the format
    * `graft_bpe(text, merges)` consumes). Stops early when no adjacent pair
    * reaches `minPairCount`.
    */
  def train(documents: DataFrame, numMerges: Int, minPairCount: Long = 2L): Seq[String] = {
    var words = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(w, ''), c -> c <> '')").as("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[String]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += s"$a $b"
        words = words
          .select(applyMerge(a, b)(col("syms")).as("syms"), col("freq"))
          .localCheckpoint()
        k += 1
      }
    }
    merges.result()
  }
}
