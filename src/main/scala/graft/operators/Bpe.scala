package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer: ONE distributed corpus pass to the
  * word-frequency model input, a driver-side merge-training loop over that
  * bounded table, plus a native encode expression (plans/BpeEncode.scala,
  * `graft_bpe`).
  *
  * Scale contract: the corpus pass is the only leg that scales with data —
  * a partial-aggregable word count, one shuffle at the |distinct words|
  * grain. The training STATE is the word-frequency table, which is
  * corpus-size-independent (Heaps-law vocabulary growth), so it is
  * collected driver-side ONCE and every merge iteration is local
  * O(|vocab|) work — numMerges × (pair count + argmax + merge application)
  * with zero further Spark jobs. The previous formulation ran one
  * pair-count aggregation + argmax collect + localCheckpoint PER MERGE
  * (200 merges = 200 jobs over an already-bounded table — all scheduler
  * overhead, no added scale headroom, since the per-merge jobs were
  * vocabulary-grain anyway). A word-count dict is the model input every
  * production BPE trainer consumes; the BOUNDARY is that the collected
  * table must fit the driver (~10^7 rows ≈ hundreds of MB), and
  * `minWordFreq` enforces it on web-scale corpora — pruning the hapax tail
  * bounds the table and removes only the pruned mass from pair counts.
  *
  * Determinism: ties on pair count break by (a, b) — Java String order,
  * identical to BpeSpec's independent reference implementation, which
  * certifies the trainer merge-for-merge and the encoder round-trip.
  */
object Bpe {

  /** Code-POINT seeding, not UTF-16 code units — the encoder's documented
    * round-trip invariant: code-unit seeding would split surrogate pairs
    * and emit lone-surrogate merge symbols that UTF8String mangles when the
    * merge list is passed back into `graft_bpe` literals.
    */
  private def codePointSyms(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Leftmost-first, non-overlapping merge application (the fold consumes
    * the merged symbol, so "aaa" under merge (a,a) becomes ["aa","a"]) —
    * the standard BPE application order, and the training-side twin of the
    * `graft_bpe` encoder's rank-greedy loop.
    */
  private def applyMerge(a: String, b: String, syms: Array[String]): Array[String] = {
    val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    syms.foreach { s =>
      if (buf.nonEmpty && buf.last == a && s == b) buf(buf.size - 1) = a + b
      else buf += s
    }
    buf.toArray
  }

  /** Train `numMerges` BPE merges over the corpus' whitespace words.
    * Returns the merge list in rank order as "a b" strings (the format
    * `graft_bpe(text, merges)` consumes). Stops early when no adjacent pair
    * reaches `minPairCount`. `minWordFreq` prunes the vocabulary tail
    * BEFORE the one driver-side collect — the knob that keeps the model
    * input bounded on corpora whose raw vocabulary outgrows the driver.
    */
  /** Code-point lexicographic compare — the order Spark's `UTF8String`
    * (UTF-8 bytes) and `orderBy` use. Java `String.compareTo` is UTF-16
    * code-UNIT order, which disagrees for ties between supplementary
    * characters and chars in [U+E000, U+FFFF]; training merges with the
    * code-point order keeps merge lists reproducible across the old
    * distributed (orderBy) and current driver-side training paths.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Most-frequent pair first; ties broken by code-point order of (left,
    * right) so training is deterministic and engine-order-independent.
    */
  private val pairOrdering: Ordering[((String, String), Long)] =
    new Ordering[((String, String), Long)] {
      def compare(p: ((String, String), Long),
                  q: ((String, String), Long)): Int = {
        val byCount = java.lang.Long.compare(q._2, p._2)
        if (byCount != 0) byCount
        else {
          val byLeft = cpCompare(p._1._1, q._1._1)
          if (byLeft != 0) byLeft else cpCompare(p._1._2, q._1._2)
        }
      }
    }

  def train(documents: DataFrame, numMerges: Int, minPairCount: Long = 2L,
            minWordFreq: Long = 1L): Seq[String] = {
    // the single distributed leg: corpus → (word, freq) at vocabulary grain
    var words: Array[(Array[String], Long)] = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minWordFreq)
      .collect()
      .map(r => (codePointSyms(r.getString(0)), r.getLong(1)))

    val merges = Seq.newBuilder[String]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.min(pairOrdering)
        if (c < minPairCount) done = true
        else {
          merges += s"$a $b"
          words = words.map { case (syms, f) => (applyMerge(a, b, syms), f) }
          k += 1
        }
      }
    }
    merges.result()
  }
}
