package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Structural invariants of the paragraph-level span dedup beyond the oracle
  * hash (which pins the VALUES): idempotence — scrubbing a scrubbed corpus
  * changes nothing, the property that makes the pipeline stage safe to
  * re-run — and the keeper guarantee — every duplicated span survives in
  * exactly one place, at its minimum (doc_id, pos) occurrence.
  */
class DedupParagraphSpec extends SparkSpec {

  test("scrubbing is idempotent: a second pass is the identity") {
    val docs = Tables.documents(spark, sf("sf0.01")).select("doc_id", "text")
    val once = Dedup.paragraphDedupedText(docs)
    val twice = Dedup.paragraphDedupedText(
      once.select(col("doc_id"), col("text_kept").as("text")))
    val a = once.select("doc_id", "text_kept").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = twice.select("doc_id", "text_kept").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.keySet == b.keySet, "second pass dropped or resurrected documents")
    // token-for-token identical — note exact string equality is not the
    // invariant (reassembly re-joins on single spaces and re-chunks on new
    // 20-word boundaries); the SPAN MULTISET is
    val aTok = a.view.mapValues(_.split(' ').toSeq).toMap
    val bTok = b.view.mapValues(_.split(' ').toSeq).toMap
    assert(aTok == bTok, "second scrub altered surviving tokens")
  }

  test("every duplicated span survives exactly once, at its minimum occurrence") {
    import spark.implicits._
    // three docs sharing one exact 20-word span, in different positions
    val span = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span ${(1 to 20).map(i => s"a$i").mkString(" ")}"),
      (2L, s"${(1 to 20).map(i => s"b$i").mkString(" ")} $span"),
      (3L, span)).toDF("doc_id", "text")
    val out = Dedup.paragraphDedupedText(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the minimum occurrence — it keeps the span
    assert(out(1L).startsWith(span))
    // doc 2 loses it but keeps its own content
    assert(out(2L) == (1 to 20).map(i => s"b$i").mkString(" "))
    // doc 3 WAS the span and nothing else — it vanishes entirely
    assert(!out.contains(3L))
    // the span exists exactly once across the surviving corpus
    assert(out.values.count(_.contains(span)) == 1)
  }
}
