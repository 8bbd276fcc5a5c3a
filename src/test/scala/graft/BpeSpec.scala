package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must agree merge-for-merge with an
  * independent single-JVM reference implementation (same tie-break: max
  * count, then lexicographic pair), and the native `graft_bpe` encoder must
  * reproduce the reference encoding and round-trip every word.
  */
class BpeSpec extends SparkSpec {

  /** Reference trainer: plain Scala over a word-frequency map. */
  private def referenceTrain(freqs: Map[String, Long], numMerges: Int,
                             minPairCount: Long): Seq[String] = {
    var words = freqs.map { case (w, f) => (w.map(_.toString).toList, f) }.toList
    val out = Seq.newBuilder[String]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        if (c < minPairCount) done = true
        else {
          out += s"$a $b"
          words = words.map { case (syms, f) =>
            val merged = scala.collection.mutable.ListBuffer[String]()
            syms.foreach { s =>
              if (merged.nonEmpty && merged.last == a && s == b)
                merged(merged.size - 1) = a + b
              else merged += s
            }
            (merged.toList, f)
          }
        }
      }
      k += 1
    }
    out.result()
  }

  /** Reference encoder: greedy lowest-rank merge loop. */
  private def referenceEncode(word: String, merges: Seq[String]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var continue = syms.size >= 2
    while (continue) {
      val candidates = syms.zip(syms.tail).zipWithIndex
        .flatMap { case ((x, y), i) => rank.get(s"$x $y").map(r => (r, i)) }
      if (candidates.isEmpty) continue = false
      else {
        val (_, i) = candidates.minBy(_._1)
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        continue = syms.size >= 2
      }
    }
    syms
  }

  private val corpus = Seq(
    ("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5))

  private def corpusDf = {
    import spark.implicits._
    // one doc per word occurrence — the trainer sees plain text
    corpus.flatMap { case (w, f) => Seq.fill(f)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("distributed trainer matches the reference merge-for-merge") {
    val expected = referenceTrain(
      corpus.map { case (w, f) => w -> f.toLong }.toMap, 8, minPairCount = 2L)
    val trained = Bpe.train(corpusDf, 8, minPairCount = 2L)
    assert(trained == expected, s"trained $trained != reference $expected")
    assert(trained.nonEmpty && trained.size >= 4)
  }

  test("native graft_bpe encodes like the reference and round-trips every word") {
    import spark.implicits._
    val merges = Bpe.train(corpusDf, 8, minPairCount = 2L)
    val mergeLit = merges.map(m => s"'${m}'").mkString("array(", ", ", ")")
    val words = Seq("hug", "pug", "pun", "bun", "hugs", "hugging", "zebra")
    val out = words.toDF("text")
      .select(col("text"), expr(s"graft_bpe(text, $mergeLit)").as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(out(w) == referenceEncode(w, merges), s"$w: ${out(w)}")
      assert(out(w).mkString == w, s"$w must round-trip, got ${out(w)}")
    }
    // trained subwords actually compress: "hugs" must not stay characters
    assert(out("hugs").size < "hugs".length)
  }

  test("property: encode round-trips arbitrary unicode words incl. astral plane") {
    // the documented invariant: concatenating a word's tokens reproduces the
    // word — which requires code-POINT seeding (UTF-16 code-unit seeding
    // splits surrogate pairs, and UTF8String.fromString then mangles the
    // lone surrogates). Generated words mix ASCII, accented Latin, CJK, and
    // astral-plane emoji (all surrogate pairs in UTF-16).
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val merges = Bpe.train(corpusDf, 8, minPairCount = 2L)
    val table = graft.plans.BpeTable(merges)
    val glyph: Gen[String] = Gen.oneOf(
      ("hugspunb".map(_.toString) ++ Seq("é", "ß", "中", "日", "🤗",
        "😀", "🧪")): Seq[String])
    val word: Gen[String] = for {
      n  <- Gen.choose(1, 8)
      gs <- Gen.listOfN(n, glyph)
    } yield gs.mkString
    val prop = Prop.forAll(word) { w =>
      val toks = table.encode(w)
      toks.mkString == w && toks.forall(_.nonEmpty)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"round-trip property failed: ${res.status}")
  }

  test("minWordFreq prunes the vocabulary tail before the driver-side collect") {
    // freq >= 6 keeps only hug(10) and pun(12): training must equal the
    // reference run over exactly the pruned word-frequency table
    val pruned = corpus.collect { case (w, f) if f >= 6 => w -> f.toLong }.toMap
    val expected = referenceTrain(pruned, 8, minPairCount = 2L)
    val trained = Bpe.train(corpusDf, 8, minPairCount = 2L, minWordFreq = 6L)
    assert(trained == expected, s"trained $trained != reference $expected")
    assert(trained != Bpe.train(corpusDf, 8, minPairCount = 2L),
      "pruning changed nothing — the fixture no longer exercises the knob")
  }

  test("training seeds by code point: astral-plane words never yield lone-surrogate merges") {
    import spark.implicits._
    val docs = Seq.fill(3)("🤗😀").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val trained = Bpe.train(docs, 4, minPairCount = 2L)
    // the one adjacent pair is the two whole emoji (each a surrogate PAIR in
    // UTF-16); code-unit seeding would instead merge inside 🤗 first
    assert(trained == Seq("🤗 😀"), s"got $trained")
  }

  test("multi-word text flattens word encodings in order; empty runs drop") {
    import spark.implicits._
    val merges = Bpe.train(corpusDf, 8, minPairCount = 2L)
    val mergeLit = merges.map(m => s"'${m}'").mkString("array(", ", ", ")")
    val out = Seq("hug pun  hugs").toDF("text")
      .select(expr(s"graft_bpe(text, $mergeLit)").as("toks"))
      .collect()(0).getSeq[String](0)
    val expected = Seq("hug", "pun", "hugs").flatMap(referenceEncode(_, merges))
    assert(out == expected)
  }
}
