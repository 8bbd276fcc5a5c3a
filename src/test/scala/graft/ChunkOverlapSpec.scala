package graft

import graft.operators.Sampling

/** The sliding chunker's structural contract, property-tested over random
  * document lengths and (size, stride) pairs: every word is covered, chunks
  * overlap by exactly size − stride (except a short final chunk), and
  * dropping each non-first chunk's overlap reconstructs the document
  * verbatim — the property that makes overlap-chunked training data safe to
  * de-duplicate back to documents.
  */
class ChunkOverlapSpec extends SparkSpec {

  test("property: coverage + exact reconstruction at arbitrary lengths") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val cases = for {
      n <- Gen.chooseNum(1, 200)
      size <- Gen.chooseNum(4, 40)
      stride <- Gen.chooseNum(1, size) // stride <= size: no gaps by design
    } yield (n, size, stride)
    val prop = Prop.forAll(Gen.listOfN(5, cases)) { cs =>
      cs.forall { case (n, size, stride) =>
        val words = (1 to n).map(i => s"w$i")
        val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
        val chunks = Sampling.chunkWindows(docs, size, stride)
          .orderBy("chunk_id").collect()
          .map(r => r.getString(2).split(' ').toSeq)
        val overlap = size - stride
        val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(overlap))
        rebuilt == words &&
          chunks.init.forall(_.size == size) && // only the last may be short
          chunks.last.nonEmpty
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
