package graft

import graft.functions.{Rounding, TextFns}
import org.apache.spark.sql.functions._

/** The weighted sampler's priorities must equal an INDEPENDENT JVM
  * evaluation of the Efraimidis–Spirakis formula (same md5 draw, same
  * rounding contract) — the distributed expression and plain Scala math may
  * never disagree — and the weight must actually bias the outcome: a
  * heavily-weighted document wins its stratum on this fixture.
  */
class WeightedSampleSpec extends SparkSpec {

  private val M = 1048576L

  private def jvmPriority(text: String, w: Long): Double = {
    val u = ((TextFns.hashN(text, 8) % M).toDouble + 0.5) / M.toDouble
    Rounding.sparkRound(math.log(u) / w, 9)
  }

  test("distributed priorities equal the independent JVM formula") {
    import spark.implicits._
    val texts = (1 to 12).map(i => (i.toLong, s"doc body number $i", "S", 10L * i))
    val docs = texts.toDF("doc_id", "text", "source", "n_chars")

    // reproduce the registered query's body on the synthetic frame
    val u = ((TextFns.hash32(col("text")) % M).cast("double") + 0.5) / M.toDouble
    val got = docs
      .select(col("doc_id"), round(log(u) / col("n_chars"), 9).as("priority"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    texts.foreach { case (id, text, _, w) =>
      assert(got(id) == jvmPriority(text, w), s"doc $id priority mismatch")
    }
  }

  test("weight biases the draw: the heavy document wins this stratum") {
    // ln(u)/w → 0⁻ as w grows, so a vastly heavier doc outranks light ones
    // unless a light doc drew u ≈ 1; verify the winner against the same
    // JVM math rather than assuming, then assert the weight did its job
    val light = (1 to 5).map(i => (i.toLong, s"light doc $i", 10L))
    val heavy = (99L, "the heavy document", 1000000L)
    val all = light :+ heavy
    val best = all.maxBy { case (_, t, w) => (jvmPriority(t, w), -1L) }
    assert(best._1 == heavy._1,
      "fixture broken: a light doc drew u~1; change a text to restore the property")
  }
}
