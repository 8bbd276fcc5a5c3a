package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Distinct word-n-gram shingle hashes of a doc's token array:
  * `graft_shingle_hashes(tokens, n)` — the native twin of the
  * explode→concat_ws→md5→DISTINCT pipeline feeding MinHash.
  *
  * The column pipeline (TextFns.shingles + hash32 + collect_set) shuffles
  * every shingle row twice (global DISTINCT, then the per-doc set aggregate)
  * to produce what is per-DOC row-local work. This expression computes the
  * identical hash set in one pass: the md5 runs over the same bytes
  * concat_ws(' ', ...) would produce (tokens joined by 0x20), the 32-bit
  * prefix matches TextFns.hash32 / the DuckDB oracle, and dedup happens on
  * the hash values — exactly the contract of `SELECT DISTINCT doc_id,
  * hash32(sh)`. Signature generation becomes shuffle-free map work; set
  * order is irrelevant downstream (min-fold and array_intersect are
  * order-invariant), which MinhashSigSpec's value checks rely on.
  *
  * Docs with fewer than n tokens yield an empty array (callers filter them,
  * mirroring the explode pipeline where such docs simply produce no rows).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashesFn.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.ShingleHashesFn.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashesFn {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val num = tokens.numElements()
    if (num < n) return new GenericArrayData(Array.empty[Long])
    val digest = md.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= num - n) {
      digest.reset()
      var k = 0
      while (k < n) {
        // same bytes as concat_ws(' ', t[i], ..., t[i+n-1]) for the non-null
        // tokens split() produces: UTF-8 bytes joined by a single 0x20
        // (a defensive null renders as empty)
        if (k > 0) digest.update(' '.toByte)
        if (!tokens.isNullAt(i + k)) digest.update(tokens.getUTF8String(i + k).getBytes)
        k += 1
      }
      val b = digest.digest()
      seen.add(((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
        ((b(2) & 0xffL) << 8) | (b(3) & 0xffL))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
