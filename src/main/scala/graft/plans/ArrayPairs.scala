package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All unordered element pairs of an array as one flat `array<struct<u,v>>`:
  * `graft_pairs(arr)` = (arr(i), arr(j)) for i < j (strict upper triangle);
  * `graft_pairs(arr, true)` additionally emits every (arr(i), arr(i))
  * diagonal pair — the q_source_overlap self-pair convention.
  *
  * The native twin of the row-local pair generation the basket/overlap
  * queries previously stated as
  * `flatten(transform(arr, (x, i) -> transform(slice(arr, i+2, size(arr)),
  * y -> struct(x, y))))`: identical output order (row-major over the upper
  * triangle), but built in ONE tight loop over a single object array. The
  * higher-order form is interpreted per element (HigherOrderFunction is
  * CodegenFallback: every lambda evaluation is an expression-tree walk plus
  * an AtomicReference bind) and allocates a sliced copy of the array tail
  * per outer element, an inner result array per outer element, and the
  * flatten copy on top — on a 12M-pair corpus that is tens of millions of
  * short-lived allocations feeding straight into young-GC pressure (the
  * round-17 q_assoc_rules measurement). Here each pair costs exactly one
  * 2-field row over elements boxed ONCE per array, and the expression
  * whole-stage-codegens like any other (guide §4: no interpreted
  * expressions in the hot path).
  *
  * Callers wanting DISTINCT pairs pass a deduplicated (e.g. collect_set)
  * array, exactly as the higher-order form required; element order is the
  * caller's (sort_array upstream makes u < v for distinct inputs).
  */
case class ArrayPairs(child: Expression, includeDiag: Boolean = false)
    extends UnaryExpression {

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("u", elementType, nullable = true),
      StructField("v", elementType, nullable = true))),
    containsNull = false)

  override def prettyName: String = "graft_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ArrayPairsFn.compute(input.asInstanceOf[ArrayData], elementType, includeDiag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elementType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.ArrayPairsFn.compute($t, $et, $includeDiag);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayPairsFn {
  def compute(arr: ArrayData, elementType: DataType, includeDiag: Boolean): ArrayData = {
    val n = arr.numElements()
    // box each element once; every pair row references the shared boxes
    val elems = arr.toObjectArray(elementType)
    val nPairs = n.toLong * (n - 1) / 2 + (if (includeDiag) n else 0)
    require(nPairs <= Int.MaxValue, s"graft_pairs: $n elements overflow one array")
    val out = new Array[Any](nPairs.toInt)
    var idx = 0
    var i = 0
    while (i < n) {
      var j = if (includeDiag) i else i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  // convenience for specs
  def rows(arr: ArrayData, elementType: DataType, includeDiag: Boolean): Seq[InternalRow] =
    compute(arr, elementType, includeDiag).toObjectArray(
      StructType(Seq(StructField("u", elementType), StructField("v", elementType))))
      .map(_.asInstanceOf[InternalRow]).toSeq
}
