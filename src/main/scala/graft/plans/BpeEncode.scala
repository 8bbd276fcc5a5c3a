package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encoder: `graft_bpe(text, array('a b', ...))` — splits the text
  * on spaces and encodes each word against the (rank-ordered) merge list,
  * returning the subword token array. UDF-less: a single codegen'd expression
  * whose merge table is resolved ONCE at plan build (the merges argument must
  * be a foldable array literal — in a pipeline it is the small trained-model
  * artifact, exactly like IVF's collected centroid table).
  *
  * Encoding is the standard greedy loop: repeatedly merge the adjacent symbol
  * pair with the LOWEST rank until none applies. Concatenating the output
  * tokens always reproduces the input word (BpeSpec pins this and agreement
  * with an independent reference encoder).
  */
case class BpeEncode(child: Expression, merges: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if merges.forall(m => m.split(" ", -1).length == 2) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: every merge must be 'left right', got ${merges.find(_.split(" ", -1).length != 2)}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  @transient private lazy val table: BpeTable = BpeTable(merges)

  override def nullSafeEval(input: Any): Any =
    table.encodeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { t =>
      val tbl = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
      s"${ev.value} = $tbl.encodeText($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rank-indexed merge table with the greedy encode loop (shared by the
  * interpreted and codegen paths).
  */
case class BpeTable(merges: Seq[String]) {
  @transient private lazy val rank: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (s, i) =>
      val Array(a, b) = s.split(" ", -1)
      // first (lowest) rank wins if a pair is listed twice
      if (!m.containsKey((a, b))) m.put((a, b), i)
    }
    m
  }

  def encode(word: String): Seq[String] = {
    // seed the symbol buffer by CODE POINT, not UTF-16 unit: astral-plane
    // characters (emoji, rare CJK) must stay whole surrogate pairs so the
    // trainer (code-point split) and encoder agree and token concatenation
    // reproduces the input word
    var syms = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        buf += word.substring(i, i + n)
        i += n
      }
      buf
    }
    var continue = syms.size >= 2
    while (continue) {
      var best = -1
      var bestRank = Integer.MAX_VALUE
      var i = 0
      while (i < syms.size - 1) {
        val r = rank.get((syms(i), syms(i + 1)))
        if (r != null && r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) continue = false
      else {
        syms(best) = syms(best) + syms(best + 1)
        syms.remove(best + 1)
        continue = syms.size >= 2
      }
    }
    syms.toSeq
  }

  /** Codegen entry point: whole-text encode to a Catalyst array. */
  def encodeText(text: UTF8String): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    words.foreach { w =>
      if (w.nonEmpty) encode(w).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[Any])
  }
}
