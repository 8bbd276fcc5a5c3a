package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, GenerateUnsafeProjection, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.graftglue.Bridge

/** Native as-of join — the whole-operator extension tier: a custom
  * [[LogicalPlan]] node, an optimizer [[Rule]], a planner [[Strategy]] and a
  * sort-merge [[SparkPlan]], registered through `SparkSessionExtensions`
  * (GraftExtensions).
  *
  * Semantics: for every left row, attach the right row with the same key and
  * the greatest time ≤ the left row's time (LEFT OUTER — unmatched left rows
  * get nulls); identical to DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t` and to the union+running-last composition in
  * `Analytics.asofJoin`. Against an inequality theta-join this is the
  * difference between a per-partition linear merge and a cartesian blow-up;
  * against the union composition it saves the union and the whole-row
  * `last(ignoreNulls)` window state, and keeps each side's columns typed
  * instead of null-padded.
  *
  * Scale shape: both sides hash-cluster on the key and sort by (key, time) —
  * exactly a sort-merge join's distribution — then each co-partition merges
  * with two forward-only pointers, O(|L| + |R|) per partition, holding ONE
  * buffered right row. Ties on right (key, time) are resolved by the optional
  * `rightTiebreak` ordering — the merge keeps the LAST tied row in sort
  * order, so `Seq(col)` means "largest col wins" — which lets callers skip a
  * whole pre-dedup window + exchange; with no tiebreak, ties must be
  * pre-deduplicated for deterministic results (same requirement the
  * composition documents).
  */
object AsOfJoin {

  /** Logical node. Children must expose disjoint column names (the public
    * builder enforces this; keeps self-join attribute rewriting out of scope).
    */
  case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTime: Expression, rightTime: Expression,
                          rightTiebreak: Seq[Expression],
                          tolerance: Option[Long] = None)
      extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Optimizer rule: a Filter over the as-of join that only references
    * left-side columns is pushed below the join (the right side can't be
    * filtered — a pre-time row may still be some later row's match). Without
    * this, Catalyst can't see through the custom node and a selective
    * predicate would run after the merge instead of before the shuffle.
    */
  object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, j: AsOfJoinPlan) =>
        val (pushable, keep) = splitConjunctivePredicates(cond)
          .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
        if (pushable.isEmpty) f
        else {
          val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
          keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Optimizer rule: column pruning through the as-of join. Catalyst's own
    * ColumnPruning can't see through a custom node, so without this a
    * `SELECT two cols` (or a COUNT, which prunes to zero payload columns)
    * still drags every child column through the exchange, sort and merge —
    * measured 2.5× slower than the union+window composition under
    * Bench's count() for that reason alone. Pushing Projects that keep only
    * (parent references ∪ key ∪ time ∪ tiebreak) into the children lets the
    * standard rules collapse them into the file scans (`ReadSchema` shrinks).
    */
  object PruneColumnsThroughAsOfJoin extends Rule[LogicalPlan] {
    private def neededFor(j: AsOfJoinPlan, parents: AttributeSet): AttributeSet =
      AttributeSet(
        parents ++ j.leftKey.references ++ j.rightKey.references ++
          j.leftTime.references ++ j.rightTime.references ++
          j.rightTiebreak.flatMap(_.references))

    private def prune(j: AsOfJoinPlan, needed: AttributeSet): Option[AsOfJoinPlan] = {
      val lKeep = j.left.output.filter(needed.contains)
      val rKeep = j.right.output.filter(needed.contains)
      if (lKeep.length == j.left.output.length &&
          rKeep.length == j.right.output.length) None
      else Some(j.copy(
        left = Project(lKeep, j.left), right = Project(rKeep, j.right)))
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case p @ Project(_, j: AsOfJoinPlan) =>
        prune(j, neededFor(j, p.references)).map(pj => p.copy(child = pj)).getOrElse(p)
      // PushFilterThroughAsOfJoin deliberately keeps right-referencing
      // predicates above the join, so Project(Filter(asof)) is a shape the
      // optimizer produces routinely — prune through the retained Filter too
      // (its condition's references join the needed set) or a filtered as-of
      // join drags every child column through the exchange/sort/merge.
      case p @ Project(_, f @ Filter(cond, j: AsOfJoinPlan)) =>
        prune(j, neededFor(j, p.references ++ cond.references))
          .map(pj => p.copy(child = f.copy(child = pj))).getOrElse(p)
    }
  }

  /** Planner strategy: mirrors Spark's own join planning — when the RIGHT
    * side's estimated size fits under `spark.sql.autoBroadcastJoinThreshold`,
    * plan the broadcast variant (no shuffle at all: the left side streams
    * through its scan stage while each task probes a broadcast index); above
    * the threshold, or with broadcasting disabled (threshold = -1), fall back
    * to the shuffled sort-merge variant. The as-of shape is asymmetric — only
    * the right (quote/dimension) side can be broadcast, and that side IS the
    * small one in the canonical "events vs reference states" usage.
    */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case j: AsOfJoinPlan =>
        val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
        val exec =
          if (threshold > 0 && j.right.stats.sizeInBytes <= threshold)
            BroadcastAsOfJoinExec(planLater(j.left), planLater(j.right),
              j.leftKey, j.rightKey, j.leftTime, j.rightTime, j.rightTiebreak, j.tolerance)
          else
            AsOfJoinExec(planLater(j.left), planLater(j.right),
              j.leftKey, j.rightKey, j.leftTime, j.rightTime, j.rightTiebreak, j.tolerance)
        exec :: Nil
      case _ => Nil
    }
  }

  /** Physical sort-merge as-of join. EnsureRequirements inserts the hash
    * exchanges and (key, time) sorts from the declared requirements; the
    * merge itself is a per-partition two-pointer pass.
    */
  /** Physical (boxed) time value → Long, for tolerance arithmetic (the
    * builder restricts tolerance to integral-physical time types).
    */
  private def timeAsLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalStateException(
      s"as-of tolerance on non-integral time value: $other")
  }

  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTime: Expression, rightTime: Expression,
                          rightTiebreak: Seq[Expression],
                          tolerance: Option[Long] = None)
      extends BinaryExecNode with CodegenSupport {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

    // the tiebreak columns extend the right sort so equal (key, time) rows
    // arrive in a deterministic order; the merge keeps the last one it
    // consumes, so the MAX tiebreak wins — duplicate resolution costs a sort
    // term instead of a whole pre-dedup window + exchange
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        rightTiebreak.map(SortOrder(_, Ascending)))

    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

    override def outputPartitioning = left.outputPartitioning

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val leftOut = left.output
      val rightOut = right.output
      val outAttrs = output
      val kDt = leftKey.dataType
      val tDt = leftTime.dataType
      val (lkE, ltE, rkE, rtE) = (leftKey, leftTime, rightKey, rightTime)
      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        // Everything per-row here is code-generated: the (key, time)
        // extractors are Janino-compiled UnsafeProjections evaluated exactly
        // once per input row, the comparisons are codegen'd BaseOrderings
        // over those 2-field UnsafeRows (field 0 = key, field 1 = time; no
        // boxing), and the output projection is the same generated
        // UnsafeProjection a built-in sort-merge join would use. Generated
        // classes are cached per-expression, so per-partition create() calls
        // after the first hit the codegen cache.
        val lProj = UnsafeProjection.create(Seq(lkE, ltE), leftOut)
        val rProj = UnsafeProjection.create(Seq(rkE, rtE), rightOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(kDt))
        val timeOrd = RowOrdering.create(
          Seq(SortOrder(BoundReference(1, tDt, nullable = true), Ascending)), Seq.empty)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightOut.size)
        val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
        // the single buffered candidate: latest right row whose (key, time)
        // does not exceed the current left row's
        var held: InternalRow = null
        var heldKt: InternalRow = null
        // right cursor: the row AND its extracted (key, time), computed once
        // per right row (the buffered-iterator form re-evaluated the head's
        // key for every left row)
        var rCur: InternalRow = null
        var rKt: InternalRow = null
        def advanceRight(): Unit =
          if (rIt.hasNext) { rCur = rIt.next(); rKt = rProj(rCur) }
          else { rCur = null; rKt = null }
        advanceRight()
        lIt.map { l =>
          val lKt = lProj(l)
          val lNull = lKt.isNullAt(0) || lKt.isNullAt(1)
          if (!lNull) {
            var advancing = true
            while (advancing && rCur != null) {
              if (rKt.isNullAt(0)) advanceRight() // null keys never match; skip
              else {
                val c = keyOrd.compare(rKt, lKt)
                if (c < 0) advanceRight() // right still on an earlier key group
                else if (c == 0) {
                  if (rKt.isNullAt(1)) advanceRight() // null time never matches;
                  // must consume it or it stalls the merge (NULLS FIRST puts
                  // it at the head of the key group)
                  else if (timeOrd.compare(rKt, lKt) <= 0) {
                    // held beyond this call while the projection buffers are
                    // reused — copy both the row and its extracted key
                    held = rCur.copy(); heldKt = rKt.copy()
                    advanceRight()
                  } else advancing = false // future-time row; stop before it
                } else advancing = false // right ahead of left's key group
              }
            }
          }
          // a null left key OR time can never satisfy l.t >= r.t — emit
          // null-padded, matching ASOF LEFT JOIN null-comparison semantics.
          // With a tolerance, the HELD row is the closest preceding one, so
          // "held too stale" means no row matches.
          val matched = held != null && !lNull && keyOrd.compare(heldKt, lKt) == 0 &&
            tolerance.forall(tol =>
              timeAsLong(lKt.get(1, tDt)) - timeAsLong(heldKt.get(1, tDt)) <= tol)
          toUnsafe(joined(l, if (matched) held else nullRight))
        }
      }
    }

    // ---- whole-stage codegen: the merge loop itself is generated ----
    // Same packaging as Spark's own SortMergeJoinExec: this node is the
    // PRODUCER of its stage — both sorted children arrive as plain row
    // iterators through inputRDDs (the sorts below keep their own
    // execution), and the two-pointer advance, the (key, time) comparisons
    // and the LEFT OUTER null-padded emit all compile into one Janino loop.
    // Downstream operators consume typed column variables directly: no
    // iterator hop per row, no output UnsafeProjection, no JoinedRow.

    /** Merge-state fields hold the right cursor's and the held candidate's
      * (key, time) as primitive Java fields across produce re-entries, so
      * codegen is gated to integral physical types — the production shape
      * (long ids, epoch times, dates). Anything else (binary keys, decimals)
      * takes the interpreted merge above unchanged.
      */
    private def integralPhysical(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      }

    override def supportCodegen: Boolean =
      Seq(leftKey, rightKey, leftTime, rightTime).map(_.dataType).forall(integralPhysical)

    override def inputRDDs(): Seq[RDD[InternalRow]] =
      left.execute() :: right.execute() :: Nil

    // emitted rows reference the held right row's buffer (stable until the
    // next hold) and left-row-derived variables — buffering parents must copy
    override def needCopyResult: Boolean = true

    override protected def doProduce(ctx: CodegenContext): String = {
      val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
        v => s"$v = inputs[0];")
      val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
        v => s"$v = inputs[1];")
      val leftRow = ctx.addMutableState("InternalRow", "asofLeftRow")
      val rightRow = ctx.addMutableState("InternalRow", "asofRightRow")
      val heldRow = ctx.addMutableState("InternalRow", "asofHeldRow")
      val kJava = CodeGenerator.javaType(leftKey.dataType)
      val tJava = CodeGenerator.javaType(leftTime.dataType)
      val rkVal = ctx.addMutableState(kJava, "asofRk")
      val rkNull = ctx.addMutableState("boolean", "asofRkNull")
      val rtVal = ctx.addMutableState(tJava, "asofRt")
      val rtNull = ctx.addMutableState("boolean", "asofRtNull")
      val heldKey = ctx.addMutableState(kJava, "asofHeldKey")
      val heldTime = ctx.addMutableState(tJava, "asofHeldTime")
      val hasHeld = ctx.addMutableState("boolean", "asofHasHeld")
      val rInit = ctx.addMutableState("boolean", "asofRightInit")

      // right-cursor extraction, evaluated ONCE per advanced right row into
      // the primitive fields (the same once-per-row contract the interpreted
      // path documents)
      ctx.INPUT_ROW = rightRow
      ctx.currentVars = null
      val rkEv = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
      val rtEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
      val advanceRight = ctx.addNewFunction("asofAdvanceRight",
        s"""
           |private void asofAdvanceRight() {
           |  if (!$rightInput.hasNext()) { $rightRow = null; return; }
           |  $rightRow = (InternalRow) $rightInput.next();
           |  ${rkEv.code}
           |  $rkNull = ${rkEv.isNull}; $rkVal = ${rkEv.value};
           |  ${rtEv.code}
           |  $rtNull = ${rtEv.isNull}; $rtVal = ${rtEv.value};
           |}
         """.stripMargin)

      // left extraction per stream row
      ctx.INPUT_ROW = leftRow
      ctx.currentVars = null
      val lkEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
      val ltEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
      val leftVars = left.output.zipWithIndex.map { case (a, i) =>
        BoundReference(i, a.dataType, a.nullable).genCode(ctx)
      }

      val matched = ctx.freshName("asofMatched")
      val outRight = ctx.freshName("asofOutRight")
      // right-side output columns read from the held row (nulls when no
      // match — LEFT OUTER semantics), the BroadcastAsOfJoinExec pattern
      val rightVars = right.output.zipWithIndex.map { case (a, i) =>
        val isNull = ctx.freshName("asofIsNull")
        val value = ctx.freshName("asofValue")
        val javaType = CodeGenerator.javaType(a.dataType)
        val valueCode = CodeGenerator.getValue(outRight, a.dataType, i.toString)
        val c = code"""
          |boolean $isNull = $outRight == null || $outRight.isNullAt($i);
          |$javaType $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($valueCode);
          |"""
        ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
      }

      val lValid = ctx.freshName("asofLeftValid")
      val advancing = ctx.freshName("asofAdvancing")
      val cmp = ctx.freshName("asofCmp")
      val tolCheck = tolerance.map(tol =>
        s" && ((long) ${ltEv.value} - (long) $heldTime) <= ${tol}L").getOrElse("")

      s"""
         |if (!$rInit) { $advanceRight(); $rInit = true; }
         |while ($leftInput.hasNext()) {
         |  $leftRow = (InternalRow) $leftInput.next();
         |  ${lkEv.code}
         |  ${ltEv.code}
         |  boolean $lValid = !(${lkEv.isNull}) && !(${ltEv.isNull});
         |  if ($lValid) {
         |    boolean $advancing = true;
         |    while ($advancing && $rightRow != null) {
         |      if ($rkNull) { $advanceRight(); }
         |      else {
         |        int $cmp = ${ctx.genComp(leftKey.dataType, rkVal, lkEv.value.toString)};
         |        if ($cmp < 0) { $advanceRight(); }
         |        else if ($cmp == 0) {
         |          if ($rtNull) { $advanceRight(); }
         |          else if (${ctx.genComp(leftTime.dataType, rtVal, ltEv.value.toString)} <= 0) {
         |            $heldRow = (InternalRow) $rightRow.copy();
         |            $heldKey = $rkVal; $heldTime = $rtVal; $hasHeld = true;
         |            $advanceRight();
         |          } else { $advancing = false; }
         |        } else { $advancing = false; }
         |      }
         |    }
         |  }
         |  boolean $matched = $hasHeld && $lValid &&
         |    ${ctx.genComp(leftKey.dataType, heldKey, lkEv.value.toString)} == 0$tolCheck;
         |  InternalRow $outRight = $matched ? $heldRow : null;
         |  ${consume(ctx, leftVars ++ rightVars)}
         |  if (shouldStop()) return;
         |}
       """.stripMargin
    }
  }

  /** Broadcast as-of join: the right side is materialized through a standard
    * [[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]]
    * (declared via `BroadcastDistribution(IdentityBroadcastMode)`, so the
    * collect runs on Spark's async broadcast thread and — under AQE — as a
    * broadcast query stage CONCURRENT with the left side's stage); left tasks
    * probe a per-executor index built lazily over the broadcast rows. Zero
    * shuffles — the left side never leaves its scan stage — the same trade
    * BroadcastHashJoin makes, and the winning plan whenever the right side is
    * dimension-sized (the strategy guards it behind
    * `autoBroadcastJoinThreshold`, so an oversized right side degrades to the
    * shuffled merge, never to a driver OOM).
    *
    * Per left row: one hash probe + an O(log n) upper-bound binary search over
    * that key's time-sorted rows (tiebreak-last order, same resolution as the
    * merge variant). Work is O(L log maxGroup) with no sort of the left side.
    */
  case class BroadcastAsOfJoinExec(left: SparkPlan, right: SparkPlan,
                                   leftKey: Expression, rightKey: Expression,
                                   leftTime: Expression, rightTime: Expression,
                                   rightTiebreak: Seq[Expression],
                                   tolerance: Option[Long] = None)
      extends BinaryExecNode with CodegenSupport {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def outputPartitioning = left.outputPartitioning

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution,
        org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
          BlobBroadcastMode(right.output, rightKey, rightTime, rightTiebreak)))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
      copy(left = newLeft, right = newRight)

    private def probeHelper: AsOfProbe =
      new AsOfProbe(right.output, rightKey, rightTime, rightTiebreak,
        leftTime.dataType, tolerance)

    override protected def doExecute(): RDD[InternalRow] = {
      val leftOut = left.output
      val outAttrs = output
      val lkE = leftKey
      val ltE = leftTime
      val nRightFields = right.output.size
      val helper = probeHelper
      val bcast = right.executeBroadcast[Array[InternalRow]]()

      left.execute().mapPartitions({ lIt =>
        val idx = helper.buildIndex(bcast.value)
        // probe with the same normalized single-field projection the index is
        // keyed on; the projection's reused output row is safe for get()
        val lKeyProj = UnsafeProjection.create(
          Seq(Bridge.normalizeFloats(BindReferences.bindReference(lkE, leftOut))))
        val lTime = BindReferences.bindReference(ltE, leftOut)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(nRightFields)
        val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
        lIt.map { l =>
          val t = lTime.eval(l)
          val kRow = lKeyProj(l)
          val matched =
            if (!kRow.isNullAt(0) && t != null) helper.probe(idx, kRow, t) else null
          toUnsafe(joined(l, if (matched != null) matched else nullRight))
        }
      }, preservesPartitioning = true)
    }

    // ---- whole-stage codegen: fuse the probe into the LEFT side's stage ----
    // The same shape BroadcastHashJoinExec uses: this node produces from its
    // stream (left) child, and each consumed left row probes the broadcast
    // index inline — no per-row interpreted expression eval, no per-row
    // output UnsafeProjection; downstream operators consume the column
    // variables directly.

    // exactly ONE output row per stream row (left outer, unique as-of match),
    // so the copy requirement is the stream side's own — the default binary
    // handling doesn't apply to a build side that is never produced from
    override def needCopyResult: Boolean =
      left.asInstanceOf[CodegenSupport].needCopyResult

    override def inputRDDs(): Seq[RDD[InternalRow]] =
      left.asInstanceOf[CodegenSupport].inputRDDs()

    override protected def doProduce(ctx: CodegenContext): String =
      left.asInstanceOf[CodegenSupport].produce(ctx, this)

    override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
      val helperTerm = ctx.addReferenceObj("asofProbe", probeHelper)
      val bcast = right.executeBroadcast[Array[InternalRow]]()
      val bcastTerm = ctx.addReferenceObj("asofBroadcast", bcast)
      // per-task-instance index, built once from the broadcast blob (memoized
      // per executor in BroadcastAsOfIndex)
      val idxTerm = ctx.addMutableState("java.util.HashMap", "asofIndex",
        v => s"$v = $helperTerm.buildIndex((InternalRow[]) $bcastTerm.value());")

      ctx.currentVars = input
      // single-field normalized UnsafeRow key — the exact representation the
      // index is keyed on
      val keyEv = GenerateUnsafeProjection.createCode(ctx,
        Seq(Bridge.normalizeFloats(BindReferences.bindReference(leftKey, left.output))))
      val timeEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
      val matched = ctx.freshName("asofMatched")

      // right-side output columns read from the matched row (nulls when no
      // match — LEFT OUTER semantics)
      val rightVars = right.output.zipWithIndex.map { case (a, i) =>
        val isNull = ctx.freshName("asofIsNull")
        val value = ctx.freshName("asofValue")
        val javaType = CodeGenerator.javaType(a.dataType)
        val valueCode = CodeGenerator.getValue(matched, a.dataType, i.toString)
        val c = code"""
          |boolean $isNull = $matched == null || $matched.isNullAt($i);
          |$javaType $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($valueCode);
          |"""
        ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
      }

      s"""
         |${keyEv.code}
         |${timeEv.code}
         |InternalRow $matched = null;
         |if (!${keyEv.value}.isNullAt(0) && !(${timeEv.isNull})) {
         |  $matched = $helperTerm.probe((java.util.HashMap) $idxTerm,
         |    (UnsafeRow) ${keyEv.value}, (Object) ${timeEv.value});
         |}
         |${consume(ctx, input ++ rightVars)}
       """.stripMargin
    }
  }

  /** Serializable probe kernel shared by the interpreted and codegen paths of
    * [[BroadcastAsOfJoinExec]]: builds (memoized) the broadcast index and
    * answers "latest right row with this key at time ≤ t (within tolerance)"
    * by upper-bound binary search over the key's time-sorted group.
    */
  final class AsOfProbe(rightOut: Seq[Attribute], rkE: Expression, rtE: Expression,
                        tiebreak: Seq[Expression],
                        timeDt: org.apache.spark.sql.types.DataType,
                        tolerance: Option[Long]) extends Serializable {
    @transient private lazy val timeOrd =
      PhysicalDataType.ordering(timeDt).asInstanceOf[Ordering[Any]]

    def buildIndex(rows: Array[InternalRow]): java.util.HashMap[UnsafeRow, Array[TimedRow]] =
      BroadcastAsOfIndex.getOrBuild(rows, rightOut.size, rightOut, rkE, rtE, tiebreak)

    def probe(idx: java.util.HashMap[UnsafeRow, Array[TimedRow]],
              key: UnsafeRow, t: Any): InternalRow = {
      val group = idx.get(key)
      if (group == null) return null
      // upper-bound search: greatest i with group(i).time <= t; the build
      // sorted tied times in tiebreak order, so "last <= t" is the
      // max-tiebreak row — identical resolution to the merge exec
      var lo = 0
      var hi = group.length // exclusive; invariant: group(<lo).t <= t
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (timeOrd.compare(group(mid).time, t) <= 0) lo = mid + 1 else hi = mid
      }
      if (lo > 0 && tolerance.forall(tol =>
          timeAsLong(t) - timeAsLong(group(lo - 1).time) <= tol))
        group(lo - 1).row
      else null
    }
  }

  /** Broadcast payload builder: length-prefixed UnsafeRow bytes in ONE flat
    * blob — the cheapest structure to serialize/deserialize (a plain byte
    * array), built on BroadcastExchangeExec's async collect thread. The
    * executor-side index wraps zero-copy row views over the blob.
    */
  case class BlobBroadcastMode(rightOut: Seq[Attribute], rkE: Expression, rtE: Expression,
                               tiebreak: Seq[Expression])
      extends org.apache.spark.sql.catalyst.plans.physical.BroadcastMode {
    override def canonicalized: org.apache.spark.sql.catalyst.plans.physical.BroadcastMode = this
    override def transform(rows: Array[InternalRow]): Any = transform(rows.iterator, None)
    override def transform(rows: Iterator[InternalRow],
                           sizeHint: Option[Long]): Any = {
      // Group by key and time-sort each group HERE, on BroadcastExchange's
      // async collect thread, so the executor-side index build is one
      // sequential pass with a single hash insert per KEY. Blob layout:
      // per group: [int rowCount][rowCount × (int len, UnsafeRow bytes)],
      // rows in (time, tiebreak) ascending order.
      val keyEval = BindReferences.bindReference(rkE, rightOut)
      val timeEval = BindReferences.bindReference(rtE, rightOut)
      val tiebreakEvals = tiebreak.map(BindReferences.bindReference(_, rightOut))
      val timeCmp = PhysicalDataType.ordering(rtE.dataType).asInstanceOf[Ordering[Any]]
      val tieCmps = tiebreak.map(e =>
        PhysicalDataType.ordering(e.dataType).asInstanceOf[Ordering[Any]])
      lazy val toUnsafe = UnsafeProjection.create(rightOut.map(_.dataType).toArray)
      def cmpVals(a: Any, b: Any, ord: Ordering[Any]): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
      val cmp = new java.util.Comparator[UnsafeRow] {
        override def compare(x: UnsafeRow, y: UnsafeRow): Int = {
          var c = cmpVals(timeEval.eval(x), timeEval.eval(y), timeCmp)
          var i = 0
          while (c == 0 && i < tiebreakEvals.size) {
            c = cmpVals(tiebreakEvals(i).eval(x), tiebreakEvals(i).eval(y), tieCmps(i))
            i += 1
          }
          c
        }
      }
      // group on an UnsafeRow PROJECTION of the key, not the boxed eval value:
      // UnsafeRow compares by value bytes, where e.g. Array[Byte] (BinaryType
      // keys) compares by identity — boxed keys would split every binary-keyed
      // group into per-row singletons and silently drop rows at index build.
      // Float normalization keeps -0.0/0.0 and NaN bit patterns unified, as
      // Spark's own planner does for equi-join keys.
      val keyProj = UnsafeProjection.create(Seq(Bridge.normalizeFloats(keyEval)))
      val grouped = new java.util.HashMap[UnsafeRow, java.util.ArrayList[UnsafeRow]]()
      rows.foreach { r =>
        // BroadcastExchange collects UnsafeRows in practice; the projection
        // only defends against a non-unsafe child, at a copy's cost
        val u = r match { case ur: UnsafeRow => ur; case other => toUnsafe(other).copy() }
        val kRow = keyProj(u)
        // rows with a null key or time can never be an as-of match
        if (!kRow.isNullAt(0) && timeEval.eval(u) != null) {
          var g = grouped.get(kRow)
          if (g == null) { g = new java.util.ArrayList(); grouped.put(kRow.copy(), g) }
          g.add(u)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(bos)
      val writeBuffer = new Array[Byte](4096)
      grouped.forEach { (_, group) =>
        group.sort(cmp)
        dos.writeInt(group.size())
        group.forEach { u =>
          dos.writeInt(u.getSizeInBytes)
          u.writeToStream(dos, writeBuffer)
        }
      }
      dos.close()
      // BroadcastExchangeExec only accepts Array[InternalRow] (or a
      // HashedRelation) from transform — wrap the blob as ONE single-field
      // binary row, still a flat byte payload on the wire
      val wrap = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.BinaryType))
      Array[InternalRow](wrap(InternalRow(bos.toByteArray)).copy())
    }
  }

  /** One time-sorted right row inside a broadcast as-of index group. */
  final case class TimedRow(time: Any, row: InternalRow)

  /** Executor-side index for [[BroadcastAsOfJoinExec]]: key → rows sorted by
    * (time, tiebreak). Built once per executor per broadcast — memoized on the
    * broadcast blob's identity in a WeakHashMap, so the entry is collectable
    * as soon as the driver drops the broadcast.
    */
  object BroadcastAsOfIndex {
    private val cache = new java.util.WeakHashMap[AnyRef, java.util.HashMap[UnsafeRow, Array[TimedRow]]]()

    def getOrBuild(wrapped: Array[InternalRow], nFields: Int,
                   rightOut: Seq[Attribute], rkE: Expression, rtE: Expression,
                   tiebreak: Seq[Expression]): java.util.HashMap[UnsafeRow, Array[TimedRow]] =
      cache.synchronized {
        val hit = cache.get(wrapped)
        if (hit != null) hit
        else {
          val built = build(wrapped(0).getBinary(0), nFields, rightOut, rkE, rtE, tiebreak)
          cache.put(wrapped, built)
          built
        }
      }

    private def build(blob: Array[Byte], nFields: Int,
                      rightOut: Seq[Attribute], rkE: Expression, rtE: Expression,
                      tiebreak: Seq[Expression]): java.util.HashMap[UnsafeRow, Array[TimedRow]] = {
      // the blob arrives pre-grouped and pre-sorted (BlobBroadcastMode did
      // the work on the broadcast thread) — this is one sequential parse
      // with a single hash insert per key; rows point INTO the blob, zero
      // per-row copies
      val keyEval = BindReferences.bindReference(rkE, rightOut)
      val timeEval = BindReferences.bindReference(rtE, rightOut)
      // index key = normalized UnsafeRow of the key (value equality for every
      // supported type, incl. binary/struct), mirroring BlobBroadcastMode's
      // grouping so build groups and probe keys always agree
      val keyProj = UnsafeProjection.create(Seq(Bridge.normalizeFloats(keyEval)))
      val index = new java.util.HashMap[UnsafeRow, Array[TimedRow]]()
      val base = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
      def readInt(pos: Int): Int =
        ((blob(pos) & 0xff) << 24) | ((blob(pos + 1) & 0xff) << 16) |
          ((blob(pos + 2) & 0xff) << 8) | (blob(pos + 3) & 0xff)
      var pos = 0
      while (pos < blob.length) {
        val groupSize = readInt(pos)
        pos += 4
        val arr = new Array[TimedRow](groupSize)
        var i = 0
        while (i < groupSize) {
          val len = readInt(pos)
          val row = new UnsafeRow(nFields)
          row.pointTo(blob, base + pos + 4, len)
          pos += 4 + len
          arr(i) = TimedRow(timeEval.eval(row), row)
          i += 1
        }
        index.put(keyProj(arr(0).row).copy(), arr)
      }
      index
    }
  }

  /** Public builder: `AsOfJoin(events, orders, "user_id", "o_custkey",
    * "t", "ot")`. Column names must be disjoint between the two sides.
    * `rightTiebreak` names right-side columns that deterministically resolve
    * duplicate (key, time) rows — the largest tiebreak tuple wins — replacing
    * a caller-side dedup window (and its exchange) with sort terms the merge
    * already pays for.
    */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            rightTiebreak: Seq[String] = Nil,
            tolerance: Option[Long] = None): DataFrame = {
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(right)
    val overlap = lPlan.output.map(_.name).toSet.intersect(rPlan.output.map(_.name).toSet)
    require(overlap.isEmpty, s"asof join sides must have disjoint column names, both have: $overlap")
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    // the merge compares right values with orderings built from the LEFT
    // types — mixed types would misbehave at runtime, so fail at plan time
    require(lk.dataType == rk.dataType,
      s"asof join key types differ: ${lk.dataType.simpleString} vs ${rk.dataType.simpleString}")
    // the merge variant sorts by key and the broadcast variant compares key
    // bytes — both need a type where ordering/byte equality IS value equality,
    // which is every orderable type (MapType is the one that isn't)
    require(RowOrdering.isOrderable(lk.dataType),
      s"asof join key type is not orderable: ${lk.dataType.simpleString}")
    require(lt.dataType == rt.dataType,
      s"asof join time types differ: ${lt.dataType.simpleString} vs ${rt.dataType.simpleString}")
    // tolerance = max staleness in the time type's PHYSICAL unit (micros for
    // timestamps, the raw value for integer times): a right row matches only
    // if 0 <= l.t - r.t <= tolerance — pandas merge_asof's `tolerance`
    tolerance.foreach { tol =>
      require(tol >= 0L, s"asof tolerance must be non-negative: $tol")
      val integral = lt.dataType match {
        case org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.DateType => true
        case _ => false
      }
      require(integral,
        s"asof tolerance requires an integral-physical time type, got ${lt.dataType.simpleString}")
    }
    Bridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, rightTiebreak.map(attr(rPlan, _)), tolerance))
  }
}
