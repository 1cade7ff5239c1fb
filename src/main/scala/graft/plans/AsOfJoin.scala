package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlInternals}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, BoundReference, Expression, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** As-of join as a NATIVE Catalyst operator — the second custom-plan
  * instance (SURVEY.md §2.3 C9), complementing the single-window
  * composition (Events.qAsofJoin, C5): for each left row, attach the
  * payload of the LATEST right row of the same key with
  * `right.time <= left.time`, or NULLs if none exists (left outer
  * semantics).
  *
  * Why native: the window-union trick carries ONE running value
  * (`max(when(click, ts))`); carrying a full payload that way means
  * max-over-struct gymnastics per column. The native operator is the
  * classic co-partitioned SORTED MERGE: both children hash-clustered
  * on the key (`requiredChildDistribution` — one exchange each, same
  * as a sort-merge join) and sorted within partitions on (key, time
  * [, tiebreaks]) (`requiredChildOrdering` — Spark inserts the
  * SortExecs), then a single forward pass per partition zips the two
  * sorted streams with O(1) state: the last right row seen for the
  * current key. No window, no state beyond one row, linear in
  * |left| + |right| per partition — the shape that survives 100 TB
  * of events.
  *
  * Tie semantics are DETERMINISTIC by construction: among right rows
  * with equal (key, time), the last in (time, tiebreaks...) sort
  * order wins — callers pass a unique tiebreak (e.g. event_id), and
  * the oracle mirrors it with arg_max.
  *
  * Monomorphic demonstration contract (like the native top-k): key
  * and tiebreaks are BIGINT, time is any type whose internal form is
  * a long (BIGINT, TIMESTAMP). Rows with NULL key or time on the
  * right never match; left rows with NULL key/time emit NULL payload.
  */
case class AsOfJoinNode(
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTiebreaks: Seq[Attribute],
    rightPayload: Seq[Attribute],
    payloadOut: Seq[Attribute], // fresh, nullable attrs naming the payload in our output
    left: LogicalPlan,
    right: LogicalPlan)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, lt, rk, rt, tb, pay, out, l, r) =>
      AsOfJoinExec(lk, lt, rk, rt, tb, pay, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Compiled-side helper for the generated merge loop: deep-copies a
  * payload value out of the sort iterator's reused row buffer
  * (UTF8String/array/struct views would otherwise be overwritten by
  * the next right row). */
object AsOfHelpers {
  def copyValue(v: Object): Object =
    InternalRow.copyValue(v).asInstanceOf[Object]
}

case class AsOfJoinExec(
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTiebreaks: Seq[Attribute],
    rightPayload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payload attrs are minted HERE — without this, missingInput is
  // non-empty and every plan dump prefixes the node with "!"
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  // both sides hash-clustered on the key — EnsureRequirements gives the
  // two exchanges compatible partitioning, exactly as for a shuffle join
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // in-partition sort: (key, time) on the left, (key, time, tiebreaks)
  // on the right — Spark plans the SortExecs under us
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTiebreaks.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  // ---- whole-stage codegen: the SortMergeJoin shape — both sorted
  // children arrive as iterators (their own stages end at the sorts);
  // the merge pass itself is generated Java fused with the PARENT
  // operators, so a projection/filter/agg above the join reads the
  // joined row with no iterator handoff or GenericInternalRow
  // materialization (doExecute below allocates one per left row).
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    Seq(left.execute(), right.execute())

  // downstream buffering operators must copy: the emitted vars point
  // into the left iterator's current row / the shared payload slots
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val lOut = left.output
    val rOut = right.output
    val nPay = rightPayload.length

    val leftInput = ctx.addMutableState(
      "scala.collection.Iterator", "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState(
      "scala.collection.Iterator", "asofRightInput", v => s"$v = inputs[1];")
    // one-row lookahead over the sorted right stream + O(1) match state
    val rRow = ctx.addMutableState("InternalRow", "asofRightRow",
      v => s"$v = $rightInput.hasNext() ? (InternalRow) $rightInput.next() : null;")
    val hasMatch = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofHasMatch")
    val matchKey = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofMatchKey")
    val matchPay = ctx.addMutableState("Object[]", "asofMatchPay",
      v => s"$v = new Object[$nPay];")

    // right-side expressions evaluate against the lookahead field
    ctx.INPUT_ROW = rRow
    ctx.currentVars = null
    val rkEv = BindReferences.bindReference(rightKey: Expression, rOut).genCode(ctx)
    val rtEv = BindReferences.bindReference(rightTime: Expression, rOut).genCode(ctx)
    val copyPay = rightPayload.zipWithIndex.map { case (p, j) =>
      val ev = BindReferences.bindReference(p: Expression, rOut).genCode(ctx)
      s"""
         |${ev.code}
         |$matchPay[$j] = ${ev.isNull} ? null
         |  : graft.plans.AsOfHelpers.copyValue((Object) ${ev.value});
       """.stripMargin
    }.mkString("\n")
    // the forward scan: consume right rows while they are <= (lk, lt),
    // remembering the payload of the last same-key row seen — sort
    // order makes that the (time, tiebreaks) winner
    val advanceName = ctx.freshName("asofAdvance")
    val advanceFn = ctx.addNewFunction(advanceName,
      s"""
         |private void $advanceName(long lk, long lt) {
         |  while ($rRow != null) {
         |    ${rkEv.code}
         |    ${rtEv.code}
         |    if (${rkEv.isNull} || ${rtEv.isNull}) {
         |      $rRow = $rightInput.hasNext() ? (InternalRow) $rightInput.next() : null;
         |      continue;
         |    }
         |    long rk = ${rkEv.value};
         |    long rt = (long) ${rtEv.value};
         |    if (rk < lk || (rk == lk && rt <= lt)) {
         |      if (rk == lk) {
         |        $matchKey = rk;
         |        $hasMatch = true;
         |        $copyPay
         |      }
         |      $rRow = $rightInput.hasNext() ? (InternalRow) $rightInput.next() : null;
         |    } else {
         |      break;
         |    }
         |  }
         |}
       """.stripMargin)

    // left side: evaluate key/time and every output column from the
    // streamed row, synthesize payload vars from the match slots
    val leftRow = ctx.freshName("asofLeftRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val lkEv = BindReferences.bindReference(leftKey: Expression, lOut).genCode(ctx)
    val ltEv = BindReferences.bindReference(leftTime: Expression, lOut).genCode(ctx)
    val leftVars = lOut.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val matched = ctx.freshName("asofMatched")
    val payVars = payloadOut.zipWithIndex.map { case (a, j) =>
      val v = ctx.freshName("asofPayVal")
      val isN = ctx.freshName("asofPayIsNull")
      val jt = CodeGenerator.javaType(a.dataType)
      val bt = CodeGenerator.boxedType(a.dataType)
      val cdeStr =
        s"""boolean $isN = !$matched || $matchPay[$j] == null;
           |$jt $v = $isN ? ${CodeGenerator.defaultValue(a.dataType)}
           |  : ($bt) $matchPay[$j];""".stripMargin
      ExprCode(code"$cdeStr", JavaCode.isNullVariable(isN), JavaCode.variable(v, a.dataType))
    }
    // consume() evaluates leftVars/payVars code at its splice point —
    // after the matched flag they reference is set
    // NO limitNotReachedCond here: it is only for leaf/blocking nodes
    // (Spark logs a [BUG] warning otherwise); a limit above us stops
    // consumption via shouldStop(), the same contract SortMergeJoin uses
    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lkEv.code}
       |  ${ltEv.code}
       |  boolean $matched = false;
       |  if (!(${lkEv.isNull}) && !(${ltEv.isNull})) {
       |    $advanceFn(${lkEv.value}, (long) ${ltEv.value});
       |    $matched = $hasMatch && $matchKey == ${lkEv.value};
       |  }
       |  ${consume(ctx, leftVars ++ payVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTimeB = BindReferences.bindReference(leftTime: Expression, lOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTimeB = BindReferences.bindReference(rightTime: Expression, rOut)
    val payB = rightPayload.map(p => BindReferences.bindReference(p: Expression, rOut))
    val lTypes = lOut.map(_.dataType)
    val outTypes = output.map(_.dataType).toArray
    val nLeft = lTypes.length
    val nPay = payB.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val toUnsafe = UnsafeProjection.create(outTypes)
      // one-row lookahead over the sorted right stream
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var matchKey = 0L
      var hasMatch = false
      val matchPay = new Array[Any](nPay)
      def advanceRightTo(lk: Long, lt: Long): Unit = {
        var continue = rRow != null
        while (continue) {
          val rkN = rKeyB.eval(rRow)
          val rtN = rTimeB.eval(rRow)
          if (rkN == null || rtN == null) {
            // unmatched-able right row — skip
            rRow = if (rIter.hasNext) rIter.next() else null
            continue = rRow != null
          } else {
            val rk = rkN.asInstanceOf[Long]
            val rt = rtN.asInstanceOf[Long]
            if (rk < lk || (rk == lk && rt <= lt)) {
              if (rk == lk) {
                // candidate: latest-so-far for this key (sort order
                // makes the LAST such row the tie/time winner)
                matchKey = rk
                hasMatch = true
                var i = 0
                // copyValue: payload may be UTF8String/array views into
                // the sort iterator's reused row buffer
                while (i < nPay) {
                  matchPay(i) = InternalRow.copyValue(payB(i).eval(rRow)); i += 1
                }
              }
              rRow = if (rIter.hasNext) rIter.next() else null
              continue = rRow != null
            } else {
              continue = false
            }
          }
        }
      }
      lIter.map { lRow =>
        val vals = new Array[Any](outTypes.length)
        var i = 0
        while (i < nLeft) { vals(i) = lRow.get(i, lTypes(i)); i += 1 }
        val lkN = lKeyB.eval(lRow)
        val ltN = lTimeB.eval(lRow)
        if (lkN != null && ltN != null) {
          val lk = lkN.asInstanceOf[Long]
          advanceRightTo(lk, ltN.asInstanceOf[Long])
          if (hasMatch && matchKey == lk) {
            var j = 0
            while (j < nPay) { vals(nLeft + j) = matchPay(j); j += 1 }
          }
        }
        toUnsafe(new GenericInternalRow(vals))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object NativeAsOfJoin {

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** `left ASOF LEFT JOIN right ON left.key = right.key AND
    * left.time >= right.time`, emitting all left columns plus
    * `payloadCols` from the matched right row under `payloadNames`.
    * `tiebreakCols` (BIGINT, e.g. an event id) make equal-time right
    * rows resolve deterministically: the largest wins.
    */
  def asofJoin(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keyCol: String,
      timeCol: String,
      tiebreakCols: Seq[String],
      payloadCols: Seq[String],
      payloadNames: Seq[String]): DataFrame = {
    require(payloadCols.length == payloadNames.length, "payload name per payload col")
    // adapt integral (non-BIGINT) keys/tiebreaks with a cast projection,
    // keeping the merge kernel monomorphic (see NativeTopK.topKPerKey)
    def widen(df: DataFrame, cols: Seq[String]): DataFrame =
      cols.foldLeft(df) { (d, c) =>
        d.schema.fields.find(_.name.equalsIgnoreCase(c)) match {
          case Some(f) if Seq(
              org.apache.spark.sql.types.ByteType,
              org.apache.spark.sql.types.ShortType,
              org.apache.spark.sql.types.IntegerType).contains(f.dataType) =>
            d.withColumn(c, org.apache.spark.sql.functions.col(c).cast(LongType))
          case _ => d
        }
      }
    val leftW = widen(leftDf, Seq(keyCol))
    val rightW = widen(rightDf, keyCol +: tiebreakCols)
    val spark = leftW.sparkSession
    ensureRegistered(spark)
    val l = leftW.queryExecution.analyzed
    // Self-join safety: left and right often derive from the SAME
    // DataFrame (events → purchases/clicks), so their plans share
    // exprIds. The analyzer's DeduplicateRelations rewrites the right
    // subtree of a conflicting two-child node but cannot know which
    // side OUR captured parameter attributes meant. Re-aliasing every
    // right column mints fresh, globally unique exprIds for the
    // attributes we capture, so the node is unambiguous however the
    // children overlap underneath.
    val rFresh = rightW.select(rightW.columns.toIndexedSeq.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*)
    val r = rFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    val lk = attr(l, keyCol); val rk = attr(r, keyCol)
    require(lk.dataType == LongType && rk.dataType == LongType,
      s"$keyCol must be BIGINT on both sides")
    val lt = attr(l, timeCol); val rt = attr(r, timeCol)
    require(lt.dataType == rt.dataType, s"$timeCol type mismatch")
    val tb = tiebreakCols.map(attr(r, _))
    tb.foreach(a => require(a.dataType == LongType, s"tiebreak ${a.name} must be BIGINT"))
    val pay = payloadCols.map(attr(r, _))
    val out = pay.zip(payloadNames).map { case (p, n) =>
      AttributeReference(n, p.dataType, nullable = true)()
    }
    GraftSqlInternals.ofRows(spark,
      AsOfJoinNode(lk, lt, rk, rt, tb, pay, out, l, r))
  }
}
