package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlInternals, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Bounded top-k-per-key as a NATIVE Catalyst operator — the
  * whole-operator extension path (SURVEY.md §2.2 B18): a custom
  * [[LogicalPlan]] node, an optimizer [[Rule]], a [[SparkStrategy]],
  * and a two-stage [[SparkPlan]] (partial per-input-partition heaps →
  * key-clustered exchange → final merge + rank), registered through
  * `SparkSessionExtensions` (or post-hoc via
  * `spark.experimental.extraStrategies`).
  *
  * Same semantics as the typed-Aggregator form (B17,
  * graft.functions.TopKByScore): rank rows per key by (score DESC,
  * id ASC), keep the first k. The scale argument is identical — the
  * exchange carries at most k rows per (input partition, key) instead
  * of every row of every key like a window `row_number` — but here the
  * shuffled payload is the bare rows themselves (no struct-array
  * aggregation buffer, no posexplode on the far side), and the merge
  * is a bounded insertion instead of a sort.
  *
  * Reference lineage: this generalizes the reference engine's
  * per-thread local map → hash-partitioned exchange → per-partition
  * reduce shape (omp_count_words.cpp:291-354) to a non-algebraic
  * "keep the k best" reduction.
  *
  * Null semantics: rows whose score or id is NULL are dropped
  * (documented; matches `row_number ... ORDER BY score DESC NULLS
  * LAST` only when k rows exist anyway, so the library API contract
  * is simply "null score/id rows do not compete").
  */
case class TopKPerKeyNode(
    keys: Seq[Attribute],
    score: Attribute,
    id: Attribute,
    rankAttr: Attribute,
    k: Int,
    child: LogicalPlan)
  extends UnaryNode {

  override def output: Seq[Attribute] = (keys :+ rankAttr :+ id) :+ score

  // rank is produced here, not consumed from below — without this the
  // analyzer would report it as a missing input reference
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Filter pushdown through the custom node: a deterministic predicate
  * over the KEY columns only commutes with per-key top-k (it removes
  * whole groups, never reorders within a group), so it can sink below
  * the operator and keep sinking into the parquet scan. Catalyst
  * cannot know this for a foreign node — this rule teaches it.
  */
object PushFilterThroughTopKPerKey extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, t: TopKPerKeyNode)
        if cond.deterministic && cond.references.subsetOf(AttributeSet(t.keys)) =>
      t.copy(child = Filter(cond, t.child))
  }
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange via
  * `requiredChildDistribution`) → final.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, score, id, rankAttr, k, child) =>
      val partial = TopKPerKeyPartialExec(keys, score, id, k, planLater(child))
      TopKPerKeyFinalExec(keys, score, id, rankAttr, k, partial) :: Nil
    case _ => Nil
  }
}

/** k-bounded buffer ordered (score DESC, id ASC); linear insertion —
  * k is small by contract (top-k, not top-k-thousand).
  */
private[plans] final class BoundedBuffer(k: Int) {
  val entries = new mutable.ArrayBuffer[(Double, Long, AnyRef)](k + 1)

  @inline private def beats(s: Double, i: Long, os: Double, oi: Long): Boolean =
    s > os || (s == os && i < oi)

  def offer(s: Double, i: Long, payload: => AnyRef): Unit = {
    if (entries.length >= k) {
      val last = entries(entries.length - 1)
      if (!beats(s, i, last._1, last._2)) return
    }
    var pos = 0
    while (pos < entries.length && beats(entries(pos)._1, entries(pos)._2, s, i)) pos += 1
    entries.insert(pos, (s, i, payload))
    if (entries.length > k) entries.remove(entries.length - 1)
  }
}

/** Shared per-task state for the codegen'd path: the key→buffer map
  * lives here in compiled Scala; the generated Java only evaluates the
  * key/score/id expressions inline in the child's loop and calls
  * [[offer]] — so the child→top-k handoff has no iterator, no virtual
  * next(), and no row materialization unless the row actually enters a
  * buffer ([[BoundedBuffer.offer]] takes the payload by name).
  */
final class TopKPartialBuffers(k: Int) {
  private val buffers = new mutable.HashMap[UnsafeRow, BoundedBuffer]

  def offer(key: UnsafeRow, score: Double, id: Long, row: UnsafeRow): Unit = {
    val buf = buffers.get(key) match {
      case Some(b) => b
      case None =>
        val b = new BoundedBuffer(k)
        buffers.put(key.copy(), b)
        b
    }
    buf.offer(score, id, row.copy())
  }

  def result(): java.util.Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    buffers.valuesIterator
      .flatMap(_.entries.iterator.map(_._3.asInstanceOf[InternalRow])).asJava
  }
}

/** Final-stage analog: payloads are not kept; the output rows
  * (keys, rank, id, score) are assembled here, already unsafe-projected
  * and copied, so the generated loop just drains an iterator.
  */
final class TopKFinalBuffers(k: Int, keyTypes: Array[org.apache.spark.sql.types.DataType],
    outTypes: Array[org.apache.spark.sql.types.DataType]) {
  private val buffers = new mutable.HashMap[UnsafeRow, BoundedBuffer]

  def offer(key: UnsafeRow, score: Double, id: Long): Unit = {
    val buf = buffers.get(key) match {
      case Some(b) => b
      case None =>
        val b = new BoundedBuffer(k)
        buffers.put(key.copy(), b)
        b
    }
    buf.offer(score, id, null)
  }

  def result(): java.util.Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    val toUnsafe = UnsafeProjection.create(outTypes)
    val nKeys = keyTypes.length
    buffers.iterator.flatMap { case (keyRow, buf) =>
      buf.entries.iterator.zipWithIndex.map { case ((s, i, _), idx) =>
        val vals = new Array[Any](outTypes.length)
        var j = 0
        while (j < nKeys) { vals(j) = keyRow.get(j, keyTypes(j)); j += 1 }
        vals(nKeys) = (idx + 1).toLong
        vals(nKeys + 1) = i
        vals(nKeys + 2) = s
        toUnsafe(new GenericInternalRow(vals)).copy(): InternalRow
      }
    }.asJava
  }
}

/** Codegen shared by both stages: blocking produce — the generated
  * function consumes the ENTIRE child inside this stage (so the scan →
  * filter → project → top-k-insert path is one fused loop with no
  * iterator handoff), then drains the helper's result iterator.
  * SortExec's shape, with the bounded-buffer map in compiled Scala.
  */
trait TopKCodegen extends BlockingOperatorWithCodegen { self: UnaryExecNode =>
  def keys: Seq[Attribute]
  def score: Attribute
  def idAttr: Attribute

  /** Java type of the per-task helper; the exec exposes a
    * `createBuffers()` factory the generated constructor calls. */
  protected def helperClass: String

  protected var helperTerm: String = _

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String = {
    val needProcess = ctx.addMutableState(
      CodeGenerator.JAVA_BOOLEAN, "topkNeedProcess", v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("topkPlan", this)
    helperTerm = ctx.addMutableState(
      helperClass, "topkBuffers", v => s"$v = $thisPlan.createBuffers();")
    val outputIter = ctx.addMutableState(
      "java.util.Iterator<org.apache.spark.sql.catalyst.InternalRow>", "topkOutput")
    val addToTopK = ctx.freshName("addToTopK")
    val addToTopKFunc = ctx.addNewFunction(addToTopK,
      s"""
         |private void $addToTopK() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val row = ctx.freshName("topkRow")
    s"""
       |if ($needProcess) {
       |  $addToTopKFunc();
       |  $outputIter = $helperTerm.result();
       |  $needProcess = false;
       |}
       |while ($limitNotReachedCond $outputIter.hasNext()) {
       |  org.apache.spark.sql.catalyst.InternalRow $row =
       |    (org.apache.spark.sql.catalyst.InternalRow) $outputIter.next();
       |  ${consume(ctx, null, row)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  /** Generates: evaluate score/id from the child's loop variables, and
    * only for rows that compete (non-null) build the key row — plus
    * whatever extra offer arguments the stage needs — and insert.
    */
  protected def consumeToOffer(
      ctx: CodegenContext, input: Seq[ExprCode],
      extra: Option[(String, String)]): String = {
    val childOutput = self.child.output
    ctx.currentVars = input
    ctx.INPUT_ROW = null
    val scoreEv = BindReferences
      .bindReference(score: Expression, childOutput).genCode(ctx)
    val idEv = BindReferences
      .bindReference(idAttr: Expression, childOutput).genCode(ctx)
    val keyEv = GenerateUnsafeProjection.createCode(ctx,
      keys.map(k => BindReferences.bindReference(k: Expression, childOutput)))
    val (extraCode, extraArgs) = extra.getOrElse(("", ""))
    s"""
       |${scoreEv.code}
       |${idEv.code}
       |if (!(${scoreEv.isNull}) && !(${idEv.isNull})) {
       |  ${keyEv.code}
       |  $extraCode
       |  $helperTerm.offer(${keyEv.value}, ${scoreEv.value}, ${idEv.value}$extraArgs);
       |}
     """.stripMargin
  }
}

/** Map-side stage: per input partition, keep at most k rows per key
  * (full input rows, so the exchange above carries pruned originals).
  * No distribution requirement — runs where the scan runs.
  */
case class TopKPerKeyPartialExec(
    keys: Seq[Attribute],
    score: Attribute,
    idAttr: Attribute,
    k: Int,
    child: SparkPlan)
  extends UnaryExecNode with TopKCodegen {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def helperClass: String = "graft.plans.TopKPartialBuffers"

  /** Per-task helper factory, called from the generated constructor. */
  def createBuffers(): TopKPartialBuffers = new TopKPartialBuffers(k)

  // the payload is the whole input row, so the parent loop must
  // evaluate every child column before our consume code runs
  override def usedInputs: AttributeSet = AttributeSet(child.output)

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    val childOutput = child.output
    ctx.currentVars = input
    ctx.INPUT_ROW = null
    // materialize the payload row ONLY for rows that pass the null
    // check (the buffer then copies only on actual insertion)
    val rowEv = GenerateUnsafeProjection.createCode(ctx,
      childOutput.map(a => BindReferences.bindReference(a: Expression, childOutput)))
    consumeToOffer(ctx, input, Some((rowEv.code.toString, s", ${rowEv.value}")))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundKeys: Seq[Expression] = keys.map(k => BindReferences.bindReference(k: Expression, childOutput))
    val boundScore: Expression = BindReferences.bindReference(score: Expression, childOutput)
    val boundId: Expression = BindReferences.bindReference(idAttr: Expression, childOutput)
    val kk = k
    child.execute().mapPartitions({ iter =>
      // codegen'd projections are built inside the task, from the
      // serializable bound expressions
      val keyProj = UnsafeProjection.create(boundKeys)
      val buffers = new mutable.HashMap[UnsafeRow, BoundedBuffer]
      iter.foreach { row =>
        val s = boundScore.eval(row)
        val i = boundId.eval(row)
        if (s != null && i != null) {
          val key = keyProj(row)
          val buf = buffers.get(key) match {
            case Some(b) => b
            case None =>
              val b = new BoundedBuffer(kk)
              buffers.put(key.copy(), b) // copy only on first sight of a key
              b
          }
          buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long], row.copy())
        }
      }
      buffers.valuesIterator.flatMap(_.entries.iterator.map(_._3.asInstanceOf[InternalRow]))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce-side stage: requires key-clustered distribution (Spark's
  * EnsureRequirements inserts the hash exchange), merges the ≤k
  * survivors per (map partition, key) and emits `keys, rank, id,
  * score`. State is bounded by k × |keys in partition| — hash-aggregate
  * scale behavior, no sort.
  */
case class TopKPerKeyFinalExec(
    keys: Seq[Attribute],
    score: Attribute,
    idAttr: Attribute,
    rankAttr: Attribute,
    k: Int,
    child: SparkPlan)
  extends UnaryExecNode with TopKCodegen {

  override def output: Seq[Attribute] = (keys :+ rankAttr :+ idAttr) :+ score

  // rank originates here (mirrors the logical node) — without this the
  // plan tree renders with a spurious missing-input marker
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // post-exchange child is hash-partitioned on keys, which are in our
  // output unchanged — downstream per-key ops can reuse it shuffle-free
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def helperClass: String = "graft.plans.TopKFinalBuffers"

  /** Per-task helper factory, called from the generated constructor. */
  def createBuffers(): TopKFinalBuffers =
    new TopKFinalBuffers(k, keys.map(_.dataType).toArray, output.map(_.dataType).toArray)

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    consumeToOffer(ctx, input, None)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundKeys: Seq[Expression] = keys.map(k => BindReferences.bindReference(k: Expression, childOutput))
    val boundScore: Expression = BindReferences.bindReference(score: Expression, childOutput)
    val boundId: Expression = BindReferences.bindReference(idAttr: Expression, childOutput)
    val keyTypes = keys.map(_.dataType)
    val outTypes = output.map(_.dataType).toArray
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(boundKeys)
      val toUnsafe = UnsafeProjection.create(outTypes)
      val buffers = new mutable.HashMap[UnsafeRow, BoundedBuffer]
      iter.foreach { row =>
        val s = boundScore.eval(row)
        val i = boundId.eval(row)
        if (s != null && i != null) {
          val key = keyProj(row)
          val buf = buffers.get(key) match {
            case Some(b) => b
            case None =>
              val b = new BoundedBuffer(kk)
              buffers.put(key.copy(), b)
              b
          }
          buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long], null)
        }
      }
      val nKeys = keyTypes.length
      buffers.iterator.flatMap { case (keyRow, buf) =>
        buf.entries.iterator.zipWithIndex.map { case ((s, i, _), idx) =>
          val vals = new Array[Any](outTypes.length)
          var j = 0
          while (j < nKeys) { vals(j) = keyRow.get(j, keyTypes(j)); j += 1 }
          vals(nKeys) = (idx + 1).toLong
          vals(nKeys + 1) = i
          vals(nKeys + 2) = s
          toUnsafe(new GenericInternalRow(vals))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** Session wiring for the graft plan extensions. Build-time path:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. For
  * sessions graft did not build (the driver's), [[NativeTopK
  * .ensureRegistered]] attaches the same strategy/rule post-hoc via
  * the public `spark.experimental` hooks.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughTopKPerKey)
    ext.injectColumnar(_ => new VecKernelColumnarRule)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // A44: ANSI DML over catalog-named graft tables (path-named DML is
    // caught at parse time inside GraftSqlParser) — post-hoc, so it
    // runs AFTER Spark's own DataSourceAnalysis and can re-route the
    // already-planned file-insert command
    ext.injectPostHocResolutionRule(_ => new GraftDmlRule)
    // r9: manifest row counts + column ranges → CatalogStatistics on
    // catalog-named graft relations, so CBO filter/join estimation
    // fires by name (metadata-only; see sources/GraftStats.scala)
    ext.injectPostHocResolutionRule(_ => new graft.sources.GraftStatsRule)
    // r9: unfiltered global count/min/max over a graft relation
    // answers from the manifest — the scan disappears from the plan
    ext.injectOptimizerRule(_ => new graft.sources.GraftMetaAggRule)
    // r10: grouped count/sum/avg over a graft base substitutes a
    // registered, exactly-fresh A55 materialized view (A58) — the base
    // scan disappears from the plan (sources/MvRewrite.scala)
    ext.injectOptimizerRule(s => new graft.sources.GraftMvRewriteRule(s))
    // r13: DV-carrying / column-mapped versions read through the
    // VECTORIZED parquet path (row-index anti join) instead of the
    // row-based compat relation — resolution-time substitution so the
    // whole optimizer (pushdown, pruning, codegen) runs over it
    ext.injectPostHocResolutionRule(s => new graft.sources.GraftDvScanRule(s))
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          builder.getClass.getCanonicalName, name),
        builder))
    }
  }
}

/** A session carrying the FULL graft extensions (parser, DML rules,
  * strategies, functions) over an EXISTING SparkContext — for
  * harness-built sessions constructed without `spark.sql.extensions`.
  * Parser and resolution rules are fixed at session build, so unlike
  * the strategy/function hooks they cannot be attached post-hoc; the
  * public escape is building a sibling session on the same context
  * with `builder().withExtensions` (the active/default session is
  * restored afterwards, and the sibling is cached per context).
  *
  * Concurrency caveat: the clear→build→restore window touches Spark's
  * PROCESS-GLOBAL session registry — another thread calling
  * `SparkSession.builder().getOrCreate()` during that window could
  * mint an extension-less sibling. Call this during query SETUP (the
  * harness pattern it exists for), not concurrently with other session
  * construction; the monitor serializes callers of this object only.
  */
object GraftSessions {
  import org.apache.spark.sql.SparkSession
  @volatile private var cached: SparkSession = _
  def withExtensions(base: SparkSession): SparkSession = synchronized {
    if (cached != null && cached.sparkContext.eq(base.sparkContext) &&
        !cached.sparkContext.isStopped) return cached
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s =
      try SparkSession.builder().withExtensions(new GraftExtensions()(_)).getOrCreate()
      finally {
        prevActive.foreach(SparkSession.setActiveSession)
        prevDefault.foreach(SparkSession.setDefaultSession)
      }
    cached = s
    s
  }
}

/** The native expressions surfaced as SQL functions, so the SQL-text
  * surface (GraftSql / spark.sql) reaches the same codegen'd kernels
  * as the Column API: `SELECT vec_cosine(a.embedding, b.embedding)`.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import graft.functions.{BpeEncode, BpeMergeOnce, Djb2, FloatVecCosine, FloatVecDistSq, FloatVecDot, FloatVecNorm, Md5Prefix60, ZValue}

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args: Seq[Expression] =>
      require(args.length == 2, "vec_dot(a, b)"); FloatVecDot(args(0), args(1)) },
    "vec_norm" -> { args: Seq[Expression] =>
      require(args.length == 1, "vec_norm(a)"); FloatVecNorm(args(0)) },
    "vec_cosine" -> { args: Seq[Expression] =>
      require(args.length == 2, "vec_cosine(a, b)"); FloatVecCosine(args(0), args(1)) },
    "vec_dist_sq" -> { args: Seq[Expression] =>
      require(args.length == 2, "vec_dist_sq(a, c)"); FloatVecDistSq(args(0), args(1)) },
    "djb2" -> { args: Seq[Expression] =>
      require(args.length == 1, "djb2(s)"); Djb2(args(0)) },
    "md5_prefix60" -> { args: Seq[Expression] =>
      require(args.length == 1, "md5_prefix60(s)"); Md5Prefix60(args(0)) },
    "bpe_merge" -> { args: Seq[Expression] =>
      require(args.length == 3, "bpe_merge(syms, l, r)")
      BpeMergeOnce(args(0), args(1), args(2)) },
    "bpe_encode" -> { args: Seq[Expression] =>
      require(args.length == 3, "bpe_encode(word, lefts, rights)")
      BpeEncode(args(0), args(1), args(2)) },
    "z_value" -> { args: Seq[Expression] =>
      require(args.length == 2, "z_value(x, y)"); ZValue(args(0), args(1)) })

  /** Post-hoc registration on an existing session (idempotent —
    * createOrReplace semantics).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftSqlInternals.registerTempFunction(spark, name, builder)
    }
}

object NativeTopK {

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
    if (!exp.extraOptimizations.contains(PushFilterThroughTopKPerKey))
      exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughTopKPerKey
  }

  /** Top k rows per key group, ordered (scoreCol DESC, idCol ASC).
    * Output columns: keyCols..., rank, idCol, scoreCol. The physical
    * operator is monomorphic (DOUBLE score, BIGINT id — one tight
    * primitive merge loop, no per-row ordering dispatch); any other
    * numeric input is adapted by a cast projection in front, so the
    * API accepts e.g. INT scores and the cast cost is one codegen'd
    * map expression, not a change to the merge kernel.
    */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      scoreCol: String,
      idCol: String,
      k: Int,
      rankName: String = "rank"): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.functions.{col => fcol}
    import org.apache.spark.sql.types.NumericType
    val fields = df.schema.fields
    def fieldType(name: String) = fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
    (fieldType(scoreCol), fieldType(idCol)) match {
      case (Some(st), Some(it))
          if (st != DoubleType && st.isInstanceOf[NumericType]) ||
            (it != LongType && it.isInstanceOf[NumericType]) =>
        return topKPerKey(
          df.withColumn(scoreCol, fcol(scoreCol).cast(DoubleType))
            .withColumn(idCol, fcol(idCol).cast(LongType)),
          keyCols, scoreCol, idCol, k, rankName)
      case _ => ()
    }
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${analyzed.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val score = attr(scoreCol)
    val id = attr(idCol)
    require(score.dataType == DoubleType, s"$scoreCol must be DOUBLE, is ${score.dataType}")
    require(id.dataType == LongType, s"$idCol must be BIGINT, is ${id.dataType}")
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    GraftSqlInternals.ofRows(spark, TopKPerKeyNode(keys, score, id, rankAttr, k, analyzed))
  }
}
