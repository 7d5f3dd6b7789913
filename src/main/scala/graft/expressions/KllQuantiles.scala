package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Mergeable quantile counters: the KLL sketch (Karnin/Lang/Liberty,
  * FOCS 2016; Apache DataSketches' `KllDoublesSketch`) as a native
  * Catalyst `TypedImperativeAggregate`, completing the [[graft.catalog.Rollup]]
  * counter family — sum/min/max (algebraic), HLL (distinct), moments
  * (corr/stddev) all fold across batches, and quantiles were the missing
  * holistic member. A KLL sketch column appended per batch unions to the
  * exact same sketch as a one-shot pass (mergeability, PODS 2012 sense),
  * so a 100 TB rollup can serve p50/p99 per group without ever
  * re-scanning history.
  *
  * Exactness regime (what the q160 gate uses): a KLL sketch with
  * parameter k is EXACT while the total item count stays at or below its
  * first-compaction capacity (> k items); merges of exact sketches whose
  * combined weight fits remain exact under any merge order. In that
  * regime `getQuantile(p, INCLUSIVE)` returns the order statistic at
  * 1-based position ceil(p*n) — reproducible bit-for-bit cross-engine
  * (it is a SELECTED data value, like [[graft.operators.Robust]]).
  * Beyond capacity the sketch degrades gracefully to ~1.65%/sqrt(k)
  * rank error instead of failing — the 100 TB behavior, property-tested
  * (rank-error bound) rather than oracle-gated, the same split as
  * HeavyHitters/HLL.
  */
object Kll {

  /** Aggregate a double column into a KLL sketch (binary). */
  def sketchAgg(c: Column, k: Int = 200): Column =
    GraftBridge.column(KllSketchAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())

  /** Union previously-built sketch columns (binary -> binary). */
  def unionAgg(c: Column, k: Int = 200): Column =
    GraftBridge.column(KllUnionAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())

  /** Quantile at rank `p` (0..1, INCLUSIVE search) of a sketch column;
    * null for an empty/null sketch. */
  def quantile(sketch: Column, p: Double): Column =
    GraftBridge.column(KllQuantileExpr(GraftBridge.expression(sketch),
      GraftBridge.expression(org.apache.spark.sql.functions.lit(p))))

  /** Number of items the sketch has seen (BIGINT). */
  def n(sketch: Column): Column =
    GraftBridge.column(KllNExpr(GraftBridge.expression(sketch)))

  private[expressions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

private[expressions] trait KllAggBase
  extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapified sketches are read-optimized; merge into a fresh writable one
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(Kll.heapify(bytes)); s
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** KLL sketch build over a DOUBLE column. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] {

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def prettyName: String = "graft_kll_sketch"
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Union of serialized KLL sketches (the rollup read/compact fold). */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] {

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(Kll.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def prettyName: String = "graft_kll_union"
  override def withNewMutableAggBufferOffset(o: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllUnionAgg =
    copy(child = c)
}

/** getQuantile(p, INCLUSIVE) over a serialized sketch. Runs on reduced
  * per-group rows (post-aggregate), so CodegenFallback costs nothing
  * measurable — the hot path is the sketch build, which lives inside the
  * hash aggregate. */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(bytes: Any, p: Any): Any = {
    val s = Kll.heapify(bytes.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null
    else s.getQuantile(p.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }
  override def prettyName: String = "graft_kll_quantile"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Item count of a serialized sketch. */
case class KllNExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(bytes: Any): Any =
    Kll.heapify(bytes.asInstanceOf[Array[Byte]]).getN
  override def prettyName: String = "graft_kll_n"
  override protected def withNewChildInternal(c: Expression): KllNExpr =
    copy(child = c)
}
