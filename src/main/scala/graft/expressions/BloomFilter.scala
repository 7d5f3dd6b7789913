package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Bloom-filter semi-join pruning (Bloom 1970; the Spark optimizer's own
  * runtime row-level filtering uses the same construction — see
  * InjectRuntimeFilter in the Spark source).
  *
  * The shape: a big fact ⋈ selective-dim join where the dim's KEY SET
  * fits a few-MB bitmap but its rows are too many to broadcast as a hash
  * relation. [[BloomLongAgg]] folds the dim keys into a bitmap (partials
  * OR together — commutative, any partitioning), the single-row result is
  * broadcast, and [[BloomMightContainLong]] drops non-joining fact rows
  * BEFORE the join's shuffle. False positives only — the join itself
  * removes them, so the final result is bit-identical to the plain join
  * (which is exactly what the q133 gate checks); false negatives are
  * impossible.
  *
  * Hashing is splitmix64 double hashing (Kirsch & Mitzenmacher 2006:
  * k independent functions from two): position_i = (h1 + i·h2) mod bits.
  * The serialized form is self-describing — [numHashes:1B][bitmap] — so
  * the probe side needs no out-of-band parameters.
  */
object Bloom {

  private[expressions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[expressions] def setBits(bloom: Array[Byte], key: Long, numHashes: Int): Unit = {
    val bits = (bloom.length - 1).toLong * 8
    val h1 = mix(key); val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % bits
      bloom((pos >>> 3).toInt + 1) = (bloom((pos >>> 3).toInt + 1) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  private[graft] def testBits(bloom: Array[Byte], key: Long): Boolean = {
    val bits = (bloom.length - 1).toLong * 8
    val numHashes = bloom(0) & 0xff
    val h1 = mix(key); val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % bits
      if ((bloom((pos >>> 3).toInt + 1) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Aggregate a BIGINT key column into a self-describing bloom bitmap
    * (`numBits` must be a positive multiple of 8). */
  def bloomAgg(key: Column, numBits: Int = 1 << 23, numHashes: Int = 5): Column =
    GraftBridge.column(BloomLongAgg(GraftBridge.expression(key), numBits, numHashes)
      .toAggregateExpression())

  /** True iff `key` MIGHT be in the bloom (no false negatives). */
  def mightContain(bloom: Column, key: Column): Column =
    GraftBridge.column(BloomMightContainLong(
      GraftBridge.expression(bloom), GraftBridge.expression(key)))

  /** A constant bitmap as a plan-REDACTED binary constant (see
    * [[BinaryBlob]]): `lit(bytes)` hex-prints 2 chars per byte into
    * every rendered plan — explain dumps and plan-assertion failure
    * messages grow by ~2 MB per default-sized bitmap. */
  def bitmapLiteral(bytes: Array[Byte]): Column =
    GraftBridge.column(BinaryBlob(bytes, "bloom_bitmap"))
}

/** A constant binary blob as a leaf expression whose plan rendering is
  * redacted to a label + byte count. Semantically a non-null BinaryType
  * constant: interpreted eval returns the array, codegen references it
  * once per task (`addReferenceObj`) exactly like a `Literal` — but
  * `toString`/`sql` never dump the payload, and `foldable = false` keeps
  * constant folding from rewriting it back into a hex-printing Literal.
  * (Deliberately NOT registered as a SQL function: a plan-only carrier
  * for driver-materialized sketch bytes.) */
case class BinaryBlob(bytes: Array[Byte], label: String) extends LeafExpression {
  override def foldable: Boolean = false
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def eval(input: InternalRow): Any = bytes
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blob", bytes, "byte[]")
    ExprCode.forNonNullValue(JavaCode.global(ref, BinaryType))
  }
  override def toString: String = s"binary_blob($label, ${bytes.length}B)"
  override def sql: String = toString
  override def prettyName: String = "binary_blob"
}

case class BloomLongAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 8 == 0, s"numBits must be a positive multiple of 8: $numBits")
  require(numHashes > 0 && numHashes <= 255, s"numHashes out of range: $numHashes")

  override def createAggregationBuffer(): Array[Byte] = {
    val buf = new Array[Byte](1 + numBits / 8)
    buf(0) = numHashes.toByte
    buf
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Bloom.setBits(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 1
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomLongAgg =
    copy(child = newChild)
}

/** Membership probe: bloom bytes (left) tested against a BIGINT key
  * (right). Stays inside whole-stage codegen via a direct call into the
  * shared bit-test helper — the fact-side filter this exists for runs in
  * the scan's generated loop. */
case class BloomMightContainLong(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(bloom: Any, key: Any): Any =
    Bloom.testBits(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  def doTest(bloom: Array[Byte], key: Long): Boolean = Bloom.testBits(bloom, key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this, classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, (b, k) => s"${ev.value} = $ref.doTest($b, $k);")
  }

  override def prettyName: String = "graft_bloom_contains"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
