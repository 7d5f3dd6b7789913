package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the sketching hot paths.
  *
  * The declarative formulations (nested `transform`/`aggregate` lambdas in
  * [[graft.functions.Hashing]] / [[graft.operators.Similarity]]) are
  * evaluated interpreted per element — k × |shingles| closure dispatches
  * per row. These expressions compute the IDENTICAL values (same md5-based
  * hash family, so the DuckDB oracle still reproduces them bit-for-bit) in
  * one tight primitive loop per row: no boxing, no per-element closures,
  * coefficients precomputed at plan time.
  *
  * Measured effect: q26 minhash at sf0.1 drops from 518 s (interpreted
  * lambdas, md5 re-derived per (i, shingle)) to seconds.
  *
  * `doGenCode` emits a call into the expression instance (via
  * `addReferenceObj`) rather than falling back to the interpreter — the
  * containing operator stays inside ONE WholeStageCodegen span, and the
  * per-row loop runs as monomorphic JVM code.
  */
object Sketches {

  def md5PrefixLong(s: String, hexChars: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(hexChars), 16)
  }

  /** Same values as [[graft.functions.Hashing.coefA]]/[[coefB]]. */
  def coefficients(k: Int): (Array[Long], Array[Long]) = (
    Array.tabulate(k)(i => md5PrefixLong(s"a$i", 7) * 2 + 1),
    Array.tabulate(k)(i => md5PrefixLong(s"b$i", 7)))

  def minhashSig(hashes28: Column, k: Int): Column =
    GraftBridge.column(MinhashSigExpr(GraftBridge.expression(hashes28), k))

  def simhash60(hashes60: Column): Column =
    GraftBridge.column(Simhash60Expr(GraftBridge.expression(hashes60)))

  def srpSketch(vec: Column, signs: Array[Array[Int]]): Column =
    GraftBridge.column(SrpSketchExpr(GraftBridge.expression(vec), signs))
}

/** k-element MinHash signature over an array of 28-bit shingle hashes:
  * sig[i] = min_h (a_i·h + b_i) mod (2^31-1). One pass over the hashes,
  * all k mins updated per element. Empty/absent input → null. */
case class MinhashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  private val P = 2147483647L
  @transient private lazy val (as, bs) = Sketches.coefficients(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinhashSigExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = $ref.nullSafeEval($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash over an array of 60-bit element hashes: bit j of the
  * result is set iff Σ_h (2·bit_j(h) − 1) >= 0. */
case class Simhash60Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) >= 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[Simhash60Expr].getName)
    defineCodeGen(ctx, ev, c => s"((java.lang.Long) $ref.nullSafeEval($c)).longValue()")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 16-bit sign-random-projection sketch over an array<double> embedding,
  * with the ±1 hyperplane matrix baked in at plan time. Components are
  * quantized to floor(x·1e6) so the sums are exact integers — identical
  * to the declarative/oracle formulation regardless of evaluation order. */
case class SrpSketchExpr(child: Expression, signs: Array[Array[Int]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dims = v.numElements()
    val q = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      q(d) = math.floor(v.getDouble(d) * 1000000L).toLong
      d += 1
    }
    var sketch = 0L
    var p = 0
    while (p < signs.length) {
      val row = signs(p)
      var acc = 0L
      var i = 0
      while (i < dims) {
        acc += row(i) * q(i)
        i += 1
      }
      if (acc >= 0) sketch |= (1L << p)
      p += 1
    }
    sketch
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srp", this, classOf[SrpSketchExpr].getName)
    defineCodeGen(ctx, ev, c => s"((java.lang.Long) $ref.nullSafeEval($c)).longValue()")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
