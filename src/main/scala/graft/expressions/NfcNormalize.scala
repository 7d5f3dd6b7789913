package graft.expressions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the first step of
  * any text-dedup pipeline that must not treat "é" (U+00E9) and
  * "e&#x301;" (e + combining acute) as different documents. Spark ships
  * no normalization function; a Scala UDF would break codegen and box
  * every row, so this is the custom-`Expression` middle ground: a static
  * `java.text.Normalizer` call emitted INLINE in the generated code (no
  * reference-object indirection — the JIT sees a monomorphic call).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real text (ASCII is always NFC) — the common
  * row pays one scan, only actually-denormalized rows pay the rebuild.
  *
  * Both the JVM and DuckDB's `nfc_normalize` implement the same Unicode
  * normalization algorithm, so q74's gate is a real cross-engine
  * hash-match on the normalized STRINGS, not a length proxy.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  // analysis-time type error for non-string SQL arguments (graft_nfc(42)
  // previously ClassCastException'd on executors mid-job)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalizeExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static worker shared by interpreted and generated paths. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column builder. */
  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalizeExpr(GraftBridge.expression(c)))
}
