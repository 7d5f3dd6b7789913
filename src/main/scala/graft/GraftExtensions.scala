package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions._

/** Spark-native deployment hook: register the engine's custom Catalyst
  * expressions through the standard `SparkSessionExtensions` mechanism —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * — so every session on the cluster (including pure-SQL users via
  * Thrift/Connect) gets the `graft_*` functions without any programmatic
  * call. [[graft.expressions.Sketches.registerSql]] remains the
  * live-session equivalent for notebooks/tests.
  *
  * Only `injectFunction` is used deliberately: the engine's operators are
  * declarative compositions Catalyst already plans well, so there is no
  * custom Rule/Strategy to inject — the extension point carries exactly
  * the pieces Spark cannot express natively (the sketch expressions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** The SQL surface: name → (info, builder). Single source of truth for
    * both the extension path and [[Sketches.registerSql]]'s live path. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "_FUNC_(array<long>) - 60-bit SimHash of element hashes"),
      (exprs: Seq[Expression]) => Simhash60Expr(exprs.head)),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "_FUNC_(array<long>) - 32-element MinHash signature of 28-bit hashes"),
      (exprs: Seq[Expression]) => MinhashSigExpr(exprs.head, 32)),
    (FunctionIdentifier("graft_md5_prefix"),
      info("graft_md5_prefix", "_FUNC_(array<string>) - 60-bit md5-prefix hash per element"),
      (exprs: Seq[Expression]) => Md5PrefixArrayExpr(exprs.head, 15)),
    (FunctionIdentifier("graft_md5_prefix28"),
      info("graft_md5_prefix28", "_FUNC_(array<string>) - 28-bit md5-prefix hash per element"),
      (exprs: Seq[Expression]) => Md5PrefixArrayExpr(exprs.head, 7)),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(array<double>, array<double>) - ordered-fold dot product"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs.head, exprs(1))))
}
