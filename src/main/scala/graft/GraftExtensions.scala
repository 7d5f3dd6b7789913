package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Repartition, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
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
  * Two extension points are used:
  *  - `injectFunction` for the sketch expressions Spark cannot express
  *    natively;
  *  - `injectRuntimeOptimizerRule` for [[SmallResultSortRule]], the
  *    stats-gated final-sort rewrite (see its doc for the scale story).
  * Everything else stays declarative — Catalyst already plans the
  * engine's operators well. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectRuntimeOptimizerRule(_ => SmallResultSortRule)
  }
}

/** AQE-runtime rewrite of a query's FINAL global sort when the sorted
  * input is measured (runtime shuffle statistics, not estimates) to be
  * small: `Sort(global)` → `repartition(1) + Sort(local)`.
  *
  * Why: a global sort range-partitions its input — an Exchange whose
  * bounds come from a driver-side sampling pass over the child (when the
  * sort is the plan's only exchange, that pass re-executes the child
  * outright) — purely to parallelize the sort. For a small final result
  * (grouped reports, top-k summaries — most declared queries) that
  * machinery costs far more than sorting the rows in one task, and
  * single-partition output is exactly what a result consumer wants.
  * Identical rows in the identical order come out — only the partitioning
  * of the last stage changes.
  *
  * Scale safety is BY CONSTRUCTION, not by tuning: the rule runs inside
  * AQE's logical re-optimization, where `stats.sizeInBytes` for
  * materialized stages is the true runtime size, and fires only below
  * `spark.graft.sort.coalesceThreshold` (default 64 MiB — one healthy
  * AQE-advisory partition). A 100 TB result keeps the parallel range
  * sort; a dashboard-sized one skips the exchange. Root-only: interior
  * sorts (window prep, sort-merge inputs, TakeOrderedAndProject limits)
  * are never touched. */
object SmallResultSortRule extends Rule[LogicalPlan] {

  private val ThresholdKey = "spark.graft.sort.coalesceThreshold"
  private val DefaultThreshold = 64L * 1024 * 1024

  private def small(child: LogicalPlan): Boolean = {
    val t = try conf.getConfString(ThresholdKey, DefaultThreshold.toString).toLong
    catch { case _: NumberFormatException => DefaultThreshold }
    t > 0 && child.stats.sizeInBytes <= t
  }

  private def rewrite(s: Sort): Sort =
    // shuffle=true, NOT coalesce: a coalesce(1) merges the CHILD's
    // partitions, so a map-only child (scan -> expression-heavy project
    // -> sort, no interior exchange) would compute single-task (measured:
    // q30's per-char fingerprint pass 1.0 -> 2.5 s when coalesced). A
    // single-partition shuffle keeps the child's parallelism and still
    // removes the range partitioner and its bounds-sampling pass - which,
    // when the sort is the plan's only exchange, re-executed the entire
    // child once just to sample it.
    s.copy(global = false, child = Repartition(1, shuffle = true, s.child))

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // the ROOT sort only: its output feeds the result sink, nothing in
    // the plan depends on its partitioning
    case s @ Sort(_, true, child, _) if small(child) => rewrite(s)
    // root projection over the final sort (column pruning can leave the
    // Project on top): Project preserves order and partitioning
    case p @ Project(_, s @ Sort(_, true, child, _)) if small(child) =>
      p.copy(child = rewrite(s))
    case _ => plan
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Wrong arity from a pure-SQL caller must surface as the standard
    * AnalysisException with the usage string, not an
    * IndexOutOfBoundsException from `exprs(1)` — these builders are
    * cluster-wide API via `spark.sql.extensions`. */
  private def arity(name: String, usage: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            // usage rides inside functionName: the docroot slot is
            // interpolated into a '<docroot>/sql-ref-functions.html' URL
            // by the template, which mangled the usage string into a
            // bogus link instead of displaying it
            "functionName" -> s"$name (usage: ${usage.replace("_FUNC_", name)})",
            "expectedNum" -> n.toString,
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(exprs)
    }

  /** The SQL surface: name → (info, builder). Single source of truth for
    * both the extension path and [[Sketches.registerSql]]'s live path. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "_FUNC_(array<long>) - 60-bit SimHash of element hashes"),
      arity("graft_simhash60", "_FUNC_(array<long>)", 1)(exprs => Simhash60Expr(exprs.head))),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "_FUNC_(array<long>) - 32-element MinHash signature of 28-bit hashes"),
      arity("graft_minhash_sig", "_FUNC_(array<long>)", 1)(exprs => MinhashSigExpr(exprs.head, 32))),
    (FunctionIdentifier("graft_md5_prefix"),
      info("graft_md5_prefix", "_FUNC_(array<string>) - 60-bit md5-prefix hash per element"),
      arity("graft_md5_prefix", "_FUNC_(array<string>)", 1)(exprs => Md5PrefixArrayExpr(exprs.head, 15))),
    (FunctionIdentifier("graft_md5_prefix28"),
      info("graft_md5_prefix28", "_FUNC_(array<string>) - 28-bit md5-prefix hash per element"),
      arity("graft_md5_prefix28", "_FUNC_(array<string>)", 1)(exprs => Md5PrefixArrayExpr(exprs.head, 7))),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(array<double>, array<double>) - ordered-fold dot product"),
      arity("graft_dot", "_FUNC_(array<double>, array<double>)", 2)(
        exprs => DotProductExpr(exprs.head, exprs(1)))),
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "_FUNC_(string) - Unicode NFC normalization"),
      arity("graft_nfc", "_FUNC_(string)", 1)(exprs => NfcNormalizeExpr(exprs.head))),
    (FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters",
        "_FUNC_(string, k) - Misra-Gries frequent-items aggregate, k counters"),
      arity("graft_heavy_hitters", "_FUNC_(string, k)", 2)(exprs =>
        HeavyHittersAgg(exprs.head, foldableInt(
          "graft_heavy_hitters", "k", exprs(1))).toAggregateExpression())),
    (FunctionIdentifier("graft_strip_markup"),
      info("graft_strip_markup",
        "_FUNC_(string) - strip HTML markup (blocks, tags, entities), collapse whitespace"),
      arity("graft_strip_markup", "_FUNC_(string)", 1)(exprs =>
        replaceChain(exprs.head, graft.functions.TextAnalysis.MarkupStrip, trimmed = true))),
    (FunctionIdentifier("graft_redact_pii"),
      info("graft_redact_pii",
        "_FUNC_(string) - redact email/IP/SSN/phone spans (training-data scrubbing)"),
      arity("graft_redact_pii", "_FUNC_(string)", 1)(exprs =>
        replaceChain(exprs.head, graft.functions.TextAnalysis.PiiPatterns, trimmed = false))))

  /** The TextAnalysis regexp_replace chains as raw Catalyst expressions,
    * so the SAME pattern tables back both the Column API and the SQL
    * surface — one source of truth for the sanitizer/redaction order. */
  private def replaceChain(subject: Expression, chain: Seq[(String, String)],
                           trimmed: Boolean): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace, StringTrim}
    val replaced = chain.foldLeft(subject) { case (e, (p, r)) =>
      RegExpReplace(e, Literal(p), Literal(r))
    }
    if (trimmed) StringTrim(replaced) else replaced
  }

  /** Aggregate capacity arguments must be literal ints — a column-valued
    * k has no meaning for a fixed-size sketch. */
  private def foldableInt(fn: String, arg: String, e: Expression): Int = e match {
    case lit if lit.foldable =>
      lit.eval() match {
        case i: Int => i
        case l: Long if l == l.toInt => l.toInt
        case other => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "SECOND_FUNCTION_ARGUMENT_NOT_INTEGER",
          messageParameters = Map("functionName" -> s"$fn ($arg=$other)"))
      }
    case _ => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "SECOND_FUNCTION_ARGUMENT_NOT_INTEGER",
      messageParameters = Map("functionName" -> s"$fn (non-literal $arg)"))
  }
}
