package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.queries.Det

/** Deterministic second-moment statistics (correlation, OLS regression).
  *
  * Spark's built-in `corr`/`regr_slope` stream co-moments in double
  * arithmetic, so their low bits depend on partition merge order — fine
  * for analytics, useless for a cross-engine hash gate, and subtly
  * unstable across retries at 100 TB. This formulation is the classic
  * algebraic decomposition instead: the five moment sums n, Σx, Σy, Σx²,
  * Σy², Σxy accumulated EXACTLY, each cast to double ONCE, and the
  * textbook formulas evaluated in a fixed IEEE expression tree:
  *
  *   corr  = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²)·(n·Σy² − Σy²))
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
  *   icept = (Σy − slope·Σx) / n
  *
  * The moments are carried in INTEGER units (cents: 2-dp sources × 100,
  * scale-0 decimals). This is what makes the one double conversion
  * bit-identical across engines: a scale-0 decimal converts as a single
  * correctly-rounded integer→double everywhere, whereas a fractional
  * decimal→double is engine-defined (DuckDB divides two already-rounded
  * doubles — int128 value and 10^scale — which can land 1 ULP off
  * Spark's correctly-rounded BigDecimal conversion; observed on q140's
  * sf0.001 Σy² before this units change).
  *
  * Same bits on any engine and any partitioning; the oracle spells the
  * identical tree. Moments are plain sums — partial-aggregated map-side,
  * one shuffle of |groups| rows, and mergeable into [[graft.catalog.Rollup]]
  * counters when the statistic must stay incrementally maintained
  * (StatsSpec proves the fold).
  */
object Stats {

  private val CentUnit = DecimalType(14, 0)

  /** Per-group exact moment sums for (x, y) — 2-dp money-like columns —
    * in cent units (sx, sy) and squared-cent units (sxx, syy, sxy). */
  def moments(df: DataFrame, groupCols: Seq[String],
              x: Column, y: Column): DataFrame = {
    val xc = (Det.money(x) * lit(100)).cast(CentUnit)
    val yc = (Det.money(y) * lit(100)).cast(CentUnit)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(xc).as("sx"), sum(yc).as("sy"),
        sum(xc * xc).as("sxx"), sum(yc * yc).as("syy"),
        sum(xc * yc).as("sxy"))
  }

  /** Correlation/regression columns from a [[moments]] row, evaluated in
    * a fixed double-precision expression tree (cent units cancel in corr
    * and slope; the intercept converts back via one ÷100). NULL when
    * degenerate (zero variance): `try_divide` NULLs a zero divisor
    * exactly like DuckDB's `/`, where ANSI Spark's plain `/` would
    * instead raise. */
  def corrCols(prefix: String = ""): Seq[Column] = {
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val covN = n * d("sxy") - d("sx") * d("sy")
    val varXN = n * d("sxx") - d("sx") * d("sx")
    val varYN = n * d("syy") - d("sy") * d("sy")
    val slope = try_divide(covN, varXN)
    Seq(
      try_divide(covN, sqrt(varXN * varYN)).as(s"${prefix}corr"),
      slope.as(s"${prefix}slope"),
      (try_divide(d("sy") - slope * d("sx"), n) / lit(100.0)).as(s"${prefix}intercept"))
  }

  /** Per-group exact raw-power sums s1..s4 of one 2-dp column, in cent
    * units — the inputs to [[skewKurtCols]]. The x⁴ chain squares the
    * square with explicit casts so every intermediate stays inside
    * DECIMAL(38)'s exact range (values ≤ ~10³⁴ here); the DuckDB twin
    * uses HUGEINT for the same reason ([[sqlMomentsHigher]]). */
  def momentsHigher(df: DataFrame, groupCols: Seq[String], x: Column): DataFrame = {
    val xc = (Det.money(x) * lit(100)).cast(CentUnit)
    val x2 = (xc * xc).cast(DecimalType(28, 0))
    val x4 = (x2 * x2).cast(DecimalType(38, 0))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(xc).as("s1"), sum(x2).as("s2"),
        sum((x2 * xc).cast(DecimalType(38, 0))).as("s3"), sum(x4).as("s4"))
  }

  /** Population skewness g1 = m3/(m2·√m2) and excess kurtosis
    * g2 = m4/m2² − 3 from [[momentsHigher]] sums, in one fixed IEEE tree
    * (central moments expanded in raw sums; `m2^1.5` spelled m2·√m2
    * because `pow` is not correctly rounded and can differ across
    * engines, while sqrt/×/÷ are exact-rounded everywhere). Cent units
    * cancel in both statistics. */
  def skewKurtCols(prefix: String = ""): Seq[Column] = {
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val mean = d("s1") / n
    val m2 = d("s2") / n - mean * mean
    val m3 = d("s3") / n - lit(3.0) * mean * (d("s2") / n) + lit(2.0) * mean * mean * mean
    val m4 = d("s4") / n - lit(4.0) * mean * (d("s3") / n) +
      lit(6.0) * mean * mean * (d("s2") / n) - lit(3.0) * mean * mean * mean * mean
    Seq(
      try_divide(m3, m2 * sqrt(m2)).as(s"${prefix}skewness"),
      (try_divide(m4, m2 * m2) - lit(3.0)).as(s"${prefix}kurtosis"))
  }

  /** Oracle-SQL twin of [[momentsHigher]] (HUGEINT power chain). */
  def sqlMomentsHigher(x: String): String = {
    val xc = s"CAST(CAST(${Det.sqlMoney(x)} * 100 AS DECIMAL(14,0)) AS HUGEINT)"
    s"""COUNT(*) AS n,
       SUM($xc) AS s1, SUM($xc * $xc) AS s2,
       SUM($xc * $xc * $xc) AS s3, SUM($xc * $xc * $xc * $xc) AS s4"""
  }

  /** Oracle-SQL twin of [[skewKurtCols]] — the same tree, same order. */
  def sqlSkewKurtCols: String = {
    val n = "CAST(n AS DOUBLE)"
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val mean = s"(${d("s1")} / $n)"
    val m2 = s"(${d("s2")} / $n - $mean * $mean)"
    val m3 = s"(${d("s3")} / $n - 3.0 * $mean * (${d("s2")} / $n) + 2.0 * $mean * $mean * $mean)"
    val m4 = s"(${d("s4")} / $n - 4.0 * $mean * (${d("s3")} / $n) + 6.0 * $mean * $mean * (${d("s2")} / $n) - 3.0 * $mean * $mean * $mean * $mean)"
    s"""$m3 / ($m2 * sqrt($m2)) AS skewness,
       ($m4 / ($m2 * $m2) - 3.0) AS kurtosis"""
  }

  /** Oracle-SQL twin of [[moments]]'s aggregate list (same cent units). */
  def sqlMomentExprs(x: String, y: String): String = {
    def cents(e: String) = s"CAST(${Det.sqlMoney(e)} * 100 AS DECIMAL(14,0))"
    s"""COUNT(*) AS n,
       SUM(${cents(x)}) AS sx, SUM(${cents(y)}) AS sy,
       SUM(${cents(x)} * ${cents(x)}) AS sxx,
       SUM(${cents(y)} * ${cents(y)}) AS syy,
       SUM(${cents(x)} * ${cents(y)}) AS sxy"""
  }

  /** The matching oracle-SQL fragments, spelled as the SAME expression
    * tree (operand order and parenthesization identical) so the IEEE
    * evaluation cannot diverge. Expects the moment columns of
    * [[moments]] in scope. */
  def sqlCorrCols: String = {
    val n = "CAST(n AS DOUBLE)"
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val covN = s"($n * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
    val varXN = s"($n * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
    val varYN = s"($n * ${d("syy")} - ${d("sy")} * ${d("sy")})"
    val slope = s"($covN / $varXN)"
    s"""$covN / sqrt($varXN * $varYN) AS corr,
       $slope AS slope,
       ((${d("sy")} - $slope * ${d("sx")}) / $n) / 100.0 AS intercept"""
  }
}
