package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic numeric aggregation helpers.
  *
  * Double addition is not associative, and Spark's partial aggregation
  * order is nondeterministic across partitions — a plain `sum(double)`
  * can differ from the DuckDB oracle (and from itself, run to run) in the
  * low bits. Worse, `cast(double-expression AS decimal)` rounds the
  * *product* of doubles, and Spark (shortest-repr BigDecimal) and DuckDB
  * (exact binary value) round ties differently.
  *
  * The fix: cast the SOURCE columns to decimal first, then do all
  * arithmetic in decimal space. Money columns carry exactly 2 fractional
  * digits (generated via round(x, 2)), so double→decimal(12,2) is
  * unambiguous in both engines; decimal × decimal is exact; the exact sum
  * casts to double with one deterministic IEEE rounding.
  *
  * Precisions are kept small so no engine hits its 38-digit ceiling and
  * rounds an intermediate: (12,2)×(5,2)→(18,4); ×(5,2)→(24,6).
  */
object Det {
  val Money: DecimalType = DecimalType(12, 2)
  val Rate: DecimalType = DecimalType(4, 2)

  /** NULL-on-zero denominator. Spark's `x / 0.0` is IEEE Inf/NaN but
    * DuckDB's is NULL, so a statistic whose denominator can collapse to
    * zero on degenerate data (single-row arm, constant series) diverges
    * cross-engine exactly when it matters. Dividing by `nz(d)` makes the
    * Spark side yield NULL too — the oracle needs no change. */
  def nz(d: Column): Column = when(d =!= lit(0).cast("double"), d)

  /** Source money column as exact decimal. */
  def money(c: Column): Column = c.cast(Money)

  /** Small-rate column (discount/tax, 0.00–0.99) as exact decimal. */
  def rate(c: Column): Column = c.cast(Rate)

  /** `1 ± rate` building block, exact. */
  def oneMinus(c: Column): Column = lit(1).cast(Rate) - rate(c)
  def onePlus(c: Column): Column = lit(1).cast(Rate) + rate(c)

  /** Exact decimal sum of an already-decimal expression, as double. */
  def sumD(c: Column): Column = sum(c).cast(DoubleType)

  /** Exact sum of a 2-decimal money column, as double. */
  def moneySum(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Finest-grain money sum kept DECIMAL (no double cast yet) — the
    * first level of a two-level aggregate (cube/rollup over a
    * pre-aggregate). Re-fold with [[refoldMoney]], which performs the
    * single final cast; the composition equals a direct [[moneySum]]
    * exactly because decimal addition is associative. */
  def moneySumExact(c: Column): Column = sum(money(c))
  def refoldMoney(c: Column): Column = sum(c).cast(DoubleType)

  /** Deterministic average: exact decimal sum as double over count —
    * a single IEEE division, identical in any engine. */
  def moneyAvg(c: Column): Column = sum(money(c)).cast(DoubleType) / count(c)

  // ---- Oracle-SQL fragments mirroring the helpers above ----
  def sqlMoney(expr: String): String = s"CAST($expr AS DECIMAL(12,2))"
  def sqlRate(expr: String): String = s"CAST($expr AS DECIMAL(4,2))"
  def sqlOneMinus(expr: String): String =
    s"(CAST(1 AS DECIMAL(4,2)) - ${sqlRate(expr)})"
  def sqlOnePlus(expr: String): String =
    s"(CAST(1 AS DECIMAL(4,2)) + ${sqlRate(expr)})"
  def sqlSumD(expr: String): String = s"CAST(SUM($expr) AS DOUBLE)"
  def sqlMoneySum(expr: String): String = sqlSumD(sqlMoney(expr))
  def sqlMoneyAvg(expr: String): String =
    s"${sqlSumD(sqlMoney(expr))} / COUNT($expr)"
}
