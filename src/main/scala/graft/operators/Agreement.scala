package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement (Cohen's kappa) for labeling QC.
  *
  * Every labeled training set (quality judgments, preference labels,
  * toxicity flags) needs an agreement audit before the labels are
  * trusted: raw percent-agreement overstates reliability because two
  * annotators with skewed marginals agree often BY CHANCE. Cohen's
  * kappa (1960) corrects for it: κ = (p_o − p_e) / (1 − p_e) with p_o
  * the observed agreement and p_e the agreement expected from the
  * marginals.
  *
  * Scale + exactness shape (the q147/q185 discipline): ONE map-side
  * combinable aggregate per group builds the 2×2 confusion matrix in
  * BIGINT; κ is then ONE fixed IEEE division over integer-exact
  * numerator and denominator —
  *
  *   κ = (n·(n11+n00) − [(n11+n10)(n11+n01) + (n00+n01)(n00+n10)])
  *       / (n² − [...same...])
  *
  * so the statistic hash-matches bit-for-bit on any engine and any
  * partitioning. Counts fit comfortably: n ≤ 2^31 rows per group keeps
  * every product < 2^62.
  */
object Agreement {

  /** Per-group 2×2 confusion matrix of two boolean annotators plus
    * exact-integer agreement counts and the IEEE-exact kappa.
    * Output: (group, n, n11, n10, n01, n00, n_agree, kappa). */
  def cohensKappa(df: DataFrame, group: String, a: Column, b: Column): DataFrame = {
    val m = df
      .select(col(group), a.as("_a"), b.as("_b"))
      .groupBy(group)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_a") && col("_b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("_a") && !col("_b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("_a") && col("_b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("_a") && !col("_b"), 1L).otherwise(0L)).as("n00"))
    // integer numerator/denominator, one double division at the end
    val chance = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
      (col("n00") + col("n01")) * (col("n00") + col("n10"))
    m.select(col(group), col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      (col("n11") + col("n00")).as("n_agree"),
      // p_e = 1 (both annotators constant and identical) makes kappa
      // 0/0-undefined; emit NULL, not NaN, on both engines
      when(col("n") * col("n") - chance > 0L,
        (col("n") * (col("n11") + col("n00")) - chance).cast("double") /
          (col("n") * col("n") - chance).cast("double")).as("kappa"))
  }

  /** DuckDB twin of [[cohensKappa]] over a relation exposing
    * `(group, a, b)` — generated from the same formula so the engines
    * cannot drift. `rel` must be a parenthesizable SQL relation. */
  def cohensKappaSql(rel: String, group: String): String =
    s"""WITH m AS (
         SELECT $group, COUNT(*) AS n,
           SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
           SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
           SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
           SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
         FROM ($rel) GROUP BY $group)
       SELECT $group, CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
         CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
         CAST(n00 AS BIGINT) AS n00, CAST(n11 + n00 AS BIGINT) AS n_agree,
         CASE WHEN n * n
              - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) > 0 THEN
           CAST(n * (n11 + n00)
                - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) AS DOUBLE)
           / CAST(n * n
                - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) AS DOUBLE)
         END AS kappa
       FROM m"""
}
