package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust statistics: exact positional medians and median-absolute-
  * deviation (MAD) outlier detection — the robust alternative to the
  * z-score anomaly pass (q77), immune to the outliers it hunts (a single
  * extreme value drags a mean/stddev fence, but not a median fence).
  *
  * Exactness: medians are SELECTED, never interpolated — the lower median
  * is the smallest value whose running count reaches (n+1) div 2 — so
  * every output is a value that exists in the data, reproducible
  * bit-for-bit cross-engine with no float arithmetic beyond the final
  * |x−med| > k·MAD comparison (IEEE-identical in Spark and DuckDB).
  *
  * Scale shape (the q52 count-first trick): the data-sized work is hash
  * aggregates; the ordered window runs over DISTINCT values per group,
  * partitioned by the group key. With heavy duplication the window input
  * collapses; for continuous doubles it approaches n/|groups| per
  * reducer — the documented bound, same as q52/q73. Group totals and
  * medians re-join as broadcasts (|groups| rows). */
object Robust {

  /** Per-group lower median of `v` + group size: (g, med, n). */
  def medians(df: DataFrame, g: String, v: String): DataFrame = {
    val vc = df.groupBy(col(g), col(v)).agg(count(lit(1)).as("cnt"))
    val tot = vc.groupBy(g).agg(sum(col("cnt")).as("n"))
    val w = Window.partitionBy(g).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vc.withColumn("cum", sum(col("cnt")).over(w))
      .join(broadcast(tot), g)
      .groupBy(g)
      .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col(v))).as("med"),
        max(col("n")).as("n"))
  }

  /** Per-group nearest-lower-rank quantile SELECTION at integer percents
    * `ps`: value at 1-based position ((n-1)*p) div 100 + 1 of the sorted
    * group — always a value present in the data (no interpolation), so
    * exact cross-engine. Returns (g, n, q{p}...). Same count-first scale
    * shape as [[medians]]. */
  def quantileSelect(df: DataFrame, g: String, v: String, ps: Seq[Int]): DataFrame = {
    val vc = df.groupBy(col(g), col(v)).agg(count(lit(1)).as("cnt"))
    val tot = vc.groupBy(g).agg(sum(col("cnt")).as("nn"))
    val w = Window.partitionBy(g).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vc.withColumn("cum", sum(col("cnt")).over(w))
      .join(broadcast(tot), g)
    val aggs = max(col("nn")).as("n") +: ps.map { p =>
      min(when(col("cum") >= expr(s"((nn - 1) * $p) div 100") + 1, col(v)))
        .as(s"q$p")
    }
    cum.groupBy(g).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group robust profile: n, median, MAD, and the count of values
    * beyond the k·MAD fence. Two median passes (values, then absolute
    * deviations), each re-broadcast; no driver state. */
  def madOutliers(df: DataFrame, g: String, v: String, k: Double = 3.0): DataFrame = {
    val med = medians(df, g, v)
    val dev = df.join(broadcast(med.select(col(g), col("med"), col("n"))), g)
      .withColumn("dev", abs(col(v) - col("med")))
    val mad = medians(dev, g, "dev").select(col(g), col("med").as("mad"))
    dev.join(broadcast(mad), g)
      .groupBy(g)
      .agg(max(col("n")).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L)).as("n_out"))
  }
}
