package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Dataset profiling: per-column null counts, distinct counts and
  * extrema in ONE pass — the audit report a pipeline runs before
  * trusting a new drop (the reference's open-time stats, D1
  * `/root/reference/serialize.py:637-683`, extended from "row count and
  * shapes" to per-column health).
  *
  * Shape: one wide aggregate row (2 + 2·|cols| expressions), then a
  * stack() unpivot to (column_name, stat rows) — the transpose costs
  * nothing (one row in, |cols| out). Distinct counts use Spark's
  * multi-count-distinct planning (Expand: one input row per distinct
  * aggregate); at 100 TB profile a sampled or recent partition, or swap
  * `countDistinct` for `approx_count_distinct` via `exact = false` —
  * HLL sketches turn the Expand into a single pass at <2% error, the
  * right trade for an audit.
  *
  * Extrema are reported for string and integral columns only (cast to
  * string for a uniform schema); floating/timestamp extrema are
  * engine-formatting-sensitive and stay out of the report's comparable
  * surface.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String] = Nil, exact: Boolean = true): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    def distinctOf(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val comparable: String => Boolean = c => df.schema(c).dataType match {
      case StringType | LongType | org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    val aggs = names.flatMap { c =>
      Seq(
        coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"nulls_$c"),
        distinctOf(c).cast("long").as(s"distinct_$c"),
        (if (comparable(c)) min(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"min_$c"),
        (if (comparable(c)) max(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // unpivot the single wide row into one report row per column
    val stackExpr = names.map { c =>
      s"'$c', `nulls_$c`, `distinct_$c`, `min_$c`, `max_$c`"
    }.mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${names.size}, $stackExpr) AS (column_name, n_nulls, n_distinct, min_s, max_s)")
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
      .orderBy("column_name")
  }
}
