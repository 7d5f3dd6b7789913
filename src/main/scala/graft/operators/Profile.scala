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
    // internal aliases are POSITIONAL: a column name is data here, and
    // interpolating it into stack()'s SQL text would break on a name
    // containing a quote or backtick (same fix as Validate.checks)
    val aggs = names.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"nulls_$i"),
        distinctOf(c).cast("long").as(s"distinct_$i"),
        (if (comparable(c)) min(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"min_$i"),
        (if (comparable(c)) max(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"max_$i"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // typed unpivot: one report row per column via explode over structs
    val kvs = names.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column_name"), col(s"nulls_$i").as("n_nulls"),
        col(s"distinct_$i").as("n_distinct"), col(s"min_$i").as("min_s"),
        col(s"max_$i").as("max_s"))
    }
    wide.select(col("n_rows"), explode(array(kvs: _*)).as("kv"))
      .select(col("kv.column_name").as("column_name"), col("n_rows"),
        col("kv.n_nulls").as("n_nulls"), col("kv.n_distinct").as("n_distinct"),
        col("kv.min_s").as("min_s"), col("kv.max_s").as("max_s"))
      .orderBy("column_name")
  }
}
