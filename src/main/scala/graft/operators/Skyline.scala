package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-d skyline (Pareto frontier) query (Börzsönyi et al., ICDE 2001):
  * the rows not strictly dominated under (minimize `minCol`, maximize
  * `maxCol`). Row y is dominated iff some x has minCol <= y's AND
  * maxCol >= y's with at least one strict.
  *
  * Shape: the classic sort-filter skyline, but count-first — the
  * data-sized work is ONE hash aggregate collapsing rows to distinct
  * `minCol` groups (each with its group max of `maxCol`); the ordered
  * running-max window then runs over DISTINCT minCol values only
  * (bounded by the value domain, the same documented bound as the q52 /
  * q73 / Robust windows), and survivors re-join by minCol. A row
  * survives iff it carries its group's max AND that max strictly beats
  * the running max over all strictly-smaller minCol groups. No
  * quadratic dominance join anywhere; duplicates of a frontier point
  * all survive (neither strictly dominates the other).
  */
object Skyline {

  /** Rows of `df` on the (min `minCol`, max `maxCol`) skyline. */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val grp = df.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("_gmax"))
    val w = Window.orderBy(minCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val fences = grp
      .withColumn("_runmax", max(col("_gmax")).over(w))
    // join keyed on minCol; AQE broadcasts the fence table when the value
    // domain is small, falls back to a keyed shuffle when it is not
    df.join(fences, minCol)
      .filter(col(maxCol) === col("_gmax") &&
        (col("_runmax").isNull || col("_runmax") < col("_gmax")))
      .drop("_gmax", "_runmax")
  }
}
