package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sums — `SUM(value) OVER (ORDER BY key)`
  * without ever collapsing the fact to one partition.
  *
  * Spark plans an unpartitioned ordered window as a SINGLE-partition
  * WindowExec: the whole table funnels through one task, the classic
  * scale-killer this repo's count-first tricks exist to avoid. But some
  * consumers genuinely need a per-ROW running value (PPS sampling, CDF
  * positions, byte offsets for shard layout), not a per-value-class one.
  * The standard two-phase scan fixes it:
  *
  *   1. bucket each row by an integer range split of the (unique) order
  *      key — `(v − lo)·B div (hi − lo + 1)`, exact BIGINT arithmetic,
  *      so the assignment is reproducible by any engine;
  *   2. run the ordered window PARTITIONED by bucket (B-way parallel,
  *      each task sees ~n/B rows);
  *   3. fold the B per-bucket totals into exclusive prefix offsets with
  *      one ordered window over the B-row aggregate (the bounded
  *      unpartitioned window this repo's plan gates allow), and
  *      broadcast-add the offset back.
  *
  * Exactness: every intermediate is the column's own SUM type (BIGINT /
  * DECIMAL) — no floating point anywhere, so merge order is irrelevant
  * and the result hash-matches a declarative `SUM OVER (ORDER BY …)`.
  *
  * Requires `orderCol` unique (ties under RANGE vs ROWS framing differ
  * between engines; a unique key makes them identical) and numeric
  * within a range where `(v − lo) · buckets` fits a BIGINT.
  */
object Prefix {

  /** Adds `cumCol` = running sum of `valueCol` in `orderCol` order.
    * Output column set = input columns + cumCol; row set unchanged. */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                cumCol: String = "cum", buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val span = df.agg(min(col(orderCol)).cast("long").as("_pfx_lo"),
                      max(col(orderCol)).cast("long").as("_pfx_hi"))
    val bucketed = df.crossJoin(broadcast(span))
      .withColumn("_pfx_b", expr(
        s"(((cast($orderCol as bigint) - _pfx_lo) * $buckets) div (_pfx_hi - _pfx_lo + 1))"))
    val local = Window.partitionBy(col("_pfx_b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = bucketed.withColumn("_pfx_local",
      sum(col(valueCol)).over(local))
    // B rows — the one unpartitioned window, bounded by the bucket count.
    val offsets = bucketed.groupBy(col("_pfx_b"))
      .agg(sum(col(valueCol)).as("_pfx_t"))
      .withColumn("_pfx_off",
        coalesce(sum(col("_pfx_t")).over(
          Window.orderBy(col("_pfx_b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("_pfx_b"), col("_pfx_off"))
    withLocal.join(broadcast(offsets), "_pfx_b")
      .withColumn(cumCol, col("_pfx_local") + col("_pfx_off"))
      .drop("_pfx_b", "_pfx_local", "_pfx_off", "_pfx_lo", "_pfx_hi")
  }
}
