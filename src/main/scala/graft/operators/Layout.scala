package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimension file skipping.
  *
  * At 100 TB, the dominant cost of a selective query is the files it CANNOT
  * skip. Sorting a table by one column gives perfect min/max pruning on that
  * column and none on any other; interleaving the bits of several bucketed
  * dimensions into one Morton key and range-partitioning on it gives every
  * interleaved dimension partial locality, so parquet footer min/max stats
  * prune files for predicates on ANY of them (the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).
  *
  * Scale design:
  *  - [[zValue]] is a compile-time-unrolled bit-arithmetic Column — pure
  *    codegen'd longs, no UDF, no shuffle; it stays inside WholeStageCodegen.
  *  - Dimension bucketing is min-max affine (two cheap global aggregates,
  *    broadcast back as literals via a 1-row cross join) — integer-exact,
  *    so an external system can reproduce the key bit-for-bit (q110).
  *  - [[writeZOrdered]] = repartitionByRange on the key + sortWithinPartitions
  *    — one range shuffle, the same cost as any global sort layout.
  *  - Skew: repartitionByRange samples the key distribution, so heavily
  *    duplicated (x,y) points still split across files; pruning quality
  *    degrades gracefully (overlapping file ranges), never correctness.
  */
object Layout {

  /** Morton-interleave two pre-bucketed non-negative int columns (each in
    * [0, 2^bits)) into one long: bit i of x lands at 2i, of y at 2i+1.
    * Unrolled at plan-build time into a flat codegen'd expression. */
  def zValue(xBucket: Column, yBucket: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xBucket, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yBucket, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Min-max affine bucket of an integer column into [0, 2^bits), given the
    * global min/max as columns (from a broadcast 1-row aggregate):
    * b = (x - min) * 2^bits div (max - min + 1), matching SQL `//` for
    * non-negative operands. Integer division is built as
    * (num - pmod(num, den)) / den: the dividend is exactly divisible and
    * < 2^53, so the double division is bit-exact — no `floor` rounding
    * hazard, no string `expr`. */
  def minMaxBucket(x: Column, mn: Column, mx: Column, bits: Int = 16): Column = {
    val num = (x - mn) * lit(1L << bits)
    val den = mx - mn + lit(1L)
    ((num - pmod(num, den)) / den).cast("long")
  }

  /** N-dimension Morton interleave: bit i of dimension d lands at
    * i·|dims| + d. Same compile-time unrolling as [[zValue]]; requires
    * bits·|dims| ≤ 62 so the key stays a positive long. */
  def zValueN(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 1 && bits >= 1 && bits * n <= 62,
      s"need 1 <= bits*dims <= 62, got bits=$bits dims=$n")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, d)) =>
        a + shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), n * i + d)
      }
    }
  }

  /** [[withZValue]] for any number of integer dimensions: min-max bucket
    * each to `bits` bits, Morton-interleave into `zval`. One aggregate
    * job + a broadcast 1-row cross join; per-row key math is map-only. */
  def withZValueN(df: DataFrame, dims: Seq[String], bits: Int): DataFrame = {
    val aggs = dims.zipWithIndex.flatMap { case (dim, d) =>
      Seq(min(col(dim)).cast("long").as(s"__mn$d"),
        max(col(dim)).cast("long").as(s"__mx$d"))
    }
    val mm = df.agg(aggs.head, aggs.tail: _*)
    val buckets = dims.zipWithIndex.map { case (dim, d) =>
      minMaxBucket(col(dim).cast("long"), col(s"__mn$d"), col(s"__mx$d"), bits)
    }
    df.crossJoin(broadcast(mm))
      .withColumn("zval", zValueN(buckets, bits))
      .drop(dims.indices.flatMap(d => Seq(s"__mn$d", s"__mx$d")): _*)
  }

  /** df + a `zval` column Morton-interleaving the two integer dimensions,
    * bucketed by their global min/max. One aggregate job + a broadcast
    * 1-row cross join; the per-row key math is map-only. */
  def withZValue(df: DataFrame, dimX: String, dimY: String,
                 bits: Int = 16): DataFrame = {
    val mm = df.agg(
      min(col(dimX)).cast("long").as("__xmin"),
      max(col(dimX)).cast("long").as("__xmax"),
      min(col(dimY)).cast("long").as("__ymin"),
      max(col(dimY)).cast("long").as("__ymax"))
    df.crossJoin(broadcast(mm))
      .withColumn("zval", zValue(
        minMaxBucket(col(dimX).cast("long"), col("__xmin"), col("__xmax"), bits),
        minMaxBucket(col(dimY).cast("long"), col("__ymin"), col("__ymax"), bits),
        bits))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
  }

  /** Write df z-ordered on (dimX, dimY) into ~numFiles parquet files:
    * range-partition on the Morton key, sort within partitions, drop the
    * key. Readers prune files on EITHER dimension via footer min/max. */
  def writeZOrdered(df: DataFrame, dimX: String, dimY: String, path: String,
                    numFiles: Int, bits: Int = 16): Unit =
    withZValue(df, dimX, dimY, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) of a column across a parquet directory, read in a
    * single scan grouped by `input_file_name()` — the test-scale stand-in
    * for reading footer stats. Returns (file, lo, hi). */
  def fileRanges(spark: SparkSession, path: String, dim: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(dim)).cast("long").as("lo"), max(col(dim)).cast("long").as("hi"))

  /** How many files a predicate `dim BETWEEN lo AND hi` must touch under
    * footer min/max pruning — the metric z-ordering exists to shrink. */
  def filesTouched(spark: SparkSession, path: String, dim: String,
                   lo: Long, hi: Long): Long =
    fileRanges(spark, path, dim)
      .filter(col("hi") >= lo && col("lo") <= hi)
      .count()

  // ---- Hilbert curve ----------------------------------------------------
  //
  // The locality-optimal sibling of the Morton key: consecutive Hilbert
  // indices are ALWAYS unit-adjacent cells (Morton jumps at power-of-two
  // boundaries), so range-partitioned files cover tighter rectangles and
  // footer stats prune better on both dimensions. Computed by the classic
  // per-bit fold (Hilbert 1891; iterative form as in Warren, Hacker's
  // Delight §16): at scale s test bit s of each coordinate, accumulate the
  // quadrant's step, mirror+swap the frame. Everything is non-negative
  // integer div/mod arithmetic, so Spark and a generated SQL oracle agree
  // bit-for-bit, and the whole fold is `bits` chained projections of
  // codegen'd longs — no UDF, no shuffle.

  /** Append `out` = Hilbert index of (xCol, yCol) on the 2^bits grid.
    * Columns must be non-negative ints < 2^bits. One projection per bit
    * level keeps the expression tree linear (a single nested expression
    * would re-expand the mirrored coordinates 4-fold per level). */
  def withHilbert2(df: DataFrame, xCol: String, yCol: String, bits: Int,
                   out: String): DataFrame = {
    require(bits >= 1 && bits <= 30)
    var cur = df
      .withColumn("_hx", col(xCol).cast("long"))
      .withColumn("_hy", col(yCol).cast("long"))
      .withColumn("_hd", lit(0L))
    val n = 1L << bits
    for (i <- 0 until bits) {
      val s = 1L << (bits - 1 - i)
      val rx = expr(s"(_hx div $s) % 2")
      val ry = expr(s"(_hy div $s) % 2")
      // quadrant step (3*rx) xor ry spelled as a CASE so no engine's xor
      // semantics are in play
      val o = when(rx === 0 && ry === 0, 0L).when(rx === 0 && ry === 1, 1L)
        .when(rx === 1 && ry === 1, 2L).otherwise(3L)
      // mirror with n-1-· (not s-1-·): keeps coordinates non-negative, and
      // the flipped high bits are never examined again (each later level
      // tests a strictly lower bit)
      val nx = when(ry === 0,
        when(rx === 1, lit(n - 1) - col("_hy")).otherwise(col("_hy")))
        .otherwise(col("_hx"))
      val ny = when(ry === 0,
        when(rx === 1, lit(n - 1) - col("_hx")).otherwise(col("_hx")))
        .otherwise(col("_hy"))
      cur = cur.withColumn("_hd", col("_hd") + lit(s * s) * o)
        .withColumn("_nx", nx).withColumn("_ny", ny)
        .withColumn("_hx", col("_nx")).withColumn("_hy", col("_ny"))
        .drop("_nx", "_ny")
    }
    cur.withColumn(out, col("_hd")).drop("_hx", "_hy", "_hd")
  }

  /** The matching DuckDB SQL: the same per-bit fold as a MATERIALIZED CTE
    * chain over a caller-supplied `pts(key, x, y)` CTE — generated from
    * the same constants, so it cannot drift from [[withHilbert2]].
    * Yields `h(key, h)`. */
  def hilbert2OracleSql(ptsCte: String, bits: Int): String = {
    val n = 1L << bits
    val pre = s"r0 AS MATERIALIZED (SELECT key, x AS x0, y AS y0, " +
      s"x AS hx, y AS hy, 0 AS hd FROM ($ptsCte))"
    val steps = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      s"""r${i + 1} AS MATERIALIZED (SELECT key, x0, y0,
           CASE WHEN (hy // $s) % 2 = 0 THEN
             CASE WHEN (hx // $s) % 2 = 1 THEN ${n - 1} - hy ELSE hy END
           ELSE hx END AS hx,
           CASE WHEN (hy // $s) % 2 = 0 THEN
             CASE WHEN (hx // $s) % 2 = 1 THEN ${n - 1} - hx ELSE hx END
           ELSE hy END AS hy,
           hd + ${s * s} * (CASE
             WHEN (hx // $s) % 2 = 0 AND (hy // $s) % 2 = 0 THEN 0
             WHEN (hx // $s) % 2 = 0 AND (hy // $s) % 2 = 1 THEN 1
             WHEN (hx // $s) % 2 = 1 AND (hy // $s) % 2 = 1 THEN 2
             ELSE 3 END) AS hd
         FROM r$i)"""
    }.mkString(",\n", ",\n", "")
    s"WITH $pre$steps, h AS (SELECT key, x0 AS x, y0 AS y, " +
      s"CAST(hd AS BIGINT) AS h FROM r$bits)"
  }
}
