package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) |
                            (((y >> i) & 1L) << (2 * i + 1))).sum

  test("zValue matches a reference Morton interleave") {
    val pts = for (x <- 0L to 17L; y <- 0L to 17L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y", 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 5), s"($x,$y)")
    }
  }

  private def mortonRefN(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    (0 until bits).flatMap(i => vals.zipWithIndex.map { case (v, d) =>
      ((v >> i) & 1L) << (n * i + d)
    }).sum
  }

  test("zValueN matches the N-dim reference interleave; 2-dim case equals zValue") {
    val pts = for (x <- 0L to 9L; y <- 0L to 9L; z <- 0L to 9L) yield (x, y, z)
    val got = pts.toDF("x", "y", "z")
      .select($"x", $"y", $"z",
        Layout.zValueN(Seq($"x", $"y", $"z"), 4).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    pts.foreach { case p @ (x, y, z) =>
      assert(got(p) == mortonRefN(Seq(x, y, z), 4), s"$p")
    }
    // the 2-dim specialization is the same curve
    val two = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 4).as("a"),
        Layout.zValueN(Seq($"x", $"y"), 4).as("b"))
      .collect().head
    assert(two.getLong(0) == two.getLong(1))
  }

  test("minMaxBucket: affine, in-range, extrema map to 0 and 2^bits-1") {
    val df = (0L to 1000L).toDF("x")
      .crossJoin(broadcast(Seq((0L, 1000L)).toDF("mn", "mx")))
      .select($"x", Layout.minMaxBucket($"x", $"mn", $"mx", 8).as("b"))
    val bs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bs(0L) == 0L)
    assert(bs(1000L) == 255L)
    assert(bs.values.forall(b => b >= 0 && b <= 255))
    // monotone non-decreasing in x
    assert((0L until 1000L).forall(x => bs(x) <= bs(x + 1)))
  }

  test("z-ordered layout prunes files on BOTH dims; linear only on one") {
    val tmp = Files.createTempDirectory("layout").toString
    // deterministic pseudo-uniform grid points (no RNG: hash-mix the index)
    val pts = spark.range(0, 8192).select(
      (pmod(xxhash64($"id"), lit(1024L))).as("x"),
      (pmod(xxhash64($"id" + 99999L), lit(1024L))).as("y"))
    Layout.writeZOrdered(pts, "x", "y", s"$tmp/zord", numFiles = 16, bits = 10)
    pts.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    // narrow band on y (1/16 of the domain)
    val zTouchY = Layout.filesTouched(spark, s"$tmp/zord", "y", 0L, 63L)
    val linTouchY = Layout.filesTouched(spark, s"$tmp/linear", "y", 0L, 63L)
    // linear-on-x layout cannot prune on y: every file spans ~full y range
    assert(linTouchY == 16L, s"linear touched $linTouchY")
    // z-order gives partial locality on y: must skip at least half the files
    assert(zTouchY <= 8L, s"z-order touched $zTouchY")

    // and z-order still prunes on x too (narrow band on x)
    val zTouchX = Layout.filesTouched(spark, s"$tmp/zord", "x", 0L, 63L)
    assert(zTouchX <= 8L, s"z-order x touched $zTouchX")
  }

  test("hilbert index is a unit-adjacent bijection over the full grid") {
    // the defining Hilbert property — consecutive indices are ALWAYS
    // edge-adjacent cells (Morton jumps at power-of-two boundaries); this
    // validates the fold independently of the oracle, which replays the
    // same rounds
    val bits = 4
    val n = 1 << bits // 16x16 = 256 cells
    val grid = spark.range(0, n.toLong * n)
      .select(($"id" % n).as("x"), ($"id" / n).cast("long").as("y"))
    val cells = Layout.withHilbert2(grid, "x", "y", bits, "h")
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq == (0L until n.toLong * n),
      "h must be a bijection onto 0..n²-1")
    assert(cells.head match { case (_, x, y) => x == 0 && y == 0 },
      "curve starts at the origin")
    cells.sliding(2).foreach { case Array((_, x1, y1), (h2, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"cells at h=${h2 - 1},${h2} are not unit-adjacent: ($x1,$y1)->($x2,$y2)")
    }
    // locality beats Morton on the same grid: max index jump between
    // horizontally adjacent cells is n²/4+... for Morton, 0-gap for Hilbert
    // neighbors along the curve by construction (checked above)
  }
}
