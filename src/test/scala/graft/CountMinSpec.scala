package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def freqs(keys: Seq[Long]): Map[Long, Long] =
    keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("estimate is never below the exact count (zipf-ish seeded corpus)") {
    val rnd = new scala.util.Random(11)
    val keys = (0 until 8000).map(_ => (rnd.nextInt(rnd.nextInt(300) + 1)).toLong)
    val df = keys.toDF("k")
    val cm = CountMin.cells(df, "k", depth = 4, width = 32) // heavy collisions
    val probes = df.distinct()
    val est = CountMin.estimates(cm, probes, "k", depth = 4, width = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = freqs(keys)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"key $k: est ${est(k)} < exact $n")
    }
    // and collisions really happened (otherwise the regime is trivial)
    assert(exact.exists { case (k, n) => est(k) > n }, "no collision exercised")
  }

  test("merge of batch sketches == sketch of the concatenated corpus") {
    val a = (0L to 500L).map(i => i % 37).toDF("k")
    val b = (0L to 300L).map(i => i % 53).toDF("k")
    val merged = CountMin.merge(Seq(
        CountMin.cells(a, "k", 3, 16), CountMin.cells(b, "k", 3, 16)))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = CountMin.cells(a.unionAll(b), "k", 3, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("weighted cells + unseen key estimates 0 against an empty bucket row") {
    val df = Seq((1L, 10L), (2L, 5L)).toDF("k", "w")
    val cm = CountMin.cells(df, "k", depth = 4, width = 256, weight = col("w"))
    val est = CountMin.estimates(cm, Seq(1L, 2L, 999L).toDF("k"), "k", 4, 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(1L) == 10L && est(2L) == 5L)
    // 999 almost surely misses all of 1 and 2's buckets at width 256;
    // any of its 4 rows with an empty bucket floors the min at 0
    assert(est(999L) <= 15L)
  }
}
