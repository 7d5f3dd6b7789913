package graft

import graft.operators.Communities

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  // Two triangles {1,2,3} and {10,11,12} joined by a single bridge 3-10:
  // the canonical two-community graph.
  private def twoTriangles = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L),
    (10L, 11L), (10L, 12L), (11L, 12L),
    (3L, 10L)).toDF("a", "b")

  test("one round matches the hand-computed vote table") {
    // Neighbor label multisets after round 1 (labels start = ids):
    //   1: {2,3} -> min on tie -> 2        2: {1,3} -> 1
    //   3: {1,2,10} -> 1                   10: {3,11,12} -> 3
    //   11: {10,12} -> 10                  12: {10,11} -> 10
    val got = Communities.labels(twoTriangles, "a", "b", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 10L -> 3L, 11L -> 10L, 12L -> 10L))
  }

  test("ties break to the smallest label") {
    // 5 has neighbors 1 and 2, one vote each: label 1 must win.
    val g = Seq((1L, 5L), (2L, 5L)).toDF("a", "b")
    val got = Communities.labels(g, "a", "b", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got(5L) == 1L)
  }

  test("parallel edges act as weighted votes") {
    // 5 sees 2 twice and 1 once: majority overrides the min tie-break.
    val g = Seq((1L, 5L), (2L, 5L), (2L, 5L)).toDF("a", "b")
    val got = Communities.labels(g, "a", "b", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got(5L) == 2L)
  }

  test("two clusters with a bridge settle into two communities") {
    val labeled = Communities.labels(twoTriangles, "a", "b", iters = 4)
      .as[(Long, Long)].collect().toMap
    val left = Set(1L, 2L, 3L).map(labeled)
    val right = Set(10L, 11L, 12L).map(labeled)
    assert(left.size == 1 && right.size == 1 && left != right)
  }

  test("deterministic under repartitioning") {
    val a = Communities.labels(twoTriangles, "a", "b", iters = 3)
      .as[(Long, Long)].collect().toSeq
    val b = Communities.labels(twoTriangles.repartition(7), "a", "b", iters = 3)
      .as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("driver tier and windowed-join tier are bit-identical") {
    // incl. a parallel edge and a bidirectional duplicate
    val g = Seq((1L, 2L), (2L, 3L), (1L, 2L), (3L, 1L), (2L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L)).toDF("a", "b")
    val fast = Communities.labels(g, "a", "b", iters = 3)
      .as[(Long, Long)].collect().toSeq
    val dist = Communities.labelsDistributed(g, "a", "b", iters = 3)
      .as[(Long, Long)].collect().toSeq
    assert(fast == dist)
  }
}
