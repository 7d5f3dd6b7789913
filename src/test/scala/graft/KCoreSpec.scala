package graft

import graft.operators.{KCore, Skyline}

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("2-core peels a tail in shell order and converges to the triangle") {
    // triangle 1-2-3 with tail 3-4, 4-5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = KCore.trajectory(edges, k = 2, rounds = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // round 1: node 5 (deg 1) drops with edge 4-5 -> nodes {1,2,3,4}
    // round 2: node 4 (deg 1 now) drops -> the triangle
    // round 3: converged — identical to round 2
    assert(got == Seq(
      (1L, 4L, 4L, 1L ^ 2L ^ 3L ^ 4L),
      (2L, 3L, 3L, 1L ^ 2L ^ 3L),
      (3L, 3L, 3L, 1L ^ 2L ^ 3L)))
  }

  test("k larger than any degree empties the graph (count 0, xor 0)") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val got = KCore.trajectory(edges, k = 5, rounds = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L)))
  }

  test("skyline keeps non-dominated rows incl. duplicate frontier points") {
    val pts = Seq((1L, 1.0, 5), (2L, 2.0, 7), (3L, 3.0, 7), (4L, 3.0, 3),
      (5L, 5.0, 8), (6L, 5.0, 8), (7L, 2.0, 6))
      .toDF("id", "price", "size")
    val got = Skyline.skyline2d(pts, "price", "size")
      .select("id").as[Long].collect().toSet
    // (3.0,7) dominated by (2.0,7); (3.0,3) dominated; (2.0,6) dominated
    // by (2.0,7); both (5.0,8) duplicates survive (neither strict)
    assert(got == Set(1L, 2L, 5L, 6L))
  }

  test("skyline of a single point or equal column is the max group") {
    val pts = Seq((1L, 2.0, 4), (2L, 2.0, 9), (3L, 2.0, 9))
      .toDF("id", "price", "size")
    val got = Skyline.skyline2d(pts, "price", "size")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }
}
