package graft

import graft.operators.Bfs

class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("multi-source BFS layers: exact hop distances, no re-visits") {
    // path 1-2-3-4-5 plus branch 3-6; seeds {1, 6}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .toDF("a", "b")
    val seeds = Seq(1L, 6L).toDF("u")
    val got = Bfs.distances(edges, seeds, rounds = 3)
      .as[(Long, Long, Long)].collect().toSeq
    // dist 0: {1,6}; dist 1: {2,3} (3 via 6, not re-visited later);
    // dist 2: {4}; dist 3: {5}
    assert(got == Seq(
      (0L, 2L, 1L ^ 6L),
      (1L, 2L, 2L ^ 3L),
      (2L, 1L, 4L),
      (3L, 1L, 5L)))
  }

  test("disconnected component is never reached; exhausted layers pin (0,0)") {
    val edges = Seq((1L, 2L), (8L, 9L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("u")
    val got = Bfs.distances(edges, seeds, rounds = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 1L),
      (1L, 1L, 2L),
      (2L, 0L, 0L),
      (3L, 0L, 0L)))
  }
}
