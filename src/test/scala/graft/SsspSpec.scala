package graft

import graft.operators.Sssp

class SsspSpec extends SparkSpec {
  import spark.implicits._

  // A—B (2), B—C (3), A—C (10): the cheap A→C route goes through B
  private def tri = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 10L))
    .toDF("a", "b", "w")
  private def seedA = Seq(Tuple1(1L)).toDF("u")

  test("relaxation rounds find the cheaper multi-hop route") {
    val after1 = Sssp.distances(tri, seedA, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(after1 == Map(1L -> 0L, 2L -> 2L, 3L -> 10L)) // direct edge only
    val after2 = Sssp.distances(tri, seedA, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(after2 == Map(1L -> 0L, 2L -> 2L, 3L -> 5L)) // via B
  }

  test("summary pins the distance table; unreached nodes are absent") {
    val disconnected = tri.unionAll(Seq((8L, 9L, 1L)).toDF("a", "b", "w"))
    val s = Sssp.summary(disconnected, seedA, rounds = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(s._1 == 3L) // 8 and 9 unreached
    assert(s._2 == 0L + 2L + 5L && s._3 == 5L)
    val expectXor = (1L * 1000003 + 0) ^ (2L * 1000003 + 2) ^ (3L * 1000003 + 5)
    assert(s._4 == expectXor)
  }

  test("undirected: relaxations flow both ways along an edge") {
    val d = Sssp.distances(tri, Seq(Tuple1(3L)).toDF("u"), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(3L -> 0L, 2L -> 3L, 1L -> 5L))
  }

  test("non-positive weights are rejected") {
    val bad = Seq((1L, 2L, 0L)).toDF("a", "b", "w")
    intercept[IllegalArgumentException] {
      Sssp.distances(bad, seedA, rounds = 1)
    }
  }
}
