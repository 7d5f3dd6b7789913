package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // A -> B, A -> C, B -> C; C dangling (its mass leaks, documented)
  private def tri = Seq(("A", "B"), ("A", "C"), ("B", "C")).toDF("s", "d")

  test("one iteration matches the hand-computed integer arithmetic") {
    // n=3: init = 10^12 div 3 = 333333333333
    //      base = ((10^12 * 15) div 100) div 3 = 50000000000
    // contribs: A's 333333333333 div 2 = 166666666666 to each of B, C;
    //           B's 333333333333 div 1 to C
    // A: base + 0                                      = 50000000000
    // B: base + (85 * 166666666666) div 100            = 191666666666
    // C: base + (85 * (166666666666+333333333333)) div 100 = 474999999999
    val got = PageRank.ranks(tri, "s", "d", iters = 1)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "A" -> 50000000000L, "B" -> 191666666666L, "C" -> 474999999999L))
  }

  test("parallel edges act as weights") {
    // A -> B twice, A -> C once: B must outrank C
    val g = Seq(("A", "B"), ("A", "B"), ("A", "C")).toDF("s", "d")
    val got = PageRank.ranks(g, "s", "d", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got("B") > got("C"))
  }

  test("deterministic under repartitioning") {
    val a = PageRank.ranks(tri, "s", "d", iters = 5).as[(String, Long)].collect().toSeq
    val b = PageRank.ranks(tri.repartition(7), "s", "d", iters = 5)
      .as[(String, Long)].collect().toSeq
    assert(a == b)
  }

  test("driver tier and distributed tier are bit-identical") {
    val edges = (Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"),
      ("B", "A"), ("A", "B")).toDF("s", "d")) // incl. a parallel edge
    val fast = PageRank.ranks(edges, "s", "d", iters = 4)
      .as[(String, Long)].collect().toSeq
    val dist = PageRank.ranksDistributed(edges, "s", "d", iters = 4)
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    assert(fast == dist)
  }

  test("ranks over a Rollup-maintained edge matrix equal batch ranks") {
    // incremental graph analytics: edge batches land as rollup partials,
    // ranks read the folded (src, dst, n) matrix — bit-equal to ranking
    // the concatenated batches, and history is never re-scanned
    val dir = java.nio.file.Files.createTempDirectory("prroll").toString + "/edges"
    val b1 = Seq(("A", "B"), ("A", "C"), ("B", "C")).toDF("s", "d")
    val b2 = Seq(("C", "A"), ("A", "B")).toDF("s", "d")
    import org.apache.spark.sql.functions._
    graft.catalog.Rollup.appendBatch(spark, b1, dir, "e1",
      Seq("s", "d"), Seq("n" -> count(lit(1))))
    graft.catalog.Rollup.appendBatch(spark, b2, dir, "e2",
      Seq("s", "d"), Seq("n" -> count(lit(1))))
    val matrix = graft.catalog.Rollup.read(spark, dir, Seq("s", "d"), Seq("n"))
      .select(col("s").as("src"), col("d").as("dst"), col("n"))
    val inc = PageRank.ranksFromMatrix(matrix, iters = 4)
      .as[(String, Long)].collect().toSeq
    val batch = PageRank.ranks(b1.unionAll(b2), "s", "d", iters = 4)
      .as[(String, Long)].collect().toSeq
    assert(inc == batch)
  }

  test("total mass never grows (floors and dangling C only leak)") {
    val total = PageRank.ranks(tri, "s", "d", iters = 4)
      .as[(String, Long)].collect().map(_._2).sum
    assert(total <= 1000000000000L && total > 0L)
  }
}
