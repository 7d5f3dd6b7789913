package graft

import org.apache.spark.sql.functions._
import graft.operators.{Gram, SetJoin}

class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(el: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) = {
    val sz = el.groupBy("id").agg(count(lit(1)).as("sz"))
    el.select(col("id").as("a"), col("tok"))
      .join(el.select(col("id").as("b"), col("tok")), "tok")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sz.select(col("id").as("a"), col("sz").as("sz_a")), "a")
      .join(sz.select(col("id").as("b"), col("sz").as("sz_b")), "b")
      .filter(col("inter") * tDen >=
        lit(tNum) * (col("sz_a") + col("sz_b") - col("inter")))
      .select("a", "b", "inter", "sz_a", "sz_b")
  }

  test("prefix-filtered join equals brute force incl. a stopword-heavy token") {
    // 'the' appears in every set (worst case for a naive token join);
    // sets 1/2 are near-identical, 3 overlaps partially, 4 is disjoint-ish
    val el = Seq(
      1L -> Seq("the", "quick", "brown", "fox", "jumps"),
      2L -> Seq("the", "quick", "brown", "fox", "leaps"),
      3L -> Seq("the", "quick", "red", "dog", "runs"),
      4L -> Seq("the", "lazy", "cat", "sleeps", "now"))
      .toDF("id", "toks")
      .select(col("id"), explode(col("toks")).as("tok"))
    for ((tn, td) <- Seq((4, 5), (3, 5), (1, 2))) {
      val got = SetJoin.jaccardJoin(el, tn, td)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = brute(el, tn, td)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"t=$tn/$td")
    }
  }

  test("threshold 1 finds exactly the identical sets") {
    val el = Seq(1L -> "x", 1L -> "y", 2L -> "x", 2L -> "y", 3L -> "x")
      .toDF("id", "tok")
    val got = SetJoin.jaccardJoin(el, 1, 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 2L, 2L)))
  }

  test("integer gram matrix matches the hand-computed triangle across partitions") {
    val vecs = Seq(Seq(1L, 2L, 3L), Seq(-1L, 0L, 2L), Seq(4L, 4L, 4L))
      .toDF("qvec").repartition(3)
    val got = Gram.gramUpper(vecs, "qvec", 3)
      .select("i", "j", "sxy", "n_vecs")
      .as[(Long, Long, Long, Long)].collect().toSet
    // columns x1=(1,-1,4) x2=(2,0,4) x3=(3,2,4)
    assert(got == Set(
      (1L, 1L, 1L + 1L + 16L, 3L), (1L, 2L, 2L + 0L + 16L, 3L),
      (1L, 3L, 3L - 2L + 16L, 3L), (2L, 2L, 4L + 0L + 16L, 3L),
      (2L, 3L, 6L + 0L + 16L, 3L), (3L, 3L, 9L + 4L + 16L, 3L)))
  }
}
