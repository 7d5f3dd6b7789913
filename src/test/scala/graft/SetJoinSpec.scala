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

  test("broadcast gate: zero-threshold shuffle fallback yields identical pairs") {
    // broadcastMaxPairs=0 forces every candidate broadcast down the
    // shuffle-join fallback; output must be bit-identical to the
    // broadcast path (the gate is a physical-plan move only)
    val el = Seq(
      1L -> Seq("the", "quick", "brown", "fox", "jumps"),
      2L -> Seq("the", "quick", "brown", "fox", "leaps"),
      3L -> Seq("the", "quick", "red", "dog", "runs"),
      4L -> Seq("the", "lazy", "cat", "sleeps", "now"))
      .toDF("id", "toks")
      .select(col("id"), explode(col("toks")).as("tok"))
    val bcast = SetJoin.jaccardJoin(el, 3, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val shuffled = SetJoin.jaccardJoin(el, 3, 5, broadcastMaxPairs = 0L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(shuffled == bcast)
    val cBcast = SetJoin.containmentJoin(el, 3, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val cShuffled = SetJoin.containmentJoin(el, 3, 5, broadcastMaxPairs = 0L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(cShuffled == cBcast)
    // plan shape, not just output: the gate must actually remove the
    // broadcast hints (analyzed plan — AQE may still pick a broadcast
    // strategy for tiny inputs on its own, which is fine and bounded)
    val hintedPlan = SetJoin.jaccardJoin(el, 3, 5)
      .queryExecution.analyzed.toString
    val gatedPlan = SetJoin.jaccardJoin(el, 3, 5, broadcastMaxPairs = 0L)
      .queryExecution.analyzed.toString
    assert(hintedPlan.contains("ResolvedHint"))
    assert(!gatedPlan.contains("ResolvedHint"))
  }

  test("candidate-volume pre-flight refuses a collision-heavy corpus loudly") {
    // bounded-vocabulary corpora make EXACT set-sim candidate volume
    // ~quadratic in corpus size (measured 10x docs -> ~150x candidates,
    // SCALE.md round 8); the budget guard must refuse BEFORE launching
    // the candidate join, and name the bounded alternatives
    val el = Seq(1L -> "x", 1L -> "y", 2L -> "x", 2L -> "y",
      3L -> "x", 3L -> "y", 4L -> "x", 4L -> "y")
      .toDF("id", "tok")
    val eJ = intercept[IllegalStateException] {
      SetJoin.jaccardJoin(el, 1, 2, maxCandidatePairs = 1L)
    }
    assert(eJ.getMessage.contains("MinHash") && eJ.getMessage.contains("budget"))
    val eC = intercept[IllegalStateException] {
      SetJoin.containmentJoin(el, 1, 2, maxCandidatePairs = 1L)
    }
    assert(eC.getMessage.contains("MinHash"))
    // the default budget admits normal corpora: same input runs clean
    assert(SetJoin.jaccardJoin(el, 1, 2).count() == 6)
  }

  test("containment join finds the inclusion that Jaccard misses") {
    // A = {a,b,c} fully inside B = {a..j}: containment(A,B) = 1 but
    // Jaccard = 3/10 — the symmetric join must NOT report it, the
    // containment join MUST (in the A→B direction only).
    val el = (Seq("a", "b", "c").map(1L -> _) ++
      Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j").map(2L -> _) ++
      Seq("x", "y", "z").map(3L -> _)).toDF("id", "tok")
    val jac = SetJoin.jaccardJoin(el, 4, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(jac.isEmpty, s"jaccard 0.8 should find nothing: $jac")
    val con = SetJoin.containmentJoin(el, 4, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(con == Set((1L, 2L, 3L, 3L, 10L)), s"containment: $con")
  }

  test("containment join equals brute force at several thresholds") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog and cat",
      3L -> "quick brown fox news", 4L -> "something else entirely here",
      5L -> "the quick brown fox jumps")
    val el = docs.toDF("id", "text")
      .select(col("id"), explode(split(col("text"), " ")).as("tok")).distinct()
    def brute(tn: Int, td: Int) = {
      val a = el.select(col("id").as("a"), col("tok"))
      val b = el.select(col("id").as("b"), col("tok"))
      val sz = el.groupBy("id").count()
      a.join(b, "tok").filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
        .join(sz.select(col("id").as("a"), col("count").as("sz_a")), "a")
        .join(sz.select(col("id").as("b"), col("count").as("sz_b")), "b")
        .filter(col("inter") * td >= lit(tn) * col("sz_a"))
        .select("a", "b", "inter", "sz_a", "sz_b")
    }
    for ((tn, td) <- Seq((4, 5), (1, 2), (1, 1))) {
      val got = SetJoin.containmentJoin(el, tn, td)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = brute(tn, td).as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"t=$tn/$td got=$got want=$want")
    }
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
