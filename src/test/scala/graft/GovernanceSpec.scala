package graft

import org.apache.spark.sql.functions._
import graft.operators.{Agreement, Anonymize, Preference, Spatial}

class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityCensus counts classes and violating rows") {
    // classes: (a,x)=3 rows, (a,y)=1, (b,x)=2 → k=2 violated by 1 row
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"),
      ("b", "x")).toDF("q1", "q2")
    val r = Anonymize.kAnonymityCensus(df, Seq("q1", "q2"), k = 2L)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(r == ((6L, 3L, 1L, 1L, false)))
    val ok = Anonymize.kAnonymityCensus(df, Seq("q1"), k = 2L)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(ok == ((6L, 2L, 2L, 0L, true)))
  }

  test("lDiversityCensus flags classes below l distinct sensitive values") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 5), ("b", 5))
      .toDF("q1", "sens")
    val rows = Anonymize.lDiversityCensus(df, Seq("q1"), col("sens"), l = 2L)
      .orderBy("q1").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(rows == Seq(("a", 3L, 2L, true), ("b", 2L, 1L, false)))
    val viol = Anonymize.lDiversityViolations(df, Seq("q1"), col("sens"), l = 2L)
      .as[(String, Long, Long)].collect().toSeq
    assert(viol == Seq(("b", 2L, 1L)))
  }

  test("cohensKappa matches the hand-computed statistic") {
    // confusion: n11=4, n10=1, n01=1, n00=4, n=10
    // po = 8/10; pe = (5*5 + 5*5)/100 = 0.5; kappa = 0.3/0.5 = 0.6
    val df = (Seq.fill(4)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(4)((false, false)))
      .map { case (a, b) => ("g", a, b) }.toDF("grp", "a", "b")
    val r = Agreement.cohensKappa(df, "grp", col("a"), col("b"))
      .as[(String, Long, Long, Long, Long, Long, Long, Double)].collect().head
    assert(r._2 == 10L && r._3 == 4L && r._6 == 4L && r._7 == 8L)
    assert(math.abs(r._8 - 0.6) < 1e-15)
  }

  test("cohensKappa is zero when one annotator is constant-uninformative") {
    // b always true: agreement is exactly chance → kappa = 0
    val df = Seq(("g", true, true), ("g", false, true), ("g", true, true),
      ("g", false, true)).toDF("grp", "a", "b")
    val r = Agreement.cohensKappa(df, "grp", col("a"), col("b"))
      .select("kappa").as[Double].collect().head
    assert(r == 0.0)
  }

  test("cohensKappa is NULL (not NaN) when both annotators are constant-identical") {
    // every row (true, true): p_e = 1, so kappa is 0/0-undefined —
    // the guard must yield an explicit NULL on both engines
    val df = Seq(("g", true, true), ("g", true, true)).toDF("grp", "a", "b")
    val r = Agreement.cohensKappa(df, "grp", col("a"), col("b"))
      .select("kappa").collect().head
    assert(r.isNullAt(0))
  }

  test("Bradley-Terry ratings rank a dominant item first") {
    // a beats b 9 times, b beats a once; c splits evenly with b
    val duels = Seq(("a", "b", 9L), ("b", "a", 1L), ("b", "c", 5L),
      ("c", "b", 5L)).toDF("winner", "loser", "w")
    val r = Preference.ratings(duels, iters = 3)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r("a")._2 == 9L && r("a")._3 == 10L) // wins, games
    assert(r("b")._2 == 6L && r("b")._3 == 20L)
    assert(r("a")._4 > r("b")._4, "9:1 winner must out-rate its victim")
    assert(r("b")._4 > 0L && r("c")._4 > 0L)
  }

  test("Bradley-Terry one-iteration value matches the closed form") {
    // single pair: a beats b 3-1. r0: p=1e6 both.
    // S_a = floor(4 * 1e6 * 1e5 / 2e6) = 200000
    // p_a(1) = floor(3 * 1e11 / 200000) = 1500000; p_b(1) = 500000
    val duels = Seq(("a", "b", 3L), ("b", "a", 1L)).toDF("winner", "loser", "w")
    val r = Preference.ratings(duels, iters = 1)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x._4).toMap
    assert(r("a") == 1500000L)
    assert(r("b") == 500000L)
  }

  test("driver-tier and distributed-tier Bradley-Terry are bit-identical") {
    val duels = Seq(("a", "b", 9L), ("b", "a", 1L), ("b", "c", 5L),
      ("c", "b", 5L), ("a", "c", 2L)).toDF("winner", "loser", "w")
    val fast = Preference.ratings(duels, iters = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    val dist = Preference.ratingsDistributed(duels, iters = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(fast == dist)
  }

  test("zero-win items floor at 1 unit and never divide by zero") {
    val duels = Seq(("a", "b", 2L)).toDF("winner", "loser", "w")
    val r = Preference.ratings(duels, iters = 4)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x._4).toMap
    assert(r("b") == 1L)
    assert(r("a") >= 1L)
  }

  test("Bradley-Terry over a Rollup-maintained win matrix equals batch ratings") {
    // the incremental-RLHF composition: preference batches land as rollup
    // partials (idempotent per-batch overwrite), ratings read the FOLDED
    // matrix — bit-equal to rating the concatenated batches directly,
    // and history is never re-aggregated when a new batch arrives
    val dir = java.nio.file.Files.createTempDirectory("btroll").toString + "/wins"
    val b1 = Seq(("a", "b", 3L), ("b", "c", 2L), ("a", "b", 1L))
      .toDF("winner", "loser", "w")
    val b2 = Seq(("b", "a", 2L), ("c", "b", 4L), ("a", "c", 1L))
      .toDF("winner", "loser", "w")
    graft.catalog.Rollup.appendBatch(spark, b1, dir, "d1",
      Seq("winner", "loser"), Seq("w" -> sum(col("w"))))
    graft.catalog.Rollup.appendBatch(spark, b2, dir, "d2",
      Seq("winner", "loser"), Seq("w" -> sum(col("w"))))
    val folded = graft.catalog.Rollup.read(spark, dir,
      Seq("winner", "loser"), Seq("w"))
    val inc = Preference.ratings(folded, iters = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    val batch = Preference.ratings(b1.unionAll(b2), iters = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(inc == batch)
    // crash-retry of batch 2 replays idempotently: ratings unchanged
    graft.catalog.Rollup.appendBatch(spark, b2, dir, "d2",
      Seq("winner", "loser"), Seq("w" -> sum(col("w"))))
    val replayed = Preference.ratings(graft.catalog.Rollup.read(spark, dir,
      Seq("winner", "loser"), Seq("w")), iters = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(replayed == batch)
  }

  test("distanceJoin equals the brute-force pair set") {
    val pts = Seq((1L, 100L, 100L), (2L, 150L, 140L), (3L, 900L, 900L),
      (4L, 905L, 910L), (5L, 100L, 260L), (6L, 5000L, 5000L))
      .toDF("id", "x", "y")
    val r = 200L
    val got = Spatial.distanceJoin(pts, r)
      .as[(Long, Long, Long)].collect().toSet
    val rows = pts.as[(Long, Long, Long)].collect()
    val want = (for {
      a <- rows; b <- rows if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet
    assert(got == want && want.nonEmpty)
    // cross-cell pair (1,5): dy=160 within r but different cy cells
    assert(want.exists { case (a, b, _) => a == 1L && b == 5L })
  }

  test("distanceJoin emits each qualifying pair exactly once") {
    // co-located points in one cell plus a neighbor-cell point
    val pts = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 110L, 10L))
      .toDF("id", "x", "y")
    val got = Spatial.distanceJoin(pts, 100L)
      .groupBy("id_a", "id_b").count().as[(Long, Long, Long)].collect()
    assert(got.nonEmpty && got.forall(_._3 == 1L), s"duplicated pairs: ${got.mkString(",")}")
  }
}
