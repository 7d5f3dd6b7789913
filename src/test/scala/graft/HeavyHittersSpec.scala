package graft

import org.apache.spark.sql.functions._
import graft.expressions.HeavyHitters.heavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(heavyHitters(col("t"), k).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.term", "e.count")
      .as[(String, Long)].collect().toMap

  test("at capacity >= distinct terms the sketch is exact under any partitioning") {
    val terms = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c") ++ Seq("d")
    for (parts <- Seq(1, 8)) {
      val df = spark.sparkContext.parallelize(terms, parts).toDF("t")
      assert(summary(df, k = 16) ==
        Map("a" -> 40L, "b" -> 25L, "c" -> 9L, "d" -> 1L))
    }
  }

  test("under capacity: every term above n/(k+1) survives, counts never overshoot") {
    // n = 1000: one term at 400, one at 180, and 420 singletons. k = 4 ->
    // threshold n/(k+1) = 200: 'big' MUST be reported; every reported
    // count c_t obeys true - n/(k+1) <= c_t <= true.
    val truth = Map("big" -> 400L, "mid" -> 180L)
    val terms = scala.util.Random.shuffle(
      Seq.fill(400)("big") ++ Seq.fill(180)("mid") ++ (0 until 420).map("u" + _))
    val df = spark.sparkContext.parallelize(terms, 8).toDF("t")
    val got = summary(df, k = 4)
    assert(got.size <= 4)
    assert(got.contains("big"), s"guaranteed heavy hitter missing: $got")
    got.foreach { case (t, c) =>
      val tru = truth.getOrElse(t, 1L)
      assert(c <= tru, s"$t overshoots: $c > $tru")
      assert(c >= tru - 200, s"$t undershoots past the MG bound: $c vs $tru")
    }
  }

  test("null inputs are skipped, empty input yields an empty summary") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("t")
    assert(summary(df, 4) == Map("x" -> 2L))
    assert(summary(Seq.empty[String].toDF("t"), 4) == Map.empty[String, Long])
  }

  test("grouped aggregation: one independent sketch per group") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "z"))
      .toDF("g", "t")
    val got = df.groupBy("g").agg(heavyHitters(col("t"), 8).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select("g", "e.term", "e.count").as[(String, String, Long)]
      .collect().groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(got == Map("g1" -> Map("a" -> 2L, "b" -> 1L), "g2" -> Map("z" -> 1L)))
  }
}
