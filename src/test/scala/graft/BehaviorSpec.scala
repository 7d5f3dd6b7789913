package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ev = Seq(
    // u1 completes the funnel in order
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    // u2 clicks BEFORE viewing — click must not count
    (2L, "click", ts("2024-01-02 09:00:00")),
    (2L, "view", ts("2024-01-02 09:30:00")),
    // u3 views only
    (3L, "view", ts("2024-01-03 08:00:00")),
    // u4 purchases with no view at all
    (4L, "purchase", ts("2024-01-04 07:00:00"))
  ).toDF("user_id", "event_type", "ts")

  test("funnel enforces strictly-after stage ordering") {
    val got = Behavior.funnel(ev, Seq("view", "click", "purchase"))
      .select("stage_ord", "stage", "n_users")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("funnel stage at same timestamp as previous reach does not count") {
    val same = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00"))).toDF("user_id", "event_type", "ts")
    val got = Behavior.funnel(same, Seq("view", "click"))
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 1L, "click" -> 0L))
  }

  test("funnel uses the EARLIEST qualifying prior-stage time, not any") {
    // u5: view@12:00, click@11:00 (before view — ignored), click@12:30 (counts)
    val tricky = Seq(
      (5L, "view", ts("2024-01-01 12:00:00")),
      (5L, "click", ts("2024-01-01 11:00:00")),
      (5L, "click", ts("2024-01-01 12:30:00"))).toDF("user_id", "event_type", "ts")
    val firsts = Behavior.funnelFirsts(tricky, Seq("view", "click"))
    val clickTs = firsts(1).select("ts_1").as[Timestamp].head()
    assert(clickTs == ts("2024-01-01 12:30:00"))
  }

  test("cohort retention counts each user once per offset week") {
    val e = Seq(
      // u1 first active day 01-01 (cohort week 0): active days in offset
      // weeks 0 (twice — must count once) and 1
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      // u2 first active 01-10 (cohort week 1), active again offset week 2
      (2L, ts("2024-01-10 10:00:00")),
      (2L, ts("2024-01-25 10:00:00"))
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = Behavior.cohortRetention(e, "2024-01-01")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("chi2 ranks a segment-exclusive term first") {
    // "zebra" appears only in segment A; "the" is exactly proportional to
    // segment size (a*N == tt*stot) so it is not positively associated.
    val occ = (Seq.fill(30)(("A", "the")) ++ Seq.fill(30)(("B", "the")) ++
      Seq.fill(20)(("A", "zebra")) ++ Seq.fill(20)(("B", "other")))
      .toDF("segment", "term")
    val got = Behavior.chi2Keywords(occ, k = 3, minDf = 5)
    val topA = got.filter(col("segment") === "A" && col("rk") === 1)
      .select("term").as[String].head()
    assert(topA == "zebra")
    // background term "the" is never positively associated anywhere
    assert(got.filter(col("term") === "the").count() == 0)
  }

  test("markov transitions: tie on ts broken by event_id; probs row-normalize") {
    val e = Seq(
      // u1: a(t0,id0) -> b(t0,id1) despite equal timestamps, then -> a
      (1L, 0L, "a", ts("2024-01-01 10:00:00")),
      (1L, 1L, "b", ts("2024-01-01 10:00:00")),
      (1L, 2L, "a", ts("2024-01-01 10:01:00")),
      // u2: a -> c
      (2L, 3L, "a", ts("2024-01-01 11:00:00")),
      (2L, 4L, "c", ts("2024-01-01 11:05:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.markovTransitions(e)
      .select("et_from", "et_to", "n", "p")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), ("b", "a", 1L, 1.0)))
  }

  test("inter-event gaps: exact micro gaps, lower median, per later type") {
    val e = Seq(
      (1L, 0L, "x", ts("2024-01-01 10:00:00")),
      (1L, 1L, "y", ts("2024-01-01 10:00:01")), // gap 1s -> y
      (1L, 2L, "y", ts("2024-01-01 10:00:04")), // gap 3s -> y
      (2L, 3L, "x", ts("2024-01-01 10:00:00")),
      (2L, 4L, "y", ts("2024-01-01 10:00:02"))  // gap 2s -> y
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.interEventGaps(e)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // y gaps: 1s, 2s, 3s in micros; lower median = 2s
    assert(got == Seq(("y", 3L, 1000000L, 2000000L, 3000000L)))
  }

  test("quantileSelect picks values present in the data at exact ranks") {
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "v")
    val got = graft.operators.Robust.quantileSelect(df, "g", "v", Seq(0, 50, 95, 100))
      .as[(String, Long, Long, Long, Long, Long)].head()
    // positions: ((100-1)*p) div 100 + 1 -> 1, 50, 95, 100
    assert(got == (("g", 100L, 1L, 50L, 95L, 100L)))
  }

  test("chi2 respects minDf and k") {
    val occ = (Seq.fill(3)(("A", "rare")) ++ Seq.fill(50)(("A", "x")) ++
      Seq.fill(50)(("B", "y"))).toDF("segment", "term")
    val got = Behavior.chi2Keywords(occ, k = 1, minDf = 5)
    // "rare" filtered by minDf; k=1 keeps one row per segment
    assert(got.filter(col("term") === "rare").count() == 0)
    assert(got.groupBy("segment").count().select(max("count")).as[Long].head() == 1L)
  }
}
