package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  test("as-of join picks the latest right row at or before each left time") {
    val quotes = Seq(
      (1L, t(5), 7.0), (1L, t(8), 8.0), (2L, t(20), 9.0))
      .toDF("k", "qt", "px")
    val trades = Seq(
      (1L, t(5), 100L),  // equal timestamp -> inclusive match (7.0)
      (1L, t(10), 101L), // latest prior is t(8) -> 8.0
      (1L, t(2), 102L),  // nothing before -> null
      (2L, t(25), 200L))
      .toDF("k", "tt", "trade_id")
    val out = AsOfJoin.asOf(trades, "k", "tt", quotes, "k", "qt", Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(100L -> Some(7.0), 101L -> Some(8.0),
      102L -> None, 200L -> Some(9.0)))
  }

  test("forward as-of picks the earliest right row at or after each left time") {
    val quotes = Seq(
      (1L, t(5), 7.0), (1L, t(8), 8.0), (2L, t(20), 9.0))
      .toDF("k", "qt", "px")
    val trades = Seq(
      (1L, t(8), 100L),  // equal timestamp -> inclusive match (8.0)
      (1L, t(6), 101L),  // earliest following is t(8) -> 8.0
      (1L, t(10), 102L), // nothing after -> null
      (2L, t(1), 200L))
      .toDF("k", "tt", "trade_id")
    val out = AsOfJoin.asOfForward(trades, "k", "tt", quotes, "k", "qt", Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(100L -> Some(8.0), 101L -> Some(8.0),
      102L -> None, 200L -> Some(9.0)))
  }

  test("a NULL carry field in the matched right row survives (no stale resurrection)") {
    val quotes = Seq(
      (1L, t(10), Some(5.0), "m1"), (1L, t(20), None, "m2"))
      .toDF("k", "qt", "px", "mkt")
    val trades = Seq((1L, t(25), 100L)).toDF("k", "tt", "trade_id")
    val out = AsOfJoin.asOf(trades, "k", "tt", quotes, "k", "qt", Seq("px", "mkt"))
      .select("trade_id", "px", "mkt")
      .as[(Long, Option[Double], String)].collect().head
    // matched row is t(20): px is genuinely NULL there, mkt is m2 —
    // both fields must come from that SAME row
    assert(out == ((100L, None, "m2")))
  }
}
