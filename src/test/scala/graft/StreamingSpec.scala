package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)
case class EvId(ts: Timestamp, event_type: String, user_id: Long,
                event_id: Long, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = new Timestamp(3600L * 1000 * 24 * 365 * 50 + m * 60000L)

  test("hourlyCounts over a MemoryStream emits watermarked window aggregates") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode(OutputMode.Append).start()
    mem.addData(
      Ev(t(0), "click", 1, 1.0), Ev(t(10), "click", 1, 2.0), Ev(t(20), "buy", 2, 5.0))
    q.processAllAvailable()
    // advance watermark past the first hour so append-mode emits it
    mem.addData(Ev(t(60 * 4), "click", 3, 1.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n, total_value FROM hourly")
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.contains(("click", 2L, 3.0)))
    assert(rows.contains(("buy", 1L, 5.0)))
  }

  test("slidingCounts: one event lands in four hopping windows (q98 twin)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.slidingCounts(mem.toDF())
      .writeStream.format("memory").queryName("sliding").outputMode(OutputMode.Append).start()
    mem.addData(Ev(t(30), "click", 1, 1.0)) // 00:30 → windows starting 23:45..00:30
    q.processAllAvailable()
    mem.addData(Ev(t(60 * 5), "click", 2, 1.0)) // advance the watermark
    q.processAllAvailable()
    val rows = spark.sql("SELECT w_start, n FROM sliding")
      .as[(java.sql.Timestamp, Long)].collect()
    q.stop()
    val forFirst = rows.filter(_._2 == 1L)
    assert(forFirst.length == 4, s"expected 4 hopping windows, got ${rows.toSeq}")
    val starts = forFirst.map(_._1.getTime).sorted
    assert(starts.sliding(2).forall { case Array(a, b) => b - a == 15 * 60 * 1000 },
      s"window starts not 15 min apart: ${starts.toSeq}")
  }

  test("sessions: 30-minute gap splits user activity into session windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessions(mem.toDF())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append).start()
    // user 1: two bursts separated by > 30 min -> two sessions
    mem.addData(
      Ev(t(0), "click", 1, 1.0), Ev(t(5), "click", 1, 1.0),
      Ev(t(60), "click", 1, 1.0),
      Ev(t(2), "click", 2, 9.0))
    q.processAllAvailable()
    mem.addData(Ev(t(60 * 8), "click", 9, 0.0)) // advance watermark
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, n_events FROM sess")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    q.stop()
    assert(rows(1L) == Seq(1L, 2L))
    assert(rows(2L) == Seq(1L))
  }

  test("file-source streaming ingest: parquet drops flow into hourly windows") {
    val in = java.nio.file.Files.createTempDirectory("evstream").toString
    val batch1 = Seq(Ev(t(0), "click", 1, 1.0), Ev(t(10), "click", 2, 2.0)).toDF()
    batch1.write.mode("append").parquet(in)
    val stream = EventStreams.fileStreamHourly(spark, in, batch1.schema)
    val q = stream.writeStream.format("memory").queryName("filehourly")
      .outputMode("append").start()
    q.processAllAvailable()
    // second file drop advances the watermark past hour 1
    Seq(Ev(t(60 * 5), "buy", 3, 9.0)).toDF().write.mode("append").parquet(in)
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n FROM filehourly")
      .as[(String, Long)].collect().toSet
    q.stop()
    assert(rows.contains(("click", 2L)))
  }

  test("streaming exact dedup drops repeated event_ids across batches") {
    implicit val sq = spark.sqlContext
    case class E2(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.dedupedEvents(df)
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    mem.addData((1L, t(0), 1L, "click", 1.0), (2L, t(1), 1L, "click", 2.0),
      (1L, t(0), 1L, "click", 1.0)) // in-batch dup
    q.processAllAvailable()
    mem.addData((2L, t(1), 1L, "click", 2.0), (3L, t(2), 2L, "buy", 3.0)) // cross-batch dup
    q.processAllAvailable()
    val ids = spark.sql("SELECT event_id FROM dedup").as[Long].collect().sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState: running per-user totals across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    // NoTimeout in the test: processing-time timeouts keep the engine
    // triggering timeout-check batches, so processAllAvailable never idles.
    val q = EventStreams.userRunningTotals(mem.toDF(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    mem.addData(Ev(t(0), "click", 1, 1.0), Ev(t(1), "purchase", 1, 10.0))
    q.processAllAvailable()
    mem.addData(Ev(t(2), "purchase", 1, 5.0), Ev(t(3), "click", 2, 0.5))
    q.processAllAvailable()
    // memory sink in update mode appends each update; take the LAST row per user
    val rows = spark.sql("SELECT * FROM totals")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    q.stop()
    assert(rows(1L) == ((1L, 3L, 2L, 16.0))) // state carried across batches
    assert(rows(2L) == ((2L, 1L, 0L, 0.5)))
  }

  test("batch and streaming share the same transform (twin of q17)") {
    val batch = Seq(
      Ev(t(0), "click", 1, 1.0), Ev(t(10), "click", 1, 2.0), Ev(t(70), "buy", 2, 5.0))
      .toDF()
    val out = EventStreams.hourlyCounts(batch)
      .selectExpr("event_type", "n").as[(String, Long)].collect().toSet
    assert(out == Set(("click", 2L), ("buy", 1L)))
  }

  test("attributedPurchases: stream-stream interval join, 1-hour lookback") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EvId]
    val q = EventStreams.attributedPurchases(mem.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      EvId(t(0), "click", 1, 100L, 0.0),    // 70 min before purchase -> outside
      EvId(t(50), "click", 1, 101L, 0.0),   // 20 min before -> attributed
      EvId(t(65), "click", 2, 102L, 0.0),   // other user -> no
      EvId(t(80), "click", 1, 103L, 0.0),   // AFTER the purchase -> no
      EvId(t(70), "purchase", 1, 200L, 9.5))
    q.processAllAvailable() // inner joins emit without watermark advance
    val rows = spark.sql("SELECT user_id, purchase_id, click_id, value FROM attrib")
      .as[(Long, Long, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set((1L, 200L, 101L, 9.5)))
  }

  test("left_outer attribution: unattributed purchases emit only after the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EvId]
    val q = EventStreams.attributedPurchases(mem.toDF(), joinType = "left_outer")
      .writeStream.format("memory").queryName("attrib_lo")
      .outputMode(OutputMode.Append).start()
    mem.addData(EvId(t(0), "purchase", 1, 200L, 9.5)) // no click anywhere near
    q.processAllAvailable()
    // a matching click could still arrive inside the watermark: no output yet
    assert(spark.sql("SELECT * FROM attrib_lo").count() == 0)
    // push BOTH sides' watermarks far past the purchase's join window (the
    // global watermark is the min across inputs, so each filtered side
    // needs a late event), then one more batch to run state eviction
    mem.addData(EvId(t(60 * 8), "click", 2, 300L, 0.0),
      EvId(t(60 * 8), "purchase", 2, 301L, 1.0))
    q.processAllAvailable()
    mem.addData(EvId(t(60 * 9), "purchase", 2, 302L, 1.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT purchase_id, click_id FROM attrib_lo")
      .as[(Long, Option[Long])].collect().toSet
    q.stop()
    assert(rows.contains((200L, None: Option[Long])),
      s"unattributed purchase not emitted with null click: $rows")
  }

  test("attributedPurchases batch twin produces the identical pairs (q70 shape)") {
    val batch = Seq(
      EvId(t(0), "click", 1, 100L, 0.0),
      EvId(t(50), "click", 1, 101L, 0.0),
      EvId(t(70), "purchase", 1, 200L, 9.5)).toDF()
    val out = EventStreams.attributedPurchases(batch)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(out == Set((200L, 101L)))
  }

  test("enrichAsOf: streamed events pick up point-in-time dim attributes") {
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("enrich").toString
    // SCD2-style dim: user 1 is bronze from t(0), gold from t(30)
    val dim = Seq((1L, t(0), "bronze"), (1L, t(30), "gold"),
      (2L, t(5), "silver")).toDF("user_id", "valid_from", "tier")
    val mem = MemoryStream[EvId]
    val q = EventStreams.enrichAsOf(mem.toDF(), "user_id", "ts",
      dim, "user_id", "valid_from", Seq("tier"),
      s"$base/out", s"$base/ckpt")
    mem.addData(
      EvId(t(10), "click", 1, 100L, 1.0),  // bronze era
      EvId(t(40), "click", 1, 101L, 1.0),  // gold era
      EvId(t(1), "click", 2, 102L, 1.0))   // before user 2's first version
    q.processAllAvailable()
    mem.addData(EvId(t(50), "purchase", 2, 103L, 2.0)) // second epoch
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$base/out")
      .select("event_id", "tier").as[(Long, Option[String])].collect().toMap
    assert(got == Map(100L -> Some("bronze"), 101L -> Some("gold"),
      102L -> None, 103L -> Some("silver")))
    // the batch twin computes the identical enrichment
    val batchTwin = graft.operators.AsOfJoin.asOf(
      Seq(EvId(t(10), "click", 1, 100L, 1.0), EvId(t(40), "click", 1, 101L, 1.0),
        EvId(t(1), "click", 2, 102L, 1.0), EvId(t(50), "purchase", 2, 103L, 2.0))
        .toDF(),
      "user_id", "ts", dim, "user_id", "valid_from", Seq("tier"))
      .select("event_id", "tier").as[(Long, Option[String])].collect().toMap
    assert(batchTwin == got)
  }
}
