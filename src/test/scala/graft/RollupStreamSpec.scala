package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.catalog.Rollup
import graft.streaming.EventStreams

/** Exactly-once streamed rollup maintenance: epoch-keyed partitions make
  * foreachBatch redelivery idempotent, and a checkpointed restart
  * continues the fold without re-counting committed epochs. */
class RollupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val groupCols = Seq("day", "event_type")
  private val counterCols = Seq("n", "cents")
  private def counters = Seq(
    "n" -> count(lit(1)),
    "cents" -> sum(floor(col("value") * 100).cast("long")))

  private def readRollup(path: String) =
    Rollup.read(spark, path, groupCols, counterCols)
      .orderBy("day", "event_type").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("streamed rollup equals batch recompute across a checkpointed restart") {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("rollup_ckpt").toString
    val path = java.nio.file.Files.createTempDirectory("rollup_stream").toString + "/daily"
    val mem = MemoryStream[(String, String, Double)]
    def start() = EventStreams.maintainRollup(
      mem.toDF().toDF("day", "event_type", "value"), path, ckpt, groupCols, counters)

    val q1 = start()
    mem.addData(("2024-01-01", "view", 1.0), ("2024-01-01", "click", 2.5))
    q1.processAllAvailable()
    mem.addData(("2024-01-02", "view", 3.0))
    q1.processAllAvailable()
    q1.stop() // simulated deploy: query gone, checkpoint + rollup stay

    // restart from the SAME checkpoint: committed epochs are not
    // reprocessed; new data continues the fold
    val q2 = start()
    mem.addData(("2024-01-01", "view", 0.5))
    q2.processAllAvailable()
    q2.stop()

    assert(readRollup(path) == Seq(
      ("2024-01-01", "click", 1L, 250L),
      ("2024-01-01", "view", 2L, 150L),
      ("2024-01-02", "view", 1L, 300L)))
    // the layout is epoch-keyed — the idempotence unit of the contract
    val parts = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=epoch")).toSet
    assert(parts.size >= 2, s"expected epoch partitions, got $parts")
  }

  test("streamed quality monitor: per-epoch violation partials fold to batch truth") {
    // Validate.qualityCounters ∘ maintainRollup = drift monitoring: each
    // epoch's violation counts land as that epoch's partition; totals
    // fold at read and must equal a one-shot Validate.checks over
    // everything seen.
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("qmon_ckpt").toString
    val path = java.nio.file.Files.createTempDirectory("qmon").toString + "/quality"
    val preds = Seq(
      "tag_complete" -> col("tag").isNotNull,
      "score_positive" -> (col("score") > 0.0))
    val mem = MemoryStream[(String, Option[String], Double)]
    val q = EventStreams.maintainRollup(
      mem.toDF().toDF("src", "tag", "score"), path, ckpt,
      Seq("src"), graft.operators.Validate.qualityCounters(preds))
    mem.addData(("web", Some("a"), 1.0), ("web", None, 2.0), ("api", Some("b"), -1.0))
    q.processAllAvailable()
    mem.addData(("web", Some("c"), -3.0), ("api", None, -4.0))
    q.processAllAvailable()
    q.stop()

    val folded = Rollup.read(spark, path, Seq("src"),
        Seq("n_rows", "bad_tag_complete", "bad_score_positive"))
      .orderBy("src").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one-shot truth over everything the stream saw
    val all = Seq(("web", Some("a"), 1.0), ("web", None, 2.0), ("api", Some("b"), -1.0),
      ("web", Some("c"), -3.0), ("api", None, -4.0)).toDF("src", "tag", "score")
    val qcs = graft.operators.Validate.qualityCounters(preds)
      .map { case (n, c) => c.as(n) }
    val want = all.groupBy("src")
      .agg(qcs.head, qcs.tail: _*)
      .orderBy("src").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(folded == want)
    assert(folded == Seq(("api", 2L, 1L, 2L), ("web", 3L, 1L, 1L)))
  }

  test("a replayed epoch lands on top of itself — never double-counts") {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("rollup_ckpt2").toString
    val path = java.nio.file.Files.createTempDirectory("rollup_stream2").toString + "/daily"
    val mem = MemoryStream[(String, String, Double)]
    val q = EventStreams.maintainRollup(
      mem.toDF().toDF("day", "event_type", "value"), path, ckpt, groupCols, counters)
    mem.addData(("2024-01-01", "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val before = readRollup(path)
    // crash between sink write and checkpoint commit ⇒ Structured
    // Streaming re-delivers the SAME batch under the SAME epoch id;
    // model that redelivery directly against the sink
    Rollup.appendBatch(spark,
      Seq(("2024-01-01", "view", 1.0)).toDF("day", "event_type", "value"),
      path, "epoch0", groupCols, counters)
    assert(readRollup(path) == before, "replayed epoch double-counted")
  }
}
