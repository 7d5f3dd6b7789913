package graft

import org.apache.spark.sql.functions._
import graft.catalog.{Rollup, Tables}

/** Incremental rollup maintenance: fold-of-partials == full recompute,
  * per-batch idempotence, isolation of other batches' files, compaction,
  * and the folded-id double-count guard. */
class RollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val groupCols = Seq("day", "event_type")
  private val counterCols = Seq("n", "cents")
  private def counters = Seq(
    "n" -> count(lit(1)),
    "cents" -> sum(floor(col("value") * 100).cast("long")))

  private def events = Tables.load(spark, dir, "events")
    .withColumn("day", date_trunc("day", col("ts")).cast("date").cast("string"))

  private def fullRecompute = events
    .groupBy("day", "event_type")
    .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100).cast("long")).as("cents"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("day", "event_type").collect().toSeq

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("rollup").toString + "/daily"

  private def monthBatches = {
    val m = events.withColumn("m",
      date_trunc("week", col("ts")).cast("date").cast("string"))
    val weeks = m.select("m").distinct().collect().map(_.getString(0)).sorted
    weeks.map(mm => mm -> m.filter(col("m") === mm).drop("m"))
  }

  test("fold of per-batch partials equals the full recompute") {
    val path = freshPath()
    val batches = monthBatches
    assert(batches.length >= 2, "fixture should span multiple months")
    batches.foreach { case (id, b) =>
      Rollup.appendBatch(spark, b, path, id, groupCols, counters)
    }
    assert(canon(Rollup.read(spark, path, groupCols, counterCols)) == canon(fullRecompute))
  }

  test("re-running a batch overwrites its own partition — never double-counts") {
    val path = freshPath()
    val batches = monthBatches
    batches.foreach { case (id, b) =>
      Rollup.appendBatch(spark, b, path, id, groupCols, counters)
    }
    val before = canon(Rollup.read(spark, path, groupCols, counterCols))
    // crash-retry: the same batch applied again
    val (rid, rb) = batches.last
    Rollup.appendBatch(spark, rb, path, rid, groupCols, counters)
    assert(canon(Rollup.read(spark, path, groupCols, counterCols)) == before)
  }

  test("appending one batch leaves other batches' files untouched") {
    val path = freshPath()
    val batches = monthBatches
    Rollup.appendBatch(spark, batches.head._2, path, batches.head._1, groupCols, counters)
    val firstPart = java.nio.file.Paths.get(path, s"batch_id=${batches.head._1}")
    import scala.jdk.CollectionConverters._
    def snapshot = java.nio.file.Files.walk(firstPart).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(f => f.toString -> java.nio.file.Files.getLastModifiedTime(f).toMillis)
      .toMap
    val before = snapshot
    Rollup.appendBatch(spark, batches.last._2, path, batches.last._1, groupCols, counters)
    assert(snapshot == before, "history partition files were rewritten")
  }

  test("compact folds batches into _base; reads unchanged; folded ids refused") {
    val path = freshPath()
    val batches = monthBatches
    batches.foreach { case (id, b) =>
      Rollup.appendBatch(spark, b, path, id, groupCols, counters)
    }
    val before = canon(Rollup.read(spark, path, groupCols, counterCols))
    Rollup.compact(spark, path, groupCols, counterCols)
    assert(canon(Rollup.read(spark, path, groupCols, counterCols)) == before)
    val parts = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSeq
    assert(parts == Seq("batch_id=_base"), s"expected single base partition, got $parts")
    // a folded batch id can no longer be re-applied (it would double-count)
    val ex = intercept[IllegalArgumentException] {
      Rollup.appendBatch(spark, batches.head._2, path, batches.head._1, groupCols, counters)
    }
    assert(ex.getMessage.contains("folded"))
    // but genuinely new batches still append and fold correctly
    Rollup.appendBatch(spark, batches.head._2.limit(0), path, "post-compact",
      groupCols, counters)
    assert(canon(Rollup.read(spark, path, groupCols, counterCols)) == before)
  }

  test("readAgg folds min/max watermark counters across batches") {
    val path = freshPath()
    val wmCounters = Seq(
      "n" -> count(lit(1)),
      "first_cents" -> min(floor(col("value") * 100).cast("long")),
      "last_cents" -> max(floor(col("value") * 100).cast("long")))
    monthBatches.foreach { case (id, b) =>
      Rollup.appendBatch(spark, b, path, id, groupCols, wmCounters)
    }
    val folds = Seq("n" -> "sum", "first_cents" -> "min", "last_cents" -> "max")
    val got = Rollup.readAgg(spark, path, groupCols, folds)
      .orderBy("day", "event_type").collect().toSeq
    val want = events.groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        min(floor(col("value") * 100).cast("long")).as("first_cents"),
        max(floor(col("value") * 100).cast("long")).as("last_cents"))
      .orderBy("day", "event_type").collect().toSeq
    assert(got == want)
    val ex = intercept[IllegalArgumentException] {
      Rollup.readAgg(spark, path, groupCols, Seq("n" -> "avg")).collect()
    }
    assert(ex.getMessage.contains("unknown fold"))
  }

  test("HLL sketch counters: per-batch sketches union to the exact distinct count") {
    // distinct users per (day, type) — the holistic counter a SUM rollup
    // cannot carry. DataSketches HLL is exact in its sparse regime (far
    // below lgK=12 capacity here), so the estimate must EQUAL the true
    // distinct count on this fixture, not just approximate it.
    val path = freshPath()
    val hllCounters = Seq(
      "n" -> count(lit(1)),
      "users" -> hll_sketch_agg(col("user_id")))
    monthBatches.foreach { case (id, b) =>
      Rollup.appendBatch(spark, b, path, id, groupCols, hllCounters)
    }
    val got = Rollup.readAgg(spark, path, groupCols,
        Seq("n" -> "sum", "users" -> "hll_estimate"))
      .orderBy("day", "event_type").collect().toSeq
    val want = events.groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .orderBy("day", "event_type").collect().toSeq
    assert(got == want, "unioned batch sketches diverged from exact distinct counts")
    // compact with hll_union keeps the BASE mergeable: reads after
    // compaction still estimate correctly
    Rollup.compactAgg(spark, path, groupCols,
      Seq("n" -> "sum", "users" -> "hll_union"))
    val after = Rollup.readAgg(spark, path, groupCols,
        Seq("n" -> "sum", "users" -> "hll_estimate"))
      .orderBy("day", "event_type").collect().toSeq
    assert(after == want, "compaction corrupted the sketch counter")
  }

  test("compactAgg preserves min/max watermark counters; plain compact would corrupt them") {
    val path = freshPath()
    val wmCounters = Seq(
      "n" -> count(lit(1)),
      "first_cents" -> min(floor(col("value") * 100).cast("long")),
      "last_cents" -> max(floor(col("value") * 100).cast("long")))
    val folds = Seq("n" -> "sum", "first_cents" -> "min", "last_cents" -> "max")
    monthBatches.foreach { case (id, b) =>
      Rollup.appendBatch(spark, b, path, id, groupCols, wmCounters)
    }
    val before = Rollup.readAgg(spark, path, groupCols, folds)
      .orderBy("day", "event_type").collect().toSeq
    Rollup.compactAgg(spark, path, groupCols, folds)
    val after = Rollup.readAgg(spark, path, groupCols, folds)
      .orderBy("day", "event_type").collect().toSeq
    assert(after == before, "compactAgg must fold each counter with its own fold")
    val parts = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSeq
    assert(parts == Seq("batch_id=_base"))
  }

  test("appendBatch does not mutate the session partitionOverwriteMode conf") {
    val path = freshPath()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    Rollup.appendBatch(spark, monthBatches.head._2, path, "b1", groupCols, counters)
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode") == prev,
      "appendBatch must use a per-write option, not a session-wide conf flip")
  }

  test("compact recovers a stranded .compact.old from a mid-swap crash") {
    val path = freshPath()
    monthBatches.foreach { case (id, b) =>
      Rollup.appendBatch(spark, b, path, id, groupCols, counters)
    }
    val before = canon(Rollup.read(spark, path, groupCols, counterCols))
    // simulate the crash window: live renamed aside, tmp never installed
    val live = java.nio.file.Paths.get(path)
    val old = java.nio.file.Paths.get(path + ".compact.old")
    java.nio.file.Files.move(live, old)
    Rollup.compact(spark, path, groupCols, counterCols)
    assert(canon(Rollup.read(spark, path, groupCols, counterCols)) == before)
  }

  test("reserved and underscore batch ids are rejected") {
    val path = freshPath()
    val ex = intercept[IllegalArgumentException] {
      Rollup.appendBatch(spark, events, path, "_base", groupCols, counters)
    }
    assert(ex.getMessage.contains("reserved"))
  }

  test("missingBatches plans the backfill: gaps only, folded ids count as present") {
    val path = freshPath()
    val cal = Seq("d1", "d2", "d3", "d4")
    assert(Rollup.missingBatches(spark, path, cal) == cal) // nothing yet
    Rollup.appendBatch(spark, events, path, "d1", groupCols, counters)
    Rollup.appendBatch(spark, events, path, "d3", groupCols, counters)
    assert(Rollup.missingBatches(spark, path, cal) == Seq("d2", "d4"))
    // compact folds d1/d3 into _base — they must still count as present
    Rollup.compact(spark, path, groupCols, counters.map(_._1))
    assert(Rollup.missingBatches(spark, path, cal) == Seq("d2", "d4"))
    Rollup.appendBatch(spark, events, path, "d2", groupCols, counters)
    assert(Rollup.missingBatches(spark, path, cal) == Seq("d4"))
  }
}
