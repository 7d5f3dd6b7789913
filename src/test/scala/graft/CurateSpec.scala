package graft

import graft.operators.Curate

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("curation drops low-quality, exact dups, and near-dups; keeps the rest") {
    val good = "the quick brown fox jumps over the lazy dog and runs far away today " * 3
    val near = good.replace("lazy", "sleepy")
    val corpus = Seq(
      (0L, good),
      (1L, good),                       // exact dup of 0 -> dropped (keep 0)
      (2L, near),                       // near dup of 0 -> dropped (greedy: b side)
      (3L, "@@ ## 12 %% !!"),           // low quality -> dropped
      (4L, "a completely different well formed document about the spark optimizer " +
        "and the shuffles it plans for large scale joins in the cluster today"))
      .toDF("doc_id", "text")

    val out = Curate.run(corpus, "doc_id", "text", minQuality = 0.5, theta = 0.5)
    val kept = out.curated.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 4L))
    val st = out.stats.as[(Long, Long, Long, Long)].collect().head
    assert(st == ((5L, 4L, 3L, 2L))) // input, after-quality, after-exact, final
  }

  test("production tier: runFast keeps the same documents as run") {
    // the funnel equivalence the rows-only q60 leans on: the xxhash64
    // sketch tier must curate the SAME corpus to the SAME survivor set as
    // the oracle-checked md5 tier (candidate generation differs per hash
    // family; survivors agree because verification is exact Jaccard)
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.catalog.Tables.load(spark, dir, "documents")
    val slow = Curate.run(corpus, "doc_id", "text")
    val fast = Curate.runFast(corpus, "doc_id", "text")
    val slowIds = slow.curated.select("doc_id").as[Long].collect().sorted.toSeq
    val fastIds = fast.curated.select("doc_id").as[Long].collect().sorted.toSeq
    assert(slowIds == fastIds && slowIds.nonEmpty)
    assert(slow.stats.collect().head == fast.stats.collect().head)
  }

  test("history index stage drops batch docs that near-duplicate history") {
    val good = "the quick brown fox jumps over the lazy dog and runs far away today " * 3
    val near = good.replace("lazy", "sleepy")
    val novel = "a completely different well formed document about the spark optimizer " +
      "and the shuffles it plans for large scale joins in the cluster today"
    val tmp = java.nio.file.Files.createTempDirectory("curate_hist").toString
    Seq((0L, good)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/hist.parquet")
    // XxTier: the fast funnel's batch sketch only band-matches a
    // same-family index
    val idx = graft.operators.Dedup.ensureSketchIndex(spark,
      indexKey = s"$tmp/hist-curate", sourcePath = s"$tmp/hist.parquet",
      corpus = spark.read.parquet(s"$tmp/hist.parquet"),
      idCol = "doc_id", textCol = "text", tier = graft.operators.Dedup.XxTier)
    val batch = Seq((10L, near), (11L, novel)).toDF("doc_id", "text")
    val out = Curate.runFast(batch, "doc_id", "text",
      minQuality = 0.5, historySketch = Some(idx))
    // doc 10 near-duplicates history doc 0 -> dropped; doc 11 survives
    assert(out.curated.select("doc_id").as[Long].collect().toSeq == Seq(11L))
    val st = out.stats.as[(Long, Long, Long, Long, Long)].collect().head
    assert(st == ((2L, 2L, 2L, 2L, 1L))) // input, quality, exact, batch-dedup, final
  }
}
