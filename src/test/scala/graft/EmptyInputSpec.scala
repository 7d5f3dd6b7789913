package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup, Similarity}

/** Operators must degrade to empty results — not crash — on empty input
  * (a filter that matches nothing upstream is routine at scale). */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup operators on an empty corpus") {
    assert(Dedup.exactDedup(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashNearDups(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhash(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.dupClusters(Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
  }

  test("similarity operators on an empty corpus") {
    val n = Similarity.normed(noVecs, "vec_id", "embedding")
    assert(Similarity.bruteForceTopK(n, n, 5).count() == 0)
    assert(Similarity.annTopK(n, n, 5).count() == 0)
    assert(Similarity.nearDupByCosine(n, 0.5).count() == 0)
  }

  test("cross-corpus dedup with an empty side yields no pairs") {
    val some = Seq((1L, "the quick brown fox jumps over the lazy dog repeatedly"))
      .toDF("doc_id", "text")
    assert(Dedup.crossCorpusNearDups(noDocs, some, "doc_id", "text").count() == 0)
    assert(Dedup.crossCorpusNearDups(some, noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.crossCorpusNearDups(noDocs, noDocs, "doc_id", "text").count() == 0)
  }

  test("governance operators on empty input") {
    val noQi = Seq.empty[(String, String)].toDF("q1", "q2")
    // an empty census row (0 classes) — not a crash, not a missing row
    val census = graft.operators.Anonymize.kAnonymityCensus(noQi, Seq("q1", "q2"), 5L)
    assert(census.count() == 1)
    assert(census.select("n_classes").as[Long].collect().head == 0L)
    assert(graft.operators.Anonymize
      .lDiversityCensus(noQi, Seq("q1"), col("q2"), 2L).count() == 0)
    val noDuels = Seq.empty[(String, String, Long)].toDF("winner", "loser", "w")
    assert(graft.operators.Preference.ratings(noDuels).count() == 0)
    assert(graft.operators.Preference.ratingsDistributed(noDuels).count() == 0)
    val noPts = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    assert(graft.operators.Spatial.distanceJoin(noPts, 100L).count() == 0)
    assert(graft.operators.PageRank.ranks(
      Seq.empty[(String, String)].toDF("s", "d"), "s", "d").count() == 0)
  }

  test("bag-of-words on an empty corpus: empty vocab, empty rows") {
    val (vocab, out) = graft.ingest.Ingest.bagOfWords(
      Seq.empty[(Long, String)].toDF("key", "text"), "text")
    assert(vocab.count() == 0 && out.count() == 0)
  }

  test("datum export of an empty frame is an empty frame") {
    assert(graft.functions.ProtoDatum.numericDatums(
      noVecs, "vec_id", "embedding", None).count() == 0)
  }

  test("curation of an empty corpus yields zero stats") {
    val st = Curate.run(noDocs, "doc_id", "text").stats
      .as[(Long, Long, Long, Long)].collect().head
    assert(st == ((0L, 0L, 0L, 0L)))
  }

  test("fast curation of an empty batch against a history index yields zero stats") {
    val hist = Dedup.sketch(
      Seq((0L, "the quick brown fox jumps over the lazy dog repeatedly and often"))
        .toDF("doc_id", "text"),
      "doc_id", "text", tier = Dedup.XxTier)
    val out = Curate.runFast(noDocs, "doc_id", "text", historySketch = Some(hist))
    val st = out.stats.as[(Long, Long, Long, Long, Long)].collect().head
    assert(st == ((0L, 0L, 0L, 0L, 0L)))
    assert(out.curated.count() == 0)
  }

  test("batchDropPairs on an empty batch emits no pairs") {
    val emptySketch = Dedup.sketch(noDocs, "doc_id", "text", tier = Dedup.XxTier)
    assert(Dedup.batchDropPairs(emptySketch, None).count() == 0)
    assert(Dedup.batchDropPairs(emptySketch, Some(emptySketch)).count() == 0)
  }

  test("train-prep operators on an empty corpus") {
    import graft.operators.TrainPrep
    val noLang = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(TrainPrep.shuffled(noDocs, "doc_id").count() == 0)
    assert(TrainPrep.chunks(noDocs, "doc_id", "text").count() == 0)
    // empty corpus: avgdl is 0/0 = NaN, every score is NaN, NaN > 0 is
    // false -> empty result, no crash
    assert(TrainPrep.bm25(noDocs, "doc_id", "text", Seq("x")).count() == 0)
    assert(TrainPrep.uniformMixture(noLang, "doc_id", "lang", "text").count() == 0)
  }

  test("shard export on an empty corpus: empty manifest, verify is a no-op") {
    import graft.operators.TrainPrep
    val dir = java.nio.file.Files.createTempDirectory("shards-empty").toString
    assert(TrainPrep.writeShards(noDocs, "doc_id", "text", dir).count() == 0)
    assert(TrainPrep.verifyShards(spark, dir, "doc_id", "text").count() == 0)
  }

  test("round-5 operators on empty input") {
    import graft.operators.{Bpe, PageRank, Quality}
    assert(Quality.repetitionStats(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.cdcDedup(noDocs, "doc_id", "text").count() == 0)
    val n = Similarity.normed(noVecs, "vec_id", "embedding")
    assert(Similarity.semanticDedup(n, 0.5).count() == 0)
    val m = Bpe.train(noDocs, "text", nMerges = 5)
    assert(m.ranks.isEmpty)
    assert(Bpe.encodeStats(spark, noDocs, "doc_id", "text", m).count() == 0)
    assert(PageRank.ranks(
      Seq.empty[(String, String)].toDF("s", "d"), "s", "d",
      iters = 1).count() == 0)
  }

  test("round-5 continuation operators on empty input") {
    import graft.operators.TrainPrep
    import graft.functions.TextAnalysis
    val noLang = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(TrainPrep.temperatureResample(noLang, "doc_id", "lang", "text").count() == 0)
    // stripMarkup of null stays null (no NPE in the regex chain)
    val r = Seq((1L, null.asInstanceOf[String]), (2L, "<p>x</p>"))
      .toDF("id", "t")
      .select(TextAnalysis.stripMarkup(col("t")).as("c"))
      .as[Option[String]].collect().toSet
    assert(r == Set(None, Some("x")))
  }
}
