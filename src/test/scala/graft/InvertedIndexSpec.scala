package graft

import org.apache.spark.sql.functions._
import graft.operators.InvertedIndex

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (10L, "alpha beta gamma"),
    (20L, "beta gamma delta"),
    (35L, "gamma alpha alpha")) // repeated token counts once per doc
    .toDF("doc_id", "text")

  test("postings are delta-encoded ascending doc ids; df is per-doc") {
    val idx = InvertedIndex.build(docs, "doc_id", "text")
      .withColumn("p", col("postings"))
      .select("term", "df", "overflow", "p")
      .as[(String, Long, Boolean, Seq[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(idx("alpha")._2 == 2 && idx("alpha")._4 == Seq(10L, 25L)) // 10, 35
    assert(idx("beta")._4 == Seq(10L, 10L))                          // 10, 20
    assert(idx("gamma")._2 == 3 && idx("gamma")._4 == Seq(10L, 10L, 15L))
    assert(idx("delta")._4 == Seq(20L))
    assert(idx.values.forall(!_._3)) // nothing overflows at cap 100
  }

  test("cap truncates postings to the smallest ids and sets overflow") {
    val many = (1L to 50L).map(i => (i, "common")).toDF("doc_id", "text")
    val row = InvertedIndex.build(many, "doc_id", "text", cap = 10)
      .select("df", "overflow", "postings")
      .as[(Long, Boolean, Seq[Long])].collect().head
    assert(row._1 == 50 && row._2)
    assert(row._3.size == 10)
    assert(row._3.head == 1L && row._3.tail.forall(_ == 1L)) // ids 1..10
  }

  test("decodePostings inverts the delta encoding") {
    val decoded = InvertedIndex.build(docs, "doc_id", "text")
      .select(col("term"), InvertedIndex.decodePostings(col("postings")).as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(decoded("alpha") == Seq(10L, 35L))
    assert(decoded("gamma") == Seq(10L, 20L, 35L))
  }

  test("searchBm25 with an untruncated cap equals full-corpus bm25") {
    import graft.operators.TrainPrep
    val corpus = Seq(
      (1L, "vector merge stream vector"),
      (2L, "stream stream other words here"),
      (3L, "nothing relevant at all"),
      (4L, "vector vector vector merge merge stream"))
      .toDF("doc_id", "text")
    val terms = Seq("vector", "stream", "merge")
    val full = TrainPrep.bm25(corpus, "doc_id", "text", terms, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(r.length - 1))).toSeq
    val served = InvertedIndex.searchBm25(corpus, "doc_id", "text", terms,
        k = 3, cap = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(r.length - 1))).toSeq
    assert(served == full) // same docs, same order, bit-equal scores
  }

  test("searchBm25 cap truncates the candidate set deterministically") {
    val corpus = (1L to 30L).map(i => (i, "vector filler")).toDF("doc_id", "text")
    val out = InvertedIndex.searchBm25(corpus, "doc_id", "text",
        Seq("vector"), k = 30, cap = 5)
      .select("id").as[Long].collect().toSet
    assert(out == (1L to 5L).toSet) // smallest ids survive the cap
  }

  test("served search from the persisted index == self-contained search") {
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.catalog.Tables.load(spark, dir, "documents")
    val terms = Seq("vector", "stream", "merge")
    val full = InvertedIndex.searchBm25(corpus, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(r.length - 1))).toSeq
    val served = InvertedIndex.searchBm25Served(spark, dir, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(r.length - 1))).toSeq
    assert(served == full)
    // second ensure serves from disk: the completeness artifact is not rewritten
    val statsFile = java.nio.file.Paths.get(
      InvertedIndex.ensureIndex(spark, dir), "stats.parquet", "_SUCCESS")
    val before = java.nio.file.Files.getLastModifiedTime(statsFile)
    InvertedIndex.ensureIndex(spark, dir)
    assert(java.nio.file.Files.getLastModifiedTime(statsFile) == before)
  }

  test("the cap is planned as WindowGroupLimit (bounded reducer state)") {
    val plan = InvertedIndex.build(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank cap must push below the exchange:\n$plan")
  }

  test("pair table follows a mutating corpus via the change feed") {
    import graft.catalog.Snapshots
    val root = java.nio.file.Files.createTempDirectory("invidx_cdf").toString
    val corpusDir = s"$root/corpus"
    val indexDir = s"$root/index"
    val v1 = Seq(
      (1L, "alpha beta", "0"), (2L, "beta gamma", "0"), (3L, "gamma delta", "1"))
      .toDF("doc_id", "text", "part")
    Snapshots.init(spark, corpusDir, v1, Some("part"))
    InvertedIndex.initPairsTable(spark, indexDir, v1, "doc_id", "text")
    // corpus mutation: doc 2's text changes, doc 3 is erased
    Snapshots.upsert(spark, corpusDir,
      Seq((2L, "beta epsilon", "0")).toDF("doc_id", "text", "part"), Seq("doc_id"))
    Snapshots.delete(spark, corpusDir,
      Seq((3L, "1")).toDF("doc_id", "part"), Seq("doc_id"))
    val feed = Snapshots.diff(spark, corpusDir, 1, Snapshots.currentVersion(spark, corpusDir))
    InvertedIndex.maintainPairs(spark, indexDir, feed, "doc_id", "text")
    // the maintained index equals a from-scratch index of the mutated corpus
    val got = InvertedIndex.pairsPostings(spark, indexDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSet
    val want = Set(
      ("alpha", 1L, Seq(1L)), ("beta", 2L, Seq(1L, 2L)), ("epsilon", 1L, Seq(2L)))
    assert(got == want, s"maintained index diverged: $got")
    // time travel: the pre-mutation index is still servable
    val old = InvertedIndex.pairsPostings(spark, indexDir, Some(1))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(old("gamma") == 2L && old("delta") == 1L)
  }
}
