package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // 8 well-separated clusters of 64-dim vectors
  private def clustered = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8, 64)(rnd.nextFloat() * 10 - 5)
    (0L until 200L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.1f), (i % 8).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  test("IVF search: high recall vs brute force on clustered data, deterministic") {
    val n = Similarity.normed(clustered, "vec_id", "embedding")
    val model = Ivf.fit(n, k = 8)
    val q = n.filter(col("id") < 8)
    val brute = Similarity.bruteForceTopK(q, n, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.search(q, n, model, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")

    val ivf2 = Ivf.search(q, n, model, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf == ivf2)
  }

  test("persisted index: ensureIndex idempotent, searchAssigned over the inverted file matches search") {
    val n = Similarity.normed(clustered, "vec_id", "embedding")
    val key = "ivfspec-fixture"
    val cents = Ivf.ensureIndex(spark, key, n, k = 8, maxIter = 10)
    // second call must not re-fit: the by-name corpus would throw if forced
    val cents2 = Ivf.ensureIndex(spark, key,
      sys.error("ensureIndex re-fit an existing index"), k = 8, maxIter = 10)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)

    val corpus = Ivf.indexedCorpus(spark, key, k = 8, maxIter = 10)
    assert(corpus.count() == 200)
    assert(corpus.columns.contains("bucket"))

    val q = n.filter(col("id") < 8)
    val live = Ivf.search(q, n, cents, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val persisted = Ivf.searchAssigned(q, corpus, cents, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(live == persisted)
  }

  test("regenerating the corpus mid-JVM invalidates the in-memory memo too") {
    // the on-disk index is fingerprint-guarded; this gates the MEMO layer:
    // same JVM, same (corpusKey, k, iter, seed), but the source parquet is
    // regenerated between calls — the second ensureIndex must re-fit, not
    // serve centroids of data that no longer exists
    val tmp = java.nio.file.Files.createTempDirectory("ivf_stale").toString
    val key = s"$tmp/corpus"
    clustered.write.mode("overwrite").parquet(s"$key.parquet")
    val n1 = Similarity.normed(spark.read.parquet(s"$key.parquet"), "vec_id", "embedding")
    val cents1 = Ivf.ensureIndex(spark, key, n1, k = 8, maxIter = 10)
    // memo hit while the source is unchanged: by-name corpus never forced
    Ivf.ensureIndex(spark, key,
      sys.error("memo should have served the unchanged index"), k = 8, maxIter = 10)
    // regenerate the corpus at the same path (fewer rows -> new fingerprint)
    clustered.filter(col("vec_id") < 120).write.mode("overwrite").parquet(s"$key.parquet")
    var refit = false
    val n2 = Similarity.normed(spark.read.parquet(s"$key.parquet"), "vec_id", "embedding")
    val cents2 = Ivf.ensureIndex(spark, key, { refit = true; n2 }, k = 8, maxIter = 10)
    assert(refit, "ensureIndex served the stale memo after the corpus changed")
    assert(cents1.length == cents2.length)
    // and the rebuilt inverted file reflects the NEW corpus
    assert(Ivf.indexedCorpus(spark, key, k = 8, maxIter = 10).count() == 120)
  }

  test("bucket assignment covers the corpus and buckets are non-trivial") {
    val n = Similarity.normed(clustered, "vec_id", "embedding")
    val model = Ivf.fit(n, k = 8)
    val counts = Ivf.assign(n, model).groupBy("bucket").count()
      .as[(Int, Long)].collect().toMap
    assert(counts.values.sum == 200)
    assert(counts.size >= 4) // clusters actually split the space
  }

  test("inverted file follows vector churn via the change feed, centroids fixed") {
    val cents: Ivf.Centroids = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    def normedOf(rows: Seq[(Long, Array[Float])]) =
      Similarity.normed(rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf_cdf").toString + "/corpus"
    val v1 = Seq(
      (1L, Array(1f, 1f)), (2L, Array(2f, 1f)),
      (3L, Array(9f, 9f)), (4L, Array(8f, 9f)))
    Ivf.initCorpusTable(spark, dir, normedOf(v1), cents)
    // churn: vector 2 erased; vector 1 MOVES across the space (update);
    // vector 5 arrives near centroid 1
    val changes = normedOf(Seq((2L, Array(2f, 1f)), (1L, Array(1f, 1f))))
      .withColumn("_change", org.apache.spark.sql.functions.lit("delete"))
      .unionByName(normedOf(Seq((1L, Array(9f, 8f)), (5L, Array(10f, 9f))))
        .withColumn("_change", org.apache.spark.sql.functions.lit("insert")))
    Ivf.maintainCorpus(spark, dir, changes, cents)
    val got = graft.catalog.Snapshots.read(spark, dir)
      .select("id", "bucket").as[(Long, String)].collect().toMap
    // equals a from-scratch assignment of the post-churn corpus
    val want = Ivf.assignTo(normedOf(Seq(
        (1L, Array(9f, 8f)), (3L, Array(9f, 9f)),
        (4L, Array(8f, 9f)), (5L, Array(10f, 9f)))), cents)
      .select("id", "bucket").as[(Long, Int)].collect()
      .map { case (i, b) => i -> b.toString }.toMap
    assert(got == want, s"maintained inverted file diverged: $got vs $want")
    assert(got(1L) == "1") // the moved vector landed in its NEW bucket
  }
}
