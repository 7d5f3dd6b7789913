package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainPrep

class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "en", "alpha beta gamma delta epsilon zeta eta theta"),
    (1L, "en", "alpha alpha alpha beta"),
    (2L, "de", "one two three four five six seven eight nine ten"),
    (3L, "fr", "solo"),
    (4L, "en", "beta gamma " * 40)) // long doc: many chunks
    .toDF("doc_id", "lang", "text")

  // ---- shuffled ---------------------------------------------------------

  test("shuffled assigns a permutation of 0..n-1 and balanced round-robin shards") {
    val out = TrainPrep.shuffled(corpus, "doc_id", shards = 2).cache()
    val rows = out.select("doc_id", "pos", "shard").as[(Long, Long, Long)]
      .collect().sortBy(_._2)
    assert(rows.map(_._2).toSeq == (0L until 5L).toSeq) // dense positions
    assert(rows.map(_._1).toSet == (0L until 5L).toSet) // every doc placed once
    assert(rows.map(_._3).toSeq == Seq(0L, 1L, 0L, 1L, 0L)) // pos % shards
    // deterministic: same permutation on a GENUINE recompute — drop the
    // first call's internal layout cache first, or CacheManager serves
    // the identical cached blocks and the assertion compares a dataset
    // with itself
    val pinned = rows.map(r => r._1 -> r._2).toMap
    out.unpersist()
    spark.catalog.clearCache()
    val again = TrainPrep.shuffled(corpus, "doc_id", shards = 2)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(pinned == again)
  }

  test("shuffled positions stay a dense permutation beyond range-sampling scale") {
    // regression pin for the two-pass construction: repartitionByRange
    // re-samples its boundaries per execution (rdd.id-seeded), so WITHOUT
    // the cache pinning one layout, 200k rows produced ~193k distinct
    // positions (and max > n-1) with no guard firing — small fixtures
    // pass because sampling is exhaustive below ~10k rows
    import spark.implicits._
    val n = 200000L
    val big = spark.range(n).toDF("doc_id").repartition(4)
    val pos = TrainPrep.shuffled(big, "doc_id").select("pos").as[Long]
    assert(pos.distinct().count() == n)
    val (mn, mx) = pos.agg(min("pos"), max("pos")).as[(Long, Long)].head()
    assert(mn == 0L && mx == n - 1)
  }

  test("shuffled stays columnar: no RDD scan, broadcast offset join") {
    // the IngestSpec scalable-key gate extended over the shuffle operator:
    // positions must come from the two-pass DataFrame construction, never
    // an rdd.zipWithIndex detour that deserializes every row
    val plan = TrainPrep.shuffled(corpus, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD detour in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"offset add must be a broadcast join:\n$plan")
  }

  test("shuffled order is the hash order, not the id order") {
    val out = TrainPrep.shuffled(corpus, "doc_id").select("doc_id", "hkey", "pos")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq) // pos follows hkey
    assert(out.map(_._1).toSeq != (0L until 5L).toSeq) // md5 actually permuted
  }

  // ---- chunks -----------------------------------------------------------

  test("chunks tile every document with the configured window and stride") {
    val out = TrainPrep.chunks(corpus, "doc_id", "text", chunk = 4, stride = 3)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // doc 3 ("solo"): one short chunk
    assert(out(3L).map(c => (c._3, c._4, c._5)).toSeq == Seq((0L, 1L, "solo")))
    // doc 1 (4 tokens): starts at 0 and 3; trailing chunk short, never empty
    assert(out(1L).map(c => (c._3, c._4)).toSeq == Seq((0L, 4L), (3L, 1L)))
    assert(out(1L).map(_._5).toSeq == Seq("alpha alpha alpha beta", "beta"))
    // doc 4 (80 tokens): ceil(80/3)=27 chunks; all full except the tail
    assert(out(4L).size == 27)
    assert(out(4L).init.forall(_._4 == 4L) && out(4L).last._4 == 2L)
    // coverage: chunk starts advance by exactly stride
    assert(out(4L).map(_._3).toSeq == (0L until 27L).map(_ * 3).toSeq)
  }

  test("chunks drops token-less documents instead of emitting empty windows") {
    val df = Seq((0L, "!!! ???"), (1L, "word")).toDF("doc_id", "text")
    val out = TrainPrep.chunks(df, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  // ---- bm25 -------------------------------------------------------------

  test("bm25 matches a hand-computed score and ranks by term density") {
    // corpus: 3 docs, query = [alpha]; df(alpha) = 2, N = 3
    val df = Seq(
      (0L, "alpha beta gamma beta"), // tf 1, dl 4
      (1L, "alpha alpha alpha beta"), // tf 3, dl 4
      (2L, "beta gamma delta"))      // tf 0 -> filtered out
      .toDF("doc_id", "text")
    val out = TrainPrep.bm25(df, "doc_id", "text", Seq("alpha"), topK = 10)
      .select("doc_id", "score").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 0L)) // tf=3 outranks tf=1
    val avgdl = 11.0 / 3.0
    def w(tf: Double, dl: Double) =
      (3.0 - 2.0 + 0.5) / (2.0 + 0.5) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
    assert(out.toMap == Map(1L -> w(3, 4), 0L -> w(1, 4)))
  }

  test("bm25 rewards rare terms over common ones at equal tf") {
    // 'rare' appears in 1 of 4 docs, 'common' in all 4; doc 0 has both once
    val df = Seq(
      (0L, "rare common filler words here"),
      (1L, "common one two"),
      (2L, "common three four"),
      (3L, "common five six"))
      .toDF("doc_id", "text")
    val out = TrainPrep.bm25(df, "doc_id", "text", Seq("rare", "common"), topK = 10)
    val r = out.filter(col("doc_id") === 0L)
      .select("tf_rare", "tf_common").as[(Long, Long)].collect().head
    assert(r == ((1L, 1L)))
    // doc 0 must rank first: same tf_common as others plus the rare hit
    assert(out.select("doc_id").as[Long].collect().head == 0L)
  }

  // ---- uniformMixture ---------------------------------------------------

  test("uniformMixture keeps under-budget domains whole and downsamples heavy ones") {
    // lang token mass: en = 8 + 4 + 80 = 92, de = 10, fr = 1 -> total 103,
    // target = 103 div 3 = 34: de/fr keep everything (ppm = 1e6), en is
    // sampled at 34*1e6 div 92 ppm
    val out = TrainPrep.uniformMixture(corpus, "doc_id", "lang", "text").cache()
    val ppm = out.select("lang", "keep_ppm").distinct()
      .as[(String, Long)].collect().toMap
    assert(ppm.get("de").forall(_ == 1000000L))
    assert(ppm.get("fr").forall(_ == 1000000L))
    assert(ppm.getOrElse("en", 34L * 1000000L / 92L) == 34L * 1000000L / 92L)
    // de + fr fully present
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(Set(2L, 3L).subsetOf(kept))
    // deterministic draw
    val again = TrainPrep.uniformMixture(corpus, "doc_id", "lang", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == again)
  }

  // ---- writeShards / verifyShards --------------------------------------

  private def bigCorpus = (0L until 100L)
    .map(i => (i, s"doc $i body " + ("tok " * (i % 7).toInt)))
    .toDF("doc_id", "text")

  test("writeShards: contiguous equal shards, manifest matches data, read-back verifies") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = TrainPrep.writeShards(bigCorpus, "doc_id", "text", dir, docsPerShard = 32)
      .orderBy("shard").collect()
    assert(manifest.map(_.getAs[Long]("shard")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(manifest.map(_.getAs[Long]("n_docs")).toSeq == Seq(32L, 32L, 32L, 4L))
    // contiguous position slices, no overlap
    assert(manifest.map(r => (r.getAs[Long]("pos_min"), r.getAs[Long]("pos_max"))).toSeq ==
      Seq((0L, 31L), (32L, 63L), (64L, 95L), (96L, 99L)))
    // every doc lands exactly once; shard dirs are partition-pruned paths
    val data = spark.read.parquet(s"$dir/data")
    assert(data.count() == 100 &&
      data.select("doc_id").distinct().count() == 100)
    assert(new java.io.File(s"$dir/data/shard=0").isDirectory)
    val check = TrainPrep.verifyShards(spark, dir, "doc_id", "text")
    assert(check.count() == 4 && check.filter(!col("ok")).count() == 0)
    // deterministic export: rewriting yields the identical manifest
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val manifest2 = TrainPrep.writeShards(bigCorpus, "doc_id", "text", dir2, docsPerShard = 32)
      .orderBy("shard").collect()
    assert(manifest.map(_.toSeq).toSeq == manifest2.map(_.toSeq).toSeq)
  }

  test("verifyShards fails closed on a torn shard (missing data file)") {
    val dir = java.nio.file.Files.createTempDirectory("shards-torn").toString
    TrainPrep.writeShards(bigCorpus, "doc_id", "text", dir, docsPerShard = 32)
    // simulate a torn copy: drop one parquet part from one shard dir
    val shardDir = new java.io.File(s"$dir/data/shard=1")
    val part = shardDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(part.delete())
    val check = TrainPrep.verifyShards(spark, dir, "doc_id", "text")
    val bad = check.filter(!col("ok")).select("shard").as[Long].collect()
    assert(bad.toSeq == Seq(1L), s"only the torn shard flags: ${bad.toSeq}")
  }
}
