package graft

import java.nio.file.{Files, Paths}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.ingest.{BatchExport, Ingest}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) = Files.createTempDirectory(prefix).toString

  test("CSV scan + key + label pop + float32 vector (S6, K1, P1, P2)") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(dir, "data.csv"),
      "f1,f2,f3,label\n1,2.5,3,0\n4,5.5,6,1\n7,8.5,9,0\n")
    val raw = Ingest.readCsv(spark, s"$dir/data.csv")
    val keyed = Ingest.withDenseKey(raw, Seq(col("f1")))
    val (inputs, labels) = Ingest.popLabel(keyed, "label")
    val vec = Ingest.toFeatureVector(inputs, Seq("f1", "f2", "f3"))
    val rows = vec.select("key", "features").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(rows.head._2.toSeq == Seq(1.0f, 2.5f, 3.0f))
    val lab = labels.orderBy("key").as[(Long, Int)].collect()
    assert(lab.map(_._2).toSeq == Seq(0, 1, 0))
  }

  test("JSON scan: list-of-dicts and {data_key: [...]} shapes (S7)") {
    val dir = tmpDir("json")
    Files.writeString(Paths.get(dir, "flat.json"),
      """[{"x": 1, "y": 2}, {"x": 3, "y": 4}]""")
    Files.writeString(Paths.get(dir, "wrapped.json"),
      """{"data": [{"x": 5, "y": 6}, {"x": 7, "y": 8}]}""")
    assert(Ingest.readJson(spark, s"$dir/flat.json").count() == 2)
    val w = Ingest.readJson(spark, s"$dir/wrapped.json", Some("data"))
    assert(w.columns.sorted.toSeq == Seq("x", "y"))
    assert(w.count() == 2)
  }

  test("scalable dense key: 1-based, dense, order-stable (K1 at scale)") {
    val df = spark.range(0, 1000).toDF("v").repartition(7)
    val keyed = Ingest.withScalableKey(df)
    val keys = keyed.select("key").as[Long].collect().sorted
    assert(keys.toSeq == (1L to 1000L))
    // alignment: key order follows partition order — within one partition,
    // keys are consecutive and track the partition-local row order
    val byPart = keyed.withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .select("pid", "key").as[(Int, Long)].collect().groupBy(_._1)
    byPart.values.foreach { rows =>
      val ks = rows.map(_._2)
      assert(ks.max - ks.min + 1 == ks.length, "keys within a partition must be consecutive")
    }
  }

  test("scalable dense key stays columnar: no RDD scan, broadcast offset join") {
    val keyed = Ingest.withScalableKey(spark.range(0, 100).toDF("v").repartition(4))
    val plan = keyed.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD detour in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"offset add must be a broadcast join:\n$plan")
  }

  test("image dir scan: label from path, sorted key order (S3)") {
    val dir = tmpDir("imgs")
    for (label <- Seq("cat", "dog"); i <- 1 to 2) {
      Files.createDirectories(Paths.get(dir, label))
      val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff0000)
      ImageIO.write(img, "png", Paths.get(dir, label, s"img$i.png").toFile)
    }
    val out = Ingest.readImageDir(spark, dir)
      .select("key", "slabel").as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq("cat", "cat", "dog", "dog"))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("n-stream image scan pivots aligned records (S4)") {
    val dir = tmpDir("mimo")
    for (stream <- Seq("rgb", "depth"); label <- Seq("a", "b"); i <- 1 to 2) {
      Files.createDirectories(Paths.get(dir, stream, label))
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      ImageIO.write(img, "png", Paths.get(dir, stream, label, s"f$i.png").toFile)
    }
    val wide = Ingest.readImageStreams(spark, dir)
    assert(wide.count() == 4) // 2 labels x 2 positions
    assert(wide.columns.contains("rgb") && wide.columns.contains("depth"))
    // aligned: same position index means same file rank in both streams
    val r = wide.selectExpr("slabel", "rgb.path", "depth.path").as[(String, String, String)]
      .collect()
    r.foreach { case (_, rgbPath, depthPath) =>
      assert(rgbPath.split("/").last == depthPath.split("/").last)
    }
  }

  test("n-stream scan truncates ragged streams to the shortest (S4 zip parity)") {
    // rgb has 3 files for label a, depth only 2: the reference's sorted
    // zip forms 2 records — the pivot must not emit a third with a NULL
    // depth struct
    val dir = tmpDir("mimo-ragged")
    for ((stream, n) <- Seq("rgb" -> 3, "depth" -> 2); i <- 1 to n) {
      Files.createDirectories(Paths.get(dir, stream, "a"))
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      ImageIO.write(img, "png", Paths.get(dir, stream, "a", s"f$i.png").toFile)
    }
    val wide = Ingest.readImageStreams(spark, dir)
    assert(wide.count() == 2)
    assert(wide.filter(col("rgb").isNull || col("depth").isNull).count() == 0)
  }

  test("binding-driven scan associates per-stream files by stem (S5)") {
    val dir = tmpDir("binding")
    for (stem <- Seq("x1", "x2", "y1")) {
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      ImageIO.write(img, "png", Paths.get(dir, s"$stem.png").toFile)
    }
    Files.writeString(Paths.get(dir, "bindings.csv"), "in0,out0\nx1,x2\ny1,x1\n")
    val binding = Ingest.readCsv(spark, s"$dir/bindings.csv")
    val out = Ingest.readWithBinding(spark, binding, Seq("in0", "out0"), dir, ".png")
    assert(out.count() == 2)
    val row = out.orderBy("key").selectExpr("key", "in0_path", "out0_path")
      .as[(Long, String, String)].collect()
    assert(row(0)._2.endsWith("x1.png") && row(0)._3.endsWith("x2.png"))
    assert(row(1)._2.endsWith("y1.png") && row(1)._3.endsWith("x1.png"))
  }

  test("binding-driven scan fails loudly on a dangling stem (S5)") {
    // the binding table is the record-count contract: a stem with no
    // matching file must raise, not silently shrink the dataset
    val dir = tmpDir("binding-dangle")
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    ImageIO.write(img, "png", Paths.get(dir, "x1.png").toFile)
    Files.writeString(Paths.get(dir, "bindings.csv"), "in0\nx1\nmissing\n")
    val binding = Ingest.readCsv(spark, s"$dir/bindings.csv")
    val out = Ingest.readWithBinding(spark, binding, Seq("in0"), dir, ".png")
    val e = intercept[Exception](out.count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("binding stem has no file")))
  }

  test("bag-of-words: distributed vocab table + sparse per-doc counts (P4)") {
    val df = Seq((1L, "spark makes big data small"), (2L, "big data big plans"),
        (3L, "")).toDF("key", "text")
    val (vocabDf, out) = Ingest.bagOfWords(df, "text")
    val vocab = vocabDf.orderBy("id").select("term").as[String].collect().toSeq
    assert(vocab == vocab.sorted) // lexicographic ids, sklearn semantics
    assert(vocab == Seq("big", "data", "makes", "plans", "small", "spark"))
    val ids = vocabDf.orderBy("id").select("id").as[Long].collect().toSeq
    assert(ids == (0L until vocab.size).toSeq) // dense 0-based
    val sparse = out.select("key", "bow")
      .as[(Long, Seq[(Long, Float)])].collect().toMap
    val bigIdx = vocab.indexOf("big").toLong
    assert(sparse(1L).toMap.apply(bigIdx) == 1.0f)
    assert(sparse(2L).toMap.apply(bigIdx) == 2.0f)
    assert(sparse(2L).map(_._1) == sparse(2L).map(_._1).sorted) // idx-sorted
    assert(sparse(3L).isEmpty) // token-less row → empty, not null
    // dense reconstruction matches the reference's per-doc vector layout
    val dense = Ingest.denseBow(out, "bow", vocab.size.toLong)
      .select("key", "bow_dense").as[(Long, Seq[Float])].collect().toMap
    assert(dense(1L) == Seq(1f, 1f, 1f, 0f, 1f, 1f))
    assert(dense(2L) == Seq(2f, 1f, 0f, 1f, 0f, 0f))
    assert(dense(3L) == Seq.fill(6)(0f))
    // scale gate: vocab ids come from the columnar two-pass key — the
    // broadcast offset join over the checkpoint-pinned layout, never a
    // single-partition window. (The checkpoint scans render as
    // ExistingRDD, so a blanket no-ExistingRDD assert does not apply
    // here; the Window absence is the single-partition gate.)
    val plan = vocabDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab offset add must be a broadcast join:\n$plan")
    assert(!plan.contains("Window"), s"single-partition window in vocab plan:\n$plan")
  }

  test("bag-of-words vocab ids stay dense beyond range-sampling scale") {
    // the q66 lesson applied to P4: range boundaries are re-sampled per
    // execution above the exhaustive-sampling size, so the two key
    // passes must read one pinned layout — 60k distinct terms would
    // yield duplicate/missing ids if the layouts decoupled
    val n = 60000
    val df = spark.range(n).selectExpr("id AS key",
      "concat('term', lpad(CAST(id AS STRING), 6, '0')) AS text")
    val (vocabDf, _) = Ingest.bagOfWords(df, "text")
    val ids = vocabDf.select("id")
    assert(ids.distinct().count() == n)
    val (mn, mx) = ids.agg(org.apache.spark.sql.functions.min("id"),
      org.apache.spark.sql.functions.max("id")).as[(Long, Long)].head()
    assert(mn == 0L && mx == n - 1L)
    // repeated actions on the SAME returned frame must see the same ids
    // (the checkpoint pin: a re-sampled layout would shuffle them)
    assert(ids.distinct().count() == n)
  }

  test("robust JSONL/CSV scans quarantine malformed lines, never fail the job") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("robust")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    java.nio.file.Files.write(dir.resolve("feed.jsonl"), java.util.List.of(
      """{"id": 1, "name": "a"}""",
      """{"id": 2, "name": "b"""", // torn line
      """{"id": 3, "name": "c"}""",
      """not json at all"""))
    val js = Ingest.readJsonlRobust(spark, dir.resolve("feed.jsonl").toString, schema)
    assert(js.good.count() == 2 && js.good.columns.toSeq == Seq("id", "name"))
    assert(js.bad.count() == 2)
    assert(js.bad.collect().map(_.getString(0)).exists(_.contains("not json at all")))
    js.release()

    java.nio.file.Files.write(dir.resolve("feed.csv"), java.util.List.of(
      "id,name", "1,a", "oops,b,extra,cols", "3,c"))
    val cs = Ingest.readCsvRobust(spark, dir.resolve("feed.csv").toString, schema)
    assert(cs.good.count() == 2)
    assert(cs.bad.count() == 1 && cs.bad.collect().head.getString(0).startsWith("oops"))
    cs.release()
  }

  test("batch export: remainder dropped, shapes from schema, epochs (D1-D3)") {
    val df = (1L to 23L).map(k => (k, Array.fill(4)(k.toFloat), k % 2))
      .toDF("key", "features", "label")
    val be = BatchExport(df, "key", Seq("features"), Seq("label"), batchSize = 5)
    assert(be.nSamples == 23 && be.nBatches == 4)
    assert(be.shapes("features") == Seq(4) && be.shapes("label") == Seq(1))
    val batches = be.epoch().toSeq
    assert(batches.size == 4)
    assert(batches.forall(_._1("features").size == 5))
    // numeric key order: first batch is keys 1..5
    assert(batches.head._2("label").size == 5)
    val twoEpochs = be.batches(epochs = 2).toSeq
    assert(twoEpochs.size == 8)
    // the epoch layout is pinned once: every epoch replays the SAME
    // batch membership and order (one sort, N linear scans — the
    // multi-epoch fit must not reshuffle 100 TB per epoch)
    val (e1, e2) = twoEpochs.splitAt(4)
    assert(e1.map(_._1("features").map(_.asInstanceOf[scala.collection.Seq[Float]].toList)) ==
      e2.map(_._1("features").map(_.asInstanceOf[scala.collection.Seq[Float]].toList)))
    // release must drop the checkpointed blocks PROMPTLY (Dataset
    // .unpersist is a no-op on a localCheckpoint — the fix unpersists
    // the backing RDD): the pinned RDD disappears from the context's
    // persistent-RDD registry, not just at some later driver GC
    val pinnedIds = spark.sparkContext.getPersistentRDDs.keySet
    be.release()
    val afterIds = spark.sparkContext.getPersistentRDDs.keySet
    assert((pinnedIds -- afterIds).nonEmpty,
      "release() did not unpersist the pinned epoch layout's RDD")
    // release is idempotent and the export remains usable (re-pins)
    be.release()
    assert(be.epoch().size == 4)
    // distributed integrity count of the pinned view (no driver drain)
    assert(be.epochRows == 20)
    be.release()
  }

  test("batch export spill mode: reliable layout, same batches, no per-epoch sort") {
    // spillDir writes the sorted layout ONCE to parquet and epochs read
    // the range-ordered part files sequentially — executor-loss-safe
    // (preemptible-cluster trade) with IDENTICAL batch semantics to the
    // localCheckpoint pin, and still one sort total
    val df = (1L to 23L).map(k => (k, Array.fill(4)(k.toFloat), k % 2))
      .toDF("key", "features", "label")
    val spill = java.nio.file.Files.createTempDirectory("graft-spill").toString
    val local = BatchExport(df, "key", Seq("features"), Seq("label"), batchSize = 5)
    val spilled = BatchExport(df, "key", Seq("features"), Seq("label"), batchSize = 5,
      spillDir = Some(spill))
    def labels(be: BatchExport) =
      be.epoch().map(_._2("label").map(String.valueOf).toList).toList
    assert(labels(spilled) == labels(local))
    assert(spilled.epochRows == 20)
    // the layout is real reliable storage: the parquet dir exists and a
    // second epoch replays the same membership from disk
    assert(new java.io.File(s"$spill/epoch-layout.parquet").exists())
    assert(labels(spilled) == labels(local))
    // one sort total: epochs in spill mode never re-sort — gate by
    // counting sort-bearing executions across two further epochs
    val sortQEs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = {
        val p = qe.executedPlan.toString
        if (p.contains("Sort ") || p.contains("TakeOrderedAndProject"))
          sortQEs.incrementAndGet()
        ()
      }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      spilled.epoch().size; spilled.epoch().size
      // listener dispatch is async; settle before asserting
      var last = -1; var stable = 0
      while (stable < 3) {
        val now = sortQEs.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
        Thread.sleep(100)
      }
      assert(sortQEs.get() == 0,
        s"spill-mode epochs must read part files linearly, saw ${sortQEs.get()} sorts")
    } finally spark.listenerManager.unregister(l)
    local.release(); spilled.release()
  }
}
