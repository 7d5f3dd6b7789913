package graft

import org.apache.spark.sql.functions._
import graft.expressions.Kll

class KllSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: quantiles are order statistics under any partitioning") {
    val vals = (1 to 500).map(_.toDouble)
    def run(parts: Int) = {
      val df = vals.map(("g", _)).toDF("g", "v").repartition(parts)
      df.groupBy("g").agg(Kll.sketchAgg(col("v"), k = 800).as("sk"))
        .select(Kll.n(col("sk")), Kll.quantile(col("sk"), 0.25),
          Kll.quantile(col("sk"), 0.5), Kll.quantile(col("sk"), 0.99))
        .as[(Long, Double, Double, Double)].head()
    }
    // positions ceil(p*500): 125, 250, 495
    assert(run(1) == ((500L, 125.0, 250.0, 495.0)))
    assert(run(13) == ((500L, 125.0, 250.0, 495.0)))
  }

  test("unionAgg of per-batch sketches equals the one-shot sketch") {
    val df = (1 to 300).map(i => (i % 3, i.toDouble)).toDF("b", "v")
    val batches = df.groupBy("b").agg(Kll.sketchAgg(col("v"), 800).as("sk"))
    val fused = batches.agg(Kll.unionAgg(col("sk"), 800).as("sk"))
      .select(Kll.n(col("sk")), Kll.quantile(col("sk"), 0.5))
      .as[(Long, Double)].head()
    assert(fused == ((300L, 150.0)))
  }

  test("rollup counter: per-batch KLL sketches fold to exact quantiles") {
    val path = java.nio.file.Files.createTempDirectory("kll_roll").toString + "/r"
    val df = (1 to 400).map(i => (if (i % 2 == 0) "even" else "odd", i.toDouble))
      .toDF("g", "v")
    Seq("b1" -> df.filter(col("v") <= 200), "b2" -> df.filter(col("v") > 200))
      .foreach { case (id, b) =>
        val partial = b.groupBy("g").agg(Kll.sketchAgg(col("v"), 800).as("q_acct"))
        graft.catalog.Rollup.appendBatch(spark, partial, path, id, Seq("g"),
          Seq("q_acct" -> Kll.unionAgg(col("q_acct"), 800)))
      }
    val got = graft.catalog.Rollup.readAgg(spark, path, Seq("g"),
        Seq("q_acct" -> "kll_p50"))
      .orderBy("g").as[(String, Double)].collect().toSeq
    // evens: 2,4,..,400 -> p50 at pos 100 = 200; odds: 1,3,..,399 -> 199
    assert(got == Seq(("even", 200.0), ("odd", 199.0)))
    // compaction with the kll_union fold keeps the base mergeable
    graft.catalog.Rollup.compactAgg(spark, path, Seq("g"),
      Seq("q_acct" -> "kll_union"))
    val after = graft.catalog.Rollup.readAgg(spark, path, Seq("g"),
        Seq("q_acct" -> "kll_p50"))
      .orderBy("g").as[(String, Double)].collect().toSeq
    assert(after == got)
  }

  test("over capacity: rank error stays within the KLL bound") {
    // 100k uniform values through a k=200 sketch: normalized rank error
    // for k=200 is ~1.65/sqrt(200) ~ 1.2% (one-sided, 99% conf); assert
    // a loose 3% envelope at p50
    val n = 100000
    val df = (1 to n).map(i => ("g", i.toDouble)).toDF("g", "v").repartition(8)
    val p50 = df.groupBy("g").agg(Kll.sketchAgg(col("v"), 200).as("sk"))
      .select(Kll.quantile(col("sk"), 0.5)).as[Double].head()
    assert(math.abs(p50 / n - 0.5) < 0.03, s"p50=$p50")
  }

  test("streamed latency monitor: per-epoch KLL partials fold to batch truth") {
    // maintainRollup ∘ Kll.sketchAgg = streaming percentile monitoring
    // with NO stateful operator: each epoch appends its per-group sketch
    // partial; read unions them. KLL union is order-invariant, so in the
    // exact regime the streamed fold equals the one-shot batch quantile
    // BIT-FOR-BIT — no disorder caveat, unlike any chained-state twin.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("kll_ckpt").toString
    val path = java.nio.file.Files.createTempDirectory("kll_stream").toString + "/lat"
    val mem = MemoryStream[(String, Double)]
    val q = graft.streaming.EventStreams.maintainRollup(
      mem.toDF().toDF("et", "v"), path, ckpt, Seq("et"),
      Seq("lat" -> Kll.sketchAgg(col("v"), 800)))
    mem.addData(("a", 10.0), ("a", 30.0), ("b", 5.0))
    q.processAllAvailable()
    mem.addData(("a", 20.0), ("b", 15.0), ("b", 25.0))
    q.processAllAvailable()
    q.stop()
    val got = graft.catalog.Rollup.readAgg(spark, path, Seq("et"),
        Seq("lat" -> "kll_p50"))
      .orderBy("et").as[(String, Double)].collect().toSeq
    // a: {10,20,30} -> 20; b: {5,15,25} -> 15 (positions ceil(.5*3)=2)
    assert(got == Seq(("a", 20.0), ("b", 15.0)))
  }

  test("null inputs are skipped; empty sketch quantile is null") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(Kll.sketchAgg(col("v"), 800).as("sk"))
      .select(Kll.n(col("sk")), Kll.quantile(col("sk"), 0.5))
      .as[(Long, Double)].head()
    assert(got == ((2L, 1.0)))
    val empty = df.filter(col("v").isNull)
      .groupBy("g").agg(Kll.sketchAgg(col("v"), 800).as("sk"))
      .select(Kll.quantile(col("sk"), 0.5)).as[Option[Double]].head()
    assert(empty.isEmpty)
  }
}
