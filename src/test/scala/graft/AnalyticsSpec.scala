package graft

import org.apache.spark.sql.functions._
import graft.operators.Advisor
import graft.queries.{Analytics, Relational}

/** Model checks for the time-series/analytics families (q192-q200):
  * each statistic pinned on a tiny hand-computable series, plus the
  * Advisor rule-chain on synthetic inputs. (The DuckDB oracle gates the
  * full queries; these pin the MATH on inputs where the closed form is
  * known exactly.) */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    (Relational.defs ++ Analytics.defs).toMap.apply(name)

  test("q192 OLS on the real tables recovers an exact line when y = a + b*x") {
    // synthetic exact check of the same formula the query compiles:
    // y = 3x + 7 over x = 1..10 → slope 3, intercept 7, r2 = 1
    val df = (1L to 10L).map(x => (x, 3 * x + 7)).toDF("x", "y")
    val sums = df.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy")).head()
    val (n, sx, sy, sxy, sxx, syy) = (sums.getLong(0), sums.getLong(1),
      sums.getLong(2), sums.getLong(3), sums.getLong(4), sums.getLong(5))
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    val r2 = (n * sxy - sx * sy).toDouble * (n * sxy - sx * sy).toDouble /
      ((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(slope == 3.0 && icept == 7.0 && r2 == 1.0)
  }

  test("q194 CUSUM argmax lands on a planted level shift") {
    // series: 10 days at 0, then 10 days at 100 — |cusum| peaks at the
    // boundary day (k=10): n*prefix - k*S = 20*0 - 10*1000 = -10000.
    val y = Seq.fill(10)(0L) ++ Seq.fill(10)(100L)
    val n = y.size
    val tot = y.sum
    val cusums = y.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
      case (prefix, i) => (i + 1, n * prefix - (i + 1).toLong * tot)
    }
    val best = cusums.minBy { case (k, c) => (-math.abs(c), k) }
    assert(best == ((10, -10000L)))
  }

  test("q195 dyadic EWMA of a constant series is exactly the constant * (1 - 2^-16)") {
    // weights sum to 2^15+...+2^0 = 2^16 - 1; num = c*(2^16-1), /65536.
    val c = 7L
    val num = (0 until 16).map(j => c * (1L << (15 - j))).sum
    assert(num == c * 65535)
    assert(num.toDouble / 65536.0 == 7.0 * 65535 / 65536)
  }

  test("Advisor.keyProfile counts rows, keys, and hottest frequency") {
    val df = Seq("a", "a", "a", "b", "c").toDF("k")
    val r = Advisor.keyProfile(df, col("k")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 3L, 3L)))
  }

  test("Advisor rule chain: broadcast beats skew beats sort-merge") {
    val small = (1 to 10).map(i => s"k$i").toDF("k")
    val big = (1 to 2000).map(i => s"k${i % 100}").toDF("k")
    val skewed = (Seq.fill(1000)("hot") ++ (1 to 1000).map(i => s"u$i")).toDF("k")

    val v1 = Advisor.advise("j1", small, col("k"), big, col("k"),
      broadcastRows = 100L).select("strategy").head().getString(0)
    assert(v1 == "broadcast_left")

    // both sides over the broadcast budget, hot key >5% of its side
    val v2 = Advisor.advise("j2", skewed, col("k"), big, col("k"),
      broadcastRows = 500L).select("strategy").head().getString(0)
    assert(v2 == "shuffle_salted")

    // uniform keys, over budget → sort_merge
    val v3 = Advisor.advise("j3", big, col("k"), big, col("k"),
      broadcastRows = 500L).select("strategy").head().getString(0)
    assert(v3 == "sort_merge")
  }

  test("Advisor.fkScore: true FK edge, reversed decoy, and non-unique parent") {
    val parent = Seq(1, 2, 3, 4).toDF("pk")
    val child = Seq(1, 1, 2, 3).toDF("ck")
    // true FK: every child key in parent, parent keys unique
    val r1 = Advisor.fkScore("ok", child, col("ck"), parent, col("pk")).head()
    assert(r1.getAs[Long]("n_child_keys") == 3L)
    assert(r1.getAs[Long]("n_contained") == 3L)
    assert(r1.getAs[Double]("containment") == 1.0)
    assert(r1.getAs[Boolean]("is_fk"))
    // reversed direction: parent has key 4 that child lacks → containment < 1
    val r2 = Advisor.fkScore("rev", parent, col("pk"), child, col("ck")).head()
    assert(r2.getAs[Double]("containment") == 0.75)
    assert(!r2.getAs[Boolean]("is_fk"))
    // duplicate parent keys: containment 1 but parent not unique → not FK
    val dupParent = Seq(1, 1, 2, 3).toDF("pk")
    val r3 = Advisor.fkScore("dup", child, col("ck"), dupParent, col("pk")).head()
    assert(r3.getAs[Double]("containment") == 1.0)
    assert(!r3.getAs[Boolean]("is_fk"))
    // nulls on either side are ignored, not counted as keys
    val nullChild = Seq[Option[Int]](Some(1), None, Some(2)).toDF("ck")
    val r4 = Advisor.fkScore("nulls", nullChild, col("ck"), parent, col("pk")).head()
    assert(r4.getAs[Long]("n_child_keys") == 2L)
    assert(r4.getAs[Boolean]("is_fk"))
  }

  test("Advisor.zonePrune classifies pruned/full/partial zones exactly") {
    // 3 zones of 2 rows: values (1,2) (5,6) (9,10); predicate [4, 7]
    //   zone0 max 2 < 4  → pruned;  zone1 in [4,7] → full;  zone2 min 9 > 7 → pruned
    val df = Seq((0, 1), (0, 2), (1, 5), (1, 6), (2, 9), (2, 10)).toDF("z", "v")
    val r = Advisor.zonePrune("t", df, col("z"), col("v"), lit(4), lit(7)).head()
    assert(r.getAs[Long]("n_zones") == 3L)
    assert(r.getAs[Long]("zones_pruned") == 2L)
    assert(r.getAs[Long]("zones_full") == 1L)
    assert(r.getAs[Long]("zones_partial") == 0L)
    assert(r.getAs[Long]("rows_skipped") == 4L)
    assert(r.getAs[Double]("skip_fraction") == 4.0 / 6.0)
    // straddling predicate [2, 5]: zone0 partial, zone1 partial, zone2 pruned
    val r2 = Advisor.zonePrune("t", df, col("z"), col("v"), lit(2), lit(5)).head()
    assert(r2.getAs[Long]("zones_pruned") == 1L)
    assert(r2.getAs[Long]("zones_full") == 0L)
    assert(r2.getAs[Long]("zones_partial") == 2L)
  }

  test("q238 normal equations recover an exact plane y = 5 + 2*x1 - 3*x2") {
    // the Cramer tree the query compiles, on integer-exact inputs whose
    // residual is zero — the recovered coefficients must be bit-exact
    val rows = for (a <- 0 to 4; b <- 0 to 4)
      yield (a.toLong, b.toLong, 5L + 2 * a - 3 * b)
    val df = rows.toDF("x1", "x2", "y")
    val s = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum($"x1").cast("double").as("sx1"), sum($"x2").cast("double").as("sx2"),
      sum($"y").cast("double").as("sy"),
      sum($"x1" * $"x1").cast("double").as("sx11"),
      sum($"x1" * $"x2").cast("double").as("sx12"),
      sum($"x2" * $"x2").cast("double").as("sx22"),
      sum($"x1" * $"y").cast("double").as("sx1y"),
      sum($"x2" * $"y").cast("double").as("sx2y")).head()
    def g(i: Int) = s.getDouble(i)
    val (n, sx1, sx2, sy, sx11, sx12, sx22, sx1y, sx2y) =
      (g(0), g(1), g(2), g(3), g(4), g(5), g(6), g(7), g(8))
    val det = n * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) +
      sx2 * (sx1 * sx12 - sx11 * sx2)
    val det0 = sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y) +
      sx2 * (sx1y * sx12 - sx11 * sx2y)
    val det1 = n * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2) +
      sx2 * (sx1 * sx2y - sx1y * sx2)
    val det2 = n * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2) +
      sy * (sx1 * sx12 - sx11 * sx2)
    assert(det0 / det == 5.0 && det1 / det == 2.0 && det2 / det == -3.0)
  }

  test("q241 boilerplate covered positions union overlapping gram spans") {
    // two docs share the 4-token run "a b c d" → trigrams "a b c" and
    // "b c d" are both boilerplate; their spans overlap on positions
    // 1-2, so covered per doc = 5 (union of [0,2] and [1,3] is 4
    // tokens... plus doc-specific tail positions are NOT covered)
    val docs = Seq(
      (1L, "s", "a b c d x"), // positions 0..4; covered 0..3
      (2L, "s", "a b c d y")) // covered 0..3
      .toDF("doc_id", "source", "text")
    val toks = docs.select($"doc_id", $"source",
      graft.functions.TextAnalysis.tokens($"text").as("toks"))
    val grams = toks.filter(size($"toks") >= 3)
      .select($"doc_id", $"source", posexplode(expr(
        "transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))")))
      .withColumnRenamed("col", "gram")
    val boiler = grams.groupBy("source", "gram")
      .agg(countDistinct($"doc_id").as("df")).filter($"df" >= 2)
    assert(boiler.select("gram").as[String].collect().toSet == Set("a b c", "b c d"))
    val covered = grams.join(boiler.select("source", "gram"), Seq("source", "gram"))
      .select($"source", $"doc_id", explode(sequence($"pos", $"pos" + 2)).as("j"))
      .distinct()
    // per doc: positions {0,1,2} ∪ {1,2,3} = {0,1,2,3} → 4 each, 8 total
    assert(covered.count() == 8L)
  }

  test("q240 snapshot tiebreak: equal ts resolves by highest event_id") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.5),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 9.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    val top = ev.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(top.select("value").as[Double].head() == 9.5)
  }

  test("q199 fence positions: ((n-1)*k) div 8 + 1 is monotone and in range") {
    for (n <- Seq(1L, 2L, 7L, 8L, 9L, 1000L)) {
      val pos = (1 to 7).map(k => (n - 1) * k / 8 + 1)
      assert(pos.head >= 1 && pos.last <= n && pos == pos.sorted)
    }
  }

  test("streamed trend monitor: rollup-maintained daily counts fold to the batch trend") {
    // The q192 power sums are additive, so a Rollup maintaining
    // (event_type, day) → n from a stream feeds trendStats directly;
    // the streamed trend must equal the batch trend over the same data.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("trend_ckpt").toString
    val path = java.nio.file.Files.createTempDirectory("trend").toString + "/daily"
    val mem = MemoryStream[(String, String)]
    val q = graft.streaming.EventStreams.maintainRollup(
      mem.toDF().toDF("day", "event_type"), path, ckpt,
      Seq("event_type", "day"), Seq("n" -> count(lit(1))))
    val rows = Seq(
      ("2024-01-01", "view"), ("2024-01-01", "view"), ("2024-01-02", "view"),
      ("2024-01-02", "view"), ("2024-01-02", "view"), ("2024-01-03", "view"),
      ("2024-01-01", "click"), ("2024-01-03", "click"), ("2024-01-03", "click"))
    mem.addData(rows.take(4): _*); q.processAllAvailable()
    mem.addData(rows.drop(4): _*); q.processAllAvailable()
    q.stop()

    def withX(df: org.apache.spark.sql.DataFrame) = df.select(col("event_type"),
      datediff(to_date(col("day")), lit("1970-01-01").cast("date"))
        .cast("long").as("x"), col("n").cast("long").as("y"))
    val streamed = Analytics.trendStats(
        withX(graft.catalog.Rollup.read(spark, path, Seq("event_type", "day"), Seq("n"))),
        "event_type")
      .orderBy("event_type").collect().toSeq
    val batch = Analytics.trendStats(
        withX(rows.toDF("day", "event_type").groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"))),
        "event_type")
      .orderBy("event_type").collect().toSeq
    assert(streamed == batch)
    // and the planted series' trends are the hand-computed exact values:
    // view: days (0,1,2 rel) counts (2,3,1) → slope = -1/2
    val view = streamed.find(_.getString(0) == "view").get
    assert(view.getDouble(2) == -0.5)
  }

  test("Mann-Whitney doubled midranks: hand-computed U on a tied sample") {
    // groups A={1,2,2}, B={2,3}: sorted 1,2,2,2,3 — midrank(1)=1,
    // midrank(2)=3 (ranks 2,3,4), midrank(3)=5.
    // R_A = 1+3+3 = 7 → 2R_A = 14; 2U_A = 2·n1·n2 + n1(n1+1) − 2R_A
    //     = 12 + 12 − 14 = 10 → U_A = 5.
    val vals = Seq((1L, true), (2L, true), (2L, true), (2L, false), (3L, false))
    val byV = vals.groupBy(_._1).toSeq.sortBy(_._1)
    var cb = 0L; var r1x2 = 0L
    for ((_, vs) <- byV) {
      val c1 = vs.count(_._2).toLong; val m = vs.size.toLong
      r1x2 += c1 * (2 * cb + m + 1); cb += m
    }
    val n1 = 3L; val n2 = 2L
    val u1x2 = 2 * n1 * n2 + n1 * (n1 + 1) - r1x2
    assert(r1x2 == 14 && u1x2 == 10)
  }

  test("KS cross-multiplied CDFs: disjoint samples give D = 1") {
    // A = {1,2}, B = {10,20}: at value 2, F1=1, F2=0 → |cum1·n2−cum2·n1| = 2·2−0 = 4 = n1·n2
    val a = Seq(1L, 2L); val b = Seq(10L, 20L)
    val vals = (a.map(_ -> true) ++ b.map(_ -> false)).sortBy(_._1)
    var c1 = 0L; var c2 = 0L
    val dnum = vals.map { case (_, g1) =>
      if (g1) c1 += 1 else c2 += 1
      math.abs(c1 * b.size - c2 * a.size)
    }.max
    assert(dnum == a.size.toLong * b.size && dnum.toDouble / (a.size * b.size) == 1.0)
  }

  test("weighted median fence: smallest value with 2·cumweight ≥ W") {
    // values (v, w): (10,1),(20,1),(30,5) → W=7, fence at 30 (cum 7·2 ≥ 7)
    val vc = Seq((10L, 1L), (20L, 1L), (30L, 5L))
    val tot = vc.map(_._2).sum
    var cum = 0L
    val med = vc.collectFirst { case (v, w) if { cum += w; cum * 2 >= tot } => v }
    assert(med.contains(30L))
  }

  test("Pareto crossing arithmetic: planted 80/20 shape") {
    // 2 users with 40 events each, 8 users with 2.5.. use ints: 8 users × 3
    // total = 80 + 24 = 104; target = ceil(0.8·104) = (416+4)/5 = 84
    // desc classes: (40, 2 users, vol 80) cum 80 < 84;
    // (3, 8 users, vol 24) cum 104 ≥ 84 → extra = ceil((84-80)/3) = 2 → 4 users
    val classes = Seq((40L, 2L), (3L, 8L))
    val tv = classes.map { case (c, m) => c * m }.sum
    val target = (4 * tv + 4) / 5
    var cumu = 0L; var cumv = 0L
    val ans = classes.collectFirst { case (c, m) if {
      cumu += m; cumv += c * m; cumv >= target
    } => cumu - m + (target - (cumv - c * m) + c - 1) / c }
    assert(target == 84 && ans.contains(4L))
  }

  test("q225 trailing distinct equals the brute expanding scan") {
    val ev = Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (1L, "2024-01-05"),
      (3L, "2024-01-08"), (1L, "2024-01-09"), (2L, "2024-01-09"))
      .toDF("user_id", "day").select(col("user_id"), to_date(col("day")).as("day"))
    val got = ev.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("w"))
      .distinct()
      .join(broadcast(ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))),
        expr("w >= d0 AND w <= d1"))
      .groupBy("w").agg(countDistinct("user_id").as("n"))
      .orderBy("w").as[(java.sql.Date, Long)].collect()
      .map { case (d, n) => d.toString -> n }.toMap
    val days = (1 to 9).map(d => f"2024-01-0$d")
    val rows = ev.as[(Long, java.sql.Date)].collect()
    for (d <- days) {
      val end = java.time.LocalDate.parse(d)
      val brute = rows.filter { case (_, dd) =>
        val x = dd.toLocalDate
        !x.isAfter(end) && !x.isBefore(end.minusDays(6))
      }.map(_._1).distinct.length.toLong
      assert(got.getOrElse(d, 0L) == brute, s"day $d")
    }
  }

  test("q196 cumulative users: running sum of firsts equals expanding distinct") {
    val ev = Seq((1L, "2024-01-01"), (1L, "2024-01-02"), (2L, "2024-01-02"),
      (3L, "2024-01-03"), (1L, "2024-01-03"), (4L, "2024-01-03"))
      .toDF("user_id", "day")
    val firsts = ev.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").count().orderBy("day")
      .as[(String, Long)].collect()
    val cums = firsts.scanLeft(0L)(_ + _._2).tail
    // expanding-window distinct computed brute-force
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val brute = days.map(d => ev.filter(col("day") <= d)
      .select("user_id").distinct().count())
    assert(cums.toSeq == brute)
  }
}
