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
