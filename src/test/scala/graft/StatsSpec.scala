package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly linear points: corr=1, exact slope and intercept") {
    val pts = Seq((1.0, 7.0), (2.0, 9.0), (3.0, 11.0), (4.0, 13.0))
      .map { case (x, y) => ("g", x, y) }
    val got = Stats.moments(pts.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .select(Seq(col("g")) ++ Stats.corrCols(): _*)
      .as[(String, Double, Double, Double)].head()
    assert(got == (("g", 1.0, 2.0, 5.0)))
  }

  test("matches Spark's built-in corr to float tolerance on real data") {
    val li = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ours = Stats.moments(li, Seq("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
      .select(Seq(col("l_returnflag")) ++ Stats.corrCols(): _*)
      .select("l_returnflag", "corr")
      .as[(String, Double)].collect().toMap
    val builtin = li.groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .as[(String, Double)].collect().toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-9, s"flag $k: $v vs builtin ${builtin(k)}")
    }
  }

  test("bit-identical under repartitioning (the property built-in corr lacks)") {
    val li = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.moments(df, Seq("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .select(Seq(col("l_returnflag")) ++ Stats.corrCols(): _*)
        .orderBy("l_returnflag")
        .as[(String, Double, Double, Double)].collect().toSeq
    assert(run(li) == run(li.repartition(17)))
  }

  test("moments are rollup counters: summed batch partials give the same corr") {
    // the incremental-maintenance claim: moment sums are additive, so a
    // Rollup carrying (n, sx, sy, sxx, syy, sxy) per batch folds to the
    // exact same statistic as a one-shot pass over everything
    val li = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val path = java.nio.file.Files.createTempDirectory("stats_roll").toString + "/m"
    val halves = Seq(
      "even" -> li.filter(col("l_orderkey") % 2 === 0),
      "odd" -> li.filter(col("l_orderkey") % 2 === 1))
    halves.foreach { case (id, b) =>
      val m = Stats.moments(b, Seq("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
      graft.catalog.Rollup.appendBatch(spark, m, path, id,
        Seq("l_returnflag"),
        Seq("n" -> sum(col("n")), "sx" -> sum(col("sx")), "sy" -> sum(col("sy")),
          "sxx" -> sum(col("sxx")), "syy" -> sum(col("syy")),
          "sxy" -> sum(col("sxy"))))
    }
    val folded = graft.catalog.Rollup.read(spark, path,
        Seq("l_returnflag"), Seq("n", "sx", "sy", "sxx", "syy", "sxy"))
      .select(Seq(col("l_returnflag")) ++ Stats.corrCols(): _*)
      .orderBy("l_returnflag")
      .as[(String, Double, Double, Double)].collect().toSeq
    val direct = Stats.moments(li, Seq("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
      .select(Seq(col("l_returnflag")) ++ Stats.corrCols(): _*)
      .orderBy("l_returnflag")
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(folded == direct, "folded moment partials diverged from the one-shot statistic")
  }

  test("skewness/kurtosis match Spark's built-ins to float tolerance") {
    val li = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ours = Stats.momentsHigher(li, Seq("l_returnflag"), col("l_extendedprice"))
      .select(Seq(col("l_returnflag")) ++ Stats.skewKurtCols(): _*)
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val builtin = li.groupBy("l_returnflag")
      .agg(skewness(col("l_extendedprice")).as("sk"),
        kurtosis(col("l_extendedprice")).as("ku"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    ours.foreach { case (k, (sk, ku)) =>
      assert(math.abs(sk - builtin(k)._1) < 1e-6, s"$k skew: $sk vs ${builtin(k)._1}")
      assert(math.abs(ku - builtin(k)._2) < 1e-6, s"$k kurt: $ku vs ${builtin(k)._2}")
    }
  }

  test("degenerate groups (zero variance) give NULL, matching DuckDB's x/0.0") {
    val pts = Seq(("one", 1.0, 1.0), ("flat", 2.0, 5.0), ("flat", 2.0, 7.0))
    val rows = Stats.moments(pts.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .select(Seq(col("g")) ++ Stats.corrCols(): _*)
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(rows("one") && rows("flat"), s"expected NULL corr for degenerate groups: $rows")
  }
}
