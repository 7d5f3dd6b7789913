package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 7}", i.toLong, i.toDouble)
  }.toDF("k", "id", "v")

  test("saltedSumCount is exact: matches the unsalted aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map { case (k, s, n) => k -> (s, n) }.toMap
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", col("id"), salts = 16)
      .as[(String, Double, Long)].collect().map { case (k, s, n) => k -> (s, n) }.toMap
    assert(salted == plain)
  }

  test("saltedJoin matches the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C"),
      ("k4", "D"), ("k5", "E"), ("k6", "F"), ("k0", "Z")).toDF("k", "name")
    val plain = skewed.join(dim, "k").agg(count(lit(1)), sum("v"))
      .as[(Long, Double)].collect().head
    val salted = Skew.saltedJoin(skewed, dim, "k", col("id"), salts = 8)
      .agg(count(lit(1)), sum("v")).as[(Long, Double)].collect().head
    assert(salted == plain)
  }
}
