package graft

import graft.operators.Prefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("prefixSum == the single-partition window truth on a seeded table") {
    val rnd = new scala.util.Random(7)
    // non-dense, non-contiguous keys with duplicated values and zeros
    val rows = rnd.shuffle((0 until 5000).toList)
      .map(i => (i.toLong * 3 + 17, rnd.nextInt(5).toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val got = Prefix.prefixSum(df, "k", "v", "cum", buckets = 16)
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("cum", sum($"v").over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("prefixSum handles negative keys, a single bucket, and decimal values") {
    val df = Seq((-5L, BigDecimal("1.25")), (-1L, BigDecimal("2.50")),
      (0L, BigDecimal("0.00")), (7L, BigDecimal("-3.75")))
      .toDF("k", "v").withColumn("v", $"v".cast("decimal(12,2)"))
    val got = Prefix.prefixSum(df, "k", "v", "cum", buckets = 1)
      .orderBy("k").select("cum").as[java.math.BigDecimal].collect().map(_.toString)
    assert(got.toSeq == Seq("1.25", "3.75", "3.75", "0.00"))
  }

  test("plan: the fact window is bucket-partitioned; only the B-row offset fold is global") {
    import org.apache.spark.sql.catalyst.plans.logical._
    val df = spark.range(0, 10000).select($"id".as("k"), lit(1L).as("v"))
    val out = Prefix.prefixSum(df, "k", "v", "cum", buckets = 32)
    // every unpartitioned ordered window must sit above an Aggregate (the
    // 32-row bucket-total fold), never directly over the fact rows
    def reachesLeafWithoutAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case l: LeafNode => true
      case other => other.children.exists(reachesLeafWithoutAggregate)
    }
    val bad = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty && reachesLeafWithoutAggregate(w.child) => w
    }
    assert(bad.isEmpty,
      s"unpartitioned window over un-aggregated rows:\n${out.queryExecution.optimizedPlan}")
  }
}
