package graft

import org.apache.spark.sql.functions._
import graft.catalog.Tables

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val p = java.nio.file.Paths.get("spark-warehouse", name)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    dropTable("b_orders"); dropTable("b_items")
    val orders = (1L to 500L).map(k => (k, s"o$k")).toDF("k", "o")
    val items = (1L to 2000L).map(i => (i % 500 + 1, i.toDouble)).toDF("k", "v")
    Tables.saveBucketed(orders, "b_orders", 4, "k")
    Tables.saveBucketed(items, "b_items", 4, "k")

    val joined = spark.table("b_items").join(spark.table("b_orders"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")

    val n = joined.count()
    assert(n == 2000)

    // same join on unbucketed frames DOES shuffle (sanity of the assertion)
    val plain = items.join(orders, "k")
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange") ||
      plain.queryExecution.executedPlan.toString.contains("Broadcast"))
  }
}
