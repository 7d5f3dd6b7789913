package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.catalog.Mutate

class MutateSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_mutate").resolve("t.parquet").toString
    Seq(
      (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "a"),
      (4L, "four", "b"), (5L, "five", "b"),
      (6L, "six", "c"), (7L, "seven", "c"))
      .toDF("id", "v", "p")
      .write.partitionBy("p").parquet(dir)
    dir
  }

  private def readAll(dir: String): Set[(Long, String, String)] =
    spark.read.parquet(dir).select("id", "v", "p")
      .as[(Long, String, String)].collect().toSet

  private def partFiles(dir: String, part: String): Map[String, Long] = {
    val p = Paths.get(dir, part)
    import scala.jdk.CollectionConverters._
    Files.list(p).iterator().asScala
      .filter(f => !f.getFileName.toString.startsWith("_"))
      .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f).toMillis)
      .toMap
  }

  test("upsert replaces same-key rows, inserts new keys and new partitions") {
    val dir = freshTable()
    val updates = Seq(
      (2L, "TWO", "a"),      // update in place
      (8L, "eight", "b"),    // insert into existing partition
      (9L, "nine", "d"))     // insert creating a new partition
      .toDF("id", "v", "p")
    val res = Mutate.upsert(spark, dir, updates, Seq("id"), "p")
    assert(res.rewritten.toSet == Set("a", "b") && res.created == Seq("d"))
    assert(readAll(dir) == Set(
      (1L, "one", "a"), (2L, "TWO", "a"), (3L, "three", "a"),
      (4L, "four", "b"), (5L, "five", "b"), (8L, "eight", "b"),
      (6L, "six", "c"), (7L, "seven", "c"), (9L, "nine", "d")))
  }

  test("untouched partitions keep their exact files") {
    val dir = freshTable()
    val before = partFiles(dir, "p=c")
    Mutate.upsert(spark, dir, Seq((1L, "ONE", "a")).toDF("id", "v", "p"),
      Seq("id"), "p")
    assert(partFiles(dir, "p=c") == before) // same names, same mtimes
    assert(partFiles(dir, "p=b") == partFiles(dir, "p=b"))
  }

  test("the base scan is partition-pruned to the affected values") {
    val dir = freshTable()
    val pruned = Mutate.prunedBase(spark, dir, "p", Seq("a"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("a"))
    // behavioral proof: only partition a's files are opened
    val scanned = pruned.select(input_file_name()).distinct()
      .as[String].collect()
    assert(scanned.nonEmpty && scanned.forall(_.contains("p=a")))
  }

  test("delete removes matching keys; an emptied partition disappears") {
    val dir = freshTable()
    val res = Mutate.delete(spark, dir,
      Seq((6L, "c"), (7L, "c"), (4L, "b")).toDF("id", "p"), Seq("id"), "p")
    assert(res.rewritten.toSet == Set("b", "c"))
    assert(readAll(dir) == Set(
      (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "a"), (5L, "five", "b")))
    assert(!Files.exists(Paths.get(dir, "p=c")))
  }

  test("re-running the same upsert batch converges (idempotent retry)") {
    val dir = freshTable()
    val batch = Seq((2L, "TWO", "a"), (9L, "nine", "d")).toDF("id", "v", "p")
    Mutate.upsert(spark, dir, batch, Seq("id"), "p")
    val once = readAll(dir)
    Mutate.upsert(spark, dir, batch, Seq("id"), "p")
    assert(readAll(dir) == once)
  }

  test("a partition stranded mid-swap is restored before the next mutation") {
    val dir = freshTable()
    // simulate a crash between rename(live->old) and rename(staged->live)
    val old = Paths.get(dir + ".mutate.old")
    Files.createDirectories(old)
    Files.move(Paths.get(dir, "p=b"), old.resolve("p=b"))
    assert(!Files.exists(Paths.get(dir, "p=b")))
    Mutate.upsert(spark, dir, Seq((1L, "ONE", "a")).toDF("id", "v", "p"),
      Seq("id"), "p")
    assert(readAll(dir).contains((4L, "four", "b"))) // restored, then mutated
    assert(!Files.exists(old))
  }

  test("schema and partition-value contracts are enforced") {
    val dir = freshTable()
    intercept[IllegalArgumentException] {
      Mutate.upsert(spark, dir, Seq((1L, "a")).toDF("id", "p"), Seq("id"), "p")
    }
    intercept[IllegalArgumentException] {
      Mutate.upsert(spark, dir,
        Seq((1L, "x", "bad value")).toDF("id", "v", "p"), Seq("id"), "p")
    }
    intercept[IllegalArgumentException] {
      Mutate.delete(spark, dir, Seq(Tuple1(1L)).toDF("id"), Seq("id"), "p")
    }
  }
}
