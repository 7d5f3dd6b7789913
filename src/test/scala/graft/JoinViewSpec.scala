package graft

import java.nio.file.Files
import scala.util.Random
import org.apache.spark.sql.functions._
import graft.catalog.JoinView

/** Model checks for the incremental join view: after every batch the
  * maintained view must equal a from-scratch join of everything
  * appended so far — including duplicate keys (per-key cross products)
  * and keys arriving on one side long before the other. Seeded
  * randomized schedules; failures replay. */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_jv").toString

  test("maintained view equals full recompute across a random batch schedule") {
    val rnd = new Random(1234)
    val root = freshRoot()
    var allA = Vector.empty[(Long, String)]
    var allB = Vector.empty[(Long, Long)]
    for (epoch <- 1 to 6) {
      val da = Vector.fill(rnd.nextInt(5))((rnd.nextInt(6).toLong, s"a$epoch-${rnd.nextInt(9)}"))
      val db = Vector.fill(rnd.nextInt(5))((rnd.nextInt(6).toLong, rnd.nextInt(100).toLong))
      allA ++= da; allB ++= db
      JoinView.appendBatch(spark, root, s"e$epoch",
        da.toDF("k", "av"), db.toDF("k", "bv"), Seq("k"))

      val got = JoinView.read(spark, root)
        .select("k", "av", "bv").as[(Long, String, Long)].collect().sorted.toSeq
      val want = (for {
        (ka, av) <- allA; (kb, bv) <- allB if ka == kb
      } yield (ka, av, bv)).sorted
      assert(got == want, s"epoch $epoch: view != brute join")

      val rec = JoinView.recompute(spark, root, Seq("k"))
        .select("k", "av", "bv").as[(Long, String, Long)].collect().sorted.toSeq
      assert(rec == want, s"epoch $epoch: recompute != brute join")
    }
  }

  test("replaying a crashed epoch is idempotent (same id, same delta)") {
    val root = freshRoot()
    JoinView.appendBatch(spark, root, "e1",
      Seq((1L, "x"), (2L, "y")).toDF("k", "av"),
      Seq((1L, 10L)).toDF("k", "bv"), Seq("k"))
    JoinView.appendBatch(spark, root, "e2",
      Seq((1L, "z")).toDF("k", "av"),
      Seq((2L, 20L), (1L, 30L)).toDF("k", "bv"), Seq("k"))
    val before = JoinView.read(spark, root)
      .select("k", "av", "bv").as[(Long, String, Long)].collect().sorted.toSeq
    // crash-replay epoch 2: identical inputs, identical id — the history
    // reads exclude e2's own partitions, so the delta recomputes equal
    JoinView.appendBatch(spark, root, "e2",
      Seq((1L, "z")).toDF("k", "av"),
      Seq((2L, 20L), (1L, 30L)).toDF("k", "bv"), Seq("k"))
    val after = JoinView.read(spark, root)
      .select("k", "av", "bv").as[(Long, String, Long)].collect().sorted.toSeq
    assert(after == before)
    // and the maintained rows are exactly the 2-batch brute join
    val a = Seq((1L, "x"), (2L, "y"), (1L, "z"))
    val b = Seq((1L, 10L), (2L, 20L), (1L, 30L))
    val want = (for { (ka, av) <- a; (kb, bv) <- b if ka == kb }
      yield (ka, av, bv)).sorted
    assert(after == want)
  }

  test("non-key column name clash fails fast") {
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      JoinView.appendBatch(spark, root, "e1",
        Seq((1L, "x")).toDF("k", "v"), Seq((1L, "y")).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("delta joins broadcast the delta side, never shuffle history") {
    val root = freshRoot()
    JoinView.appendBatch(spark, root, "e1",
      (1L to 50L).map(i => (i, s"a$i")).toDF("k", "av"),
      (1L to 50L).map(i => (i, i * 2)).toDF("k", "bv"), Seq("k"))
    // capture the plan of the epoch-2 delta as appendBatch builds it:
    // both delta-vs-history joins must be BroadcastHashJoin
    val da = Seq((7L, "new")).toDF("k", "av")
    val hist = spark.read.option("basePath", s"$root/b").parquet(s"$root/b")
      .filter(col("batch_id") =!= "e2").drop("batch_id")
    val plan = broadcast(da).join(hist, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"delta-vs-history join must broadcast the delta:\n$plan")
  }
}
