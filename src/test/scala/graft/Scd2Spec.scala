package graft

import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.Scd2

/** Model checks for SCD2 maintenance: a plain-Scala reference folds the
  * same randomized change schedules, and the distributed result must
  * match exactly — versions, interval bounds, no-op suppression,
  * point-in-time reads. Seeded; failures replay. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val empty: DataFrame =
    Seq.empty[(Long, String, Long, Option[Long])]
      .toDF("k", "attr", "valid_from", "valid_to")

  private def dimOf(rows: Seq[(Long, String, Long, Option[Long])]): DataFrame =
    rows.toDF("k", "attr", "valid_from", "valid_to")

  /** Reference: fold ordered (ts, attr) change events per key into SCD2
    * intervals with no-op suppression. */
  private def refFold(events: Map[Long, Seq[(Long, String)]])
  : Set[(Long, String, Long, Option[Long])] =
    events.flatMap { case (k, evs) =>
      val kept = evs.sortBy(_._1).foldLeft(Vector.empty[(Long, String)]) {
        case (acc, (ts, a)) =>
          if (acc.nonEmpty && acc.last._2 == a) acc else acc :+ ((ts, a))
      }
      kept.zipWithIndex.map { case ((ts, a), i) =>
        (k, a, ts, kept.lift(i + 1).map(_._1))
      }
    }.toSet

  test("randomized change schedules fold to the reference intervals") {
    val rnd = new Random(902)
    for (cse <- 1 to 8) {
      var events = Map.empty[Long, Seq[(Long, String)]].withDefaultValue(Seq.empty)
      var dim = empty
      var clock = 0L
      for (_ <- 1 to 4) {
        // one batch: unique (key, ts); some attrs repeat to test no-ops
        val batch = (1 to (1 + rnd.nextInt(6))).map { _ =>
          clock += 1 + rnd.nextInt(3)
          (rnd.nextInt(4).toLong, s"v${rnd.nextInt(3)}", clock)
        }
        batch.foreach { case (k, a, ts) => events += k -> (events(k) :+ ((ts, a))) }
        dim = Scd2.applyChanges(dim, batch.toDF("k", "attr", "ts"),
          Seq("k"), Seq("attr"))
      }
      val got = dim.select("k", "attr", "valid_from", "valid_to")
        .as[(Long, String, Long, Option[Long])].collect().toSet
      assert(got == refFold(events), s"case $cse")
    }
  }

  test("re-delivered unchanged snapshot cuts no new version") {
    val d1 = Scd2.applyChanges(empty,
      Seq((1L, "a", 10L)).toDF("k", "attr", "ts"), Seq("k"), Seq("attr"))
    val d2 = Scd2.applyChanges(d1,
      Seq((1L, "a", 20L)).toDF("k", "attr", "ts"), Seq("k"), Seq("attr"))
    val rows = d2.as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(rows == Seq((1L, "a", 10L, None)))
  }

  test("asOf returns each key's effective version; current returns open rows") {
    var dim = empty
    dim = Scd2.applyChanges(dim, Seq((1L, "a", 10L), (2L, "x", 15L))
      .toDF("k", "attr", "ts"), Seq("k"), Seq("attr"))
    dim = Scd2.applyChanges(dim, Seq((1L, "b", 20L))
      .toDF("k", "attr", "ts"), Seq("k"), Seq("attr"))
    val at12 = Scd2.asOf(dim, lit(12L), Seq("k"), Seq("attr"))
      .select("k", "attr").as[(Long, String)].collect().toSet
    assert(at12 == Set((1L, "a")))
    val at17 = Scd2.asOf(dim, lit(17L), Seq("k"), Seq("attr"))
      .select("k", "attr").as[(Long, String)].collect().toSet
    assert(at17 == Set((1L, "a"), (2L, "x")))
    val cur = Scd2.current(dim, Seq("k"), Seq("attr"))
      .select("k", "attr").as[(Long, String)].collect().toSet
    assert(cur == Set((1L, "b"), (2L, "x")))
  }

  test("a change predating its key's open valid_from fails fast") {
    val dim = dimOf(Seq((1L, "a", 5L, Some(10L)), (1L, "b", 10L, None)))
    val e = intercept[IllegalArgumentException] {
      Scd2.applyChanges(dim, Seq((1L, "c", 7L)).toDF("k", "attr", "ts"),
        Seq("k"), Seq("attr"))
    }
    assert(e.getMessage.contains("predate"))
  }

  test("closed history passes through untouched") {
    val dim = dimOf(Seq((1L, "a", 5L, Some(10L)), (1L, "b", 10L, None)))
    val out = Scd2.applyChanges(dim,
      Seq((1L, "c", 20L)).toDF("k", "attr", "ts"), Seq("k"), Seq("attr"))
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, "a", 5L, Some(10L)), (1L, "b", 10L, Some(20L)), (1L, "c", 20L, None)))
  }
}
