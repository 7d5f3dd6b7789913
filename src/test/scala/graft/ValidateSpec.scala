package graft

import org.apache.spark.sql.functions._
import graft.operators.Validate

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 10.0),
    (2L, None, -5.0),
    (2L, Some("c"), 0.5),
    (4L, Some("zz"), 99.0)).toDF("id", "tag", "score")

  test("predicate violations count false AND null rows") {
    val rep = Validate.checks(df, Seq(
        "tag_complete" -> col("tag").isNotNull,
        "score_positive" -> (col("score") > 0.0),
        "tag_short" -> (length(col("tag")) <= 1)))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(rep("tag_complete") == ((1L, false)))
    assert(rep("score_positive") == ((1L, false)))
    // null tag -> null predicate -> violation, plus "zz"
    assert(rep("tag_short") == ((2L, false)))
  }

  test("uniqueness counts duplicate key tuples in the same scan") {
    val rep = Validate.checks(df, Seq("score_any" -> lit(true)),
        uniqueKeys = Seq("id_unique" -> Seq("id"), "id_tag_unique" -> Seq("id", "tag")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep("id_unique") == 1L)     // id=2 twice
    assert(rep("id_tag_unique") == 0L) // (2,null) vs (2,c) differ
    assert(rep("score_any") == 0L)
  }

  test("refIntegrity counts orphans, including null child keys") {
    val child = Seq(Some(1L), Some(2L), Some(7L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val rep = Validate.refIntegrity("fk_check", child, Seq("fk"), parent, Seq("pk"))
      .collect().head
    assert(rep.getString(0) == "fk_check" && rep.getLong(1) == 4L &&
      rep.getLong(2) == 2L && !rep.getBoolean(3))
  }

  test("all-green table passes every check") {
    val clean = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val rep = Validate.checks(clean,
        Seq("tag_complete" -> col("tag").isNotNull),
        uniqueKeys = Seq("id_unique" -> Seq("id")))
      .collect()
    assert(rep.forall(_.getBoolean(3)))
  }

  test("schemaDrift reports added/removed/retyped columns and null-rate drift") {
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0), (4L, "w", 4.0))
      .toDF("id", "tag", "v")
    val b = Seq((1L, 5, Some("n")), (2L, 6, None), (3L, 7, None), (4L, 8, None))
      .toDF("id", "v", "extra") // v retyped double→int, tag removed, extra added
    val drift = Validate.schemaDrift(a, b, nullTolNum = 1, nullTolDen = 2)
      .as[(String, String, String, String)].collect().toSet
    assert(drift.contains(("extra", "added", "", "STRING")))
    assert(drift.contains(("tag", "removed", "STRING", "")))
    assert(drift.exists { case (c, d, _, _) => c == "v" && d == "retyped" })
    // extra: 3/4 null in b vs absent in a — not a common column, no rate row;
    // id: 0 nulls both sides — within the 50% tolerance
    assert(!drift.exists(_._2 == "null_rate_drift"))
    // tighten tolerance on a genuinely drifting column
    val a2 = Seq(Some(1L), Some(2L), Some(3L), Some(4L)).toDF("k")
    val b2 = Seq(Some(1L), None, None, None).toDF("k")
    val d2 = Validate.schemaDrift(a2, b2, nullTolNum = 1, nullTolDen = 10)
      .as[(String, String, String, String)].collect().toSeq
    assert(d2 == Seq(("k", "null_rate_drift", "0/4", "3/4")))
    // identical tables: empty report
    assert(Validate.schemaDrift(a, a).count() == 0)
  }
}
