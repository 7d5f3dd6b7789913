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
}
