package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(2.5)),
    (2L, None, Some(1.0)),
    (3L, Some("b"), None),
    (4L, Some("a"), Some(7.25)))
    .toDF("id", "tag", "score")

  test("profile: nulls, distincts, extrema in one report; non-comparable extrema are null") {
    val rows = Profile.profile(df).collect().map(r =>
      r.getAs[String]("column_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct"),
          r.getAs[String]("min_s"), r.getAs[String]("max_s")))).toMap
    assert(rows("id") == ((4L, 0L, 4L, "1", "4")))
    assert(rows("tag") == ((4L, 1L, 2L, "a", "b")))
    // double column: counts reported, extrema excluded from the
    // comparable surface (engine-formatting-sensitive)
    assert(rows("score") == ((4L, 1L, 3L, null, null)))
  }

  test("profile: column subset and approx distinct mode") {
    val sub = Profile.profile(df, Seq("tag"), exact = false).collect()
    assert(sub.map(_.getAs[String]("column_name")).toSeq == Seq("tag"))
    val d = sub.head.getAs[Long]("n_distinct")
    assert(d >= 1 && d <= 3, s"HLL estimate of 2 distinct: $d")
  }

  test("profile: empty input reports zero rows, not a crash") {
    val empty = Seq.empty[(Long, String)].toDF("id", "tag")
    val rows = Profile.profile(empty).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getAs[Long]("n_rows") == 0L && r.getAs[Long]("n_distinct") == 0L))
  }
}
