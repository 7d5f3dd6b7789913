package graft

import java.sql.Timestamp
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("banded range join equals the naive inequality join") {
    val rnd = new scala.util.Random(3)
    val lefts = (1 to 60).map(i => (i.toLong % 5, t(rnd.nextInt(20)), i.toLong))
      .toDF("k", "lt", "lid")
    val rights = (1 to 80).map(i => (i.toLong % 5, t(rnd.nextInt(23)), i.toLong + 1000))
      .toDF("k", "rt", "rid")

    val banded = RangeJoin.within(lefts, "k", "lt", rights, "k", "rt", 7200L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = lefts.join(rights, Seq("k"))
      .filter($"rt" >= $"lt" && $"rt".cast("long") <= $"lt".cast("long") + 7200L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive && banded.nonEmpty)
  }
}
