package graft

import graft.operators.Curate

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("curation drops low-quality, exact dups, and near-dups; keeps the rest") {
    val good = "the quick brown fox jumps over the lazy dog and runs far away today " * 3
    val near = good.replace("lazy", "sleepy")
    val corpus = Seq(
      (0L, good),
      (1L, good),                       // exact dup of 0 -> dropped (keep 0)
      (2L, near),                       // near dup of 0 -> dropped (greedy: b side)
      (3L, "@@ ## 12 %% !!"),           // low quality -> dropped
      (4L, "a completely different well formed document about the spark optimizer " +
        "and the shuffles it plans for large scale joins in the cluster today"))
      .toDF("doc_id", "text")

    val out = Curate.run(corpus, "doc_id", "text", minQuality = 0.5, theta = 0.5)
    val kept = out.curated.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 4L))
    val st = out.stats.as[(Long, Long, Long, Long)].collect().head
    assert(st == ((5L, 4L, 3L, 2L))) // input, after-quality, after-exact, final
  }
}
