package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random 64-dim vectors + one planted near-dup pair
  private def vecs = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1), i.toInt % 4)
    }
    val planted = rows(5)._2.clone()
    planted(0) = planted(0) + 0.001f
    (rows :+ ((40L, planted, 0))).toDF("vec_id", "embedding", "label")
  }

  test("brute-force top-k matches a driver-side computation") {
    val n = Similarity.normed(vecs, "vec_id", "embedding")
    val got = Similarity.bruteForceTopK(n.filter(col("id") === 0L), n, 3)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq.sortBy(_._1)

    val all = vecs.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]) = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val expected = all.filter(_._1 != 0L).toSeq
      .map { case (id, v) => (id, cos(all(0L), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
    assert(got.map(_._2) == expected)
  }

  test("ANN results are a subset of brute-force candidates ranked identically") {
    val n = Similarity.normed(vecs, "vec_id", "embedding")
    val q = n.filter(col("id") < 5)
    val brute = Similarity.bruteForceTopK(q, n, 40)
      .select("query_id", "neighbor_id", "cos").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val ann = Similarity.annTopK(q, n, 5)
      .select("query_id", "neighbor_id", "cos").as[(Long, Long, Double)].collect()
    assert(ann.nonEmpty)
    ann.foreach { case (qid, nid, c) =>
      assert(brute((qid, nid)) == c) // exact same cosine as the brute path
    }
  }

  test("nearDupByCosine finds the planted near-duplicate") {
    val n = Similarity.normed(vecs, "vec_id", "embedding")
    val pairs = Similarity.nearDupByCosine(n, 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((5L, 40L)))
  }

  test("sketch is deterministic and integer-quantized") {
    val n = Similarity.normed(vecs, "vec_id", "embedding")
    val s1 = Similarity.sketched(n).select("id", "sketch").as[(Long, Long)].collect().toMap
    val s2 = Similarity.sketched(n).select("id", "sketch").as[(Long, Long)].collect().toMap
    assert(s1 == s2)
    assert(s1.values.forall(v => v >= 0 && v < (1 << 16)))
    // planted near-dup shares the sketch with its source
    assert(s1(5L) == s1(40L))
  }

  test("quantizeInt8: range, reconstruction bound, zero vector, determinism") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-3.0f, 2.0f, 1.0f, -0.5f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("scale"),
          r.getAs[scala.collection.Seq[Long]]("qvec").toSeq))).toMap
    // extremum maps to ±127; everything inside [-127, 127]
    assert(q(1L)._2 == Seq(64L, -127L, 32L, 16L))
    assert(q.values.forall(_._2.forall(v => v >= -127 && v <= 127)))
    // zero vector: zeros with scale 0
    assert(q(2L) == ((0.0, Seq(0L, 0L, 0L, 0L))))
    // reconstruction: |q*scale - v| <= scale/2 + eps per element
    for ((id, (scale, qv)) <- q if scale > 0) {
      val orig = vecs.filter($"vec_id" === id).collect()
        .head.getAs[scala.collection.Seq[Float]]("embedding")
      qv.zip(orig).foreach { case (qi, vi) =>
        assert(math.abs(qi * scale - vi) <= scale / 2 + 1e-12,
          s"id=$id: $qi*$scale vs $vi")
      }
    }
    val again = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[scala.collection.Seq[Long]]("qvec").toSeq).toSet
    assert(again == q.values.map(_._2.toSeq).toSet)
  }

  test("semanticDedup removes the planted near-dup, keeps its smaller twin") {
    val n = Similarity.normed(vecs, "vec_id", "embedding")
    val kept = Similarity.semanticDedup(n, 0.9).as[Long].collect().toSet
    assert(kept.contains(5L))   // the original survives (smallest in pair)
    assert(!kept.contains(40L)) // the planted copy is dominated by 5
    // near-orthogonal random vectors are untouched at theta 0.9
    assert(kept.size == 40)
  }
}
