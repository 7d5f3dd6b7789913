package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.{Bfs, Gram, SetJoin}

/** Seeded randomized model checks for the round's new operators: each
  * case drives the distributed operator with random input and asserts
  * against a plain-Scala reference implementation (the Snapshots
  * model-check pattern). Deterministic seeds — failures replay. */
class NewOpsModelSpec extends SparkSpec {
  import spark.implicits._

  test("SetJoin.jaccardJoin == scala brute force over random set families") {
    val rnd = new Random(421)
    val universe = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (cse <- 1 to 12) {
      val nSets = 2 + rnd.nextInt(5)
      val sets = (1 to nSets).map { id =>
        id.toLong -> rnd.shuffle(universe).take(1 + rnd.nextInt(6)).toSet
      }.toMap
      val (tn, td) = Seq((1, 2), (2, 3), (4, 5))(rnd.nextInt(3))
      val el = sets.toSeq.flatMap { case (id, ts) => ts.map(id -> _) }
        .toDF("id", "tok")
      val got = SetJoin.jaccardJoin(el, tn, td)
        .select("a", "b", "inter").as[(Long, Long, Long)].collect().toSet
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size
        if inter * td >= tn * (sets(a) | sets(b)).size
      } yield (a, b, inter.toLong)).toSet
      assert(got == want, s"case $cse t=$tn/$td sets=$sets")
    }
  }

  test("Bfs.distances == scala BFS over random graphs") {
    val rnd = new Random(77)
    for (cse <- 1 to 6) {
      val n = 5 + rnd.nextInt(5)
      val edges = (for {
        a <- 1 to n; b <- (a + 1) to n if rnd.nextDouble() < 0.3
      } yield (a.toLong, b.toLong)).toVector
      val seeds = (1 to n).filter(_ => rnd.nextDouble() < 0.3)
        .map(_.toLong) match {
        case Seq() => Seq(1L)
        case s => s
      }
      val rounds = 3
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      var layer = seeds.toSet
      var reached = layer
      val expected = Seq.newBuilder[(Long, Long, Long)]
      expected += ((0L, layer.size.toLong, layer.fold(0L)(_ ^ _)))
      for (d <- 1 to rounds) {
        layer = layer.flatMap(u => adj.getOrElse(u, Set.empty)) -- reached
        reached ++= layer
        expected += ((d.toLong, layer.size.toLong, layer.fold(0L)(_ ^ _)))
      }
      val got = Bfs.distances(edges.toDF("a", "b"), seeds.toDF("u"), rounds)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == expected.result(), s"case $cse edges=$edges seeds=$seeds")
    }
  }

  test("Gram.gramUpper == naive X^T X over random int vectors") {
    val rnd = new Random(9)
    for (cse <- 1 to 8) {
      val d = 2 + rnd.nextInt(4)
      val n = 1 + rnd.nextInt(6)
      val vecs = Vector.fill(n)(Vector.fill(d)(rnd.nextInt(7) - 3L))
      val got = Gram.gramUpper(vecs.map(v => Tuple1(v)).toDF("qvec"), "qvec", d)
        .select("i", "j", "sxy", "n_vecs")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = (for {
        i <- 1 to d; j <- i to d
      } yield (i.toLong, j.toLong,
        vecs.map(v => v(i - 1) * v(j - 1)).sum, n.toLong)).toSet
      assert(got == want, s"case $cse d=$d n=$n vecs=$vecs")
    }
  }
}
