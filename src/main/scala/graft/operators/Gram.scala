package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-space Gram matrix over quantized embedding vectors — the
  * covariance/PCA preparation pass of an embedding pipeline (feature
  * whitening, dimensionality reduction, OPQ rotation fitting all start
  * from X^T X), computed exactly.
  *
  * Determinism: inputs are the int8-quantized vectors of
  * [[Similarity.quantizeInt8]] (q109's hash-gated chain), so every
  * product is a small-integer multiply and every sum is an integer add —
  * commutative and associative, bit-identical under ANY partition/merge
  * order. No IEEE accumulation anywhere.
  *
  * Scale design (100 TB): the classic explode-and-self-join spelling
  * shuffles n·d²/2 rows; this operator instead folds each partition's
  * vectors into ONE d(d+1)/2-long accumulator (mapPartitions — the
  * genuine per-partition imperative case: a running triangular array has
  * no Catalyst equivalent) and shuffles only numPartitions·d²/2 partial
  * cells to a tiny keyed merge. For d=64 that is 2,080 longs per
  * partition — kilobytes — regardless of how many billions of vectors
  * stream through. Overflow headroom: |q|≤127 ⇒ |x·y|≤16,129, so ~5.7e14
  * vectors fit a signed 64-bit cell.
  */
object Gram {

  /** Upper-triangle (1-based i ≤ j) exact Gram matrix of `vecCol`
    * (array<long>, every row length d). Columns: i, j, sxy, n_vecs. */
  def gramUpper(qvecs: DataFrame, vecCol: String, d: Int): DataFrame = {
    val s = qvecs.sparkSession
    import s.implicits._
    require(d >= 1)
    val cells = qvecs.select(col(vecCol).cast("array<long>").as("v"))
      .as[Seq[Long]]
      .mapPartitions { it =>
        val acc = new Array[Long](d * (d + 1) / 2)
        var seen = false
        it.foreach { v =>
          require(v.length == d, s"vector of dim ${v.length}, expected $d")
          seen = true
          val a = v.toArray
          var k = 0
          var i = 0
          while (i < d) {
            val xi = a(i)
            var j = i
            while (j < d) { acc(k) += xi * a(j); k += 1; j += 1 }
            i += 1
          }
        }
        if (!seen) Iterator.empty
        else Iterator.tabulate(acc.length) { k => k -> acc(k) }
      }
      .toDF("k", "s")
      .groupBy("k").agg(sum(col("s")).as("sxy"))
    // decode the triangular index k -> (i, j) once, on the merged cells
    val rowOf = udf { (k: Int) =>
      // i is the largest r with r*d - r*(r-1)/2 <= k
      var i = 0
      var base = 0
      while (base + (d - i) <= k) { base += d - i; i += 1 }
      (i + 1, i + 1 + (k - base))
    }
    val n = qvecs.agg(count(lit(1)).as("n_vecs"))
    cells.withColumn("ij", rowOf(col("k")))
      .select(col("ij._1").cast("long").as("i"),
        col("ij._2").cast("long").as("j"), col("sxy"))
      .crossJoin(broadcast(n))
  }
}
