package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns: brute-force cosine top-k
  * (the correctness baseline) and sign-random-projection (SRP) LSH
  * (random-hyperplane rounding, Charikar STOC 2002; Goemans-Williamson)
  * bucketed search (the scale path), plus cosine near-dup pairing.
  *
  * Scale design (100 TB):
  *  - Sketches are pure per-row expressions — computed inside the scan
  *    stage, no shuffle. The SRP hyperplane sign matrix is a plan-time
  *    literal (16×64 ints), not per-row hashing.
  *  - Brute-force top-k broadcasts the (small) query set against the
  *    corpus: one map-side pass + a per-query top-k, no corpus shuffle.
  *  - LSH search shuffles only (band, key) buckets; candidate volume per
  *    query is ~corpus × P(8-bit band match) instead of the full corpus.
  *
  * Determinism (oracle parity): dot products and norms are ORDERED left
  * folds over the array (never a multi-row double SUM), and SRP sketch
  * sums are integer-quantized (floor(x·1e6)) so they are order-free —
  * both bit-reproducible in any engine.
  */
object Similarity {

  val Planes = 16
  val Dims = 64
  val Quant = 1000000L

  /** (id, v: array<double>, nrm) — normalized-read corpus. */
  def normed(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.expressions.Sketches.dotProduct(col("v"), col("v"))))

  /** Ordered-fold cosine of two double-array columns with precomputed
    * norms — [[graft.expressions.DotProductExpr]] is bit-identical to the
    * declarative aggregate/zip_with fold (and the oracle's list_reduce),
    * evaluated as one primitive loop. */
  def cosineExpr(va: String, vb: String, na: String, nb: String): Column =
    graft.expressions.Sketches.dotProduct(col(va), col(vb)) / (col(na) * col(nb))

  /** md5-derived ±1 hyperplane matrix, computed once at plan time.
    * sign(p,d) = +1 iff the first 7 md5 hex chars of "w<p>_<d>" are odd —
    * identical to the oracle SQL's `h28('w'||p||'_'||d) % 2`. */
  lazy val signMatrix: Array[Array[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(Planes, Dims) { (p, d) =>
      val hex = md.digest(s"w${p}_${d + 1}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 1) 1 else -1
    }
  }

  /** Adds `sketch`: a 16-bit SRP signature. Integer-exact: quantizes each
    * component to floor(x·1e6) so the per-plane sum is order-independent —
    * computed by the custom expression [[graft.expressions.SrpSketchExpr]]
    * with the hyperplane matrix baked in at plan time (map-only). */
  def sketched(normedDf: DataFrame): DataFrame =
    normedDf.withColumn("sketch",
      graft.expressions.Sketches.srpSketch(col("v"), signMatrix))

  /** (id, v, nrm, band, bkey): two 8-bit bands per sketch. */
  def banded(sketchedDf: DataFrame): DataFrame =
    sketchedDf
      .withColumn("band", explode(sequence(lit(0), lit(1))))
      .withColumn("bkey",
        expr("shiftright(sketch, band * 8) & 255"))

  /** Brute-force cosine top-k: every query row against the whole corpus.
    * Query set is broadcast — corpus is scanned once, never shuffled. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = corpus.select(col("id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineExpr("qv", "cv", "qn", "cn"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** LSH-bucketed approximate top-k: candidates = corpus rows sharing at
    * least one 8-bit SRP band with the query, ranked by exact cosine. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val qb = banded(sketched(queries)).select(col("band"), col("bkey"), col("id").as("query_id"))
    val cb = banded(sketched(corpus)).select(col("band"), col("bkey"), col("id").as("neighbor_id"))
    // dedupe candidate id-pairs FIRST (small keys), then rejoin the vectors —
    // never carries arrays through the distinct.
    val cand = qb.join(cb, Seq("band", "bkey"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
    val q = queries.select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = corpus.select(col("id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    cand.join(broadcast(q), "query_id").join(c, "neighbor_id")
      .withColumn("cos", cosineExpr("qv", "cv", "qn", "cn"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Near-duplicate vectors: pairs sharing an SRP band with cosine >= θ. */
  def nearDupByCosine(corpus: DataFrame, theta: Double): DataFrame = {
    val bd = banded(sketched(corpus)).select("band", "bkey", "id")
    val cand = bd.select(col("band"), col("bkey"), col("id").as("a"))
      .join(bd.select(col("band"), col("bkey"), col("id").as("b")), Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val va = corpus.select(col("id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val vb = corpus.select(col("id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(va, "a").join(vb, "b")
      .withColumn("cos", cosineExpr("va", "vb", "na", "nb"))
      .filter(col("cos") >= theta)
      .select("a", "b", "cos")
      .orderBy("a", "b")
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): drop every
    * vector that has a near-duplicate (cosine ≥ theta) with a SMALLER id —
    * the deterministic one-sided sweep that keeps exactly one
    * representative per duplicate pair chain's minimum. Candidate
    * generation is the same SRP-banded LSH as [[nearDupByCosine]] (no
    * all-pairs join); the removal itself is one anti-join on the distinct
    * dominated ids. Returns the kept ids, ordered. */
  def semanticDedup(corpus: DataFrame, theta: Double): DataFrame = {
    val dominated = nearDupByCosine(corpus, theta)
      .select(col("b").as("id")).distinct()
    corpus.select("id").join(dominated, Seq("id"), "left_anti").orderBy("id")
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|v| / 127, q_i = floor(v_i / max|v| · 127 + 0.5) ∈
    * [-127, 127] (the affine-free variant used for embedding storage —
    * 4× smaller than float32, dot products stay a cheap integer
    * kernel). All-zero vectors quantize to zeros with scale 0.
    *
    * Determinism: max is order-independent; the per-element expression
    * is a fixed two-op IEEE chain plus floor, so the oracle reproduces
    * every quantized value exactly (q109). Map-only; no shuffle.
    *
    * Returns (id, scale, qvec: array<long>); dequantize as q_i · scale. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("v"))
      .withColumn("amax",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .select(col("id"), (col("amax") / 127.0).as("scale"),
        when(col("amax") === 0.0,
            transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"),
            x => floor(x / col("amax") * 127.0 + 0.5).cast("long")))
          .as("qvec"))
  }
}
