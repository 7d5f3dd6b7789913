package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join by prefix filtering (the AllPairs/PPJoin
  * family — Bayardo et al. 2007, Xiao et al. 2008): find every pair of
  * sets with Jaccard ≥ t, WITHOUT the all-pairs token join. MinHash LSH
  * ([[Dedup]]) answers the same question probabilistically; this is the
  * exact-recall member of the family — record linkage and plagiarism
  * sweeps want no false negatives.
  *
  * Prefix-filter lemma: order every set by one global token order
  * (ascending document frequency, then token — rarest first, so
  * prefixes carry the most selective tokens). If |A∩B| ≥ α then the
  * first |A|−α+1 tokens of A and first |B|−α+1 of B share a token; with
  * α = ceil(t·|s|) (J ≥ t ⟹ overlap ≥ t·|A∪B| ≥ t·|s| for BOTH sets),
  * candidate generation can join on prefix tokens only. The prefix
  * bound is computed in INTEGER arithmetic (t = tNum/tDen,
  * ceil(a/b) = (a+b−1) div b) — an IEEE ceil(0.8·n) rounds the wrong
  * way for some n and silently drops candidates.
  *
  * Scale design (100 TB): the candidate join touches only prefix
  * tokens — for t = 0.8 that is ~20% of each set, and the global df
  * order puts the CORPUS-RAREST tokens there, so hot-token buckets
  * (the n² failure of a naive token join) are structurally avoided.
  * Verification joins full token lists against the (small) candidate
  * set only; the final Jaccard test is a cross-multiplied integer
  * inequality. Everything is counts — deterministic on any engine.
  */
object SetJoin {

  /** All pairs (a < b) of `el` (columns `id`, `tok` — distinct set
    * elements per id) with Jaccard ≥ tNum/tDen. Output: a, b, inter,
    * sz_a, sz_b. */
  def jaccardJoin(el: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen)
    val sz = el.groupBy("id").agg(count(lit(1)).as("sz"))
    val dfc = el.groupBy("tok").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("id").orderBy("df", "tok")
    val prefix = el.join(dfc, "tok").join(sz, "id")
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <=
        col("sz") - expr(s"($tNum * sz + ${tDen - 1}) div $tDen") + 1)
      .select(col("id"), col("tok"))
    val cand = prefix.select(col("id").as("a"), col("tok"))
      .join(prefix.select(col("id").as("b"), col("tok")), "tok")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val inter = el.select(col("id").as("a"), col("tok"))
      .join(cand, "a")
      .join(el.select(col("id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("id").as("a"), col("sz").as("sz_a")), "a")
      .join(sz.select(col("id").as("b"), col("sz").as("sz_b")), "b")
      .filter(col("inter") * tDen >=
        lit(tNum) * (col("sz_a") + col("sz_b") - col("inter")))
      .select("a", "b", "inter", "sz_a", "sz_b")
  }
}
