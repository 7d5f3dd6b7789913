package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import graft.expressions.Bloom

/** Build-side key-set pruning for big fact ⋈ selective-dim joins.
  *
  * [[bloomSemiFilter]] is the manual twin of Spark's AQE runtime
  * row-level filtering (InjectRuntimeFilter), for when the caller KNOWS
  * the dim is selective: the dim's join keys fold into a few-MB bloom
  * bitmap (one single-row aggregate, materialized like a blocking scalar
  * subquery and embedded as a binary literal), and the fact side drops
  * non-joining rows inside its scan's codegen loop —
  * BEFORE the join's shuffle ever materializes them. At 100 TB this is
  * the difference between shuffling the full fact table and shuffling
  * the joining fraction; false positives pass through and the join
  * removes them, so results are bit-identical to the unfiltered join.
  *
  * Sizing: with k=5 hashes, m/n ≈ 10 bits per distinct key gives ~1% FP
  * (Bloom 1970). The default 2²³ bits (1 MiB) covers ~800k distinct dim
  * keys at that rate; oversizing only wastes broadcast bytes, never
  * correctness.
  */
object Prune {

  /** `fact` filtered to rows whose BIGINT `factKey` might appear in
    * `dim`'s `dimKey` set. Purely a pre-join reducer: compose with the
    * real join for exact results.
    *
    * EAGER — the dim key set is scanned and folded into the bitmap AT
    * CALL TIME (two Spark jobs run as a side effect of building the
    * returned frame), and the bitmap is a SNAPSHOT: rows appended to
    * `dim` after this call are invisible to the filter, so executing the
    * returned frame against a mutated dim can silently drop joining fact
    * rows. Build the filter and the join from the same dim snapshot (or
    * re-call after dim changes) — the same contract as collecting any
    * blocking scalar subquery. */
  def bloomSemiFilter(fact: DataFrame, factKey: Column,
                      dim: DataFrame, dimKey: Column,
                      numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    // The bitmap is materialized ONCE (driver-side single-row aggregate —
    // the same blocking-subquery shape Spark's InjectRuntimeFilter uses)
    // and embedded as a plan-redacted binary constant, which codegen
    // references as one task-level object. The previous
    // crossJoin(broadcast(bitmap)) form re-read the binary COLUMN per
    // fact row, and UnsafeRow.getBinary copies — |fact| x bitmap-size
    // allocation (~77 GB at sf0.1 for a 128 KiB bitmap), which
    // intermittently collapsed the probe stage into GC (q133 reps
    // bimodal 1.5 s vs 27-72 s across rounds).
    val bytes = dim.agg(Bloom.bloomAgg(dimKey, numBits, numHashes).as("_bloom"))
      .head().getAs[Array[Byte]](0)
    fact.filter(Bloom.mightContain(Bloom.bitmapLiteral(bytes), factKey))
  }
}
