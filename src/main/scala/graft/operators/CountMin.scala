package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing => H}

/** Count-Min sketch — the bounded-state point-frequency counter.
  *
  * Misra-Gries (`expressions/HeavyHitters`) answers "which keys are
  * frequent"; CM answers "how often did THIS key occur" for any key, from
  * `depth × width` BIGINT cells regardless of key cardinality — the
  * mergeable frequency state a 100 TB rollup can afford to keep per
  * batch when the key domain (users, URLs) cannot be enumerated.
  *
  * Representation: a relational cell table `(j, b, c)` with at most
  * depth·width rows — c = Σ weight of keys hashing to row j's bucket b.
  * Merging sketches of two corpora is `UNION ALL` + re-`SUM` by (j, b):
  * associative/commutative in BIGINT, so batch partials fold exactly
  * (the [[graft.catalog.Rollup]] contract). The estimate for a key is
  * `min_j c(j, h_j(key))` — never an underestimate, overshoots only by
  * colliding keys' mass.
  *
  * Hashes are the repo's md5 oracle tier (`h28("cm<j>:" || key) mod
  * width`) so an external engine reproduces every cell and every
  * estimate bit-for-bit — q236 hash-gates the COLLISION regime, not
  * just the exact one. Production swaps xxhash64 (the q40 two-tier
  * pattern).
  *
  * Scale: cells = one map-side-combinable aggregate over an exploded
  * depth-way fan-out of the scan (shuffle carries ≤ depth·width rows
  * per partition after combine); estimates = a broadcast join of the
  * probe keys against the tiny cell table.
  */
object CountMin {

  private def bucket(j: Int, key: Column, width: Int): Column =
    pmod(H.h28(concat(lit(s"cm$j:"), key.cast("string"))), lit(width))

  /** SQL twin of [[bucket]] for DuckDB oracles. */
  def sqlBucket(j: String, key: String, width: Int): String =
    s"(${H.sqlH28(s"'cm' || CAST($j AS VARCHAR) || ':' || CAST($key AS VARCHAR)")} % $width)"

  /** The (j, b, c) cell table of `keyCol` occurrences (each weighted by
    * `weight`) under a depth × width sketch. ≤ depth·width rows. */
  def cells(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 256,
            weight: Column = lit(1L)): DataFrame = {
    val jb = array((0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(j, col(keyCol), width).as("b"))): _*)
    df.select(explode(jb).as("jb"), weight.as("_w"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(sum(col("_w")).as("c"))
  }

  /** Exact-fold merge of batch sketches: UNION ALL + SUM by (j, b). */
  def merge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionAll _).groupBy("j", "b").agg(sum("c").as("c"))

  /** Point estimates for the keys in `probes(keyCol)`: min over rows of
    * the key's bucket counter; keys the sketch never saw estimate from
    * whatever mass collided there (0 if none). */
  def estimates(cellTable: DataFrame, probes: DataFrame, keyCol: String,
                depth: Int = 4, width: Int = 256): DataFrame = {
    val jb = array((0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(j, col(keyCol), width).as("b"))): _*)
    probes.select(col(keyCol), explode(jb).as("jb"))
      .select(col(keyCol), col("jb.j").as("j"), col("jb.b").as("b"))
      .join(broadcast(cellTable), Seq("j", "b"), "left_outer")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
