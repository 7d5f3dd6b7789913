package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Production hash tier: xxhash64 (Spark built-in, whole-stage codegen'd,
  * no hex round-trip) in place of the oracle tier's md5-prefix hashes
  * ([[Hashing]]). Same algorithms downstream — the 28-bit outputs feed the
  * same [[graft.expressions.MinhashSigExpr]] — different hash family, so
  * results are NOT oracle-comparable; the fast pipeline is validated by
  * ScalaTest against the md5 tier's behaviour (same duplicate sets on
  * planted data) instead of the DuckDB gate.
  */
object FastHashing {

  /** 28-bit xxhash64-derived shingle hash (overflow-safe for the minhash
    * linear transforms, like [[Hashing.h28]]). */
  def h28Fast(c: Column): Column =
    pmod(xxhash64(c), lit(1L << 28))

  /** 60-bit xxhash64-derived hash (like [[Hashing.h60]]). */
  def h60Fast(c: Column): Column =
    pmod(xxhash64(c), lit(1L << 60))
}
