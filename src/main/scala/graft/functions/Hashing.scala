package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, oracle-mirrorable hashing primitives.
  *
  * The engine has two hashing tiers:
  *
  *  1. **Oracle tier (this file)** — hashes derived from `md5` hex prefixes,
  *     because `md5` is byte-identical in every engine (Spark, DuckDB,
  *     Postgres, …). Used by the declared queries so the DuckDB correctness
  *     gate can recompute minhash/simhash/fingerprints exactly.
  *  2. **Production tier** — `xxhash64` (codegen'd, no hex round-trip),
  *     ~10x cheaper per call. Same algorithms, different hash family; see
  *     [[graft.functions.FastHashing]].
  *
  * All arithmetic stays within provable ranges so `Long` never overflows:
  * h28 < 2^28^, minhash coefficients < 2^29^, so `a*x + b < 2^57`.
  */
object Hashing {

  /** Prime modulus 2^31-1 for the minhash universal-hash family. */
  val P31 = 2147483647L

  /** 60-bit hash: first 15 hex chars of md5. Positive, fits a Long. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 28-bit hash: first 7 hex chars of md5 (overflow-safe multiplicand). */
  def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** i-th minhash coefficient a_i (odd, < 2^29), derived from md5("a<i>"). */
  def coefA(i: Column): Column = h28(concat(lit("a"), i.cast("string"))) * 2 + 1

  /** i-th minhash coefficient b_i (< 2^28), derived from md5("b<i>"). */
  def coefB(i: Column): Column = h28(concat(lit("b"), i.cast("string")))

  /** k-element MinHash signature of a token/shingle array column.
    *
    * Pure per-row map — NO shuffle: at 100 TB this runs entirely inside the
    * scan stage. sig[i] = min over shingles t of (a_i * h28(t) + b_i) mod P.
    * Null/empty shingle arrays yield null minima; callers filter those rows.
    */
  def minhashSig(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingles, t =>
        pmod(coefA(i) * h28(t) + coefB(i), lit(P31)))))

  // ---- DuckDB oracle-SQL twins of the helpers above -------------------
  def sqlH60(x: String): String =
    s"CAST(CONCAT('0x', SUBSTR(MD5($x), 1, 15)) AS BIGINT)"
  def sqlH28(x: String): String =
    s"CAST(CONCAT('0x', SUBSTR(MD5($x), 1, 7)) AS BIGINT)"
  def sqlCoefA(i: String): String =
    s"(${sqlH28(s"'a' || CAST($i AS VARCHAR)")} * 2 + 1)"
  def sqlCoefB(i: String): String =
    sqlH28(s"'b' || CAST($i AS VARCHAR)")
}
