package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for 100 TB workloads.
  *
  * First line of defence is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on in [[graft.GraftSession]]), which splits oversized shuffle
  * partitions at runtime. These helpers cover the cases AQE cannot fix:
  * a single group key whose PARTIAL aggregation state is itself too hot
  * (one reducer owns the key), and broadcast-ineligible joins against a
  * skewed key distribution.
  */
object Skew {

  /** Two-phase salted aggregation for sum/count over heavily skewed keys:
    * phase 1 aggregates (keys, salt) — spreading each hot key over
    * `salts` reducers — phase 2 combines the partials per key. Sums and
    * counts are algebraic, so the result is exact. The salt is derived
    * from a uniform column (`saltFrom`), not rand(), so the operator
    * stays deterministic and retry-safe. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltFrom: Column, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n"))
  }

  /** Salted join of a skewed fact table against a small-ish dimension that
    * is still too large to broadcast: the fact side gets a deterministic
    * salt in [0, salts); the dimension is replicated `salts` times. Each
    * hot fact key now hashes to `salts` distinct reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFrom: Column, salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)))
    val repDim = dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, "_salt")).drop("_salt")
  }
}
