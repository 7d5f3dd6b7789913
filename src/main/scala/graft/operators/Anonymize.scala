package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-release auditing: k-anonymity and l-diversity censuses.
  *
  * Training corpora and analytics extracts get released to downstream
  * teams; before release the quasi-identifier (QI) combinations must be
  * checked against re-identification (Sweeney 2002: k-anonymity) and
  * attribute disclosure (Machanavajjhala 2007: l-diversity). Both checks
  * reduce to aggregates over the QI equivalence classes:
  *
  *  - '''k-anonymity''': every QI class must contain ≥ k rows, else the
  *    class's members are re-identifiable by joining public data on the QI.
  *  - '''l-diversity''': every QI class must carry ≥ l distinct values of
  *    the sensitive attribute, else membership in the class DISCLOSES the
  *    attribute even when k-anonymity holds.
  *
  * Scale shape: ONE groupBy on the QI columns (map-side combinable
  * count / distinct-count), then constant-size reductions. The class
  * count is bounded by the QI value-domain product, so everything after
  * the first aggregate is kilobytes at any corpus size. No row ever
  * leaves its executor un-aggregated. All outputs are BIGINT — the
  * verdicts cross-engine hash bit-for-bit.
  *
  * The reference has no privacy tooling (its corpus handling starts and
  * ends at `serialize.py`'s ingest); this is a target-only operator in
  * the SURVEY §2.3 spirit.
  */
object Anonymize {

  /** One census row over the QI equivalence classes of `df`:
    * `(n_rows, n_classes, min_class_size, rows_violating, k_anonymous)`.
    * `rows_violating` counts the rows living in classes smaller than k —
    * the population that a QI join re-identifies. */
  def kAnonymityCensus(df: DataFrame, qi: Seq[String], k: Long): DataFrame =
    df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("sz"))
      .agg(
        sum(col("sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("sz")).as("min_class_size"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("rows_violating"))
      .withColumn("k_anonymous", col("rows_violating") === 0L)

  /** Per-class l-diversity census on `sensitive`: every QI class with
    * its size, its distinct-sensitive-value count, and the l-diversity
    * verdict. The distinct count is per-class exact (the class domain is
    * bounded, so the distinct aggregation state is too). */
  def lDiversityCensus(df: DataFrame, qi: Seq[String],
                       sensitive: Column, l: Long): DataFrame =
    df.withColumn("_sens", sensitive)
      .groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("_sens")).as("l_distinct"))
      .withColumn("l_diverse", col("l_distinct") >= l)

  /** The QI classes that fail l-diversity — empty result = the release
    * passes. */
  def lDiversityViolations(df: DataFrame, qi: Seq[String],
                           sensitive: Column, l: Long): DataFrame =
    lDiversityCensus(df, qi, sensitive, l)
      .filter(!col("l_diverse")).drop("l_diverse")
}
