package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy self-join by deletion-neighborhood blocking — the
  * record-linkage primitive (SymSpell's candidate generation; FastSS,
  * Bocek et al. 2007): two strings at Levenshtein distance ≤ 1 ALWAYS
  * share a member of their 1-deletion neighborhoods (delete the edited
  * position from both sides of a substitution; a deletion/insertion pair
  * shares the shorter string itself), so blocking on the neighborhood
  * finds every ED-1 pair without the n² cross product a naive fuzzy join
  * needs. The block join admits some ED-2 same-length pairs (different
  * deletions colliding); the exact `levenshtein` post-filter removes
  * them — false candidates cost work, never correctness.
  *
  * Scale design (100 TB): the explode multiplies rows by |word|+1, the
  * candidate join shuffles on the variant string, and each variant
  * bucket joins |b|² candidates — the same blocked-join shape as the
  * LSH band join in [[Dedup]], and like it, skew shows up as a hot
  * variant bucket (a production caller caps bucket sizes the way
  * Dedup.lshPairs does; the exact gate here runs uncapped).
  */
object Fuzzy {

  /** The string plus every 1-character deletion of it, distinct. */
  def deletionVariants(word: Column): Column =
    array_union(array(word),
      transform(sequence(lit(1), length(word)), i =>
        concat(word.substr(lit(1), i - 1), word.substr(i + 1, length(word)))))

  /** The BLOCK-JOIN candidate pairs (id_a < id_b, distinct) — every pair
    * sharing a deletion variant, BEFORE the exact distance filter. The
    * blocking-quality harness (q278) scores exactly this set: its size
    * over n²/2 is the reduction ratio, its ED-1 coverage the pair
    * completeness (1.0 by the deletion-neighborhood lemma). */
  def candidatesEd1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val v = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
      .withColumn("_v", explode(deletionVariants(col("_s"))))
    v.as("l").join(v.as("r"),
        col("l._v") === col("r._v") && col("l._id") < col("r._id"))
      .select(col("l._id").as("id_a"), col("l._s").as("s_a"),
        col("r._id").as("id_b"), col("r._s").as("s_b"))
      .distinct()
  }

  /** All pairs at Levenshtein distance EXACTLY 1 within `df`, keyed
    * (idCol < idCol) so each pair appears once: (id_a, s_a, id_b, s_b).
    * Equal strings (distance 0) are excluded by the dist=1 filter even
    * when ids differ. */
  def selfJoinEd1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    candidatesEd1(df, idCol, strCol)
      .filter(levenshtein(col("s_a"), col("s_b")) === 1)
}
