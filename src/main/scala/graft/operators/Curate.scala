package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** End-to-end training-data curation: quality gate → exact dedup →
  * near-dup removal, as one composable pipeline. This is the product
  * shape of the engine — the reference ingests corpora for training
  * (`/root/reference/serialize.py` EP1); a modern LLM-data pipeline
  * additionally curates them before export.
  *
  * Keep rules are deterministic: exact groups keep the smallest id;
  * near-dup pairs (a < b) drop the larger id — the standard greedy rule
  * (not full transitive closure: a connected-components pass over the
  * pair graph is the exhaustive variant; greedy-drop-b is what large
  * pipelines run because it needs one anti-join, not an iterative fixpoint).
  *
  * Every stage is oracle-reproducible (quality scores, sha-group keeps,
  * LSH pair sets are all bit-deterministic), so the whole pipeline is
  * hash-checked cross-engine as q41.
  */
object Curate {

  final case class Curation(curated: DataFrame, stats: DataFrame)

  def run(docs: DataFrame, idCol: String, textCol: String,
          minQuality: Double = 0.6, theta: Double = 0.5): Curation = {
    val toks = TextAnalysis.tokens(col(textCol))
    val quality = docs
      .filter(TextAnalysis.qualityScore(col(textCol), toks) >= minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keepIds = Dedup.exactDedup(quality, idCol, textCol).select(idCol)
    val exact = quality.join(keepIds, Seq(idCol), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearPairs = Dedup.minhashNearDups(exact, idCol, textCol, theta = theta)
    val dropIds = nearPairs.select(col("b").as(idCol)).distinct()
    val curated = exact.join(dropIds, Seq(idCol), "left_anti")

    val stats = docs.agg(count(lit(1)).as("n_input"))
      .crossJoin(quality.agg(count(lit(1)).as("n_quality")))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(curated.agg(count(lit(1)).as("n_final")))
    Curation(curated, stats)
  }
}
