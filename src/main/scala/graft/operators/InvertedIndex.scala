package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Inverted-index construction: term → document frequency + a bounded,
  * delta-encoded posting list (the classic IR layout — Zobel & Moffat
  * 2006, "Inverted files for text search engines").
  *
  * Scale design (100 TB): the hazard in a naive
  * `groupBy(term).agg(collect_list(doc_id))` is a stopword term whose
  * aggregation buffer collects the entire corpus' ids on one reducer.
  * Here the posting list is capped BEFORE collection: a row_number over
  * the term partition (planned as WindowGroupLimit — the rank filter
  * pushes below the exchange, so each map task already truncates its
  * local run) keeps only the `cap` smallest doc ids per term, and the
  * full document frequency is a separate count aggregate that never
  * materializes a list. Reducer state is O(cap) per term, corpus size
  * notwithstanding; `overflow` marks truncated terms.
  *
  * Postings are ascending doc ids, delta-encoded ([first, gap, gap, …]) —
  * the layout that makes real posting lists compressible; here it also
  * keeps the oracle comparison exact (pure integer arithmetic).
  */
object InvertedIndex {

  def build(docs: DataFrame, idCol: String, textCol: String,
            cap: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val pairs = docs
      .select(col(idCol).as("id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))

    val df_ = pairs.groupBy("term").agg(count(lit(1)).as("df"))

    val capped = pairs
      .withColumn("rn",
        row_number().over(Window.partitionBy("term").orderBy("id")))
      .filter(col("rn") <= cap)
      .groupBy("term")
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .withColumn("postings",
        transform(sequence(lit(1), size(col("ids"))), i =>
          when(i === 1, element_at(col("ids"), 1))
            .otherwise(element_at(col("ids"), i) -
              element_at(col("ids"), i - 1))))
      .drop("ids")

    df_.join(capped, Seq("term"))
      .select(col("term"), col("df"),
        (col("df") > cap).as("overflow"), col("postings"))
      .orderBy("term")
  }

  /** Reconstruct absolute doc ids from a delta-encoded posting column —
    * the read-side inverse, for lookups and for testing losslessness. */
  def decodePostings(postings: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(1), size(postings)), i =>
      aggregate(slice(postings, lit(1), i), lit(0L), (acc, x) => acc + x))
}
