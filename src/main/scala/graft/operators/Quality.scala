package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Repetition-based quality filters for training corpora — the Gopher
  * family of heuristics (Rae et al. 2021, "Scaling Language Models",
  * §A1.1.2): documents dominated by a few repeated words or n-grams are
  * boilerplate/spam and get filtered before training.
  *
  * Scale design (100 TB): "most frequent n-gram per document" is computed
  * by explode → (doc, gram) count → per-doc max, NOT by a per-row O(n²)
  * lambda over the token array. The shuffle carries (doc_id, gram) pairs —
  * linear in corpus size, the same shape as every word-count job — so a
  * 10k-word document costs 10k rows, not 10⁸ comparisons. Ties and float
  * hazards are kept out of the result: every stat is an exact integer, and
  * the one ratio is a single division of two exact integers.
  */
object Quality {

  /** Word n-grams WITH duplicates (multiset), "w1 w2 ... wn"; empty array
    * when the document has fewer than n tokens. The size guard is
    * load-bearing: sequence(1, 0) is DESCENDING [1, 0] in Spark, so an
    * unguarded short doc would index past the array under ANSI mode. */
  private def ngramsAll(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(off => element_at(toks, i + off)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Per-document repetition profile:
    * (id, n_words, n_distinct_words, top_word_cnt, dup_word_frac,
    *  n_2grams, n_distinct_2grams, top_2gram_cnt, dup_2gram_words)
    * where dup_word_frac = (n_words - n_distinct) / n_words and
    * dup_2gram_words = Σ counts of 2-grams occurring more than once. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))

    val words = toks
      .select(col("id"), explode(col("toks")).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("top_word_cnt"))

    val grams = toks
      .select(col("id"), explode(ngramsAll(col("toks"), 2)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum(col("c")).as("n_2grams"),
        count(lit(1)).as("n_distinct_2grams"),
        max(col("c")).as("top_2gram_cnt"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_2gram_words"))

    // LEFT join: a doc with <2 tokens has words but zero 2-grams and must
    // still appear in the profile (explode dropped all its gram rows).
    words.join(grams, Seq("id"), "left")
      .select(col("id"), col("n_words"), col("n_distinct_words"),
        col("top_word_cnt"),
        ((col("n_words") - col("n_distinct_words")).cast("double") /
          col("n_words").cast("double")).as("dup_word_frac"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        coalesce(col("n_distinct_2grams"), lit(0L)).as("n_distinct_2grams"),
        coalesce(col("top_2gram_cnt"), lit(0L)).as("top_2gram_cnt"),
        coalesce(col("dup_2gram_words"), lit(0L)).as("dup_2gram_words"))
  }

  /** Gopher-style keep/drop verdict from the repetition profile: drop when
    * the top word exceeds maxTopWordFrac of all words or duplicate 2-grams
    * exceed maxDup2gramFrac. Exact integer cross-multiplication — no float
    * thresholds in the decision. */
  def repetitionFilter(stats: DataFrame,
                       maxTopWordFracPct: Int = 20,
                       maxDup2gramFracPct: Int = 60): DataFrame =
    stats.withColumn("keep",
      (col("top_word_cnt") * 100 <= col("n_words") * maxTopWordFracPct) &&
        (col("dup_2gram_words") * 100 <= col("n_2grams") * maxDup2gramFracPct))
}
