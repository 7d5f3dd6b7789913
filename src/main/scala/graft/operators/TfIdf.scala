package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Term weighting over a document corpus (SURVEY §2.3 text analysis;
  * lineage: the reference's corpus-wide CountVectorizer fit,
  * `/root/reference/serialize.py:220-231`, is the same two-pass shape —
  * global term statistics, then a per-doc map).
  *
  * The idf is the BM25 rational form (Robertson/Zaragoza 2009)
  * idf = (N - df + 0.5)/(df + 0.5)
  * rather than a logarithm: division is a single IEEE operation, so the
  * scores are bit-identical in every engine (libm `log` implementations
  * are not), keeping this operator oracle-checkable.
  *
  * Scale shape: tf is a (doc, term) groupBy (one shuffle of token pairs —
  * at 100 TB this is the dominant shuffle and is partial-aggregated
  * map-side); df is a groupBy over the distinct (doc, term) pairs already
  * produced by tf; N is a scalar broadcast. No driver-side vocabulary.
  */
object TfIdf {

  /** Per-document top-k terms by tf·idf.
    * Returns (doc_id, rank, term, tf, df, score), deterministic
    * tie-break (score desc, term asc). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))
    tf.join(dfT, "term")
      .join(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score")
  }
}
