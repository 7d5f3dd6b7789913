package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** A real trained byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — merge
  * learning plus corpus encoding — replacing the `bpeEstimate` heuristic
  * wherever an actual subword vocabulary is needed.
  *
  * Scale design (100 TB). BPE never touches raw documents more than once:
  *  - '''train''': one word-count shuffle reduces the corpus to a
  *    (word, count) dictionary; the dictionary is frequency-truncated to
  *    the top `maxTrainWords` (the standard practice — GPT-2's vocab was
  *    fit on a corpus sample) and the merge loop runs driver-side over
  *    ≤ maxTrainWords rows. The loop is O(nMerges · dictChars) — pure CPU
  *    on kilobytes-to-megabytes, never a per-merge Spark job over the
  *    corpus.
  *  - '''encode''': the merge table (a few kB) is broadcast; the DISTINCT
  *    words of the corpus (a second word-level shuffle, dictionary-sized)
  *    are encoded once each with mapPartitions — the documented
  *    per-partition-imperative exception, running over the dictionary,
  *    not the corpus — and the (word → subwords) table broadcast-joins
  *    back to the exploded corpus. A 1000-executor corpus pays two
  *    word-keyed shuffles and one broadcast, independent of how often
  *    each word repeats.
  *
  * Determinism: merge selection breaks count ties by lexicographic pair
  * order, so the merge sequence is a pure function of the word counts;
  * encoding applies merges in rank order left-to-right. No floats
  * anywhere.
  */
object Bpe {

  /** Learned merge table: pair (a, b) at rank i merges into a + b. */
  final case class Merges(ranks: Seq[(String, String)]) {
    @transient private lazy val rankOf: Map[(String, String), Int] =
      ranks.zipWithIndex.toMap

    /** Encode one word: split to single characters, then repeatedly merge
      * the present pair with the lowest rank (the standard BPE encode
      * order, equivalent to replaying training merges). */
    def encodeWord(w: String): Seq[String] = {
      if (w.isEmpty) return Seq.empty
      var syms = w.map(_.toString).toVector
      var done = false
      while (!done && syms.size > 1) {
        var best = -1
        var bestAt = -1
        var i = 0
        while (i < syms.size - 1) {
          rankOf.get((syms(i), syms(i + 1))) match {
            case Some(r) if best == -1 || r < best => best = r; bestAt = i
            case _ =>
          }
          i += 1
        }
        if (best == -1) done = true
        else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
          syms.drop(bestAt + 2)
      }
      syms
    }
  }

  /** Learn `nMerges` merges from the corpus word counts. One shuffle over
    * the corpus (word count), one top-K truncation, then a driver loop. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            maxTrainWords: Int = 100000): Merges = {
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxTrainWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // dict: word as symbol vector, with multiplicity
    var dict: Array[(Vector[String], Long)] =
      counts.map { case (w, c) => (w.map(_.toString).toVector, c) }

    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val pairCounts = collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.size - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic argmax: max count, then lexicographically least
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        dict = dict.map { case (syms, c) =>
          if (syms.size < 2) (syms, c)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.size) {
              if (i < syms.size - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        step += 1
      }
    }
    Merges(merges.result())
  }

  /** (word, subwords) encoding table for every distinct word of the
    * corpus: a word-keyed shuffle down to the dictionary, then a
    * mapPartitions encode with the merges broadcast. */
  def encodingTable(spark: SparkSession, docs: DataFrame, textCol: String,
                    merges: Merges): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .distinct()
      .as[String]
      .mapPartitions { it => val m = bc.value; it.map(w => (w, m.encodeWord(w))) }
      .toDF("w", "subwords")
  }

  /** Per-document BPE stats over the encoded corpus: token count, char
    * count, and the exact compression ratio chars/token (single division
    * of exact integers). The corpus-side join is a broadcast of the
    * dictionary-sized encoding table. */
  def encodeStats(spark: SparkSession, docs: DataFrame, idCol: String,
                  textCol: String, merges: Merges): DataFrame = {
    val enc = encodingTable(spark, docs, textCol, merges)
      .select(col("w"), size(col("subwords")).cast("long").as("n_sub"),
        length(col("w")).cast("long").as("n_char"))
    docs.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .join(broadcast(enc), Seq("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_bpe_tokens"),
        sum(col("n_char")).as("n_word_chars"))
      .withColumn("chars_per_token",
        col("n_word_chars").cast("double") / col("n_bpe_tokens").cast("double"))
  }
}
