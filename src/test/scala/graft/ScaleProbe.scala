package graft

import org.apache.spark.sql.functions._

/** Dev probe (test scope, not shipped): measures the set-similarity
  * family's candidate-volume scaling across fixture scales — the one
  * super-linear query family in SCALE.md's 10× table. For each input
  * dir it rebuilds q173/q218's element table, counts the PREFIX-FILTER
  * candidate pairs (the quantity the 100 TB valve caps), reports
  * whether the count-gated broadcast (4M pairs) would engage its
  * shuffle fallback, and times the full joins.
  *
  * Run: sbt "Test/runMain graft.ScaleProbe <dir1> <dir2> ..."
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import graft.functions.TextAnalysis
    for (dir <- args) {
      val el = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("id"),
          explode(TextAnalysis.wordNgrams(TextAnalysis.tokens(col("text")), 3)).as("tok"))
        .distinct()
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val nEl = el.count()
      // replicate prefixTables at t = 4/5 (same math as SetJoin)
      val elH = el.select(col("id"), col("tok"), xxhash64(col("tok")).as("tokh"))
      val sz = elH.groupBy("id").agg(count(lit(1)).as("sz"))
      val dfc = elH.groupBy("tokh").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("df", "tokh", "tok")
      val prefix = elH.join(dfc, "tokh").join(sz, "id")
        .withColumn("pos", row_number().over(w))
        .filter(col("pos") <= col("sz") - expr("(4 * sz + 4) div 5") + 1)
        .select(col("id"), col("tokh"))
      val candJac = prefix.select(col("id").as("a"), col("tokh"))
        .join(prefix.select(col("id").as("b"), col("tokh")), "tokh")
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
      val candCont = prefix.select(col("id").as("a"), col("tokh"))
        .join(elH.select(col("id").as("b"), col("tokh")), "tokh")
        .filter(col("a") =!= col("b")).select("a", "b").distinct().count()
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
      }
      val (jacPairs, jacSec) = time(
        graft.operators.SetJoin.jaccardJoin(el, 4, 5).count())
      val (contPairs, contSec) = time(
        graft.operators.SetJoin.containmentJoin(el, 4, 5).count())
      println(f"[scale-probe] dir=$dir docs=$nDocs elements=$nEl " +
        f"cand_jaccard=$candJac (broadcast_cap_hit=${candJac > 4000000L}) " +
        f"cand_containment=$candCont (broadcast_cap_hit=${candCont > 4000000L}) " +
        f"q173_pairs=$jacPairs q173_sec=$jacSec%.2f " +
        f"q218_pairs=$contPairs q218_sec=$contSec%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
