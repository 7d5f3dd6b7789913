package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbour search (the coarse
  * quantizer of Jegou et al., TPAMI 2011): partition the
  * corpus into k centroid buckets (KMeans), search only the `nProbe`
  * buckets nearest to each query.
  *
  * This is the second scale path for similarity search (SRP-LSH being the
  * first, [[Similarity.annTopK]]): at 100 TB the corpus is bucketed ONCE
  * at ingest (a write-side shuffle on `bucket`), and every query then
  * touches nProbe/k of the data. Centroids are a driver-side literal
  * (k × dims doubles — kilobytes), so probe assignment is a map-only
  * expression, and the candidate join is bucket-equi, never a cross join.
  *
  * Not oracle-checked (KMeans is not SQL-expressible); the spec asserts
  * recall against brute force on clustered data and determinism via a
  * fixed seed.
  */
object Ivf {

  /** Fit k centroids over the `v` column of a normed corpus
    * ([[Similarity.normed]] output). Deterministic for a fixed seed. */
  def fit(normedDf: DataFrame, k: Int, seed: Long = 42L, maxIter: Int = 20): KMeansModel = {
    // KMeans iterates over its input; materialize once instead of
    // recomputing the scan+norm chain per iteration.
    val feats = normedDf.withColumn("features", array_to_vector(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("bucket")
      .fit(feats)
    finally feats.unpersist()
  }

  /** Corpus with its IVF bucket id. At scale, write this out partitioned
    * or bucketed by `bucket` so search prunes at the storage layer. */
  def assign(normedDf: DataFrame, model: KMeansModel): DataFrame =
    model.transform(normedDf.withColumn("features", array_to_vector(col("v"))))
      .drop("features")

  /** Squared-L2 distances from `v` to each centroid, as a map-only
    * expression over a plan-time centroid literal. */
  private def centroidDists(model: KMeansModel) = {
    val cents = model.clusterCenters.toIndexedSeq.map(c => array(c.toArray.toIndexedSeq.map(lit): _*))
    array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d).as("dist"),
        lit(i).as("bucket"))
    }: _*)
  }

  /** Top-k cosine neighbours per query, probing the nProbe nearest
    * centroid buckets. */
  def search(queries: DataFrame, corpus: DataFrame, model: KMeansModel,
             k: Int, nProbe: Int): DataFrame = {
    val bucketed = assign(corpus, model)
    val probes = queries
      .withColumn("_probes", slice(array_sort(centroidDists(model)), 1, nProbe))
      .withColumn("_p", explode(col("_probes")))
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("_p.bucket").as("bucket"))
    val cand = bucketed.select(col("bucket"), col("id").as("neighbor_id"),
      col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    probes.join(cand, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Similarity.cosineExpr("qv", "cv", "qn", "cn"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
