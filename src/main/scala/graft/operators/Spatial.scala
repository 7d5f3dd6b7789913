package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked spatial distance self-join.
  *
  * The classic "all pairs of points within distance R" problem — store
  * dedup by geo proximity, POI conflation, trajectory contact tracing.
  * A naive formulation is an O(n²) cross join; the scalable shape is
  * GRID BLOCKING (the spatial twin of LSH banding, `Dedup.scala`): hash
  * every point to a square cell of side = R, replicate each LEFT point
  * into its 3×3 cell neighborhood, equi-join on the cell key, and
  * verify the exact distance on the candidates only.
  *
  * Completeness: two points within R differ by ≤ R per axis, so their
  * cells differ by ≤ 1 per axis — the 3×3 probe neighborhood covers
  * every qualifying pair. Uniqueness: a pair's cell offset is a single
  * fixed (dx, dy) ∈ {-1,0,1}², so each unordered pair (id_a < id_b)
  * joins exactly once — no dedup pass needed.
  *
  * Exactness: coordinates are integer micro-degrees, the predicate is
  * squared Euclidean distance in BIGINT (dx² + dy² ≤ R²) — no floats
  * anywhere, so pair sets cross-engine hash bit-for-bit.
  *
  * Scale shape: the join is a plain equi-join on (cx, cy) — a keyed
  * shuffle, never a cartesian (PlanShapeSpec gates it). Candidate count
  * is Σ_cell 9·|cell|·E[|cell|]; with cell side = R the constant is the
  * local point density, not n². Skewed cells (a city) are ordinary
  * hot keys — AQE skew-join or salting applies as with any join.
  */
object Spatial {

  /** All unordered pairs (id_a < id_b) of `points(id, x, y)` within
    * Euclidean distance `r` (integer coordinates, exact integer
    * predicate). Output: (id_a, id_b, dist2). */
  def distanceJoin(points: DataFrame, r: Long): DataFrame = {
    require(r > 0)
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
      .withColumn("cx", expr(s"x div $r"))
      .withColumn("cy", expr(s"y div $r"))
    // left side replicated into its 9-cell probe neighborhood
    val probes = p.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        col("cx").as("pcx"), col("cy").as("pcy"))
      .withColumn("dx", explode(expr("array(-1L, 0L, 1L)")))
      .withColumn("dy", explode(expr("array(-1L, 0L, 1L)")))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("pcx") + col("dx")).as("cx"), (col("pcy") + col("dy")).as("cy"))
    val right = p.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      col("cx"), col("cy"))
    probes.join(right, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= lit(r * r))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
