package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Seidman 1983): repeatedly
  * delete nodes of degree < k until none remain; the survivors form the
  * k-core, the standard cohesive-subgraph filter (spam/bot rings and
  * tight collaboration groups survive; tendrils do not).
  *
  * Determinism: peeling is pure integer degree arithmetic, and the
  * peeling ORDER does not matter (removing any degree-deficient node
  * never makes another node eligible to stay), so a fixed round count R
  * yields identical bits on any engine — and if the peel has CONVERGED
  * by round R, the result IS the exact k-core, independent of R. The
  * q157 gate pins the whole trajectory: per-round survivor counts, so
  * an engine that peels differently in ANY round trips the hash.
  *
  * Scale design (100 TB): each round is one degree count (map-side
  * combined) + two semi joins of the edge list against the (much
  * smaller) surviving-node set — O(R) edge-list shuffles, nothing
  * quadratic, the same bound as LPA ([[Communities]]). Convergence on
  * real graphs is fast (the degeneracy peel removes whole shells per
  * round); R is a snapshot bound, not an accuracy knob, and the
  * trajectory output makes an unconverged R visible (last two rounds
  * differ).
  */
object KCore {

  /** Edge lists after each of `rounds` peels of the UNDIRECTED simple
    * graph `edges` (a < b, deduplicated by the caller). Element i is the
    * edge list after i+1 peels. */
  def peels(edges: DataFrame, k: Int, rounds: Int): Seq[DataFrame] = {
    require(k >= 1 && rounds >= 1)
    // Lineage is CUT each round (eager localCheckpoint): round i's plan
    // references e_{i-1} three times (twice in the degree union, once as
    // the semi-join source), so an uncut plan re-expands 3^i-fold — and
    // persist() alone does not save it, because AQE-era cache lookup by
    // canonicalized plan misses on these nested shapes and silently
    // recomputes. Checkpointing materializes each round once and makes
    // every later action O(cached edge list). A multi-node deployment
    // with executor loss would use reliable checkpoint(dir) instead;
    // the round structure is identical.
    var e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
      .localCheckpoint(true)
    (1 to rounds).map { _ =>
      val deg = e.select(col("a").as("u")).union(e.select(col("b").as("u")))
        .groupBy("u").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("u")
      e = e
        .join(keep.withColumnRenamed("u", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("u", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      e
    }
  }

  /** Peeling trajectory: one row per round with surviving node/edge
    * counts and an xor pin over surviving nodes. Columns: round,
    * n_nodes, n_edges, xor_nodes. */
  def trajectory(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val reports = peels(edges, k, rounds).zipWithIndex.map { case (e, i) =>
      val nodes = e.select(col("a").as("u")).union(e.select(col("b").as("u")))
        .distinct()
      nodes.agg(
          count(lit(1)).as("n_nodes"),
          coalesce(expr("bit_xor(u)"), lit(0L)).as("xor_nodes"))
        .crossJoin(e.agg(count(lit(1)).as("n_edges")))
        .select(lit(i + 1L).as("round"), col("n_nodes"), col("n_edges"),
          col("xor_nodes"))
    }
    reports.reduce(_.union(_)).orderBy("round")
  }

  /** The matching DuckDB SQL, generated from the same constants: a chain
    * of `rounds` peels over an `edges(a, b)` CTE the caller supplies.
    * Pure integer counts — the chain cannot drift from [[trajectory]]. */
  def oracleSql(edgesCte: String, k: Int, rounds: Int): String = {
    // every CTE is MATERIALIZED: each e_i is referenced several times
    // downstream, and an inlining engine would otherwise re-expand the
    // whole chain exponentially
    val pre = s"WITH e0 AS MATERIALIZED ($edgesCte)"
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM (
           SELECT a AS u FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
           GROUP BY u),
         k$i AS MATERIALIZED (SELECT u FROM d$i WHERE d >= $k),
         e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
           WHERE a IN (SELECT u FROM k$i) AND b IN (SELECT u FROM k$i))"""
    }.mkString(",\n", ",\n", "")
    val rows = (1 to rounds).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round,
           (SELECT COUNT(*) FROM (SELECT DISTINCT u FROM
              (SELECT a AS u FROM e$i UNION ALL SELECT b FROM e$i))) AS n_nodes,
           (SELECT COUNT(*) FROM e$i) AS n_edges,
           (SELECT CAST(COALESCE(bit_xor(u), 0) AS BIGINT) FROM
              (SELECT DISTINCT u FROM
                (SELECT a AS u FROM e$i UNION ALL SELECT b FROM e$i))) AS xor_nodes"""
    }.mkString(" UNION ALL ")
    s"$pre$steps SELECT * FROM ($rows) ORDER BY round"
  }
}
