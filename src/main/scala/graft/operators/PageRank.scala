package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank (Brin & Page 1998) in exact integer arithmetic.
  *
  * Ranks are carried as BIGINT micro-units (1.0 ≡ `unit`), every division
  * is a positive-operand floor division, and every sum is an integer sum —
  * so the result is bit-identical on any engine and any partitioning, with
  * no float-summation order hazard. The trade: each iteration floors away
  * < 1 unit per division (and dangling nodes leak their mass, the
  * standard simplification), so ranks are a deterministic fixed point of
  * THIS arithmetic rather than the real-valued one — exactly what a
  * cross-engine gate needs.
  *
  * Scale design (100 TB): the classic distributed formulation — the edge
  * list is persisted once and reused across iterations; each iteration is
  * one src-keyed join (edges ⋈ ranks) and one dst-keyed aggregation, both
  * plain keyed shuffles. K iterations = 2K shuffles of the EDGE list,
  * never anything quadratic. Parallel edges are legal and act as weights
  * (each edge row contributes rank/outdeg once).
  */
object PageRank {

  /** Ranks after `iters` iterations with damping dampNum/dampDen.
    * Input: an edge DataFrame; nodes are inferred as src ∪ dst.
    * Returns (node, rank_units: BIGINT). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int = 5, dampNum: Long = 85, dampDen: Long = 100,
            unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))

    // the two scalar constants of the recurrence, computed ONCE:
    // base = ((unit * (dampDen - dampNum)) div dampDen) div n
    val n = nodes.count()
    if (n == 0) // empty graph: empty ranks, not a divide-by-zero
      return nodes.select(col("node"), lit(0L).as("rank_units"))
    val base = (unit * (dampDen - dampNum) / dampDen) / n
    val init = unit / n

    // `div` (not `/`): Long `/` is DOUBLE division in Spark SQL, and a
    // near-integer quotient could round across the floor; `div` is the
    // exact integer operator, matching DuckDB's `//` on positive longs.
    var ranks = nodes.withColumn("rank", lit(init))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), expr("rank div od").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr(s"$base + ($dampNum * coalesce(s, 0L)) div $dampDen").as("rank"))
    }
    ranks.select(col("node"), col("rank").cast("long").as("rank_units"))
      .orderBy("node")
  }

  /** The matching DuckDB SQL, generated from the same constants so the
    * two engines cannot drift: a chain of K materialized iterations over
    * an `edges(src, dst)` CTE the caller supplies. Positive-operand `//`
    * in DuckDB floors exactly like the Long division above. */
  def oracleSql(edgesCte: String, iters: Int = 5, dampNum: Long = 85,
                dampDen: Long = 100, unit: Long = 1000000000000L): String = {
    val pre =
      s"""WITH e AS ($edgesCte),
         nodes AS (SELECT DISTINCT src AS node FROM e
                   UNION SELECT DISTINCT dst FROM e),
         outdeg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
         consts AS (SELECT CAST($unit // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS init,
                    CAST((($unit * ${dampDen - dampNum}) // $dampDen)
                         // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS base),
         r0 AS (SELECT node, (SELECT init FROM consts) AS rank FROM nodes)"""
    val iterations = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
           CAST((SELECT base FROM consts)
                + ($dampNum * COALESCE(c.s, 0)) // $dampDen AS BIGINT) AS rank
         FROM nodes n LEFT JOIN (
           SELECT e.dst AS node, SUM(r.rank // od.od) AS s
           FROM e JOIN r${i - 1} r ON r.node = e.src
                  JOIN outdeg od ON od.src = e.src
           GROUP BY e.dst) c ON c.node = n.node)"""
    }.mkString(",\n", ",\n", "")
    s"""$pre$iterations
       SELECT node, CAST(rank AS BIGINT) AS rank_units
       FROM r$iters ORDER BY node"""
  }
}
