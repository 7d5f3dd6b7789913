package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the constraint-check report a
  * pipeline gates a new drop on before publishing it (the Deequ /
  * Great-Expectations operator class, re-expressed as plain Spark
  * aggregates). Three check families:
  *
  *  - '''predicate checks''' ([[checks]]): any row-level `Column`
  *    predicate (completeness, ranges, domains, formats). ALL predicates
  *    for a table are counted in ONE wide aggregate — one scan total,
  *    like [[Profile]] — with a null predicate counting as a violation
  *    (ternary logic never lets a null sneak past a range check).
  *  - '''uniqueness''' ([[checks]]' `uniqueKeys`): n_rows − n_distinct
  *    over key tuples, planned into the same single scan via Spark's
  *    multi-count-distinct Expand.
  *  - '''referential integrity''' ([[refIntegrity]]): orphan count via
  *    a left-anti join — the one family that genuinely needs a second
  *    table; keyed shuffle (or broadcast when the parent is a dim).
  *
  * Report rows are (check, n_rows, n_bad, pass) — uniform, unionable
  * across tables, and cheap to persist per ingest batch (a [[graft.catalog.Rollup]]
  * over the report is drift monitoring for free).
  */
object Validate {

  /** Row-predicate + uniqueness checks in one scan. Each predicate is
    * named; a row violates it when the predicate is false OR null. */
  def checks(df: DataFrame, preds: Seq[(String, Column)],
             uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(preds.nonEmpty || uniqueKeys.nonEmpty, "no checks given")
    // internal aliases are POSITIONAL (bad_0, bad_1…): a check name is
    // user text and must never be parsed as SQL (a quote/backtick/dot in
    // the name would break a selectExpr/stack round-trip)
    val predAggs = preds.zipWithIndex.map { case ((_, p), i) =>
      coalesce(sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"bad_$i")
    }
    // struct() so null-containing key tuples still participate in the
    // distinct count (bare COUNT(DISTINCT a, b) silently skips them)
    val uniqAggs = uniqueKeys.zipWithIndex.map { case ((_, cols), j) =>
      (count(lit(1)) - countDistinct(struct(cols.map(col): _*)))
        .cast("long").as(s"bad_${preds.size + j}")
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), (predAggs ++ uniqAggs): _*)
    val names = preds.map(_._1) ++ uniqueKeys.map(_._1)
    // typed unpivot (explode over literal structs): name strings stay
    // DATA, never SQL text
    val kvs = names.zipWithIndex.map { case (n, i) =>
      struct(lit(n).as("check_name"), col(s"bad_$i").as("n_bad"))
    }
    wide.select(col("n_rows"), explode(array(kvs: _*)).as("kv"))
      .select(col("kv.check_name").as("check_name"), col("n_rows"),
        col("kv.n_bad").as("n_bad"), (col("kv.n_bad") === 0L).as("pass"))
  }

  /** The [[checks]] predicates as SUM-mergeable rollup counters
    * (`n_rows` plus one violation count per check) — drop-in for
    * [[graft.streaming.EventStreams.maintainRollup]], which turns a
    * stream into per-epoch quality partials: totals fold at read, drift
    * shows up by comparing epochs, and the exactly-once epoch-overwrite
    * contract makes the monitor crash-safe for free. */
  def qualityCounters(preds: Seq[(String, Column)]): Seq[(String, Column)] =
    ("n_rows" -> count(lit(1))) +: preds.map { case (name, p) =>
      s"bad_$name" ->
        coalesce(sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)), lit(0L))
    }

  /** Orphan check: child rows whose key tuple has no match in the
    * parent. Null child keys are orphans (they reference nothing). */
  def refIntegrity(name: String, child: DataFrame, childKeys: Seq[String],
                   parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    require(childKeys.size == parentKeys.size && childKeys.nonEmpty)
    val cond = childKeys.zip(parentKeys).map { case (c, p) =>
      child(c) === parent(p)
    }.reduce(_ && _)
    val orphans = child.join(parent, cond, "left_anti")
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_bad"))))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_bad"),
        (col("n_bad") === 0L).as("pass"))
  }

  /** Schema + content drift between two snapshots of "the same" table —
    * the contract check a pipeline runs before swapping a refreshed
    * extract in. Structural drift (columns added / removed / retyped) is
    * metadata-only; content drift is the per-common-column null-rate
    * delta, computed with ONE conditional-sum aggregate per side and
    * compared against `nullRateTol` in EXACT integer cross-multiplication
    * (|n_b·nulls_a·den − n_a·nulls_b·den| vs tolNum·n_a·n_b — no float
    * threshold). Output: one row per finding; empty = no drift. */
  def schemaDrift(a: DataFrame, b: DataFrame,
                  nullTolNum: Long = 1, nullTolDen: Long = 100): DataFrame = {
    import a.sparkSession.implicits._
    val at = a.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val bt = b.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val structural =
      (bt.keySet -- at.keySet).toSeq.sorted.map(c => (c, "added", "", bt(c))) ++
      (at.keySet -- bt.keySet).toSeq.sorted.map(c => (c, "removed", at(c), "")) ++
      at.keySet.intersect(bt.keySet).toSeq.sorted
        .filter(c => at(c) != bt(c)).map(c => (c, "retyped", at(c), bt(c)))
    val common = at.keySet.intersect(bt.keySet).toSeq.sorted
      .filter(c => at(c) == bt(c))
    def nullCounts(df: DataFrame) = {
      val aggs = count(lit(1)).as("_n") +:
        common.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"))
      val r = df.agg(aggs.head, aggs.tail: _*).collect().head
      (r.getLong(0), common.zipWithIndex.map { case (c, i) => c -> r.getLong(i + 1) }.toMap)
    }
    val (na, nullsA) = nullCounts(a)
    val (nb, nullsB) = nullCounts(b)
    val content =
      if (na == 0 || nb == 0) Seq.empty
      else common.flatMap { c =>
        // |nulls_a/n_a − nulls_b/n_b| > tol, cross-multiplied exactly.
        // BigInt: n_a·n_b·tolDen clears 2^63 already for two ~3·10^8-row
        // tables at the default tolDen=100 — a Long here would wrap and
        // silently flip the verdict. Counts are driver-side scalars, so
        // the arbitrary-precision cost is nil.
        val lhs = (BigInt(nullsA(c)) * nb - BigInt(nullsB(c)) * na).abs * nullTolDen
        val rhs = BigInt(nullTolNum) * na * nb
        if (lhs > rhs)
          Some((c, "null_rate_drift",
            s"${nullsA(c)}/$na", s"${nullsB(c)}/$nb"))
        else None
      }
    (structural ++ content).toDF("column", "drift", "before", "after")
  }
}
