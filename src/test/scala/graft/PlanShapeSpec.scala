package graft

/** Physical-plan gates for the queries whose SCALE story depends on plan
  * shape, not just on result correctness. A regression here (a lost filter
  * pushdown, a reintroduced full-table sort) would keep CORRECTNESS green
  * while quietly breaking the 100 TB plan — so the shape itself is tested.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed layout: lineitem ⋈ orders on orderkey joins with ZERO exchange") {
    // the 100 TB storage story (Tables.bucketSpecs): both facts bucketed
    // and sorted on orderkey, so their join moves nothing. Broadcast is
    // disabled for the assertion — a small-fixture auto-broadcast would
    // hide a lost co-location just as green.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.catalog.Tables.ensureBucketed(spark, dir)
      val li = graft.catalog.Tables.load(spark, dir, "lineitem")
      val o = graft.catalog.Tables.load(spark, dir, "orders")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(li("l_orderkey"), o("o_orderdate"), li("l_extendedprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed fact-fact join must be exchange-free:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scans are not reading the bucketed layout:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      graft.catalog.Tables.clearBucketed()
    }
  }

  test("q58 lateral: outer constraint reaches the orders parquet scan") {
    val df = SparkEntry.queries("q58_lateral_topn")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the transitive predicate must be pushed into the ORDERS scan — the
    // ranking (WindowGroupLimit) then runs over 100 customers' orders, not
    // every customer's
    val ordersScan = plan.linesIterator
      .find(l => l.contains("orders.parquet") && l.contains("FileScan"))
      .getOrElse(fail(s"no orders scan in plan:\n$plan"))
    assert(ordersScan.contains("LessThanOrEqual(o_custkey,100)"),
      s"outer constraint not pushed into orders scan:\n$ordersScan")
    assert(plan.contains("WindowGroupLimit"), s"top-N not planned as WindowGroupLimit:\n$plan")
  }

  test("q52 exact quantiles: no window sorts un-aggregated base rows") {
    import org.apache.spark.sql.catalyst.plans.logical._
    val df = SparkEntry.queries("q52_exact_quantiles")(spark, dir)
    // every ordered window must sit ABOVE an aggregate: the per-group sort
    // then covers distinct values (bounded by the value domain), never the
    // raw table — the row_number formulation this replaced sorted ALL rows
    // in 3 reducers
    def reachesLeafWithoutAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: LeafNode => true
      case other => other.children.exists(reachesLeafWithoutAggregate)
    }
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.nonEmpty, "expected the running-count window")
    windows.foreach { w =>
      assert(!reachesLeafWithoutAggregate(w.child),
        s"window consumes un-aggregated base rows:\n${w.treeString}")
    }
    // and the result is still the same 3 groups
    assert(df.count() == 3)
  }

  test("q64 decontamination broadcasts the benchmark side") {
    val plan = SparkEntry.queries("q64_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$plan")
  }

  test("q65 packing window is shard-partitioned, never a single partition") {
    val plan = SparkEntry.queries("q65_sequence_packing")(spark, dir)
      .queryExecution.executedPlan.toString
    // the cumulative-sum exchange must hash on source; SinglePartition
    // would mean a global cumsum — the one-reducer anti-pattern
    assert(plan.contains("hashpartitioning(source"),
      s"packing window not partitioned by source:\n$plan")
    assert(!plan.contains("SinglePartition"), s"global single-partition step:\n$plan")
  }

  test("q67 chunking is map-only: no exchange anywhere in the plan") {
    val plan = SparkEntry.queries("q67_doc_chunks")(spark, dir)
      .queryExecution.executedPlan.toString
    // explode + slice per row; the only allowed exchange is the final
    // presentation orderBy's range partitioning
    val body = plan.linesIterator.filterNot(_.contains("rangepartitioning")).mkString("\n")
    assert(!body.contains("Exchange hashpartitioning"),
      s"chunking introduced a shuffle:\n$plan")
  }

  test("q68 BM25: corpus stats broadcast back, tf never explodes/shuffles") {
    val plan = SparkEntry.queries("q68_bm25_probe")(spark, dir)
      .queryExecution.executedPlan.toString
    // single-row stats frame joins via broadcast nested loop; per-term tf
    // is an array filter in the scan projection, so no Generate (explode)
    // and no SortMergeJoin may appear
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"stats not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"BM25 planned a shuffle join:\n$plan")
    assert(!plan.contains("Generate"), s"tf computed via explode, not array filter:\n$plan")
  }

  test("q69 mixture: per-domain thresholds broadcast to the keep filter") {
    val plan = SparkEntry.queries("q69_lang_mixture")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"threshold join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"mixture join fell back to SMJ:\n$plan")
  }

  test("q70 attribution joins on the user key, never a cartesian scan") {
    val plan = SparkEntry.queries("q70_attribution")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join lost its equi-key:\n$plan")
  }

  test("q71 heavy hitters: partial MG sketches combine map-side (ObjectHashAggregate)") {
    val plan = SparkEntry.queries("q71_heavy_terms")(spark, dir)
      .queryExecution.executedPlan.toString
    // partial ObjectHashAggregate below the exchange, final above: the
    // shuffle carries <= k counters per partition, never the token stream
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"MG aggregate not partial+final:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"TypedImperativeAggregate fell back to SortAggregate:\n$plan")
  }

  test("q73/q88: unpartitioned windows sit above aggregates, never raw rows") {
    import org.apache.spark.sql.catalyst.plans.logical._
    for (q <- Seq("q73_length_curriculum", "q88_wow_growth")) {
      def reachesLeafWithoutAggregate(p: LogicalPlan): Boolean = p match {
        case _: Aggregate => false
        case _: LeafNode => true
        case other => other.children.exists(reachesLeafWithoutAggregate)
      }
      val windows = SparkEntry.queries(q)(spark, dir)
        .queryExecution.optimizedPlan.collect { case w: Window => w }
      assert(windows.nonEmpty, s"$q: expected a window")
      windows.foreach { w =>
        assert(!reachesLeafWithoutAggregate(w.child),
          s"$q: window consumes un-aggregated base rows:\n${w.treeString}")
      }
    }
  }

  test("q82/q83 windows partition on user_id, never a single partition") {
    for (q <- Seq("q82_scd2_intervals", "q83_event_transitions")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(user_id"),
        s"$q: per-user window not partitioned:\n$plan")
    }
  }

  test("q87 salted aggregate: phase-1 exchange spreads each key over salts") {
    val plan = SparkEntry.queries("q87_salted_hot_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    // the first exchange must partition on (event_type, _salt) — that is
    // the whole point: a hot key fans out over `salts` reducers
    assert(plan.contains("hashpartitioning(event_type") && plan.contains("_salt"),
      s"salt missing from the phase-1 exchange:\n$plan")
  }

  test("dimension joins broadcast the small side (q03, q35, q36)") {
    // at 100 TB the fact side must never shuffle for a dimension lookup:
    // every dimension join plans as a BroadcastHashJoin, and no
    // SortMergeJoin touches the plan
    for (q <- Seq("q03_topk_revenue", "q35_regional_volume", "q36_returned_items")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: no broadcast join:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q: dimension join fell back to SMJ:\n$plan")
    }
  }

  test("q89 brand filter prunes the part scan and every aggregate sits above a join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = SparkEntry.queries("q89_small_qty_revenue")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val partScans = plan.linesIterator
      .filter(l => l.contains("part.parquet") && l.contains("FileScan")).toList
    assert(partScans.nonEmpty && partScans.forall(_.contains("EqualTo(p_brand,Brand#4)")),
      s"brand filter not pushed to part scan:\n$plan")
    // the decorrelation refinement: the per-part average aggregates the
    // brand JOIN's output, never a bare lineitem scan — so every Aggregate
    // in the optimized plan must have a Join somewhere beneath it
    val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, "expected the per-part average aggregate")
    aggs.foreach { a =>
      assert(a.child.collect { case j: Join => j }.nonEmpty,
        s"aggregate runs over an un-pruned input:\n${a.treeString}")
    }
  }

  test("q90 anti join: recency predicate reaches the orders scan") {
    val plan = SparkEntry.queries("q90_inactive_rich_customers")(spark, dir)
      .queryExecution.executedPlan.toString
    val ordersScan = plan.linesIterator
      .find(l => l.contains("orders.parquet") && l.contains("FileScan"))
      .getOrElse(fail(s"no orders scan in plan:\n$plan"))
    assert(ordersScan.contains("GreaterThanOrEqual(o_orderdate"),
      s"recency filter not pushed into the anti join's build input:\n$ordersScan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not planned as anti join:\n$plan")
  }

  test("q101 decorrelation: ONE pruned lineitem scan, broadcast family filter, semi join") {
    val df = SparkEntry.queries("q101_dominant_suppliers")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the nested-IN shape must not scan the fact table once per subquery
    // level: one lineitem scan feeds both aggregation levels
    val liScans = plan.linesIterator
      .filter(l => l.contains("lineitem.parquet") && l.contains("FileScan")).toList
    assert(liScans.size == 1, s"expected exactly 1 lineitem scan, got ${liScans.size}:\n$plan")
    // scan must read only the 3 needed columns
    assert(liScans.head.contains("l_partkey") && liScans.head.contains("l_quantity")
      && !liScans.head.contains("l_extendedprice"),
      s"lineitem scan not column-pruned:\n${liScans.head}")
    assert(plan.contains("BroadcastHashJoin"), s"part family filter must broadcast:\n$plan")
    assert(plan.contains("LeftSemi"), s"supplier qualification must be a semi join:\n$plan")
  }

  test("q102 aggregated view is reused: one lineitem scan, pushed date filter") {
    val df = SparkEntry.queries("q102_top_supplier")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val liScans = plan.linesIterator
      .filter(l => l.contains("lineitem.parquet") && l.contains("FileScan")).toList
    assert(liScans.size == 1,
      s"revenue view must aggregate once, got ${liScans.size} lineitem scans:\n$plan")
    assert(liScans.head.contains("GreaterThanOrEqual(l_shipdate"),
      s"ship-date filter not pushed to scan:\n${liScans.head}")
    // the max runs over the |suppliers|-row aggregate, never raw lineitem:
    // the Window's input must be the HashAggregate
    assert(plan.contains("Window"), s"max-over-view must be a window:\n$plan")
  }

  test("cube/rollup/grouping-sets queries expand AGGREGATES, not fact rows (q09/q10/q45/q100)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, LogicalPlan}
    // the naive plan's Expand multiplies every fact row by the
    // grouping-set count before the partial aggregate; the two-level
    // rewrite must feed each Expand from a finest-grain Aggregate
    def expandFedByAggregate(p: LogicalPlan): Boolean = {
      val expands = p.collect { case e: Expand => e }
      expands.nonEmpty && expands.forall(_.child.collectFirst { case a: Aggregate => a }.nonEmpty)
    }
    for (q <- Seq("q09_rollup_revenue", "q10_cube_counts", "q45_grouping_sets",
        "q100_rollup_grouping")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan
      assert(expandFedByAggregate(plan), s"$q: Expand runs over raw rows:\n$plan")
    }
  }

  test("q107 profile reads the table ONCE for all per-column stats") {
    val df = SparkEntry.queries("q107_profile")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the per-column UNION ALL oracle scans once per column; the
    // one-pass wide aggregate is the operator's point
    val scans = plan.linesIterator
      .filter(l => l.contains("orders.parquet") && l.contains("FileScan")).toList
    assert(scans.size == 1, s"expected exactly 1 orders scan, got ${scans.size}:\n$plan")
  }

  test("q103 EXISTS/NOT-EXISTS folds to window counts: ONE lineitem scan, no self-join") {
    val df = SparkEntry.queries("q103_waiting_suppliers")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the classic Q21 form scans the fact table three times (l1 + EXISTS
    // + NOT EXISTS); the window rewrite must scan it exactly once
    val liScans = plan.linesIterator
      .filter(l => l.contains("lineitem.parquet") && l.contains("FileScan")).toList
    assert(liScans.size == 1, s"expected exactly 1 lineitem scan, got ${liScans.size}:\n$plan")
    assert(liScans.head.contains("l_suppkey") && !liScans.head.contains("l_quantity"),
      s"lineitem scan not column-pruned:\n${liScans.head}")
    // both correlated counts ride one orderkey-partitioned window
    assert(plan.contains("Window") && plan.contains("hashpartitioning(l_orderkey"),
      s"per-order counts must be an orderkey window:\n$plan")
    assert(plan.contains("LeftSemi"), s"F-order qualification must be a semi join:\n$plan")
  }

  test("q104 grouped-HAVING qualification aggregates lineitem once, ends in top-k") {
    val df = SparkEntry.queries("q104_large_orders")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the nested-IN form aggregates lineitem twice; computing the
    // per-order quantity once must leave a single fact scan
    val liScans = plan.linesIterator
      .filter(l => l.contains("lineitem.parquet") && l.contains("FileScan")).toList
    assert(liScans.size == 1, s"expected exactly 1 lineitem scan, got ${liScans.size}:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"limit+orderBy must plan as top-k, not a global sort:\n$plan")
  }

  test("q97 latest-per-user plans as WindowGroupLimit on a user_id exchange") {
    val plan = SparkEntry.queries("q97_latest_per_user")(spark, dir)
      .queryExecution.executedPlan.toString
    // rank-1 filter must push a per-task group limit below the exchange —
    // the shuffle then carries |users| rows, not |events|
    assert(plan.contains("WindowGroupLimit"),
      s"rank-1 filter not planned as WindowGroupLimit:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"),
      s"window not partitioned by user_id:\n$plan")
  }

  test("runtime bloom filter: selective dim filter reaches the fact scan") {
    // the 100 TB shuffle-join story: when the dim side is too big to
    // broadcast but carries a selective predicate, Spark's InjectRuntimeFilter
    // builds a bloom filter from the filtered dim keys and applies it
    // map-side on the fact BEFORE the shuffle — fact rows that cannot join
    // never enter the exchange. GraftSession enables the rule; the
    // application-side size gate (10 GB default — correct in prod, where
    // the fact side is the 100 TB table) is lowered here so the rule fires
    // on the test fixture.
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = graft.catalog.Tables.load(spark, dir, "lineitem")
      val p = graft.catalog.Tables.load(spark, dir, "part")
        .filter(org.apache.spark.sql.functions.col("p_size") === 1)
      val j = li.join(p, li("l_partkey") === p("p_partkey"))
        .select(li("l_orderkey"), p("p_name"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom runtime filter injected on the fact side:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("q133: the explicit bloom probe prunes lineitem BELOW the join") {
    // operators.Prune is the caller-controlled twin of InjectRuntimeFilter
    // (no optimizer threshold dependence): the probe must run on the fact
    // side UNDER the merge join, so pruned rows never reach the exchange.
    val df = SparkEntry.queries("q133_bloom_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge-hinted join not planned:\n$plan")
    val joinLine = plan.linesIterator.indexWhere(_.contains("SortMergeJoin"))
    val probeLine = plan.linesIterator.indexWhere(_.contains("graft_bloom_contains"))
    assert(probeLine > joinLine && joinLine >= 0,
      s"bloom probe must sit below the join (join@$joinLine, probe@$probeLine):\n$plan")
    // and the bitmap is an embedded task-level literal, not a joined-in
    // binary COLUMN: the old crossJoin(broadcast(bitmap)) shape re-read
    // (= copied, via UnsafeRow.getBinary) the bitmap per fact row
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bloom bitmap must be a literal, not a per-row joined column:\n$plan")
  }

  test("q136 predicate + uniqueness checks all run in ONE table scan") {
    import org.apache.spark.sql.functions._
    val o = graft.catalog.Tables.load(spark, dir, "orders")
    val rep = graft.operators.Validate.checks(o, Seq(
        "complete" -> col("o_custkey").isNotNull,
        "domain" -> col("o_orderstatus").isin("O", "F", "P"),
        "positive" -> (col("o_totalprice") > 0.0)),
      uniqueKeys = Seq("unique" -> Seq("o_orderkey")))
    val plan = rep.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("orders"))
    assert(scans == 1, s"expected ONE orders scan for the whole report, got $scans:\n$plan")
  }

  test("q144: NOT IN plans as a null-aware anti join, not a plain anti join") {
    val df = SparkEntry.queries("q144_not_in_nulls")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the trailing `true` on BroadcastHashJoin ... LeftAnti, BuildRight is
    // Spark's isNullAwareAntiJoin flag — the 3VL-correct variant
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"NOT IN lost its null-aware anti join plan shape:\n$plan")
  }

  test("q92 mode window ranks counts, never raw lineitem rows") {
    import org.apache.spark.sql.catalyst.plans.logical._
    val df = SparkEntry.queries("q92_mode_quantity")(spark, dir)
    def reachesLeafWithoutAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: LeafNode => true
      case other => other.children.exists(reachesLeafWithoutAggregate)
    }
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.nonEmpty, "expected the ranking window")
    windows.foreach { w =>
      assert(!reachesLeafWithoutAggregate(w.child),
        s"window consumes un-aggregated base rows:\n${w.treeString}")
    }
  }

  test("q116 min-cost supplier: ONE lineitem scan, dims broadcast, part-keyed window") {
    val df = SparkEntry.queries("q116_min_cost_supplier")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the correlated-MIN classic form would plant the scoped join twice;
    // the window rewrite scans the fact table exactly once
    val liScans = plan.linesIterator
      .filter(l => l.contains("lineitem.parquet") && l.contains("FileScan")).toList
    assert(liScans.size == 1, s"expected exactly 1 lineitem scan, got ${liScans.size}:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension joins must broadcast, never shuffle the fact side:\n$plan")
    assert(plan.contains("Window") && plan.contains("hashpartitioning(p_partkey"),
      s"per-part minimum must be a p_partkey window:\n$plan")
  }

  test("q113 cdc-dedup: every window is partitioned (no global sort point)") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    // the scale claim: the running boundary sum partitions by document and
    // the keep-first rank partitions by chunk content — an empty partition
    // spec anywhere would serialize the whole corpus through one reducer
    val df = SparkEntry.queries("q113_cdc_dedup")(spark, dir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.size >= 2, "expected the per-doc and per-chunk windows")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window in cdc dedup:\n${w.treeString}")
    }
  }

  test("q123 LM scoring: top-k plans as TakeOrderedAndProject, model joins are real") {
    val df = SparkEntry.queries("q123_lm_bigram_score")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the top-15 must never be a global sort of all scored docs
    assert(plan.contains("TakeOrderedAndProject"),
      s"q123 top-k not TakeOrderedAndProject:\n$plan")
    // no cartesian/BNLJ fallback anywhere in the model re-join
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q123 model join degenerated:\n$plan")
  }

  test("q125 temperature resample: plan broadcast to a map-side explode, no extra shuffle") {
    val df = SparkEntry.queries("q125_temperature_resample")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the |domains|-row plan must broadcast into the per-doc join; a
    // shuffled join here would move the whole corpus for a 20-row table
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"q125 plan join not broadcast:\n$plan")
    // the copy materialization is an explode (Generate), not a join
    assert(plan.contains("Generate"), s"q125 copies not exploded map-side:\n$plan")
  }

  test("q126 MAD: every window sits above an aggregate and is group-partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LeafNode, LogicalPlan, Window => LWindow}
    val df = SparkEntry.queries("q126_mad_outliers")(spark, dir)
    def reachesLeafWithoutAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: LeafNode => true
      case other => other.children.exists(reachesLeafWithoutAggregate)
    }
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.size >= 2, "expected the value and deviation median windows")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window:\n${w.treeString}")
      assert(!reachesLeafWithoutAggregate(w.child),
        s"window sorts raw rows, not the distinct-value aggregate:\n${w.treeString}")
    }
  }

  test("q130 triangles: blocked joins only, never a cartesian fallback") {
    val df = SparkEntry.queries("q130_triangle_count")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"triangle enumeration degenerated to a cartesian product:\n$plan")
  }

  test("q131: each table's share of the disjunction is pushed below the join") {
    val df = SparkEntry.queries("q131_disjunctive_revenue")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val pushedOr = plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("Or(") && l.contains("p_brand"))
    assert(pushedOr,
      s"part's share of the OR-of-conjunctions was not pushed to its scan:\n$plan")
    val pushedQty = plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("Or(") && l.contains("l_quantity"))
    assert(pushedQty,
      s"lineitem's share of the disjunction was not pushed to its scan:\n$plan")
  }

  test("q124 markup strip is shuffle-free up to its final order") {
    import org.apache.spark.sql.catalyst.plans.logical.{Sort => LSort}
    val df = SparkEntry.queries("q124_strip_markup")(spark, dir)
    // per-row regex chain fused into the scan: the ONLY ordering/exchange
    // is the presentation ORDER BY doc_id; no aggregation, no join
    val plan = df.queryExecution.optimizedPlan
    val sorts = plan.collect { case s: LSort => s }
    assert(sorts.size == 1, s"expected exactly the presentation sort:\n$plan")
    val pstr = df.queryExecution.executedPlan.toString
    assert(!pstr.contains("HashAggregate") && !pstr.contains("Join"),
      s"q124 should be a pure map + sort:\n$pstr")
  }

  test("q161 five-way profit join: all three dims broadcast, part filter pushed") {
    val df = SparkEntry.queries("q161_profit_by_nation")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the fact never shuffles for a dim: part/supplier/nation all arrive
    // as broadcasts; only the li ⋈ orders key join may exchange
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3,
      s"expected 3 broadcast dim joins:\n$plan")
    val partScan = plan.linesIterator
      .find(l => l.contains("part.parquet") && l.contains("FileScan"))
      .getOrElse(fail(s"no part scan:\n$plan"))
    assert(partScan.contains("EqualTo(p_type,PROMO)"),
      s"part filter not pushed to its scan:\n$partScan")
  }

  test("q166 decorrelated average: ONE lineitem scan, window partitioned by part") {
    val df = SparkEntry.queries("q166_small_qty_revenue")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val liScans = plan.linesIterator.count(l =>
      l.contains("lineitem.parquet") && l.contains("FileScan"))
    assert(liScans == 1,
      s"correlated-average decorrelation must scan lineitem ONCE, saw $liScans:\n$plan")
    // the per-part window must be partitioned (no global sort point)
    assert(!plan.linesIterator.exists(l =>
        l.trim.startsWith("Window ") && !l.contains("l_partkey")),
      s"window not partitioned by part key:\n$plan")
  }

  test("q173 set-similarity join: no cartesian, verification joins broadcast-pruned") {
    val df = SparkEntry.queries("q173_setsim_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"set-similarity join degenerated to a cartesian product:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate-id prune should broadcast, not shuffle the element list:\n$plan")
  }

  test("q175 sweep line: running-concurrency windows are day-partitioned") {
    val df = SparkEntry.queries("q175_peak_concurrency")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l =>
        l.trim.startsWith("Window ") && !l.contains("day")),
      s"sweep window lost its day partitioning (global sort point):\n$plan")
  }

  test("q176 gini: the rank window runs over aggregated count values only") {
    import org.apache.spark.sql.catalyst.plans.logical._
    val df = SparkEntry.queries("q176_key_skew_gini")(spark, dir)
    def reachesLeafWithoutAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: LeafNode => true
      case other => other.children.exists(reachesLeafWithoutAggregate)
    }
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(!reachesLeafWithoutAggregate(w.child),
        s"gini rank window sorts un-aggregated base rows:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("q192/q194 time-series: every window is aggregate-bounded (spine, not fact)") {
    import org.apache.spark.sql.catalyst.plans.logical._
    def reachesLeafWithoutAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: LeafNode => true
      case other => other.children.exists(reachesLeafWithoutAggregate)
    }
    for (q <- Seq("q192_daily_trend", "q194_changepoint", "q209_rolling_corr")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      windows.foreach { w =>
        assert(!reachesLeafWithoutAggregate(w.child),
          s"$q: a window sorts un-aggregated event rows:\n${df.queryExecution.optimizedPlan}")
      }
    }
  }

  test("q197 vocab bitmask: vocab is a LIMIT (TakeOrdered), joined by broadcast") {
    val df = SparkEntry.queries("q197_vocab_bitmask")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-24 must plan as TakeOrderedAndProject, not a rank window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"24-row vocab must broadcast into the token join:\n$plan")
  }

  test("q204 image phash: band join is equi (no cartesian), hashes only shuffle") {
    val df = SparkEntry.queries("q204_image_phash_dups")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"band candidate join degenerated to an all-pairs product:\n$plan")
  }

  test("q210 trigrams: global top-10 is TakeOrderedAndProject, not a rank window") {
    val df = SparkEntry.queries("q210_event_trigrams")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 paths must not plan a corpus-wide rank window:\n$plan")
  }

  test("q249 spatial join: grid blocking plans an equi-join, never a cross product") {
    val df = SparkEntry.queries("q249_spatial_pairs")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the pair generation must ride the (cx, cy) cell key — a cartesian
    // (or BNLJ on the pair predicate) would be the n² plan grid blocking
    // exists to avoid. The only legal nested-loop is the final single-row
    // summary crossJoin.
    val body = plan.linesIterator.filterNot(_.contains("rows=1")).mkString("\n")
    assert(!body.contains("CartesianProduct"),
      s"spatial candidate join degenerated to a cross product:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"expected a keyed equi-join on the cell key:\n$plan")
  }

  test("q252 Zipf head: top-50 is TakeOrderedAndProject, rank window over 50 rows only") {
    val df = SparkEntry.queries("q252_zipf_head")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocabulary top-50 must never be a global rank window:\n$plan")
  }

  test("q251 Heaps fences: broadcast joins, no sort or rank window anywhere") {
    val df = SparkEntry.queries("q251_heaps_law")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(_.trim.startsWith("Window")),
      s"id-range fences must not need a rank window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 5-row fence table must broadcast into the censuses:\n$plan")
  }

  test("q254/q257: every window is partitioned or value-domain bounded") {
    // q254's cumulative risk window runs over the duration-day domain
    // (calendar-bounded); q257's running max is per-user. Neither may
    // grow a window over raw fact rows.
    val km = SparkEntry.queries("q254_kaplan_meier")(spark, dir)
      .queryExecution.optimizedPlan
    val kmWindows = km.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(kmWindows.nonEmpty)
    // the only unpartitioned window sits above the per-duration aggregate
    kmWindows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty, s"q254 unpartitioned window not above an aggregate:\n${w.treeString}")
    }
    val dp = SparkEntry.queries("q257_disorder_profile")(spark, dir)
      .queryExecution.optimizedPlan
    dp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
      .foreach { w => assert(w.partitionSpec.nonEmpty,
        s"q257 running max must be per-user partitioned:\n${w.treeString}") }
  }

  test("q259 imputation: the 5-row median table broadcasts into the repair join") {
    val df = SparkEntry.queries("q259_impute_median")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"median lookup must broadcast, not shuffle the fact:\n$plan")
  }

  test("q199 histogram: fences come from ONE aggregate pass (a single window)") {
    val df = SparkEntry.queries("q199_equidepth_hist")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val windowOps = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windowOps <= 1,
      s"expected a single cumulative window (one fence pass), saw $windowOps:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 7-row fence table must broadcast into the bucket tagging:\n$plan")
  }

  test("q237 fk discovery: edge verdicts read materialized profiles, not base tables") {
    // gate for the concurrent-profile rewrite: the 9 (table, column) key
    // profiles are materialized up front (overlapping localCheckpoint
    // jobs), so the final 7-edge verdict job must contain ZERO file
    // scans — every side-aggregate reads a checkpointed (k, cnt) RDD. A
    // re-derived profile (the naive per-edge formulation that scanned
    // lineitem/orders/customer 2-4x) would reappear here as a parquet
    // scan inside the verdict plan.
    val df = SparkEntry.queries("q237_fk_discovery")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val fileScans = plan.linesIterator.count(l =>
      l.contains("FileScan") || l.contains("Scan parquet"))
    assert(fileScans == 0,
      s"q237 edge verdicts must read materialized profiles only, saw $fileScans file scans:\n$plan")
    val rddScans = plan.linesIterator.count(_.contains("ExistingRDD"))
    assert(rddScans >= 7,
      s"expected the 7 edges to consume checkpointed profile RDDs, saw $rddScans:\n$plan")
  }
}
