package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.Hashing
import graft.queries.Relational.Q

/** Pipeline-QC operators: event-time disorder profiling (the input that
  * sizes streaming watermarks), mixture-concentration indices, and a
  * deterministic missing-value imputation pipeline.
  *
  * Exactness: timestamps ride as exact epoch-microsecond BIGINTs, all
  * counts/sums are BIGINT, each emitted statistic ends in at most one
  * IEEE division.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[(String, Q)] = Seq(

    // ---- event-time disorder profile (watermark sizing) -----------------
    // How out-of-order is the stream? Per user, arrival order is
    // event_id (the generation sequence); an event is LATE if an
    // already-arrived event of that user carries a newer event time, and
    // its lateness is the gap to the per-user running max — exactly the
    // quantity `withWatermark` must dominate for the streaming operators
    // (EventStreams/DocStreams) to never drop it. Per event type:
    // late-event count/share, max and total lateness. The running max is
    // an entity-bounded per-user window; everything else is one
    // map-side-combinable aggregate.
    "q257_disorder_profile" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("runmax", max(col("us")).over(w))
          .withColumn("late_us",
            greatest(coalesce(col("runmax") - col("us"), lit(0L)), lit(0L)))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
            max(col("late_us")).as("max_late_us"),
            sum(col("late_us")).as("sum_late_us"))
          .withColumn("late_share",
            col("n_late").cast("double") / col("n_events").cast("double"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, EPOCH_US(ts) AS us
            FROM events),
        r AS (SELECT event_type, us,
            MAX(us) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
          FROM e),
        l AS (SELECT event_type,
            GREATEST(COALESCE(runmax - us, 0), 0) AS late_us FROM r)
        SELECT event_type, COUNT(*) AS n_events,
          CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
          CAST(MAX(late_us) AS BIGINT) AS max_late_us,
          CAST(SUM(late_us) AS BIGINT) AS sum_late_us,
          CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS late_share
        FROM l GROUP BY event_type ORDER BY event_type""")),

    // ---- Simpson diversity / mixture concentration ----------------------
    // The corpus-mixture health check entropy can't give exactly (log is
    // not portable cross-engine): Simpson's index 1 − Σp_i² and the
    // effective class count n²/Σn_i² — both exact-integer
    // numerator/denominator with ONE IEEE division each. Reported for
    // the language mixture per source (the q69 composition, reduced to
    // one comparable concentration number per source).
    "q258_simpson_diversity" -> Q(
      (s, dir) => {
        t(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(sum(col("c")).as("n"), count(lit(1)).as("n_langs"),
            sum(col("c") * col("c")).as("sum_sq"))
          .select(col("source"), col("n"), col("n_langs"),
            (lit(1d) - col("sum_sq").cast("double")
              / (col("n") * col("n")).cast("double")).as("simpson"),
            ((col("n") * col("n")).cast("double") / col("sum_sq").cast("double"))
              .as("effective_langs"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, lang, COUNT(*) AS c
            FROM documents GROUP BY source, lang),
        a AS (SELECT source, SUM(c) AS n, COUNT(*) AS n_langs,
            SUM(c * c) AS sum_sq FROM c GROUP BY source)
        SELECT source, CAST(n AS BIGINT) AS n, CAST(n_langs AS BIGINT) AS n_langs,
          1 - CAST(sum_sq AS DOUBLE) / CAST(n * n AS DOUBLE) AS simpson,
          CAST(n * n AS DOUBLE) / CAST(sum_sq AS DOUBLE) AS effective_langs
        FROM a ORDER BY source""")),

    // ---- median imputation pipeline -------------------------------------
    // The ETL repair step, end-to-end and hash-gated: a deterministic
    // md5 draw REDACTS ~10% of the props.k readings (both engines redact
    // the identical rows), the per-type exact lower median of the
    // surviving values is computed COUNT-FIRST over the value domain
    // (the q52/operators.Robust trick — never a per-row rank), and every
    // missing reading is filled with its group median. The audit row per
    // type carries n/n_missing/median and the post-imputation sum — so
    // the gate checks the injected missingness, the exact median, AND
    // the repair in one hash.
    "q259_impute_median" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .withColumn("k_obs",
            when(pmod(Hashing.h28(concat(lit("miss"), col("event_id").cast("string"))),
              lit(10L)) === 0L, lit(null).cast("long"))
              .otherwise(col("k")))
        val med = graft.operators.Robust.medians(
          ev.filter(col("k_obs").isNotNull), "event_type", "k_obs")
          .select(col("event_type"), col("med").as("median_k"))
        ev.join(broadcast(med), Seq("event_type"))
          .withColumn("k_filled", coalesce(col("k_obs"), col("median_k")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("k_obs").isNull, 1L).otherwise(0L)).as("n_missing"),
            max(col("median_k")).as("median_k"),
            sum(col("k_filled")).as("sum_k_imputed"),
            sum(col("k")).as("sum_k_true"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (SELECT event_id, event_type,
            CAST(json_extract(props, '$$.k') AS BIGINT) AS k
          FROM events),
        m AS (SELECT event_id, event_type, k,
            CASE WHEN ${Hashing.sqlH28("'miss' || CAST(event_id AS VARCHAR)")} % 10 = 0
              THEN NULL ELSE k END AS k_obs
          FROM ev),
        vc AS (SELECT event_type, k_obs AS v, COUNT(*) AS cnt
            FROM m WHERE k_obs IS NOT NULL GROUP BY event_type, k_obs),
        tot AS (SELECT event_type, SUM(cnt) AS n FROM vc GROUP BY event_type),
        cum AS (SELECT vc.event_type, v,
            SUM(cnt) OVER (PARTITION BY vc.event_type ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, n
          FROM vc JOIN tot ON vc.event_type = tot.event_type),
        med AS (SELECT event_type,
            MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS median_k
          FROM cum GROUP BY event_type)
        SELECT m.event_type, COUNT(*) AS n,
          CAST(SUM(CASE WHEN k_obs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_missing,
          CAST(MAX(median_k) AS BIGINT) AS median_k,
          CAST(SUM(COALESCE(k_obs, median_k)) AS BIGINT) AS sum_k_imputed,
          CAST(SUM(k) AS BIGINT) AS sum_k_true
        FROM m JOIN med ON m.event_type = med.event_type
        GROUP BY m.event_type ORDER BY m.event_type""")),

    // ---- join-order advisor ---------------------------------------------
    // The System-R seed, served from statistics: for the 3-table chain
    // customer ⋈ orders ⋈ lineitem there are two left-deep orders, and
    // the one with the smaller FIRST intermediate wins. Both
    // intermediates are computed EXACTLY from the key histograms
    // (Σ f_A(k)·f_B(k), the q219 machinery — distinct-key shuffles, the
    // join itself never runs). Output: each order with its intermediate
    // size and the chosen verdict — what a cost-based planner decides
    // before execution, hash-gated.
    "q268_join_order_advisor" -> Q(
      (s, dir) => {
        val oc = graft.operators.Advisor.joinSize("start_orders_customer",
          t(s, dir, "orders"), col("o_custkey"),
          t(s, dir, "customer"), col("c_custkey"))
        val lo = graft.operators.Advisor.joinSize("start_lineitem_orders",
          t(s, dir, "lineitem"), col("l_orderkey"),
          t(s, dir, "orders"), col("o_orderkey"))
        val both = oc.unionAll(lo)
        val best = both.agg(min(col("out_rows")).as("best_rows"))
        both.crossJoin(broadcast(best))
          .select(col("join_name").as("first_join"), col("l_rows"), col("r_rows"),
            col("out_rows").as("intermediate_rows"),
            (col("out_rows") === col("best_rows")).as("chosen"))
          .orderBy("first_join")
      },
      Some {
        val oc = graft.operators.Advisor.joinSizeSql("start_orders_customer",
          "orders", "o_custkey", "customer", "c_custkey")
        val lo = graft.operators.Advisor.joinSizeSql("start_lineitem_orders",
          "lineitem", "l_orderkey", "orders", "o_orderkey")
        s"""WITH cand AS (SELECT * FROM ($oc) UNION ALL SELECT * FROM ($lo)),
          best AS (SELECT MIN(out_rows) AS best_rows FROM cand)
        SELECT join_name AS first_join, CAST(l_rows AS BIGINT) AS l_rows,
          CAST(r_rows AS BIGINT) AS r_rows,
          CAST(out_rows AS BIGINT) AS intermediate_rows,
          out_rows = best_rows AS chosen
        FROM cand CROSS JOIN best ORDER BY first_join"""
      }),

    // ---- SLO burn rate (multi-window alert) -----------------------------
    // The SRE alerting rule over the error stream: error share in the
    // trailing 6 h / 24 h / 72 h windows (anchored at the stream's max
    // event time) against a 25% error budget; the alarm is the EXACT
    // integer comparison 4·n_err > n, not a float threshold. One
    // aggregate computes all six conditional sums; stack() unpivots to
    // one row per window — the fact is scanned once.
    "q269_slo_burn" -> Q(
      (s, dir) => {
        val mx = t(s, dir, "events").agg(max(col("ts")).as("mx"))
        def win(h: Int) = col("ts") >= col("mx") - expr(s"INTERVAL $h HOURS")
        t(s, dir, "events").crossJoin(broadcast(mx))
          .agg(
            sum(when(win(6), 1L).otherwise(0L)).as("n6"),
            sum(when(win(6) && col("event_type") === "error", 1L).otherwise(0L)).as("e6"),
            sum(when(win(24), 1L).otherwise(0L)).as("n24"),
            sum(when(win(24) && col("event_type") === "error", 1L).otherwise(0L)).as("e24"),
            sum(when(win(72), 1L).otherwise(0L)).as("n72"),
            sum(when(win(72) && col("event_type") === "error", 1L).otherwise(0L)).as("e72"))
          .select(expr(
            "stack(3, '06h', n6, e6, '24h', n24, e24, '72h', n72, e72)" +
              " AS (win_label, n, n_err)"))
          .withColumn("err_rate",
            col("n_err").cast("double") / col("n").cast("double"))
          .withColumn("burn", col("err_rate") / lit(0.25d))
          .withColumn("alarm", col("n_err") * 4L > col("n"))
          .orderBy("win_label")
      },
      Some("""WITH mx AS (SELECT MAX(ts) AS mx FROM events),
        a AS (SELECT
            SUM(CASE WHEN ts >= mx - INTERVAL 6 HOUR THEN 1 ELSE 0 END) AS n6,
            SUM(CASE WHEN ts >= mx - INTERVAL 6 HOUR AND event_type = 'error'
              THEN 1 ELSE 0 END) AS e6,
            SUM(CASE WHEN ts >= mx - INTERVAL 24 HOUR THEN 1 ELSE 0 END) AS n24,
            SUM(CASE WHEN ts >= mx - INTERVAL 24 HOUR AND event_type = 'error'
              THEN 1 ELSE 0 END) AS e24,
            SUM(CASE WHEN ts >= mx - INTERVAL 72 HOUR THEN 1 ELSE 0 END) AS n72,
            SUM(CASE WHEN ts >= mx - INTERVAL 72 HOUR AND event_type = 'error'
              THEN 1 ELSE 0 END) AS e72
          FROM events CROSS JOIN mx),
        u AS (SELECT '06h' AS win_label, n6 AS n, e6 AS n_err FROM a
          UNION ALL SELECT '24h', n24, e24 FROM a
          UNION ALL SELECT '72h', n72, e72 FROM a)
        SELECT win_label, CAST(n AS BIGINT) AS n, CAST(n_err AS BIGINT) AS n_err,
          CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE) AS err_rate,
          (CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE)) / 0.25 AS burn,
          n_err * 4 > n AS alarm
        FROM u ORDER BY win_label""")),

    // ---- rendezvous-hash sharding (minimal disruption) -------------------
    // Highest-random-weight (Thaler-Ravishankar) shard assignment for
    // customer keys: shard = argmax over shards of h28(key ⊕ shard) —
    // coordination-free, no ring metadata, and when the cluster grows
    // from 8 to 9 shards ONLY the keys whose new argmax is shard 8 move
    // (≈1/9, the minimal-disruption property the query PROVES
    // numerically). Per shard: population at 8, moved count at 9, move
    // share — all from two map-side argmaxes over a generated 9-element
    // shard axis. Exact integers; md5 family shared with the oracle.
    "q295_rendezvous_sharding" -> Q(
      (s, dir) => {
        val scored = t(s, dir, "customer")
          .select(col("c_custkey"),
            explode(expr("sequence(0L, 8L)")).as("shard"))
          .withColumn("hw", Hashing.h28(concat(lit("rv"),
            col("c_custkey").cast("string"), lit("_"), col("shard").cast("string"))))
        val w8 = Window.partitionBy("c_custkey")
          .orderBy(col("hw").desc, col("shard"))
        val pick = scored
          .withColumn("rk9", row_number().over(w8))
          .withColumn("rk8", row_number().over(
            Window.partitionBy("c_custkey").orderBy(
              when(col("shard") === 8L, lit(-1L)).otherwise(col("hw")).desc,
              col("shard"))))
        val assign = pick.groupBy("c_custkey")
          .agg(min(when(col("rk8") === 1, col("shard"))).as("shard8"),
            min(when(col("rk9") === 1, col("shard"))).as("shard9"))
        assign.groupBy(col("shard8").as("shard"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L))
              .as("n_moved"))
          .withColumn("move_share",
            col("n_moved").cast("double") / col("n_keys").cast("double"))
          .orderBy("shard")
      },
      Some(s"""WITH sc AS (SELECT c_custkey, shard,
            ${Hashing.sqlH28("'rv' || CAST(c_custkey AS VARCHAR) || '_' || CAST(shard AS VARCHAR)")}
              AS hw
          FROM customer CROSS JOIN (SELECT UNNEST(range(0, 9)) AS shard)),
        pick AS (SELECT c_custkey, shard,
            ROW_NUMBER() OVER (PARTITION BY c_custkey
              ORDER BY hw DESC, shard) AS rk9,
            ROW_NUMBER() OVER (PARTITION BY c_custkey
              ORDER BY CASE WHEN shard = 8 THEN -1 ELSE hw END DESC, shard) AS rk8
          FROM sc),
        a AS (SELECT c_custkey,
            MIN(CASE WHEN rk8 = 1 THEN shard END) AS shard8,
            MIN(CASE WHEN rk9 = 1 THEN shard END) AS shard9
          FROM pick GROUP BY c_custkey)
        SELECT CAST(shard8 AS BIGINT) AS shard, COUNT(*) AS n_keys,
          CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_moved,
          CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS move_share
        FROM a GROUP BY shard8 ORDER BY shard"""))
  )
}
