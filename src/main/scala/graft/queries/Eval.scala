package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.{Hashing, TextAnalysis}
import graft.queries.Relational.Q

/** Model-evaluation and survival-analysis operators: Kaplan-Meier user
  * retention, classifier calibration, and the language-ID quality report.
  *
  * Exactness discipline: all counts BIGINT; per-row statistics end in at
  * most one IEEE division; the one cross-term float reduction (the KM
  * survival product) folds a DETERMINISTICALLY SORTED list left-to-right
  * on both engines (the q208 Cramér's-V pattern), so even a cumulative
  * float product hash-matches bit-for-bit.
  */
object Eval {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def sqlList(ws: Seq[String]): String =
    ws.mkString("['", "','", "']")

  /** Per-user survival input shared by q254 (Kaplan-Meier) and q285
    * (log-rank): observation window [d0, d1], first purchase p0,
    * duration to conversion-or-censoring, and the `converted` event flag
    * (true = the user DID purchase; censored users carry false). One
    * definition so a censoring change cannot desynchronize the paired
    * statistics. */
  private def userSurvival(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(to_date(min(col("ts"))).as("d0"),
        to_date(max(col("ts"))).as("d1"),
        to_date(min(when(col("event_type") === "purchase", col("ts"))))
          .as("p0"))
      .select(col("user_id"),
        datediff(coalesce(col("p0"), col("d1")), col("d0")).cast("long")
          .as("dur"),
        col("p0").isNotNull.as("converted"))

  /** DuckDB twin of [[userSurvival]] (CTE body yielding user_id, dur,
    * converted). */
  private val SqlSurvival: String =
    """u AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS d0,
            CAST(MAX(ts) AS DATE) AS d1,
            CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS DATE) AS p0
          FROM events GROUP BY user_id),
        su AS (SELECT user_id,
            CAST(DATEDIFF('day', d0, COALESCE(p0, d1)) AS BIGINT) AS dur,
            p0 IS NOT NULL AS converted FROM u)"""

  val defs: Seq[(String, Q)] = Seq(

    // ---- Kaplan-Meier survival (time to first purchase) -----------------
    // The survival-analysis primitive: per user, days from first event to
    // FIRST PURCHASE (the event); users who never purchase are CENSORED
    // at their last-seen day — exactly the setting KM exists for (q213's
    // converter-only latency percentiles silently drop the censored;
    // naive means are biased the same way). S(t) = Π_{t_i ≤ t}
    // (1 − d_i/n_i) over conversion times t_i, risk sets n_i = users
    // still unconverted and observed at t_i.
    // Scale shape: one groupBy(user) reduces the fact; everything after
    // lives on the duration-day domain (calendar-bounded — the q73
    // argument for its ordered window). The survival product is an
    // ordered left fold over the ≤|days| conversion-time list, broadcast
    // as one collected row — bit-identical to DuckDB's list_reduce over
    // the same ORDER BY list.
    "q254_kaplan_meier" -> Q(
      (s, dir) => {
        val du = userSurvival(s, dir)
        val byDur = du.groupBy("dur")
          .agg(count(lit(1)).as("m"),
            sum(when(col("converted"), 1L).otherwise(0L)).as("d"))
        val wBefore = Window.orderBy("dur")
          .rowsBetween(Window.unboundedPreceding, -1)
        val tot = byDur.agg(sum(col("m")).as("n_total"))
        val risk = byDur
          .withColumn("before", coalesce(sum(col("m")).over(wBefore), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("n_risk", col("n_total") - col("before"))
          .filter(col("d") > 0L)
          .withColumn("term",
            (col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double"))
        val terms = risk.agg(
          sort_array(collect_list(struct(col("dur"), col("term")))).as("arr"))
        risk.crossJoin(broadcast(terms))
          .select(col("dur").as("t_day"), col("n_risk"), col("d").as("d_converted"),
            expr("aggregate(filter(arr, x -> x.dur <= dur), CAST(1 AS DOUBLE)," +
              " (acc, x) -> acc * x.term)").as("survival"))
          .orderBy("t_day")
      },
      Some(s"""WITH $SqlSurvival,
        bd AS (SELECT dur, COUNT(*) AS m,
            SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS d
          FROM su GROUP BY dur),
        r AS (SELECT dur, d,
            (SELECT SUM(m) FROM bd) -
              COALESCE(SUM(m) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) AS n_risk
          FROM bd),
        k AS (SELECT dur, d, n_risk,
            CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS term
          FROM r WHERE d > 0),
        arr AS (SELECT list(struct_pack(dur := dur, term := term) ORDER BY dur)
            AS a FROM k)
        SELECT k.dur AS t_day, CAST(k.n_risk AS BIGINT) AS n_risk,
          CAST(k.d AS BIGINT) AS d_converted,
          list_reduce(list_prepend(CAST(1 AS DOUBLE),
            [x.term for x in a if x.dur <= k.dur]), (acc, x) -> acc * x)
            AS survival
        FROM k CROSS JOIN arr ORDER BY t_day""")),

    // ---- log-rank test (two survival curves) ----------------------------
    // The inferential companion to q254: does TREATMENT (the md5 coin)
    // change time-to-first-purchase? The log-rank statistic compares
    // observed treated conversions to their expectation under the null
    // at every conversion time: O is an integer sum; each E = d·n_t/n
    // and V = d·n_t·n_c·(n−d) / (n²·(n−1)) is ONE division over exact
    // BIGINT operands (overflow ≤ 2^41 at this population); ΣE and ΣV
    // fold a deterministically sorted time list (the q208 pattern), and
    // z² = (ΣO−ΣE)²/ΣV is a fixed tree. Everything before the folds is
    // one groupBy over per-user rows plus duration-domain windows.
    "q285_km_logrank" -> Q(
      (s, dir) => {
        val du = userSurvival(s, dir)
          .select(col("dur"), col("converted").cast("long").as("conv"),
            (pmod(graft.functions.Hashing.h28(
              concat(lit("t"), col("user_id").cast("string"))), lit(2L)) === 0L)
              .as("tr"))
        val byDur = du.groupBy("dur").agg(
          sum(when(col("tr"), 1L).otherwise(0L)).as("m_t"),
          sum(when(!col("tr"), 1L).otherwise(0L)).as("m_c"),
          sum(when(col("tr"), col("conv")).otherwise(0L)).as("d_t"),
          sum(when(!col("tr"), col("conv")).otherwise(0L)).as("d_c"))
        val wFrom = Window.orderBy("dur")
          .rowsBetween(0, Window.unboundedFollowing)
        val terms = byDur
          .withColumn("n_t", sum(col("m_t")).over(wFrom))
          .withColumn("n_c", sum(col("m_c")).over(wFrom))
          .filter(col("d_t") + col("d_c") > 0L)
          .withColumn("dtot", col("d_t") + col("d_c"))
          .withColumn("ntot", col("n_t") + col("n_c"))
          .withColumn("e", (col("dtot") * col("n_t")).cast("double")
            / col("ntot").cast("double"))
          .withColumn("v", when(col("ntot") > 1L,
            (col("dtot") * col("n_t") * col("n_c") * (col("ntot") - col("dtot")))
              .cast("double")
              / (col("ntot") * col("ntot") * (col("ntot") - 1L)).cast("double"))
            .otherwise(lit(0d)))
        val folded = terms.agg(
          count(lit(1)).as("n_times"),
          sum(col("d_t")).as("sum_o"),
          expr("aggregate(sort_array(collect_list(struct(dur, e)))," +
            " CAST(0 AS DOUBLE), (acc, x) -> acc + x.e)").as("sum_e"),
          expr("aggregate(sort_array(collect_list(struct(dur, v)))," +
            " CAST(0 AS DOUBLE), (acc, x) -> acc + x.v)").as("sum_v"))
        folded.select(col("n_times"), col("sum_o"), col("sum_e"), col("sum_v"),
          when(col("sum_v") > 0d,
            (col("sum_o").cast("double") - col("sum_e"))
              * (col("sum_o").cast("double") - col("sum_e")) / col("sum_v"))
            .as("logrank_z2"))
      },
      Some(s"""WITH $SqlSurvival,
        du AS (SELECT dur,
            CASE WHEN converted THEN 1 ELSE 0 END AS conv,
            ${graft.functions.Hashing.sqlH28("'t' || CAST(user_id AS VARCHAR)")} % 2 = 0
              AS tr
          FROM su),
        bd AS (SELECT dur,
            SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS m_t,
            SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS m_c,
            SUM(CASE WHEN tr THEN conv ELSE 0 END) AS d_t,
            SUM(CASE WHEN tr THEN 0 ELSE conv END) AS d_c
          FROM du GROUP BY dur),
        r AS (SELECT dur, d_t, d_c,
            SUM(m_t) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
              AND UNBOUNDED FOLLOWING) AS n_t,
            SUM(m_c) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
              AND UNBOUNDED FOLLOWING) AS n_c
          FROM bd),
        k AS (SELECT dur, d_t,
            CAST((d_t + d_c) * n_t AS DOUBLE) / CAST(n_t + n_c AS DOUBLE) AS e,
            CASE WHEN n_t + n_c > 1 THEN
              CAST((d_t + d_c) * n_t * n_c * (n_t + n_c - d_t - d_c) AS DOUBLE)
                / CAST((n_t + n_c) * (n_t + n_c) * (n_t + n_c - 1) AS DOUBLE)
            ELSE 0 END AS v
          FROM r WHERE d_t + d_c > 0),
        f AS (SELECT COUNT(*) AS n_times, SUM(d_t) AS sum_o,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              [x.e for x in list(struct_pack(dur := dur, e := e, v := v)
                ORDER BY dur)]), (acc, x) -> acc + x) AS sum_e,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              [x.v for x in list(struct_pack(dur := dur, e := e, v := v)
                ORDER BY dur)]), (acc, x) -> acc + x) AS sum_v
          FROM k)
        SELECT CAST(n_times AS BIGINT) AS n_times, CAST(sum_o AS BIGINT) AS sum_o,
          sum_e, sum_v,
          CASE WHEN sum_v > 0 THEN
            (CAST(sum_o AS DOUBLE) - sum_e) * (CAST(sum_o AS DOUBLE) - sum_e)
              / sum_v END AS logrank_z2
        FROM f""")),

    // ---- classifier calibration (reliability diagram) -------------------
    // The ML-ops release gate for any scoring model: bucket predictions
    // into deciles, compare mean predicted probability against observed
    // outcome rate. Scores are deterministic md5-derived milli-units
    // (both engines derive identical "predictions"); outcome = order
    // fulfilled. Per bucket: exact integer sums, two single-division
    // rates, and their gap (one subtraction of two deterministic
    // doubles). One map-side-combinable groupBy over the fact.
    "q255_calibration" -> Q(
      (s, dir) => {
        t(s, dir, "orders")
          .select(
            pmod(Hashing.h28(concat(lit("cal"), col("o_orderkey").cast("string"))),
              lit(1000L)).as("score_mil"),
            (col("o_orderstatus") === "F").as("pos"))
          .withColumn("bucket", expr("score_mil div 100"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            sum(col("score_mil")).as("sum_score_mil"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
          .select(col("bucket"), col("n"), col("sum_score_mil"), col("n_pos"),
            (col("sum_score_mil").cast("double") / (col("n") * 1000L).cast("double"))
              .as("mean_pred"),
            (col("n_pos").cast("double") / col("n").cast("double")).as("obs_rate"))
          .withColumn("gap", col("mean_pred") - col("obs_rate"))
          .orderBy("bucket")
      },
      Some(s"""WITH sc AS (SELECT
            ${Hashing.sqlH28("'cal' || CAST(o_orderkey AS VARCHAR)")} % 1000
              AS score_mil,
            o_orderstatus = 'F' AS pos
          FROM orders)
        SELECT score_mil // 100 AS bucket, COUNT(*) AS n,
          CAST(SUM(score_mil) AS BIGINT) AS sum_score_mil,
          CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
          CAST(SUM(score_mil) AS DOUBLE) / CAST(COUNT(*) * 1000 AS DOUBLE)
            AS mean_pred,
          CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS obs_rate,
          CAST(SUM(score_mil) AS DOUBLE) / CAST(COUNT(*) * 1000 AS DOUBLE)
            - CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS gap
        FROM sc GROUP BY score_mil // 100 ORDER BY bucket""")),

    // ---- language-ID quality report (per-class P/R/F1) ------------------
    // The eval loop closed over the engine's own classifier: q24's
    // stopword language-ID scored against the ground-truth lang column.
    // The confusion matrix is ONE groupBy over the corpus (bounded
    // |langs|² domain); per-class tp/fp/fn come from the matrix's
    // marginals; precision/recall are single divisions and F1 uses the
    // one-division form 2·tp/(n_true + n_pred). Micro accuracy rides as
    // a constant column. Stopword lists in the oracle are SPLICED from
    // the same Scala constants the Spark side compiles.
    "q256_langid_eval" -> Q(
      (s, dir) => {
        val toks = TextAnalysis.tokens(col("text"))
        val (en, de, es, fr) = (
          TextAnalysis.hits(toks, TextAnalysis.StopEn),
          TextAnalysis.hits(toks, TextAnalysis.StopDe),
          TextAnalysis.hits(toks, TextAnalysis.StopEs),
          TextAnalysis.hits(toks, TextAnalysis.StopFr))
        val conf = t(s, dir, "documents")
          .select(col("lang"),
            TextAnalysis.predictedLang(en, de, es, fr).as("pred"))
          .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        val classes = conf.select(col("lang").as("cls"))
          .union(conf.select(col("pred").as("cls"))).distinct()
        val byTrue = conf.groupBy(col("lang").as("cls")).agg(sum("n").as("n_true"))
        val byPred = conf.groupBy(col("pred").as("cls")).agg(sum("n").as("n_pred"))
        val diag = conf.filter(col("lang") === col("pred"))
          .select(col("lang").as("cls"), col("n").as("tp"))
        val overall = conf.agg(sum(col("n")).as("n_docs"),
          sum(when(col("lang") === col("pred"), col("n")).otherwise(0L)).as("n_ok"))
        classes
          .join(byTrue, Seq("cls"), "left").join(byPred, Seq("cls"), "left")
          .join(diag, Seq("cls"), "left")
          .crossJoin(broadcast(overall))
          .select(col("cls"),
            coalesce(col("n_true"), lit(0L)).as("n_true"),
            coalesce(col("n_pred"), lit(0L)).as("n_pred"),
            coalesce(col("tp"), lit(0L)).as("tp"),
            col("n_ok"), col("n_docs"))
          .withColumn("precision", when(col("n_pred") > 0L,
            col("tp").cast("double") / col("n_pred").cast("double")))
          .withColumn("recall", when(col("n_true") > 0L,
            col("tp").cast("double") / col("n_true").cast("double")))
          .withColumn("f1", when(col("n_true") + col("n_pred") > 0L,
            (col("tp") * 2L).cast("double")
              / (col("n_true") + col("n_pred")).cast("double")))
          .withColumn("micro_acc",
            col("n_ok").cast("double") / col("n_docs").cast("double"))
          .drop("n_ok", "n_docs")
          .orderBy("cls")
      },
      Some(s"""WITH w AS (SELECT lang, regexp_extract_all(text, '\\w+') AS toks
            FROM documents),
        h AS (SELECT lang,
          CAST(len(list_filter(toks, t -> list_contains(${sqlList(TextAnalysis.StopEn)}, t))) AS BIGINT) AS en_hits,
          CAST(len(list_filter(toks, t -> list_contains(${sqlList(TextAnalysis.StopDe)}, t))) AS BIGINT) AS de_hits,
          CAST(len(list_filter(toks, t -> list_contains(${sqlList(TextAnalysis.StopEs)}, t))) AS BIGINT) AS es_hits,
          CAST(len(list_filter(toks, t -> list_contains(${sqlList(TextAnalysis.StopFr)}, t))) AS BIGINT) AS fr_hits
        FROM w),
        p AS (SELECT lang,
          CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
               WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
               WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END AS pred
          FROM h),
        conf AS (SELECT lang, pred, COUNT(*) AS n FROM p GROUP BY lang, pred),
        cls AS (SELECT DISTINCT lang AS cls FROM conf
                UNION SELECT DISTINCT pred FROM conf),
        bt AS (SELECT lang AS cls, SUM(n) AS n_true FROM conf GROUP BY lang),
        bp AS (SELECT pred AS cls, SUM(n) AS n_pred FROM conf GROUP BY pred),
        dg AS (SELECT lang AS cls, n AS tp FROM conf WHERE lang = pred),
        ov AS (SELECT SUM(n) AS n_docs,
            SUM(CASE WHEN lang = pred THEN n ELSE 0 END) AS n_ok FROM conf)
        SELECT cls.cls,
          CAST(COALESCE(bt.n_true, 0) AS BIGINT) AS n_true,
          CAST(COALESCE(bp.n_pred, 0) AS BIGINT) AS n_pred,
          CAST(COALESCE(dg.tp, 0) AS BIGINT) AS tp,
          CASE WHEN COALESCE(bp.n_pred, 0) > 0 THEN
            CAST(COALESCE(dg.tp, 0) AS DOUBLE) / CAST(bp.n_pred AS DOUBLE) END
            AS precision,
          CASE WHEN COALESCE(bt.n_true, 0) > 0 THEN
            CAST(COALESCE(dg.tp, 0) AS DOUBLE) / CAST(bt.n_true AS DOUBLE) END
            AS recall,
          CASE WHEN COALESCE(bt.n_true, 0) + COALESCE(bp.n_pred, 0) > 0 THEN
            CAST(COALESCE(dg.tp, 0) * 2 AS DOUBLE)
              / CAST(COALESCE(bt.n_true, 0) + COALESCE(bp.n_pred, 0) AS DOUBLE) END
            AS f1,
          CAST(n_ok AS DOUBLE) / CAST(n_docs AS DOUBLE) AS micro_acc
        FROM cls LEFT JOIN bt ON bt.cls = cls.cls
          LEFT JOIN bp ON bp.cls = cls.cls
          LEFT JOIN dg ON dg.cls = cls.cls
          CROSS JOIN ov
        ORDER BY cls.cls"""))
  )
}
