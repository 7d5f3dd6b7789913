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
        GROUP BY m.event_type ORDER BY m.event_type"""))
  )
}
