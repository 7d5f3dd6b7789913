package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.TextAnalysis
import graft.queries.Relational.Q

/** Corpus-statistics operators a tokenizer/LM team runs before training:
  * Good-Turing frequency smoothing, Heaps'-law vocabulary growth, the
  * Zipf rank-frequency head, and time-weighted event averages.
  *
  * Scale shape shared by the text queries: ONE explode+groupBy over the
  * token stream reduces the corpus to its vocabulary (map-side
  * combinable); everything after runs over |vocab| or smaller. Exactness:
  * counts stay BIGINT; each statistic ends in at most one IEEE division.
  */
object Corpus {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[(String, Q)] = Seq(

    // ---- Good-Turing frequency-of-frequencies ---------------------------
    // The smoothing table an n-gram LM (q123's bigram scorer) needs:
    // N_r = how many BIGRAM types occur exactly r times, and the
    // Good-Turing adjusted count r* = (r+1)·N_{r+1}/N_r for the 10
    // sparsest counts (the region smoothing exists for — an absolute
    // r ≤ 10 filter would be empty on a corpus whose every type is
    // frequent). Two aggregates (corpus → type counts → freq-of-freqs),
    // a TakeOrdered-10 head, one self-join on r+1, one IEEE division per
    // row. The unseen-mass estimate N_1/N rides along as a constant
    // column.
    "q250_good_turing" -> Q(
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .select(TextAnalysis.tokens(col("text")).as("toks"))
          // sub-bigram docs: sequence(0, -1) would DESCEND and emit null
          // grams where the oracle's range(1, len) emits none
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
            .as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("r"))
        val ff = counts.groupBy("r").agg(count(lit(1)).as("n_r"))
        val tot = counts.agg(sum(col("r")).as("n_grams"),
          sum(when(col("r") === 1L, 1L).otherwise(0L)).as("n1"))
        ff.orderBy("r").limit(10).as("a")
          .join(ff.select(col("r").as("r1"), col("n_r").as("n_r_next")),
            col("a.r") + 1L === col("r1"), "left")
          .crossJoin(broadcast(tot))
          .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
            coalesce(col("n_r_next"), lit(0L)).as("n_r_next"),
            (((col("a.r") + 1L) * coalesce(col("n_r_next"), lit(0L))).cast("double")
              / col("a.n_r").cast("double")).as("gt_star"),
            (col("n1").cast("double") / col("n_grams").cast("double")).as("p_unseen"))
          .orderBy("r")
      },
      Some("""WITH w AS (SELECT regexp_extract_all(text, '\w+') AS toks FROM documents),
        grams AS (SELECT UNNEST([toks[i] || ' ' || toks[i + 1]
                    for i in range(1, len(toks))]) AS gram FROM w),
        c AS (SELECT gram, COUNT(*) AS r FROM grams GROUP BY gram),
        ff AS (SELECT r, COUNT(*) AS n_r FROM c GROUP BY r),
        tot AS (SELECT SUM(r) AS n_grams,
                  SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS n1 FROM c),
        head AS (SELECT r, n_r FROM ff ORDER BY r LIMIT 10)
        SELECT a.r, a.n_r, CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r_next,
          CAST((a.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE) / CAST(a.n_r AS DOUBLE)
            AS gt_star,
          CAST(n1 AS DOUBLE) / CAST(n_grams AS DOUBLE) AS p_unseen
        FROM head a LEFT JOIN ff b ON a.r + 1 = b.r CROSS JOIN tot
        ORDER BY a.r""")),

    // ---- Heaps'-law vocabulary growth -----------------------------------
    // How fast does vocabulary grow with corpus size? Each token's FIRST
    // document (min doc_id — one groupBy) places it on the corpus axis;
    // five id-range fences (pure integer arithmetic on min/max doc_id —
    // no global sort, no rank window) then census vocabulary and doc
    // count at 20..100% of the corpus. The fence table is 5 rows,
    // broadcast into both censuses.
    "q251_heaps_law" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val firstDoc = docs
          .select(col("doc_id"), explode(array_distinct(
            TextAnalysis.tokens(col("text")))).as("tok"))
          .groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
        val fences = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
          .select(explode(expr("array(20L, 40L, 60L, 80L, 100L)")).as("pct"),
            col("lo"), col("hi"))
          .select(col("pct"),
            expr("lo + ((hi - lo) * pct) div 100").as("fence_id"))
        val vocab = firstDoc.join(broadcast(fences),
            col("first_doc") <= col("fence_id"))
          .groupBy("pct", "fence_id").agg(count(lit(1)).as("vocab"))
        val nDocs = docs.join(broadcast(fences), col("doc_id") <= col("fence_id"))
          .groupBy("pct").agg(count(lit(1)).as("n_docs"))
        vocab.join(nDocs, Seq("pct")).orderBy("pct")
          .select(col("pct"), col("fence_id"), col("n_docs"), col("vocab"))
      },
      Some("""WITH td AS (SELECT doc_id,
                  UNNEST(list_distinct(regexp_extract_all(text, '\w+'))) AS tok
                FROM documents),
        fd AS (SELECT tok, MIN(doc_id) AS first_doc FROM td GROUP BY tok),
        b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
        f AS (SELECT pct, lo + ((hi - lo) * pct) // 100 AS fence_id
              FROM b CROSS JOIN (VALUES (20), (40), (60), (80), (100)) p(pct)),
        v AS (SELECT pct, fence_id, COUNT(*) AS vocab
              FROM fd JOIN f ON first_doc <= fence_id GROUP BY pct, fence_id),
        nd AS (SELECT pct, COUNT(*) AS n_docs
               FROM documents JOIN f ON doc_id <= fence_id GROUP BY pct)
        SELECT CAST(v.pct AS BIGINT) AS pct, v.fence_id, nd.n_docs, v.vocab
        FROM v JOIN nd ON v.pct = nd.pct ORDER BY pct""")),

    // ---- Zipf rank-frequency head ---------------------------------------
    // The Zipf diagnostic: the 50 most frequent tokens with their rank
    // and the rank·frequency product (constant under an ideal Zipf law).
    // The top-50 is TakeOrderedAndProject over the vocabulary aggregate
    // (never a corpus-wide rank window); the rank window then runs over
    // exactly 50 rows. Deterministic tie-break (count desc, token asc).
    "q252_zipf_head" -> Q(
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(50)
        counts
          .withColumn("rank",
            row_number().over(Window.orderBy(col("cnt").desc, col("tok")))
              .cast("long"))
          .select(col("rank"), col("tok"), col("cnt"),
            (col("rank") * col("cnt")).as("rank_x_freq"))
          .orderBy("rank")
      },
      Some("""WITH c AS (SELECT tok, COUNT(*) AS cnt FROM (
                SELECT UNNEST(regexp_extract_all(text, '\w+')) AS tok
                FROM documents) GROUP BY tok),
        r AS (SELECT tok, cnt,
                ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank FROM c)
        SELECT rank, tok, cnt, rank * cnt AS rank_x_freq
        FROM r WHERE rank <= 50 ORDER BY rank""")),

    // ---- time-weighted average event value ------------------------------
    // The TWAP/telemetry primitive: an event's value holds until the
    // user's NEXT event, so the honest per-type average weights each
    // value by its holding duration, not its row count. Durations are
    // exact epoch-millisecond differences (lead over the entity-bounded
    // per-user window); values are 2-decimal money lifted to BIGINT
    // cents (the Det discipline), so the weighted mass is an exact
    // integer and the average is ONE IEEE division. Overflow budget:
    // cents ≤ 2^15, Σ dur_ms per user = its span ≤ 2^33 — the corpus
    // total stays far under 2^63.
    "q253_time_weighted" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
            (Det.money(col("value")) * 100).cast("long").as("cents"))
          .withColumn("next_ms", unix_millis(lead(col("ts"), 1).over(w)))
          .filter(col("next_ms").isNotNull)
          .withColumn("dur_ms", col("next_ms") - unix_millis(col("ts")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dur_ms")).as("total_ms"),
            sum(col("cents") * col("dur_ms")).as("w_cents_ms"))
          .withColumn("twa_value",
            col("w_cents_ms").cast("double") / (col("total_ms") * 100L).cast("double"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
            EPOCH_MS(LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              - EPOCH_MS(ts) AS dur_ms,
            LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM events)
        SELECT event_type, COUNT(*) AS n_intervals,
          CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
          CAST(SUM(cents * dur_ms) AS BIGINT) AS w_cents_ms,
          CAST(SUM(cents * dur_ms) AS DOUBLE) / CAST(SUM(dur_ms) * 100 AS DOUBLE)
            AS twa_value
        FROM e WHERE nxt IS NOT NULL
        GROUP BY event_type ORDER BY event_type"""))
  )
}
