package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.Hashing
import graft.operators.{Agreement, Anonymize, Preference, Spatial}
import graft.queries.Relational.Q

/** Data-governance and human-feedback operators on the oracle surface:
  * privacy-release audits (k-anonymity / l-diversity), labeling QC
  * (Cohen's kappa), RLHF preference-strength estimation (Bradley-Terry),
  * and grid-blocked spatial joins.
  *
  * The shared discipline: every statistic reduces the fact table with
  * ONE map-side combinable aggregate, carries its state in BIGINT, and
  * spends at most one fixed IEEE expression tree at the end — so every
  * query here hash-matches DuckDB bit-for-bit at all scales.
  */
object Governance {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** One k-anonymity census row at a generalization level. */
  private def censusSql(level: String, qiRel: String, k: Long): String =
    s"""SELECT '$level' AS level, CAST(SUM(sz) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS min_class_size,
       CAST(SUM(CASE WHEN sz < $k THEN sz ELSE 0 END) AS BIGINT) AS rows_violating,
       SUM(CASE WHEN sz < $k THEN sz ELSE 0 END) = 0 AS k_anonymous
       FROM (SELECT COUNT(*) AS sz FROM ($qiRel) GROUP BY q1, q2)"""

  val defs: Seq[(String, Q)] = Seq(

    // ---- k-anonymity census with a generalization ladder ----------------
    // The release audit: are customers re-identifiable by joining public
    // data on (nation, market segment)? Level 0 checks the raw QI; level
    // 1 generalizes nation → region (the standard k-anonymity remedy)
    // and shows the violation count collapsing. One groupBy per level
    // over bounded QI domains; everything downstream is constant-size.
    "q245_k_anonymity" -> Q(
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val l0 = Anonymize.kAnonymityCensus(
          cust.select(col("c_nationkey").as("q1"), col("c_mktsegment").as("q2")),
          Seq("q1", "q2"), k = 5L)
          .select(lit("0_nation_segment").as("level"), col("n_rows"), col("n_classes"),
            col("min_class_size"), col("rows_violating"), col("k_anonymous"))
        val l1 = Anonymize.kAnonymityCensus(
          cust.join(broadcast(t(s, dir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
            .select(col("n_regionkey").cast("int").as("q1"),
              col("c_mktsegment").as("q2")),
          Seq("q1", "q2"), k = 5L)
          .select(lit("1_region_segment").as("level"), col("n_rows"), col("n_classes"),
            col("min_class_size"), col("rows_violating"), col("k_anonymous"))
        l0.unionAll(l1).orderBy("level")
      },
      Some(Seq(
        censusSql("0_nation_segment",
          "SELECT c_nationkey AS q1, c_mktsegment AS q2 FROM customer", 5L),
        censusSql("1_region_segment",
          """SELECT n_regionkey AS q1, c_mktsegment AS q2
             FROM customer JOIN nation ON c_nationkey = n_nationkey""", 5L))
        .mkString("", " UNION ALL ", " ORDER BY level"))),

    // ---- l-diversity census ---------------------------------------------
    // Attribute-disclosure audit on top of the same QI classes: a class
    // whose members all share one balance bracket DISCLOSES the bracket
    // even if the class is large. Sensitive attribute = 1000-unit
    // account-balance bracket (exact: one correctly-rounded IEEE divide
    // by 1000, then floor — both engines bit-equal). Output: EVERY class
    // with its size, observed diversity, and the l ≥ 3 verdict (a
    // violations-only result would be empty at larger scales — a full
    // census keeps the hash gate strong at every sf).
    "q246_l_diversity" -> Q(
      (s, dir) => Anonymize.lDiversityCensus(
        t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / 1000d).cast("long"), l = 3L)
        .orderBy("c_nationkey", "c_mktsegment"),
      Some("""SELECT c_nationkey, c_mktsegment,
          CAST(COUNT(*) AS BIGINT) AS class_size,
          CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
            AS l_distinct,
          COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) >= 3 AS l_diverse
        FROM customer GROUP BY c_nationkey, c_mktsegment
        ORDER BY c_nationkey, c_mktsegment""")),

    // ---- inter-annotator agreement (Cohen's kappa) ----------------------
    // Labeling QC: two deterministic document-quality "annotators" —
    // A: length ≥ 300 chars; B: ≥ 55 space-separated gaps — scored per
    // language. The 2×2 confusion matrix is one BIGINT aggregate; κ is
    // one IEEE division over exact integer numerator/denominator, so the
    // chance-corrected agreement hash-matches bit-for-bit.
    "q247_annotator_kappa" -> Q(
      (s, dir) => Agreement.cohensKappa(
        t(s, dir, "documents"),
        "lang",
        a = col("n_chars") >= 300L,
        b = (length(col("text")) - length(regexp_replace(col("text"), " ", ""))) >= 55)
        .orderBy("lang"),
      Some(Agreement.cohensKappaSql(
        """SELECT lang, n_chars >= 300 AS a,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) >= 55 AS b
           FROM documents""", "lang") + " ORDER BY lang")),

    // ---- Bradley-Terry preference strengths -----------------------------
    // RLHF-style preference aggregation over real behavior: each
    // (user, day) where two event types both occur with DIFFERENT counts
    // is a duel won by the more frequent type; the win matrix (≤ |types|²
    // rows, aggregated map-side before anything iterative) feeds 3 exact-
    // integer MM updates (operators.Preference — the q118 pattern: the
    // DuckDB chain is GENERATED from the same constants, so an iterative
    // fixed point hash-matches bit-for-bit).
    "q248_bradley_terry" -> Q(
      (s, dir) => {
        val c = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
          .groupBy("user_id", "day", "event_type").agg(count(lit(1)).as("c"))
        val x = c.select(col("user_id"), col("day"),
          col("event_type").as("ta"), col("c").as("ca"))
        val y = c.select(col("user_id"), col("day"),
          col("event_type").as("tb"), col("c").as("cb"))
        val duels = x.join(y, Seq("user_id", "day"))
          .filter(col("ta") < col("tb") && col("ca") =!= col("cb"))
          .select(
            when(col("ca") > col("cb"), col("ta")).otherwise(col("tb")).as("winner"),
            when(col("ca") > col("cb"), col("tb")).otherwise(col("ta")).as("loser"))
          .groupBy("winner", "loser").agg(count(lit(1)).as("w"))
        Preference.ratings(duels, iters = 3)
      },
      Some(Preference.oracleSql(
        """SELECT winner, loser, COUNT(*) AS w FROM (
             SELECT CASE WHEN x.c > y.c THEN x.event_type ELSE y.event_type END AS winner,
                    CASE WHEN x.c > y.c THEN y.event_type ELSE x.event_type END AS loser
             FROM (SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
                   FROM events GROUP BY 1, 2, 3) x
             JOIN (SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
                   FROM events GROUP BY 1, 2, 3) y
               ON x.user_id = y.user_id AND x.day = y.day
              AND x.event_type < y.event_type
             WHERE x.c <> y.c)
           GROUP BY winner, loser""", iters = 3))),

    // ---- grid-blocked spatial distance join -----------------------------
    // All customer pairs within R = 0.2° on a deterministic md5-derived
    // micro-degree plane (both engines derive identical coordinates from
    // the h28 family). operators.Spatial: cell side = R, 3×3 probe
    // neighborhood, equi-join on the cell key, exact BIGINT distance
    // check — each qualifying pair joins EXACTLY once, never a cross
    // join (plan-gated). The oracle replays the same blocking (a brute
    // O(n²) oracle would not finish at sf0.1). Output: one summary row
    // pinning the pair SET (count, distance mass, xor fingerprint).
    "q249_spatial_pairs" -> Q(
      (s, dir) => {
        val pts = t(s, dir, "customer").select(col("c_custkey").as("id"),
          pmod(Hashing.h28(concat(lit("px"), col("c_custkey").cast("string"))),
            lit(10000000L)).as("x"),
          pmod(Hashing.h28(concat(lit("py"), col("c_custkey").cast("string"))),
            lit(10000000L)).as("y"))
        val pairs = Spatial.distanceJoin(pts, r = 200000L)
        val pairAgg = pairs.agg(
          count(lit(1)).as("n_pairs"),
          coalesce(sum(col("dist2")), lit(0L)).as("sum_dist2"),
          // modular residues: raw id*1000003 would wrap in Spark but
          // raise in DuckDB for 64-bit ids (Sssp.FpMod discipline)
          coalesce(expr(s"bit_xor((id_a % ${graft.operators.Sssp.FpMod}) * 1000003" +
            s" + id_b % ${graft.operators.Sssp.FpMod})"), lit(0L)).as("pair_xor"))
        pts.agg(count(lit(1)).as("n_points")).crossJoin(pairAgg)
      },
      Some(s"""WITH pts AS (SELECT c_custkey AS id,
            ${Hashing.sqlH28("'px' || CAST(c_custkey AS VARCHAR)")} % 10000000 AS x,
            ${Hashing.sqlH28("'py' || CAST(c_custkey AS VARCHAR)")} % 10000000 AS y
          FROM customer),
        p AS (SELECT id, x, y, x // 200000 AS cx, y // 200000 AS cy FROM pts),
        probes AS (SELECT id AS id_a, x AS xa, y AS ya,
            cx + o1.dx AS cx, cy + o2.dy AS cy
          FROM p CROSS JOIN (VALUES (-1), (0), (1)) o1(dx)
                 CROSS JOIN (VALUES (-1), (0), (1)) o2(dy)),
        pairs AS (SELECT id_a, r.id AS id_b,
            (xa - r.x) * (xa - r.x) + (ya - r.y) * (ya - r.y) AS dist2
          FROM probes JOIN p r ON probes.cx = r.cx AND probes.cy = r.cy
            AND probes.id_a < r.id
          WHERE (xa - r.x) * (xa - r.x) + (ya - r.y) * (ya - r.y)
              <= ${200000L * 200000L})
        SELECT (SELECT COUNT(*) FROM pts) AS n_points,
          COUNT(*) AS n_pairs,
          CAST(COALESCE(SUM(dist2), 0) AS BIGINT) AS sum_dist2,
          CAST(COALESCE(BIT_XOR((id_a % ${graft.operators.Sssp.FpMod}) * 1000003
              + id_b % ${graft.operators.Sssp.FpMod}), 0) AS BIGINT) AS pair_xor
        FROM pairs""")),

    // ---- consistent pseudonymization ------------------------------------
    // Dynamic-masking / pseudonymization with REFERENTIAL CONSISTENCY:
    // the released report carries an md5-derived token instead of the
    // customer key, the name masked to its first two characters, and the
    // balance generalized to a 1000-unit bracket — but because the token
    // is a deterministic function of the key, the per-customer order
    // aggregate still joins exactly (the property ad-hoc masking breaks).
    // The gate hashes the pseudonymous report itself: identical tokens,
    // masks, and join results in both engines. Top-20 by order count for
    // a bounded result.
    "q289_pseudonymized_report" -> Q(
      (s, dir) => {
        val cust = t(s, dir, "customer").select(
          col("c_custkey"),
          concat(lit("c-"), substring(md5(concat(lit("p"),
            col("c_custkey").cast("string"))), 1, 12)).as("pseudonym"),
          concat(substring(col("c_name"), 1, 2), lit("***")).as("masked_name"),
          (floor(col("c_acctbal") / 1000d) * 1000).cast("long").as("balance_bracket"))
        val ords = t(s, dir, "orders").groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            Det.moneySumExact(col("o_totalprice")).as("spend"))
        cust.join(ords, col("c_custkey") === col("o_custkey"))
          .select(col("pseudonym"), col("masked_name"), col("balance_bracket"),
            col("n_orders"), col("spend").cast("double").as("total_spend"))
          .orderBy(col("n_orders").desc, col("pseudonym")).limit(20)
      },
      Some("""SELECT 'c-' || SUBSTR(MD5('p' || CAST(c_custkey AS VARCHAR)), 1, 12)
            AS pseudonym,
          SUBSTR(c_name, 1, 2) || '***' AS masked_name,
          CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS balance_bracket,
          o.n_orders,
          CAST(o.spend AS DOUBLE) AS total_spend
        FROM customer
        JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
            SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
          FROM orders GROUP BY o_custkey) o ON c_custkey = o.o_custkey
        ORDER BY n_orders DESC, pseudonym LIMIT 20""")),

    // ---- privacy-utility tradeoff ---------------------------------------
    // What does q246/q289's 1000-unit balance generalization COST an
    // analyst? Per nation: the exact balance sum (cents), the sum
    // reconstructed from brackets under the midpoint convention
    // (bracket + 500), and the absolute reconstruction error — all exact
    // integers, so the privacy-utility report hash-matches. The per-row
    // error is bounded by construction (|err| ≤ 50000 cents); the census
    // shows how it nets out per group — the number a release reviewer
    // weighs against the k-anonymity gain.
    "q290_privacy_utility" -> Q(
      (s, dir) => {
        t(s, dir, "customer")
          .select(col("c_nationkey"),
            (Det.money(col("c_acctbal")) * 100).cast("long").as("cents"),
            ((floor(col("c_acctbal") / 1000d) * 1000 + 500) * 100).cast("long")
              .as("recon_cents"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("exact_cents"),
            sum(col("recon_cents")).as("recon_cents"),
            sum(abs(col("recon_cents") - col("cents"))).as("abs_err_cents"))
          .withColumn("err_share",
            col("abs_err_cents").cast("double")
              / abs(col("exact_cents")).cast("double"))
          .orderBy("c_nationkey")
      },
      Some(s"""SELECT c_nationkey, COUNT(*) AS n,
          CAST(SUM(${Det.sqlMoney("c_acctbal")} * 100) AS BIGINT) AS exact_cents,
          CAST(SUM((FLOOR(c_acctbal / 1000) * 1000 + 500) * 100) AS BIGINT)
            AS recon_cents,
          CAST(SUM(ABS((FLOOR(c_acctbal / 1000) * 1000 + 500) * 100
            - ${Det.sqlMoney("c_acctbal")} * 100)) AS BIGINT) AS abs_err_cents,
          CAST(SUM(ABS((FLOOR(c_acctbal / 1000) * 1000 + 500) * 100
            - ${Det.sqlMoney("c_acctbal")} * 100)) AS DOUBLE)
            / CAST(ABS(SUM(${Det.sqlMoney("c_acctbal")} * 100)) AS DOUBLE)
            AS err_share
        FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ---- TextRank keyword extraction ------------------------------------
    // Mihalcea & Tarau 2004 as pure operator COMPOSITION: the word
    // co-occurrence graph (adjacent-token edges, symmetrized) feeds the
    // exact-integer PageRank, and the top-10 ranked tokens are the
    // corpus keywords. The vocabulary-bounded node domain takes
    // PageRank's driver tier; the oracle wraps the GENERATED q118
    // iteration chain over the same edge CTE — an end-to-end iterative
    // graph computation hash-matching from tokenizer to ranking.
    "q264_textrank_keywords" -> Q(
      (s, dir) => {
        val grams = t(s, dir, "documents")
          .select(graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
          // sub-bigram docs: sequence(0, -1) would DESCEND and emit null
          // grams where the oracle's range(1, len) emits none
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
            .as("g"))
          .select(split(col("g"), " ").getItem(0).as("a"),
            split(col("g"), " ").getItem(1).as("b"))
        val edges = grams.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(grams.select(col("b").as("src"), col("a").as("dst")))
        graft.operators.PageRank.ranks(edges, "src", "dst", iters = 5)
          .orderBy(col("rank_units").desc, col("node")).limit(10)
      },
      Some {
        val edgesCte =
          """SELECT split_part(g, ' ', 1) AS src, split_part(g, ' ', 2) AS dst
             FROM (SELECT UNNEST([toks[i] || ' ' || toks[i + 1]
                 for i in range(1, len(toks))]) AS g
               FROM (SELECT regexp_extract_all(text, '\w+') AS toks FROM documents))
             UNION ALL
             SELECT split_part(g, ' ', 2), split_part(g, ' ', 1)
             FROM (SELECT UNNEST([toks[i] || ' ' || toks[i + 1]
                 for i in range(1, len(toks))]) AS g
               FROM (SELECT regexp_extract_all(text, '\w+') AS toks FROM documents))"""
        s"""SELECT node, rank_units FROM (
           ${graft.operators.PageRank.oracleSql(edgesCte, iters = 5)}
           ) ORDER BY rank_units DESC, node LIMIT 10"""
      }),

    // ---- geometric-noise count release ----------------------------------
    // Differential-privacy mechanism PLUMBING, made cross-engine
    // testable: each released count is perturbed by two-sided geometric
    // noise built from md5 hex — the magnitude is the leading-'f' run
    // length of the group's salted digest (P(len ≥ k) = 16^-k, i.e.
    // geometric with p = 15/16), one draw positive, one negative. The
    // noise here is SEEDED by the group key so the gate can hash-match
    // the whole release path; a production release swaps the digest for
    // a real RNG (same mechanism shape, actual privacy — with a
    // deterministic seed there is none, which is the point of gating
    // the plumbing separately). True count, draws, and noisy count are
    // all emitted so the mechanism is pinned end-to-end.
    "q265_noisy_counts" -> Q(
      (s, dir) => {
        def fRun(salt: String) = length(regexp_extract(
          md5(concat(lit(salt), col("event_type"))), "^f*", 0)).cast("long")
        t(s, dir, "events")
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .withColumn("mag_pos", fRun("dp+"))
          .withColumn("mag_neg", fRun("dp-"))
          .withColumn("noisy_n", col("n") + col("mag_pos") - col("mag_neg"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(LENGTH(regexp_extract(MD5('dp+' || event_type), '^f*')) AS BIGINT)
            AS mag_pos,
          CAST(LENGTH(regexp_extract(MD5('dp-' || event_type), '^f*')) AS BIGINT)
            AS mag_neg,
          COUNT(*)
            + LENGTH(regexp_extract(MD5('dp+' || event_type), '^f*'))
            - LENGTH(regexp_extract(MD5('dp-' || event_type), '^f*')) AS noisy_n
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
