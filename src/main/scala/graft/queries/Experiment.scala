package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.Hashing
import graft.queries.Relational.Q

/** Experimentation-platform analytics: off-policy evaluation by replay,
  * difference-in-differences, CUPED variance reduction, and sample-ratio
  * mismatch detection. Assignments and candidate policies are md5-derived
  * (both engines assign identically), metrics keep their mass in exact
  * integers/decimals, and every emitted statistic is a fixed IEEE tree
  * over exact operands — the full A/B readout hash-matches bit-for-bit.
  */
object Experiment {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Deterministic per-user treatment flag (md5 coin). */
  private def treated(user: org.apache.spark.sql.Column) =
    pmod(Hashing.h28(concat(lit("t"), user.cast("string"))), lit(2L)) === 0L

  private val SqlTreated =
    s"${Hashing.sqlH28("'t' || CAST(user_id AS VARCHAR)")} % 2 = 0"

  /** Per-user paired pre/post comparison shared by q297 (sign test) and
    * q298 (Wilcoxon signed-rank): cents and active-day counts on each
    * side of the cut date, users active on both sides, and the exact
    * cross-multiplied per-day-value comparison `cmp` (sign of
    * post_rate − pre_rate without a division). One definition so a cut
    * or censoring change cannot desynchronize the paired tests. */
  private def prePostCmp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("user_id"),
        (to_date(col("ts")) >= to_date(lit("2024-01-16"))).as("post"),
        to_date(col("ts")).as("day"),
        (Det.money(col("value")) * 100).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(sum(when(!col("post"), col("cents")).otherwise(0L)).as("pre_c"),
        countDistinct(when(!col("post"), col("day"))).as("pre_d"),
        sum(when(col("post"), col("cents")).otherwise(0L)).as("post_c"),
        countDistinct(when(col("post"), col("day"))).as("post_d"))
      .filter(col("pre_d") > 0L && col("post_d") > 0L)
      .withColumn("cmp",
        col("post_c") * col("pre_d") - col("pre_c") * col("post_d"))

  /** DuckDB twin of [[prePostCmp]] (the `per` CTE; each test defines its
    * own cmp selection on top). */
  private val SqlPrePost: String =
    """per AS (SELECT user_id,
            SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16' THEN 0
              ELSE CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END) AS pre_c,
            COUNT(DISTINCT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
              THEN CAST(ts AS DATE) END) AS pre_d,
            SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
              THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END)
              AS post_c,
            COUNT(DISTINCT CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
              THEN CAST(ts AS DATE) END) AS post_d
          FROM events GROUP BY user_id)"""

  val defs: Seq[(String, Q)] = Seq(

    // ---- off-policy evaluation by replay --------------------------------
    // The bandit-logging primitive (Li et al. 2011): a CANDIDATE policy
    // assigns each user one action (md5 draw over the action set); the
    // logged stream is replayed and only events whose logged action
    // equals the policy's choice count toward the policy's estimated
    // reward. Per arm: exposure, match count/share, and the exact-
    // decimal mean reward on matched events vs the arm's logged mean —
    // one map-side-combinable aggregate over the fact.
    "q260_policy_replay" -> Q(
      (s, dir) => {
        val arms = array(Seq("click", "error", "purchase", "signup", "view")
          .map(lit): _*)
        val ev = t(s, dir, "events")
          .withColumn("arm", element_at(arms,
            (pmod(Hashing.h28(concat(lit("arm"), col("user_id").cast("string"))),
              lit(5L)) + 1L).cast("int")))
        ev.groupBy("arm")
          .agg(count(lit(1)).as("n_logged"),
            sum(when(col("event_type") === col("arm"), 1L).otherwise(0L))
              .as("n_matched"),
            Det.moneySumExact(col("value")).as("sum_all"),
            sum(when(col("event_type") === col("arm"), Det.money(col("value")))
              .otherwise(lit(0).cast(Det.Money))).as("sum_matched"))
          .select(col("arm"), col("n_logged"), col("n_matched"),
            (col("n_matched").cast("double") / col("n_logged").cast("double"))
              .as("match_share"),
            when(col("n_matched") > 0L,
              col("sum_matched").cast("double") / col("n_matched").cast("double"))
              .as("policy_reward"),
            (col("sum_all").cast("double") / col("n_logged").cast("double"))
              .as("logged_reward"))
          .orderBy("arm")
      },
      Some(s"""WITH ev AS (SELECT event_type, value,
            (['click','error','purchase','signup','view'])[CAST(
              ${Hashing.sqlH28("'arm' || CAST(user_id AS VARCHAR)")} % 5 + 1
              AS INT)] AS arm
          FROM events)
        SELECT arm, COUNT(*) AS n_logged,
          CAST(SUM(CASE WHEN event_type = arm THEN 1 ELSE 0 END) AS BIGINT)
            AS n_matched,
          CAST(SUM(CASE WHEN event_type = arm THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS match_share,
          CASE WHEN SUM(CASE WHEN event_type = arm THEN 1 ELSE 0 END) > 0 THEN
            CAST(SUM(CASE WHEN event_type = arm
              THEN CAST(value AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END)
              AS DOUBLE)
            / CAST(SUM(CASE WHEN event_type = arm THEN 1 ELSE 0 END) AS DOUBLE)
          END AS policy_reward,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS logged_reward
        FROM ev GROUP BY arm ORDER BY arm""")),

    // ---- difference-in-differences --------------------------------------
    // The causal readout when assignment is per-user and a mid-month
    // change lands at a known date: the treatment effect is the change
    // in the treated group's mean MINUS the change in control's —
    // differencing out both the group baseline and the common time
    // trend. Four cell means from ONE aggregate (exact decimal sums),
    // then a fixed IEEE combination.
    "q261_diff_in_diff" -> Q(
      (s, dir) => {
        val cut = to_date(lit("2024-01-16"))
        val cells = t(s, dir, "events")
          .select(treated(col("user_id")).as("tr"),
            (to_date(col("ts")) >= cut).as("post"),
            Det.money(col("value")).as("v"))
          .groupBy("tr", "post")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        val m = cells.select(
          concat(when(col("tr"), "t").otherwise("c"),
            when(col("post"), "_post").otherwise("_pre")).as("cell"),
          col("n"), (col("sv").cast("double") / col("n").cast("double")).as("mean"))
        val wide = m.groupBy()
          .pivot("cell", Seq("c_pre", "c_post", "t_pre", "t_post"))
          .agg(first(col("mean")))
        val ns = m.groupBy().pivot("cell", Seq("c_pre", "c_post", "t_pre", "t_post"))
          .agg(first(col("n")))
          .select(col("c_pre").as("n_c_pre"), col("c_post").as("n_c_post"),
            col("t_pre").as("n_t_pre"), col("t_post").as("n_t_post"))
        wide.crossJoin(ns)
          .withColumn("did",
            (col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
      },
      Some(s"""WITH cells AS (SELECT
            CASE WHEN $SqlTreated THEN 't' ELSE 'c' END ||
            CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
              THEN '_post' ELSE '_pre' END AS cell,
            COUNT(*) AS n,
            CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS mean
          FROM events GROUP BY 1)
        SELECT
          MAX(CASE WHEN cell = 'c_pre' THEN mean END) AS c_pre,
          MAX(CASE WHEN cell = 'c_post' THEN mean END) AS c_post,
          MAX(CASE WHEN cell = 't_pre' THEN mean END) AS t_pre,
          MAX(CASE WHEN cell = 't_post' THEN mean END) AS t_post,
          MAX(CASE WHEN cell = 'c_pre' THEN n END) AS n_c_pre,
          MAX(CASE WHEN cell = 'c_post' THEN n END) AS n_c_post,
          MAX(CASE WHEN cell = 't_pre' THEN n END) AS n_t_pre,
          MAX(CASE WHEN cell = 't_post' THEN n END) AS n_t_post,
          (MAX(CASE WHEN cell = 't_post' THEN mean END)
            - MAX(CASE WHEN cell = 't_pre' THEN mean END))
          - (MAX(CASE WHEN cell = 'c_post' THEN mean END)
            - MAX(CASE WHEN cell = 'c_pre' THEN mean END)) AS did
        FROM cells""")),

    // ---- CUPED variance reduction ---------------------------------------
    // The experimentation-platform sensitivity booster (Deng et al.
    // 2013): regress each user's post-period metric on their PRE-period
    // metric and remove the explained variance; θ = cov(X,Y)/var(X),
    // achieved reduction = ρ². Per-user X/Y are whole-currency integer
    // sums (exact), the five power sums are BIGINT (overflow budget:
    // per-user sums < 2^27, squares summed over users < 2^57), and
    // θ/ρ² are fixed IEEE trees over the exact sums. Raw vx/vy/cxy ride
    // along as exact BIGINTs, so the gate pins the sums — not just the
    // rounded ratios.
    "q262_cuped" -> Q(
      (s, dir) => {
        val cut = to_date(lit("2024-01-16"))
        val per = t(s, dir, "events")
          .select(col("user_id"),
            (to_date(col("ts")) >= cut).as("post"),
            floor(col("value")).cast("long").as("v"))
          .groupBy("user_id")
          .agg(sum(when(!col("post"), col("v")).otherwise(0L)).as("x"),
            sum(when(col("post"), col("v")).otherwise(0L)).as("y"))
        per.agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("cxy"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("vx"),
            (col("n") * col("syy") - col("sy") * col("sy")).as("vy"))
          .withColumn("theta", col("cxy").cast("double") / col("vx").cast("double"))
          .withColumn("rho2",
            (col("cxy").cast("double") / col("vx").cast("double"))
              * (col("cxy").cast("double") / col("vy").cast("double")))
      },
      Some(s"""WITH per AS (SELECT user_id,
            SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16' THEN 0
                ELSE CAST(FLOOR(value) AS BIGINT) END) AS x,
            SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                THEN CAST(FLOOR(value) AS BIGINT) ELSE 0 END) AS y
          FROM events GROUP BY user_id),
        s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
            SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy FROM per)
        SELECT CAST(n AS BIGINT) AS n,
          CAST(n * sxy - sx * sy AS BIGINT) AS cxy,
          CAST(n * sxx - sx * sx AS BIGINT) AS vx,
          CAST(n * syy - sy * sy AS BIGINT) AS vy,
          CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
            AS theta,
          (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
            * (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * syy - sy * sy AS DOUBLE))
            AS rho2
        FROM s""")),

    // ---- sample-ratio mismatch ------------------------------------------
    // The assignment-health alarm: under a 50/50 md5 coin the per-type
    // EXPOSED-USER counts must split evenly; χ² = (n_t − n_c)²/n per
    // type (the 2-cell Pearson statistic in one division) with the
    // standard χ²₁ > 9 (p ≈ 0.0027) alarm threshold as an exact integer
    // comparison: 9·n < (n_t − n_c)². Distinct-user counts are
    // per-type exact; the type domain is bounded.
    "q263_srm_check" -> Q(
      (s, dir) => {
        t(s, dir, "events")
          .select(col("event_type"), col("user_id"),
            treated(col("user_id")).as("tr"))
          .distinct()
          .groupBy("event_type")
          .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("n_t"),
            sum(when(!col("tr"), 1L).otherwise(0L)).as("n_c"))
          .withColumn("n", col("n_t") + col("n_c"))
          .withColumn("chi2",
            ((col("n_t") - col("n_c")) * (col("n_t") - col("n_c"))).cast("double")
              / col("n").cast("double"))
          .withColumn("srm_alarm",
            (col("n_t") - col("n_c")) * (col("n_t") - col("n_c")) > col("n") * 9L)
          .orderBy("event_type")
      },
      Some(s"""WITH u AS (SELECT DISTINCT event_type, user_id,
            $SqlTreated AS tr FROM events),
        c AS (SELECT event_type,
            SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS n_t,
            SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS n_c
          FROM u GROUP BY event_type)
        SELECT event_type, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
          CAST(n_t + n_c AS BIGINT) AS n,
          CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE)
            / CAST(n_t + n_c AS DOUBLE) AS chi2,
          (n_t - n_c) * (n_t - n_c) > (n_t + n_c) * 9 AS srm_alarm
        FROM c ORDER BY event_type""")),

    // ---- two-proportion test (conversion lift) --------------------------
    // The readout q261 needs a verdict for: did treatment change the
    // user-level HEAVY-BUYER rate (≥ 14 purchases — the fixture's
    // per-user purchase rate is scale-invariant, so the threshold splits
    // the population at every sf; "≥ 1 purchase" is degenerate, everyone
    // converts)? Pearson χ² on the 2×2 in the n(ad−bc)²/row-col-margin
    // form — exact BIGINT numerator and denominator, ONE division
    // (guarded: a zero margin yields NULL, not an error), and the
    // α = 0.05 verdict (χ²₁ > 3.84) as an EXACT integer
    // cross-multiplication (100·n·(ad−bc)² > 384·margins), no float
    // threshold. Overflow budget: safe to ~50k units per cell
    // (margins⁴·384 < 2^63); larger populations promote the margin
    // product to DECIMAL.
    "q266_proportion_test" -> Q(
      (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 14L).cast("long").as("conv"))
          .select(treated(col("user_id")).as("tr"), col("conv"))
        users.agg(
            sum(when(col("tr") && col("conv") === 1L, 1L).otherwise(0L)).as("a"),
            sum(when(col("tr") && col("conv") === 0L, 1L).otherwise(0L)).as("b"),
            sum(when(!col("tr") && col("conv") === 1L, 1L).otherwise(0L)).as("c"),
            sum(when(!col("tr") && col("conv") === 0L, 1L).otherwise(0L)).as("d"))
          .withColumn("n", col("a") + col("b") + col("c") + col("d"))
          .withColumn("num",
            col("n") * (col("a") * col("d") - col("b") * col("c"))
              * (col("a") * col("d") - col("b") * col("c")))
          .withColumn("den",
            (col("a") + col("b")) * (col("c") + col("d"))
              * (col("a") + col("c")) * (col("b") + col("d")))
          .select(col("a"), col("b"), col("c"), col("d"), col("n"),
            when(col("den") > 0L,
              col("num").cast("double") / col("den").cast("double")).as("chi2"),
            (col("num") * 100L > col("den") * 384L).as("significant"))
      },
      Some(s"""WITH u AS (SELECT user_id,
            CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS conv
          FROM events GROUP BY user_id),
        cells AS (SELECT
            SUM(CASE WHEN $SqlTreated AND conv = 1 THEN 1 ELSE 0 END) AS a,
            SUM(CASE WHEN $SqlTreated AND conv = 0 THEN 1 ELSE 0 END) AS b,
            SUM(CASE WHEN NOT ($SqlTreated) AND conv = 1 THEN 1 ELSE 0 END) AS c,
            SUM(CASE WHEN NOT ($SqlTreated) AND conv = 0 THEN 1 ELSE 0 END) AS d
          FROM u)
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
          CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
          CAST(a + b + c + d AS BIGINT) AS n,
          CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) > 0 THEN
            CAST((a + b + c + d) * (a*d - b*c) * (a*d - b*c) AS DOUBLE)
              / CAST((a+b) * (c+d) * (a+c) * (b+d) AS DOUBLE) END AS chi2,
          (a + b + c + d) * (a*d - b*c) * (a*d - b*c) * 100
            > (a+b) * (c+d) * (a+c) * (b+d) * 384 AS significant
        FROM cells""")),

    // ---- power analysis / minimum detectable effect ---------------------
    // The DESIGN side of the suite: given each event type's observed
    // variance, what effect size can a 50/50 split detect at α = 0.05,
    // power 0.8? MDE = (z_{0.975} + z_{0.8})·sqrt(2σ²/n_arm) — the z
    // constants are PARSED decimal strings (the BenfordProbs ruling:
    // build-time normal quantiles differ across libms), σ² is a fixed
    // IEEE tree over exact decimal-sourced sums, and sqrt is correctly
    // rounded — the whole design number hash-matches.
    "q267_power_mde" -> Q(
      (s, dir) => {
        val z = lit("1.959963984540054").cast("double") +
          lit("0.8416212335729143").cast("double")
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            Det.moneySumExact(col("value")).as("sv"),
            sum(Det.money(col("value")) * Det.money(col("value"))).as("svv"))
          // Det.nz: a single-event type (n=1, n_arm=0) must yield NULL
          // like DuckDB's /0, not Spark's Inf
          .withColumn("variance",
            (col("n").cast("double") * col("svv").cast("double")
              - col("sv").cast("double") * col("sv").cast("double"))
              / Det.nz(col("n").cast("double") * (col("n") - 1L).cast("double")))
          .withColumn("n_arm", expr("n div 2"))
          .withColumn("mde", z * sqrt(lit(2d) * col("variance")
            / Det.nz(col("n_arm").cast("double"))))
          .select("event_type", "n", "variance", "n_arm", "mde")
          .orderBy("event_type")
      },
      Some("""WITH a AS (SELECT event_type, COUNT(*) AS n,
            SUM(CAST(value AS DECIMAL(12,2))) AS sv,
            SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS svv
          FROM events GROUP BY event_type)
        SELECT event_type, n,
          (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
            - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS variance,
          CAST(n // 2 AS BIGINT) AS n_arm,
          (CAST('1.959963984540054' AS DOUBLE) + CAST('0.8416212335729143' AS DOUBLE))
            * SQRT(2 * ((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
                - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
              / CAST(n // 2 AS DOUBLE)) AS mde
        FROM a ORDER BY event_type""")),

    // ---- group-sequential interim monitoring ----------------------------
    // The "peeking correctly" readout: the treated-vs-control value mean
    // is tested at three interim looks (day 10/20/30 cut dates) against
    // O'Brien-Fleming boundaries — the spending schedule that makes
    // early stopping legitimate. Per look: exact decimal sums/sums-of-
    // squares (ONE pass, conditional aggregates), Welch-style z from a
    // fixed IEEE tree with correctly-rounded sqrt, and the boundary as a
    // PARSED decimal string (the BenfordProbs libm ruling). The reject
    // verdict compares two deterministic doubles.
    "q286_group_sequential" -> Q(
      (s, dir) => {
        val looks = Seq(
          ("1_day10", "2024-01-11", "3.471086"),
          ("2_day20", "2024-01-21", "2.454262"),
          ("3_day30", "2024-01-31", "2.004089"))
        val ev = t(s, dir, "events")
          .select(treated(col("user_id")).as("tr"),
            to_date(col("ts")).as("day"), Det.money(col("value")).as("v"))
        val rows = looks.map { case (look, cut, bound) =>
          val c = ev.filter(col("day") < to_date(lit(cut)))
          c.agg(
              sum(when(col("tr"), 1L).otherwise(0L)).as("n_t"),
              sum(when(col("tr"), col("v")).otherwise(lit(0).cast(Det.Money)))
                .as("sv_t"),
              sum(when(col("tr"), col("v") * col("v"))
                .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(24, 4))))
                .as("svv_t"),
              sum(when(!col("tr"), 1L).otherwise(0L)).as("n_c"),
              sum(when(!col("tr"), col("v")).otherwise(lit(0).cast(Det.Money)))
                .as("sv_c"),
              sum(when(!col("tr"), col("v") * col("v"))
                .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(24, 4))))
                .as("svv_c"))
            // Det.nz on every collapsible denominator: an arm with n<=1
            // must yield NULL (DuckDB's /0) not Inf/NaN (Spark's)
            .select(lit(look).as("look"), col("n_t"), col("n_c"),
              (col("sv_t").cast("double") / Det.nz(col("n_t").cast("double"))
                - col("sv_c").cast("double") / Det.nz(col("n_c").cast("double")))
                .as("mean_diff"),
              ((col("n_t").cast("double") * col("svv_t").cast("double")
                - col("sv_t").cast("double") * col("sv_t").cast("double"))
                / Det.nz(col("n_t").cast("double") * (col("n_t") - 1L).cast("double"))
                / Det.nz(col("n_t").cast("double"))
                + (col("n_c").cast("double") * col("svv_c").cast("double")
                  - col("sv_c").cast("double") * col("sv_c").cast("double"))
                  / Det.nz(col("n_c").cast("double") * (col("n_c") - 1L).cast("double"))
                  / Det.nz(col("n_c").cast("double"))).as("se2"),
              lit(bound).cast("double").as("boundary"))
            .withColumn("z", col("mean_diff") / Det.nz(sqrt(col("se2"))))
            .withColumn("reject", abs(col("z")) > col("boundary"))
        }
        rows.reduce(_.unionAll(_)).orderBy("look")
      },
      Some {
        def one(look: String, cut: String, bound: String) =
          s"""SELECT '$look' AS look,
             SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS n_t,
             SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS n_c,
             CAST(SUM(CASE WHEN tr THEN v ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS DOUBLE)
             - CAST(SUM(CASE WHEN tr THEN CAST(0 AS DECIMAL(12,2)) ELSE v END) AS DOUBLE)
               / CAST(SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS DOUBLE) AS mean_diff,
             (CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS DOUBLE)
                 * CAST(SUM(CASE WHEN tr THEN v * v ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
               - CAST(SUM(CASE WHEN tr THEN v ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 * CAST(SUM(CASE WHEN tr THEN v ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE))
               / (CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS DOUBLE)
                 * CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) - 1 AS DOUBLE))
               / CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS DOUBLE)
             + (CAST(SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS DOUBLE)
                 * CAST(SUM(CASE WHEN tr THEN CAST(0 AS DECIMAL(24,4)) ELSE v * v END) AS DOUBLE)
               - CAST(SUM(CASE WHEN tr THEN CAST(0 AS DECIMAL(12,2)) ELSE v END) AS DOUBLE)
                 * CAST(SUM(CASE WHEN tr THEN CAST(0 AS DECIMAL(12,2)) ELSE v END) AS DOUBLE))
               / (CAST(SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS DOUBLE)
                 * CAST(SUM(CASE WHEN tr THEN 0 ELSE 1 END) - 1 AS DOUBLE))
               / CAST(SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS DOUBLE) AS se2,
             CAST('$bound' AS DOUBLE) AS boundary
           FROM (SELECT $SqlTreated AS tr, CAST(ts AS DATE) AS day,
               CAST(value AS DECIMAL(12,2)) AS v FROM events)
           WHERE day < DATE '$cut'"""
        val looks = Seq(("1_day10", "2024-01-11", "3.471086"),
          ("2_day20", "2024-01-21", "2.454262"),
          ("3_day30", "2024-01-31", "2.004089"))
        val closed = looks.map { case (l, c, b) => s"(${one(l, c, b)})" }
          .mkString(" UNION ALL ")
        s"""SELECT look, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
             mean_diff, se2, boundary,
             mean_diff / SQRT(se2) AS z,
             ABS(mean_diff / SQRT(se2)) > boundary AS reject
           FROM ($closed) ORDER BY look"""
      }),

    // ---- paired sign test (pre vs post per user) ------------------------
    // The PAIRED companion to Mann-Whitney (q206 is unpaired): did each
    // user's daily event value rise after the mid-month split? Per user,
    // pre/post exact-cent sums normalized per active day (cross-
    // multiplied to avoid division: post_cents·pre_days vs
    // pre_cents·post_days — exact BIGINT compare), then the sign test on
    // the positive/negative counts: z = (n_pos − n/2)/sqrt(n/4) as a
    // fixed tree, α = 0.05 via the parsed 1.96. Ties drop, as the test
    // prescribes.
    "q297_sign_test" -> Q(
      (s, dir) => {
        val per = prePostCmp(s, dir)
        per.agg(
            sum(when(col("cmp") > 0L, 1L).otherwise(0L)).as("n_pos"),
            sum(when(col("cmp") < 0L, 1L).otherwise(0L)).as("n_neg"),
            sum(when(col("cmp") === 0L, 1L).otherwise(0L)).as("n_tie"))
          .withColumn("n", col("n_pos") + col("n_neg"))
          // Det.nz: n=0 (all ties) must be NULL like DuckDB's /0, not NaN
          .withColumn("z",
            (col("n_pos").cast("double") - col("n").cast("double") / 2d)
              / Det.nz(sqrt(col("n").cast("double") / 4d)))
          .withColumn("significant",
            abs(col("z")) > lit("1.959963984540054").cast("double"))
      },
      Some(s"""WITH $SqlPrePost,
        s AS (SELECT post_c * pre_d - pre_c * post_d AS cmp FROM per
          WHERE pre_d > 0 AND post_d > 0),
        a AS (SELECT
            SUM(CASE WHEN cmp > 0 THEN 1 ELSE 0 END) AS n_pos,
            SUM(CASE WHEN cmp < 0 THEN 1 ELSE 0 END) AS n_neg,
            SUM(CASE WHEN cmp = 0 THEN 1 ELSE 0 END) AS n_tie
          FROM s)
        SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
          CAST(n_tie AS BIGINT) AS n_tie,
          CAST(n_pos + n_neg AS BIGINT) AS n,
          (CAST(n_pos AS DOUBLE) - CAST(n_pos + n_neg AS DOUBLE) / 2)
            / SQRT(CAST(n_pos + n_neg AS DOUBLE) / 4) AS z,
          ABS((CAST(n_pos AS DOUBLE) - CAST(n_pos + n_neg AS DOUBLE) / 2)
            / SQRT(CAST(n_pos + n_neg AS DOUBLE) / 4))
            > CAST('1.959963984540054' AS DOUBLE) AS significant
        FROM a""")),

    // ---- Wilcoxon signed-rank test --------------------------------------
    // The rank-powered upgrade of q297's sign test: the same per-user
    // pre/post cross-multiplied differences, but ranked by magnitude so
    // large movements weigh more. Doubled midranks (the q206 trick —
    // 2·count_less + count_equal + 1 over the distinct |diff| count
    // table) keep tie handling exact-integer; W₂ = Σ doubled ranks of
    // positive diffs, and z = (W₂ − n(n+1)/2)/sqrt(n(n+1)(2n+1)/6) is
    // one fixed tree (doubling scales numerator and sd together). Zero
    // diffs drop; no tie-variance correction (documented — |diff| ties
    // are rare off zero in this fixture).
    "q298_wilcoxon_signed" -> Q(
      (s, dir) => {
        val per = prePostCmp(s, dir)
          .filter(col("cmp") =!= 0L)
          .withColumn("a", abs(col("cmp")))
        val vc = per.groupBy("a").agg(count(lit(1)).as("cnt"))
        val wCum = org.apache.spark.sql.expressions.Window.orderBy("a")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val dr = vc
          .withColumn("before", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
          .withColumn("dr", col("before") * 2L + col("cnt") + 1L)
          .select("a", "dr")
        per.join(dr, Seq("a"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("cmp") > 0L, col("dr")).otherwise(0L)).as("w2_pos"))
          // Det.nz: n=0 (no nonzero diffs) must be NULL, not NaN
          .withColumn("z",
            (col("w2_pos").cast("double")
              - (col("n") * (col("n") + 1L)).cast("double") / 2d)
              / Det.nz(sqrt((col("n") * (col("n") + 1L) * (col("n") * 2L + 1L))
                .cast("double") / 6d)))
          .withColumn("significant",
            abs(col("z")) > lit("1.959963984540054").cast("double"))
      },
      Some(s"""WITH $SqlPrePost,
        s AS (SELECT post_c * pre_d - pre_c * post_d AS cmp,
            ABS(post_c * pre_d - pre_c * post_d) AS a
          FROM per WHERE pre_d > 0 AND post_d > 0
            AND post_c * pre_d - pre_c * post_d <> 0),
        vc AS (SELECT a, COUNT(*) AS cnt FROM s GROUP BY a),
        dr AS (SELECT a,
            COALESCE(SUM(cnt) OVER (ORDER BY a ROWS BETWEEN UNBOUNDED
              PRECEDING AND 1 PRECEDING), 0) * 2 + cnt + 1 AS dr
          FROM vc),
        agg AS (SELECT COUNT(*) AS n,
            SUM(CASE WHEN cmp > 0 THEN dr ELSE 0 END) AS w2_pos
          FROM s JOIN dr ON s.a = dr.a)
        SELECT CAST(n AS BIGINT) AS n, CAST(w2_pos AS BIGINT) AS w2_pos,
          (CAST(w2_pos AS DOUBLE) - CAST(n * (n + 1) AS DOUBLE) / 2)
            / SQRT(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 6) AS z,
          ABS((CAST(w2_pos AS DOUBLE) - CAST(n * (n + 1) AS DOUBLE) / 2)
            / SQRT(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 6))
            > CAST('1.959963984540054' AS DOUBLE) AS significant
        FROM agg""")),

    // ---- uplift by model decile (Qini-style curve) ----------------------
    // Targeting-model evaluation: per md5-score decile, treated vs
    // control heavy-buyer rates and their gap (uplift), plus the
    // cumulative Qini-style numerator Σ(conv_t − conv_c·n_t/n_c) over
    // deciles ranked best-first. One (decile, arm) aggregate over users;
    // the cumulative window runs over 10 rows. Rates are single
    // divisions over exact counts; the qini term keeps its (conv_c·n_t)
    // product exact and spends one division per decile.
    "q275_uplift_deciles" -> Q(
      (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 14L).cast("long").as("conv"))
          .select(col("user_id"), col("conv"), treated(col("user_id")).as("tr"),
            pmod(Hashing.h28(concat(lit("scr"), col("user_id").cast("string"))),
              lit(10L)).as("decile"))
        val cells = users.groupBy("decile")
          .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("n_t"),
            sum(when(col("tr"), col("conv")).otherwise(0L)).as("conv_t"),
            sum(when(!col("tr"), 1L).otherwise(0L)).as("n_c"),
            sum(when(!col("tr"), col("conv")).otherwise(0L)).as("conv_c"))
          .withColumn("uplift",
            when(col("n_t") > 0L && col("n_c") > 0L,
              col("conv_t").cast("double") / col("n_t").cast("double")
                - col("conv_c").cast("double") / col("n_c").cast("double")))
          .withColumn("qini_term",
            when(col("n_c") > 0L,
              col("conv_t").cast("double")
                - (col("conv_c") * col("n_t")).cast("double")
                  / col("n_c").cast("double")).otherwise(lit(0d)))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("uplift").desc, col("decile"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        cells.withColumn("qini_cum", sum(col("qini_term")).over(w))
          .drop("qini_term")
          .orderBy("decile")
      },
      Some(s"""WITH u AS (SELECT user_id,
            CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS conv
          FROM events GROUP BY user_id),
        s AS (SELECT conv, $SqlTreated AS tr,
            ${Hashing.sqlH28("'scr' || CAST(user_id AS VARCHAR)")} % 10 AS decile
          FROM u),
        cells AS (SELECT decile,
            SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS n_t,
            SUM(CASE WHEN tr THEN conv ELSE 0 END) AS conv_t,
            SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS n_c,
            SUM(CASE WHEN tr THEN 0 ELSE conv END) AS conv_c
          FROM s GROUP BY decile),
        scored AS (SELECT decile, n_t, conv_t, n_c, conv_c,
            CASE WHEN n_t > 0 AND n_c > 0 THEN
              CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) END AS uplift,
            CASE WHEN n_c > 0 THEN
              CAST(conv_t AS DOUBLE)
                - CAST(conv_c * n_t AS DOUBLE) / CAST(n_c AS DOUBLE)
            ELSE 0 END AS qini_term
          FROM cells)
        SELECT CAST(decile AS BIGINT) AS decile,
          CAST(n_t AS BIGINT) AS n_t, CAST(conv_t AS BIGINT) AS conv_t,
          CAST(n_c AS BIGINT) AS n_c, CAST(conv_c AS BIGINT) AS conv_c,
          uplift,
          SUM(qini_term) OVER (ORDER BY uplift DESC, decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qini_cum
        FROM scored ORDER BY decile"""))
  )
}
