package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.store.VectorStore
import graft.store.VectorStore.pointsSql
import graft.QDsl._

/** SparkEntry query family (split from the single-file inventory
  * in round 14 — same query names, same bodies; SparkEntry
  * assembles the full map and the driver contract). */
private[graft] object QRound10e {


  val round10kQ: Seq[(String, Q)] = Seq(
    // Wang-Isola alignment & uniformity (ICML 2020) — THE two-number
    // contrastive-embedding report: alignment = mean squared distance
    // of same-label pairs (want small), uniformity = ln mean
    // exp(−2‖x̂−ŷ‖²) over all pairs (want very negative = spread
    // out). Computed exactly on the bounded oracle subset via the
    // shared 6dp cosine (‖x̂−ŷ‖² = 2−2cos); the at-scale path is the
    // same formula over LSH-bucket-sampled pairs (documented
    // deliberate altitude, like dedup_embed_cosine).
    "emb_align_uniform" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val f = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull && col("vec_id") < 200)
          .select(col("vec_id"), col("label"), col("embedding"))
        val pairs = f.select(col("vec_id").as("va"), col("label").as("la"),
            col("embedding").as("ea"))
          .join(f.select(col("vec_id").as("vb"), col("label").as("lb"),
            col("embedding").as("eb")), col("va") < col("vb"))
          .withColumn("d2", lit(2.0) - lit(2.0) * score(col("ea"), col("eb")))
        pairs.agg(count(lit(1)).as("n_pairs"),
            sum(when(col("la") === col("lb"), 1L).otherwise(0L))
              .as("n_align_pairs"),
            avg(when(col("la") === col("lb"), col("d2"))).as("al"),
            avg(exp(lit(-2.0) * col("d2"))).as("un"))
          .select(col("n_pairs"), col("n_align_pairs"),
            round(col("al"), 4).as("alignment"),
            round(log(col("un")), 4).as("uniformity"))
      },
      Some("""WITH f AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
             |           FROM embeddings
             |           WHERE embedding IS NOT NULL AND vec_id < 200),
             |p AS (SELECT a.label AS la, b.label AS lb,
             |             2.0 - 2.0 * (round(list_cosine_similarity(a.emb, b.emb), 6) + 0.0) AS d2
             |      FROM f a JOIN f b ON a.vec_id < b.vec_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_align_pairs,
             |       round(avg(CASE WHEN la = lb THEN d2 END), 4) AS alignment,
             |       round(ln(avg(exp(-2.0 * d2))), 4) AS uniformity
             |FROM p""".stripMargin)),

    // data-contract audit of the events table — the rules a feed
    // owner would declare, checked in ONE conditional map-side
    // aggregate: null keys, unknown enum values, out-of-range
    // measures, NaN poisoning, malformed JSON payloads, timestamps
    // outside the believable window. The wide one-row report is what
    // a pipeline gate consumes; any nonzero cell is an alert.
    "pipe_contract_events" -> Q(
      (s, d) => {
        val known = Seq("click", "view", "purchase", "signup", "error")
        Tables.events(s, d).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("event_type").isNull, 1L).otherwise(0L))
            .as("n_null_type"),
          sum(when(col("event_type").isNotNull &&
            !col("event_type").isin(known: _*), 1L).otherwise(0L))
            .as("n_unknown_type"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L))
            .as("n_null_user"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
          sum(when(isnan(col("value")), 1L).otherwise(0L)).as("n_nan_value"),
          sum(when(col("value") < 0 || col("value") > 1000, 1L).otherwise(0L))
            .as("n_value_range"),
          sum(when(col("props").isNotNull && !col("props").like("{%"), 1L)
            .otherwise(0L)).as("n_bad_props"),
          sum(when(col("ts") < lit(1577836800000000000L) ||
            col("ts") > lit(1893456000000000000L), 1L).otherwise(0L))
            .as("n_ts_range"))
          .withColumn("n_violations",
            col("n_null_type") + col("n_unknown_type") + col("n_null_user") +
            col("n_null_value") + col("n_nan_value") + col("n_value_range") +
            col("n_bad_props") + col("n_ts_range"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_type,
             |  CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
             |    ('click', 'view', 'purchase', 'signup', 'error')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown_type,
             |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user,
             |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
             |  CAST(sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_value,
             |  CAST(sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_value_range,
             |  CAST(sum(CASE WHEN props IS NOT NULL AND props NOT LIKE '{%'
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_props,
             |  CAST(sum(CASE WHEN ts < 1577836800000000000 OR ts > 1893456000000000000
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ts_range,
             |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
             |        ('click', 'view', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN props IS NOT NULL AND props NOT LIKE '{%' THEN 1 ELSE 0 END)
             |    + sum(CASE WHEN ts < 1577836800000000000 OR ts > 1893456000000000000
             |        THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
             |FROM events""".stripMargin)),

    // Dunn's post-hoc test: WHICH language pairs differ after
    // stat_kruskal rejects — pairwise z on tie-corrected mean
    // midranks (the same VALUE-level rank machinery, never a row
    // rank), Bonferroni-adjusted over the k(k-1)/2 comparisons. The
    // pair frame is |langs|², bounded by the language domain.
    "stat_dunn_test" -> Q(
      (s, d) => {
        val cells = Tables.documents(s, d)
          .groupBy(col("lang"), col("n_chars").cast("long").as("x"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false) // value ranks + group sums
        val wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
        val ranks = cells.groupBy("x").agg(sum("cnt").as("t"))
          .withColumn("f", coalesce(sum("t").over(wx), lit(0L)))
          .select(col("x"), col("t"), (col("f") * 2 + col("t") + 1).as("rank2"))
          .localCheckpoint(eager = false) // rank join + tie term
        val grp = cells.join(broadcast(ranks), "x")
          .groupBy("lang").agg(sum("cnt").as("n_g"),
            (sum(col("cnt") * col("rank2")) / 2.0 / sum("cnt")).as("mr"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val tot = cells.agg(sum("cnt").cast("double").as("nn"))
          .crossJoin(broadcast(ranks.agg(
            sum(col("t").cast("double") * col("t") * col("t") - col("t"))
              .as("tie"))))
        val k = grp.agg(count(lit(1)).cast("double").as("k"))
        val pairs = grp.select(col("lang").as("la"), col("n_g").as("na"),
            col("mr").as("ma"))
          .join(grp.select(col("lang").as("lb"), col("n_g").as("nb"),
            col("mr").as("mb")), col("la") < col("lb"))
          .crossJoin(broadcast(tot)).crossJoin(broadcast(k))
        val s2 = (col("nn") * (col("nn") + 1)
          - col("tie") / (col("nn") - 1)) / 12.0 *
          (lit(1.0) / col("na") + lit(1.0) / col("nb"))
        val zc = pairs.withColumn("z",
          when(s2 > 0, round((col("ma") - col("mb")) / sqrt(s2), 4)))
        val xx = abs(col("z")) / sqrt(lit(2.0))
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        zc.withColumn("p",
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
                + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
                + t1 * lit(1.061405429)))))
              * exp(-xx * xx), 6)))
          .withColumn("m", col("k") * (col("k") - 1) / 2)
          .select(col("la"), col("lb"),
            col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
            col("z"), col("p"),
            when(col("p").isNotNull,
              round(least(col("p") * col("m"), lit(1.0)), 6)).as("p_bonf"),
            when(col("p").isNotNull,
              (round(least(col("p") * col("m"), lit(1.0)), 6) < 0.05)
                .cast("long")).as("reject_05"))
          .orderBy("la", "lb")
      },
      Some("""WITH cells AS (SELECT lang, CAST(n_chars AS BIGINT) AS x,
             |                      count(*) AS cnt
             |               FROM documents GROUP BY lang, x),
             |hx AS (SELECT x, sum(cnt) AS t FROM cells GROUP BY x),
             |rk AS (SELECT x, t,
             |         coalesce(sum(t) OVER (ORDER BY x ROWS BETWEEN
             |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
             |           + t + 1 AS rank2
             |       FROM hx),
             |g AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_g,
             |             sum(cnt * rank2) / 2.0 / sum(cnt) AS mr
             |      FROM cells JOIN rk USING (x) GROUP BY lang),
             |tt AS (SELECT CAST(sum(cnt) AS DOUBLE) AS nn FROM cells),
             |te AS (SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie FROM rk),
             |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM g),
             |pr AS (SELECT a.lang AS la, b.lang AS lb, a.n_g AS na, b.n_g AS nb,
             |              a.mr AS ma, b.mr AS mb, nn, tie, k
             |       FROM g a JOIN g b ON a.lang < b.lang, tt, te, kk),
             |zz AS (SELECT *,
             |         (nn * (nn + 1) - tie / (nn - 1)) / 12.0
             |           * (1.0 / na + 1.0 / nb) AS s2
             |       FROM pr),
             |zc AS (SELECT *, CASE WHEN s2 > 0
             |              THEN round((ma - mb) / sqrt(s2), 4) END AS z
             |       FROM zz),
             |pv AS (SELECT *, abs(z) / sqrt(2.0) AS xx,
             |              1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t1
             |       FROM zc),
             |pp AS (SELECT *,
             |         CASE WHEN z IS NULL THEN NULL ELSE round(
             |           t1 * (0.254829592 + t1 * (-0.284496736
             |             + t1 * (1.421413741 + t1 * (-1.453152027
             |             + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p
             |       FROM pv)
             |SELECT la, lb, na AS n_a, nb AS n_b, z, p,
             |       CASE WHEN p IS NOT NULL
             |            THEN round(least(p * (k * (k - 1) / 2), 1.0), 6)
             |       END AS p_bonf,
             |       CASE WHEN p IS NOT NULL THEN CAST(CASE WHEN
             |         round(least(p * (k * (k - 1) / 2), 1.0), 6) < 0.05
             |         THEN 1 ELSE 0 END AS BIGINT)
             |       END AS reject_05
             |FROM pp ORDER BY la, lb""".stripMargin)))

  val round10lQ: Seq[(String, Q)] = Seq(
    // exact sign test on paired pre/post per-user mean values
    // (ev_cuped's calendar halves): distribution-free "did users
    // move" with an EXACT two-sided binomial p — ties dropped, the
    // tail sum bounded by min(n+, n-) runs through the shared
    // Stirling lgamma (ln C(n,k) - n ln 2). The assumption-free
    // companion to stat_mcnemar's χ² on a continuous outcome.
    "stat_sign_test" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("day", expr("ts div 86400000000000"))
          .localCheckpoint(eager = false) // bounds + the per-user halves
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val diffs = ud.crossJoin(broadcast(bounds))
          .withColumn("post",
            (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg(avg(when(col("post") === 0, col("value"))).as("pre"),
               avg(when(col("post") === 1, col("value"))).as("post_v"))
          .filter(col("pre").isNotNull && col("post_v").isNotNull &&
            col("pre") =!= col("post_v"))
        val cts = diffs.agg(
          sum(when(col("post_v") > col("pre"), 1L).otherwise(0L)).as("n_up"),
          sum(when(col("post_v") < col("pre"), 1L).otherwise(0L)).as("n_down"))
          .withColumn("n", col("n_up") + col("n_down"))
          .withColumn("kmin", least(col("n_up"), col("n_down")))
        val terms = cts
          .withColumn("k", explode(sequence(lit(0L), col("kmin"))))
          .withColumn("lp",
            lfCol(col("n").cast("double")) - lfCol(col("k").cast("double")) -
            lfCol((col("n") - col("k")).cast("double")) -
            col("n") * lit(math.log(2.0)))
        terms.groupBy("n_up", "n_down", "n")
          .agg(sum(exp(col("lp"))).as("tail"))
          .select(col("n_up"), col("n_down"),
            when(col("n") > 0,
              round(least(lit(2.0) * col("tail"), lit(1.0)), 6)).as("p_exact"))
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, value, ts // 86400000000000 AS day
              |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
              |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
              |ud AS (SELECT user_id,
              |         avg(CASE WHEN day < (mn + mx + 1) // 2 THEN value END) AS pre,
              |         avg(CASE WHEN day >= (mn + mx + 1) // 2 THEN value END) AS post_v
              |       FROM ev, b GROUP BY user_id),
              |df AS (SELECT * FROM ud
              |       WHERE pre IS NOT NULL AND post_v IS NOT NULL AND pre <> post_v),
              |ct AS (SELECT
              |         CAST(sum(CASE WHEN post_v > pre THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
              |         CAST(sum(CASE WHEN post_v < pre THEN 1 ELSE 0 END) AS BIGINT) AS n_down
              |       FROM df),
              |nn AS (SELECT *, n_up + n_down AS n, least(n_up, n_down) AS kmin
              |       FROM ct),
              |tm AS (SELECT *,
              |         ${sqlLf("n")} - ${sqlLf("k")} - ${sqlLf("n - k")}
              |           - n * ln(2.0) AS lp
              |       FROM (SELECT *, CAST(unnest(generate_series(0, kmin)) AS BIGINT) AS k
              |             FROM nn))
              |SELECT n_up, n_down,
              |       CASE WHEN n > 0
              |            THEN round(least(2.0 * sum(exp(lp)), 1.0), 6)
              |       END AS p_exact
              |FROM tm GROUP BY n_up, n_down, n""".stripMargin)),

    // DAU/MAU stickiness per 30-day window: the "how often do monthly
    // users show up daily" engagement ratio — avg daily actives over
    // the window's distinct actives. Two DISTINCT rollups (day grain
    // and window grain) off one pass each; windows are fixed
    // calendar buckets, never sliding fan-outs.
    "ev_stickiness" -> Q(
      (s, d) => {
        val dd = Tables.events(s, d)
          .select(expr("ts div 86400000000000").as("day"), col("user_id"))
          .distinct()
          .localCheckpoint(eager = false) // day grain + window grain
        val dau = dd.groupBy("day").agg(count(lit(1)).as("dau"))
          .withColumn("w", expr("day div 30"))
          .groupBy("w").agg(count(lit(1)).as("n_days"),
            round(avg("dau"), 2).as("avg_dau"))
        val mau = dd.withColumn("w", expr("day div 30"))
          .groupBy("w").agg(countDistinct("user_id").as("mau"))
        dau.join(mau, "w")
          .select(col("w").as("window30"), col("n_days"), col("avg_dau"),
            col("mau"),
            round(col("avg_dau") / col("mau").cast("double"), 4)
              .as("stickiness"))
          .orderBy("window30")
      },
      Some("""WITH dd AS (SELECT DISTINCT ts // 86400000000000 AS day, user_id
             |            FROM events),
             |dau AS (SELECT day // 30 AS w, CAST(count(*) AS BIGINT) AS n_days,
             |               round(avg(dau), 2) AS avg_dau
             |        FROM (SELECT day, CAST(count(*) AS BIGINT) AS dau
             |              FROM dd GROUP BY day)
             |        GROUP BY 1),
             |mau AS (SELECT day // 30 AS w,
             |               CAST(count(DISTINCT user_id) AS BIGINT) AS mau
             |        FROM dd GROUP BY 1)
             |SELECT w AS window30, n_days, avg_dau, mau,
             |       round(avg_dau / CAST(mau AS DOUBLE), 4) AS stickiness
             |FROM dau JOIN mau USING (w) ORDER BY window30""".stripMargin)),

    // post-stratified estimation: a 10% hash sample's mean tokens/doc
    // re-weighted so language strata match the corpus margins (the
    // one-step raking every survey-grade metric pipeline applies
    // before quoting sampled numbers) — reported NEXT to the naive
    // sample mean and the true value, so the variance reduction is
    // auditable. Margins are a |langs|-row broadcast; the sample scan
    // is the only doc-scale pass.
    "samp_poststratify" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("double")
            .as("n_tok"))
          .localCheckpoint(eager = false) // margins + truth + the sample
        val marg = t.groupBy("lang").agg(count(lit(1)).cast("double").as("nl"))
        val truth = t.agg(count(lit(1)).as("nn"),
          round(avg("n_tok"), 4).as("truth"))
        val samp = t.filter(
          pmod(md5Long(concat(lit("ps:"), col("doc_id").cast("string"))),
            lit(10)) === 0)
        val perLang = samp.groupBy("lang")
          .agg(count(lit(1)).cast("double").as("ml"),
               avg("n_tok").as("mean_l"))
        val est = perLang.join(broadcast(marg), "lang")
          .crossJoin(broadcast(truth))
          .agg(sum("ml").cast("long").as("n_sample"),
               round(sum(col("ml") * col("mean_l")) / sum("ml"), 4)
                 .as("est_unweighted"),
               round(sum(col("nl") * col("mean_l")) / sum("nl"), 4)
                 .as("est_poststrat"),
               max("truth").as("truth"))
        est.select(col("n_sample"), col("est_unweighted"),
          col("est_poststrat"), col("truth"),
          round(abs(col("est_unweighted") - col("truth")), 4).as("err_unw"),
          round(abs(col("est_poststrat") - col("truth")), 4).as("err_ps"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS n_tok
             |  FROM documents),
             |marg AS (SELECT lang, CAST(count(*) AS DOUBLE) AS nl FROM t GROUP BY lang),
             |tr AS (SELECT round(avg(n_tok), 4) AS truth FROM t),
             |s AS (SELECT * FROM t
             |      WHERE ('0x' || substr(md5('ps:' || doc_id::VARCHAR), 1, 15))::BIGINT
             |            % 10 = 0),
             |pl AS (SELECT lang, CAST(count(*) AS DOUBLE) AS ml,
             |              avg(n_tok) AS mean_l
             |       FROM s GROUP BY lang),
             |e AS (SELECT CAST(sum(ml) AS BIGINT) AS n_sample,
             |             round(sum(ml * mean_l) / sum(ml), 4) AS est_unweighted,
             |             round(sum(nl * mean_l) / sum(nl), 4) AS est_poststrat,
             |             max(truth) AS truth
             |      FROM pl JOIN marg USING (lang), tr)
             |SELECT n_sample, est_unweighted, est_poststrat, truth,
             |       round(abs(est_unweighted - truth), 4) AS err_unw,
             |       round(abs(est_poststrat - truth), 4) AS err_ps
             |FROM e""".stripMargin)))

  val round10mQ: Seq[(String, Q)] = Seq(
    // purchase-segment migration matrix between calendar halves: each
    // user classified none/one/repeat in BOTH halves from ONE
    // conditional per-user rollup, then the 3×3 transition counts —
    // the "are repeat buyers persisting or churning" table next to
    // ev_growth_accounting's new/retained/churned flow. Fixed
    // thresholds, no quantile machinery, exact integer counts.
    "ev_segment_migration" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
          .localCheckpoint(eager = false) // bounds + the per-user halves
        val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
        val u = ev.crossJoin(broadcast(bounds))
          .withColumn("post",
            (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg(sum(when(col("post") === 0 && col("event_type") === "purchase",
                 1L).otherwise(0L)).as("pre_n"),
               sum(when(col("post") === 1 && col("event_type") === "purchase",
                 1L).otherwise(0L)).as("post_n"))
        def seg(c: Column) = when(c === 0, "none")
          .when(c === 1, "one").otherwise("repeat")
        val m = u.select(seg(col("pre_n")).as("seg_pre"),
          seg(col("post_n")).as("seg_post"))
        val tot = m.agg(count(lit(1)).cast("double").as("nn"))
        m.groupBy("seg_pre", "seg_post")
          .agg(count(lit(1)).as("n_users"))
          .crossJoin(broadcast(tot))
          .select(col("seg_pre"), col("seg_post"), col("n_users"),
            round(col("n_users") / col("nn"), 4).as("share"))
          .orderBy("seg_pre", "seg_post")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |                   ts // 86400000000000 AS day FROM events),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |u AS (SELECT user_id,
             |        sum(CASE WHEN day < (mn + mx + 1) // 2
             |                  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS pre_n,
             |        sum(CASE WHEN day >= (mn + mx + 1) // 2
             |                  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS post_n
             |      FROM ev, b GROUP BY user_id),
             |m AS (SELECT CASE WHEN pre_n = 0 THEN 'none'
             |                  WHEN pre_n = 1 THEN 'one' ELSE 'repeat' END AS seg_pre,
             |             CASE WHEN post_n = 0 THEN 'none'
             |                  WHEN post_n = 1 THEN 'one' ELSE 'repeat' END AS seg_post
             |      FROM u),
             |t AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM m)
             |SELECT seg_pre, seg_post, CAST(count(*) AS BIGINT) AS n_users,
             |       round(count(*) / nn, 4) AS share
             |FROM m, t GROUP BY seg_pre, seg_post, nn
             |ORDER BY seg_pre, seg_post""".stripMargin)),

    // seasonal-naive (y_{t-7}) forecast backtest per type — the
    // weekly-pattern baseline ts_backtest's trailing mean and
    // ts_theil_u's naive-1 both need to beat before any model ships.
    // Scored only where BOTH lag-7 and lag-1 exist so the skill ratio
    // compares on identical days; ONE rollup, two per-type lag
    // windows over O(days) rows.
    "ts_backtest_snaive" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val sc = daily
          .withColumn("f7", lag("y", 7).over(w))
          .withColumn("f1", lag("y", 1).over(w))
          .filter(col("f7").isNotNull && col("f1").isNotNull)
        sc.groupBy("event_type")
          .agg(count(lit(1)).as("n_scored"),
               sum(pow(col("f7") - col("y"), 2)).as("s7"),
               sum(pow(col("f1") - col("y"), 2)).as("s1"),
               sum(abs(col("f7") - col("y")) / col("y")).as("ape"))
          .select(col("event_type"), col("n_scored"),
            round(sqrt(col("s7") / col("n_scored")), 4).as("rmse_snaive"),
            round(col("ape") / col("n_scored") * 100, 4).as("mape_snaive"),
            round(sqrt(col("s1") / col("n_scored")), 4).as("rmse_naive1"),
            when(col("s1") > 0,
              round(lit(1.0) - sqrt(col("s7") / col("s1")), 4))
              .as("skill_vs_naive1"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |sc AS (SELECT event_type, y,
             |         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS f7,
             |         lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS f1
             |       FROM daily)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
             |       round(sqrt(sum((f7 - y)*(f7 - y)) / count(*)), 4) AS rmse_snaive,
             |       round(sum(abs(f7 - y) / y) / count(*) * 100, 4) AS mape_snaive,
             |       round(sqrt(sum((f1 - y)*(f1 - y)) / count(*)), 4) AS rmse_naive1,
             |       CASE WHEN sum((f1 - y)*(f1 - y)) > 0
             |            THEN round(1.0 - sqrt(sum((f7 - y)*(f7 - y))
             |                       / sum((f1 - y)*(f1 - y))), 4)
             |       END AS skill_vs_naive1
             |FROM sc WHERE f7 IS NOT NULL AND f1 IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // dedup impact report per source: docs/tokens before vs after
    // canonical (min-id) dedup on the SHARED cluster-label table —
    // "what did dedup cost each source" is the number a data-mix
    // owner signs off on. Labels are computed once (the
    // dedup_clusters materialization); this query is two grouped
    // passes over the bounded labeled subset.
    "text_dedup_impact" -> Q(
      (s, d) => {
        val docs200 = docsUnder(s, d, 200)
        val lbl = graft.dedup.Dedup.clusterLabelsShared(docs200, d, 5, 8, 2)
        val t = docs200.select(col("doc_id"), col("source"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
            .as("n_tok"))
        t.join(lbl, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               countDistinct("cluster").as("n_kept"),
               sum("n_tok").as("tokens_total"),
               sum(when(col("doc_id") === col("cluster"), col("n_tok"))
                 .otherwise(0L)).as("tokens_kept"))
          .select(col("source"), col("n_docs"), col("n_kept"),
            (col("n_docs") - col("n_kept")).as("n_removed"),
            col("tokens_total"), col("tokens_kept"),
            round((col("tokens_total") - col("tokens_kept"))
              / col("tokens_total").cast("double"), 4)
              .as("token_removed_share"))
          .orderBy("source")
      },
      Some(s"""WITH RECURSIVE sig AS (
              |${graft.dedup.Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
              |bands AS (${(0 until 4).map(b =>
                 s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                 .mkString(" UNION ALL ")}),
              |pairs AS (
              |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
              |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
              |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
              |reach(src, lbl) AS (
              |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
              |  UNION
              |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
              |cl AS (SELECT src AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster
              |       FROM reach GROUP BY src),
              |t AS (SELECT doc_id, source,
              |        CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
              |      FROM documents WHERE doc_id < 200)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(count(DISTINCT cluster) AS BIGINT) AS n_kept,
              |       CAST(count(*) - count(DISTINCT cluster) AS BIGINT) AS n_removed,
              |       CAST(sum(n_tok) AS BIGINT) AS tokens_total,
              |       CAST(sum(CASE WHEN doc_id = cluster THEN n_tok ELSE 0 END) AS BIGINT)
              |         AS tokens_kept,
              |       round((sum(n_tok) - sum(CASE WHEN doc_id = cluster THEN n_tok ELSE 0 END))
              |             / CAST(sum(n_tok) AS DOUBLE), 4) AS token_removed_share
              |FROM t JOIN cl USING (doc_id)
              |GROUP BY source ORDER BY source""".stripMargin)),

    // multimodal data card: per modality (the engine's doc_id mod 3
    // convention — text/audio/video), asset counts and total content
    // units from the SAME deterministic stub metadata every mm_*
    // operator derives (frames for video, samples+seconds for audio,
    // chars for text) — ONE conditional map-side pass.
    "mm_modality_card" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d)
          .withColumn("hm", md5Long(col("text")))
          .withColumn("modality",
            when(col("doc_id") % 3 === 0, "text")
              .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))
          .withColumn("units",
            when(col("doc_id") % 3 === 0, length(col("text")).cast("long"))
              .when(col("doc_id") % 3 === 1, col("hm") % 2000000 + 1)
              .otherwise(col("hm") % 240 + 1))
          .withColumn("sr", when(col("doc_id") % 3 === 1,
            element_at(array(lit(8000L), lit(16000L), lit(44100L)),
              (col("hm") % 3 + 1).cast("int"))))
        t.groupBy("modality")
          .agg(count(lit(1)).as("n_assets"),
               sum("units").as("total_units"),
               round(avg(col("units").cast("double")), 2).as("avg_units"),
               round(sum(when(col("sr").isNotNull,
                 col("units") / col("sr").cast("double")).otherwise(0.0)), 2)
                 .as("total_audio_sec"))
          .orderBy("modality")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm,
             |         CASE WHEN doc_id % 3 = 0 THEN 'text'
             |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
             |         CASE WHEN doc_id % 3 = 0 THEN CAST(length(text) AS BIGINT)
             |              WHEN doc_id % 3 = 1
             |                THEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 2000000 + 1
             |              ELSE ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1
             |         END AS units,
             |         CASE WHEN doc_id % 3 = 1 THEN
             |           ([8000, 16000, 44100])[CAST(('0x' || substr(md5(text), 1, 15))::BIGINT
             |             % 3 AS INTEGER) + 1]
             |         END AS sr
             |  FROM documents)
             |SELECT modality, CAST(count(*) AS BIGINT) AS n_assets,
             |       CAST(sum(units) AS BIGINT) AS total_units,
             |       round(avg(CAST(units AS DOUBLE)), 2) AS avg_units,
             |       round(sum(CASE WHEN sr IS NOT NULL
             |                 THEN units / CAST(sr AS DOUBLE) ELSE 0.0 END), 2)
             |         AS total_audio_sec
             |FROM t GROUP BY modality ORDER BY modality""".stripMargin)))

  val round10nQ: Seq[(String, Q)] = Seq(
    // Burrows' Delta stylometric distance between sources (the
    // authorship-attribution classic): per-source relative
    // frequencies of the top-50 corpus words, z-scored per word
    // across sources, Δ(a,b) = mean |z_a − z_b| — which sources
    // "write alike" (near-duplicate FEEDS, not documents). Corpus
    // work is two hash aggregates; the vocab is TakeOrdered-bounded
    // at 50 and the pair frame is |sources|²·50.
    "text_burrows_delta" -> Q(
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .localCheckpoint(eager = false) // vocab + per-source counts
        val vocab = tok.groupBy("tok").agg(count(lit(1)).as("cf"))
          .orderBy(col("cf").desc, col("tok")).limit(50)
          .select("tok")
        val stot = tok.groupBy("source").agg(count(lit(1)).as("nt"))
        val f = tok.join(broadcast(vocab), "tok")
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .join(broadcast(stot), "source")
          .select(col("source"), col("tok"),
            round(col("c") * 1000.0 / col("nt"), 6).as("f"))
          .localCheckpoint(eager = false) // stats + both pair sides
        val st = f.groupBy("tok")
          .agg(avg("f").as("mu"), sqrt(var_pop("f")).as("sg"))
          .filter(col("sg") > 0)
        val z = f.join(broadcast(st), "tok")
          .select(col("source"), col("tok"),
            round((col("f") - col("mu")) / col("sg"), 6).as("z"))
          .localCheckpoint(eager = false)
        z.select(col("source").as("sa"), col("tok"), col("z").as("za"))
          .join(z.select(col("source").as("sb"), col("tok"), col("z").as("zb")),
            Seq("tok"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb")
          .agg(count(lit(1)).as("n_terms"),
               round(avg(abs(col("za") - col("zb"))), 4).as("delta"))
          .orderBy(col("delta"), col("sa"), col("sb"))
          .limit(15)
      },
      Some("""WITH tok AS (
             |  SELECT source,
             |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents),
             |vocab AS (SELECT tok FROM (
             |    SELECT tok, count(*) AS cf FROM tok GROUP BY tok
             |    ORDER BY cf DESC, tok LIMIT 50)),
             |stot AS (SELECT source, CAST(count(*) AS BIGINT) AS nt
             |         FROM tok GROUP BY source),
             |f AS MATERIALIZED (
             |  SELECT source, tok, round(c * 1000.0 / nt, 6) AS f
             |  FROM (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
             |        FROM tok JOIN vocab USING (tok) GROUP BY 1, 2)
             |  JOIN stot USING (source)),
             |st AS (SELECT tok, avg(f) AS mu, sqrt(var_pop(f)) AS sg
             |       FROM f GROUP BY tok HAVING sqrt(var_pop(f)) > 0),
             |z AS MATERIALIZED (
             |  SELECT source, f.tok, round((f - mu) / sg, 6) AS z
             |  FROM f JOIN st ON st.tok = f.tok)
             |SELECT a.source AS sa, b.source AS sb,
             |       CAST(count(*) AS BIGINT) AS n_terms,
             |       round(avg(abs(a.z - b.z)), 4) AS delta
             |FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY delta, sa, sb LIMIT 15""".stripMargin)),

    // nearest-centroid classification accuracy per label: assign each
    // embedding to its closest label centroid (the Rocchio
    // classifier) and score against the true labels — the LINEAR
    // separability read-out between emb_label_cohesion (how tight)
    // and emb_knn_accuracy (how locally consistent). Centroids are a
    // broadcast |labels|×64 table; per-vector work is an index join +
    // one bounded per-vector rank window over |labels| rows.
    "emb_centroid_classifier" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d).filter(col("embedding").isNotNull)
        val dims = emb.select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          .select(col("vec_id"), col("label"), col("i").cast("long").as("i"),
                  col("x").cast("double").as("x"))
          .localCheckpoint(eager = false) // centroids + distance pass
        val cent = dims.groupBy(col("label").as("cl"), col("i"))
          .agg(round(avg("x"), 7).as("c"))
        val d2 = dims.join(broadcast(cent), "i")
          .groupBy("vec_id", "label", "cl")
          .agg(round(sum(pow(col("x") - col("c"), 2)), 6).as("d2"))
        val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cl"))
        d2.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
               sum(when(col("cl") === col("label"), 1L).otherwise(0L))
                 .as("n_correct"))
          .select(col("label"), col("n"), col("n_correct"),
            round(col("n_correct") / col("n").cast("double"), 4).as("accuracy"))
          .orderBy("label")
      },
      Some("""WITH dims AS MATERIALIZED (
             |  SELECT vec_id, label,
             |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             |         CAST(unnest(embedding) AS DOUBLE) AS x
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |cent AS MATERIALIZED (
             |  SELECT label AS cl, i, round(avg(x), 7) AS c
             |  FROM dims GROUP BY 1, 2),
             |d2 AS (SELECT vec_id, label, cl,
             |              round(sum((x - c) * (x - c)), 6) AS d2
             |       FROM dims JOIN cent USING (i) GROUP BY 1, 2, 3),
             |pk AS (SELECT *, row_number() OVER (PARTITION BY vec_id
             |         ORDER BY d2, cl) AS rk
             |       FROM d2)
             |SELECT label, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN cl = label THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_correct,
             |       round(sum(CASE WHEN cl = label THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS accuracy
             |FROM pk WHERE rk = 1 GROUP BY label ORDER BY label""".stripMargin)),

    // binomial overdispersion check of daily conversion: Pearson
    // dispersion φ = Σ(x_d − n_d·p̂)²/(n_d·p̂(1−p̂)) / (D−1) over the
    // per-day (active users, converted users) rollup — φ ≈ 1 means
    // the binomial z-tests upstream are honest, φ >> 1 means
    // clustered conversions and understated error bars. One DISTINCT
    // per-(day,user) pass; everything after is |days| arithmetic.
    "stat_overdispersion" -> Q(
      (s, d) => {
        val du = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"), col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val daily = du.groupBy("day")
          .agg(count(lit(1)).cast("double").as("n"),
               sum("conv").cast("double").as("x"))
          .localCheckpoint(eager = false) // pooled rate + the sum
        val pool = daily.agg((sum("x") / sum("n")).as("p"),
          count(lit(1)).cast("double").as("dd"))
        daily.crossJoin(broadcast(pool))
          .filter(col("p") > 0 && col("p") < 1 && col("dd") > 1)
          .agg(max("dd").cast("long").as("n_days"),
               round(max("p"), 6).as("p_pool"),
               round(sum(pow(col("x") - col("n") * col("p"), 2)
                 / (col("n") * col("p") * (lit(1.0) - col("p"))))
                 / (max("dd") - 1), 4).as("phi"))
          .withColumn("overdispersed", (col("phi") > 1.5).cast("long"))
      },
      Some("""WITH du AS (
             |  SELECT ts // 86400000000000 AS day, user_id,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY 1, 2),
             |daily AS (SELECT day, CAST(count(*) AS DOUBLE) AS n,
             |                 CAST(sum(conv) AS DOUBLE) AS x
             |          FROM du GROUP BY day),
             |pool AS (SELECT sum(x) / sum(n) AS p,
             |                CAST(count(*) AS DOUBLE) AS dd
             |         FROM daily),
             |ag AS (SELECT CAST(max(dd) AS BIGINT) AS n_days,
             |              round(max(p), 6) AS p_pool,
             |              round(sum((x - n*p)*(x - n*p) / (n*p*(1.0 - p)))
             |                    / (max(dd) - 1), 4) AS phi
             |       FROM daily, pool
             |       WHERE p > 0 AND p < 1 AND dd > 1)
             |SELECT n_days, p_pool, phi,
             |       CAST(CASE WHEN phi > 1.5 THEN 1 ELSE 0 END AS BIGINT)
             |         AS overdispersed
             |FROM ag""".stripMargin)))

  val round10oQ: Seq[(String, Q)] = Seq(
    // Hampel filter per type: a day is an outlier when it sits more
    // than 3 scaled-MADs from the CENTERED rolling median (±3 days) —
    // the robust spike detector that, unlike the 3σ ev_outliers, a
    // single spike can't poison. Both the median and the MAD come
    // from ONE bounded 7-element window list per row (sort + HOF
    // arithmetic, identical element math on both engines); report is
    // the per-type flag-rate rollup.
    "ts_hampel" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-3, 3)
        val sc = daily
          .withColumn("arr", collect_list("y").over(w))
          .filter(size(col("arr")) === 7)
          .withColumn("med", element_at(sort_array(col("arr")), 4))
          .withColumn("mad", element_at(sort_array(
            expr("transform(arr, v -> abs(v - med))")), 4))
          .withColumn("flag",
            (abs(col("y") - col("med")) > lit(4.4478) * col("mad") &&
             abs(col("y") - col("med")) > 0).cast("long"))
        sc.groupBy("event_type")
          .agg(count(lit(1)).as("n_days_scored"),
               sum("flag").as("n_flagged"),
               round(sum("flag") / count(lit(1)).cast("double"), 4)
                 .as("flag_rate"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |win AS (SELECT event_type, day, y,
             |          list(y) OVER (PARTITION BY event_type ORDER BY day
             |            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS arr
             |        FROM daily),
             |sc AS (SELECT *,
             |         list_sort(arr)[4] AS med
             |       FROM win WHERE len(arr) = 7),
             |md AS (SELECT *,
             |         list_sort(list_transform(arr, v -> abs(v - med)))[4] AS mad
             |       FROM sc),
             |fl AS (SELECT event_type,
             |         CASE WHEN abs(y - med) > 4.4478 * mad AND abs(y - med) > 0
             |              THEN 1 ELSE 0 END AS flag
             |       FROM md)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_scored,
             |       CAST(sum(flag) AS BIGINT) AS n_flagged,
             |       round(sum(flag) / CAST(count(*) AS DOUBLE), 4) AS flag_rate
             |FROM fl GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // A/B covariate balance table: standardized mean differences of
    // per-user activity covariates between the hash arms — the
    // randomization-health check causal analysis starts with
    // (|SMD| < 0.1 = balanced). ONE per-user rollup, one wide
    // conditional aggregate, then 3 rows of arithmetic; variances
    // from raw sums so both engines run identical expressions.
    "ev_covariate_balance" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(count(lit(1)).cast("double").as("x1"),
               sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("x2"),
               countDistinct(expr("ts div 86400000000000")).cast("double")
                 .as("x3"))
        def sums(a: Int, c: String) = Seq(
          sum(when(col("arm") === a, 1.0).otherwise(0.0)),
          sum(when(col("arm") === a, col(c)).otherwise(0.0)),
          sum(when(col("arm") === a, col(c) * col(c)).otherwise(0.0)))
        val g = u.agg(
          sums(1, "x1")(0).as("n1"), sums(1, "x1")(1).as("s1_1"),
          sums(1, "x1")(2).as("q1_1"), sums(0, "x1")(1).as("s0_1"),
          sums(0, "x1")(2).as("q0_1"), sums(0, "x1")(0).as("n0"),
          sums(1, "x2")(1).as("s1_2"), sums(1, "x2")(2).as("q1_2"),
          sums(0, "x2")(1).as("s0_2"), sums(0, "x2")(2).as("q0_2"),
          sums(1, "x3")(1).as("s1_3"), sums(1, "x3")(2).as("q1_3"),
          sums(0, "x3")(1).as("s0_3"), sums(0, "x3")(2).as("q0_3"))
        val rows = g.select(explode(array(
          struct(lit("n_events").as("covariate"),
            col("n1"), col("n0"), col("s1_1").as("s1"), col("q1_1").as("q1"),
            col("s0_1").as("s0"), col("q0_1").as("q0")),
          struct(lit("n_purchases").as("covariate"),
            col("n1"), col("n0"), col("s1_2").as("s1"), col("q1_2").as("q1"),
            col("s0_2").as("s0"), col("q0_2").as("q0")),
          struct(lit("n_active_days").as("covariate"),
            col("n1"), col("n0"), col("s1_3").as("s1"), col("q1_3").as("q1"),
            col("s0_3").as("s0"), col("q0_3").as("q0")))).as("r"))
          .select(col("r.*"))
        rows.filter(col("n1") > 1 && col("n0") > 1)
          .withColumn("m1", col("s1") / col("n1"))
          .withColumn("m0", col("s0") / col("n0"))
          .withColumn("v1",
            (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1))
          .withColumn("v0",
            (col("q0") - col("s0") * col("s0") / col("n0")) / (col("n0") - 1))
          .withColumn("sp", sqrt((col("v1") + col("v0")) / 2))
          .select(col("covariate"),
            col("n1").cast("long").as("n_t"), col("n0").cast("long").as("n_c"),
            round(col("m1"), 4).as("mean_t"), round(col("m0"), 4).as("mean_c"),
            when(col("sp") > 0,
              round((col("m1") - col("m0")) / col("sp"), 4)).as("smd"),
            when(col("sp") > 0,
              (abs((col("m1") - col("m0")) / col("sp")) < 0.1).cast("long"))
              .as("balanced"))
          .orderBy("covariate")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(count(*) AS DOUBLE) AS x1,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS x2,
             |         CAST(count(DISTINCT ts // 86400000000000) AS DOUBLE) AS x3
             |  FROM events GROUP BY 1, 2),
             |g AS (SELECT
             |        sum(CASE WHEN arm = 1 THEN 1.0 ELSE 0.0 END) AS n1,
             |        sum(CASE WHEN arm = 0 THEN 1.0 ELSE 0.0 END) AS n0,
             |        sum(CASE WHEN arm = 1 THEN x1 ELSE 0 END) AS s1_1,
             |        sum(CASE WHEN arm = 1 THEN x1*x1 ELSE 0 END) AS q1_1,
             |        sum(CASE WHEN arm = 0 THEN x1 ELSE 0 END) AS s0_1,
             |        sum(CASE WHEN arm = 0 THEN x1*x1 ELSE 0 END) AS q0_1,
             |        sum(CASE WHEN arm = 1 THEN x2 ELSE 0 END) AS s1_2,
             |        sum(CASE WHEN arm = 1 THEN x2*x2 ELSE 0 END) AS q1_2,
             |        sum(CASE WHEN arm = 0 THEN x2 ELSE 0 END) AS s0_2,
             |        sum(CASE WHEN arm = 0 THEN x2*x2 ELSE 0 END) AS q0_2,
             |        sum(CASE WHEN arm = 1 THEN x3 ELSE 0 END) AS s1_3,
             |        sum(CASE WHEN arm = 1 THEN x3*x3 ELSE 0 END) AS q1_3,
             |        sum(CASE WHEN arm = 0 THEN x3 ELSE 0 END) AS s0_3,
             |        sum(CASE WHEN arm = 0 THEN x3*x3 ELSE 0 END) AS q0_3
             |      FROM u),
             |rows_ AS (
             |  SELECT 'n_events' AS covariate, n1, n0, s1_1 AS s1, q1_1 AS q1,
             |         s0_1 AS s0, q0_1 AS q0 FROM g
             |  UNION ALL
             |  SELECT 'n_purchases', n1, n0, s1_2, q1_2, s0_2, q0_2 FROM g
             |  UNION ALL
             |  SELECT 'n_active_days', n1, n0, s1_3, q1_3, s0_3, q0_3 FROM g),
             |c AS (SELECT *, s1/n1 AS m1, s0/n0 AS m0,
             |             (q1 - s1*s1/n1) / (n1 - 1) AS v1,
             |             (q0 - s0*s0/n0) / (n0 - 1) AS v0
             |      FROM rows_ WHERE n1 > 1 AND n0 > 1),
             |sm AS (SELECT *, sqrt((v1 + v0) / 2) AS sp FROM c)
             |SELECT covariate, CAST(n1 AS BIGINT) AS n_t, CAST(n0 AS BIGINT) AS n_c,
             |       round(m1, 4) AS mean_t, round(m0, 4) AS mean_c,
             |       CASE WHEN sp > 0 THEN round((m1 - m0) / sp, 4) END AS smd,
             |       CASE WHEN sp > 0 THEN CAST(CASE WHEN abs((m1 - m0) / sp) < 0.1
             |            THEN 1 ELSE 0 END AS BIGINT) END AS balanced
             |FROM sm ORDER BY covariate""".stripMargin)))

  val round10pQ: Seq[(String, Q)] = Seq(
    // Lincoln-Petersen / Chapman capture-recapture estimate of corpus
    // size from TWO independent 10% hash samples — the "how big is
    // the population really" estimator a crawler uses when it can
    // only sample (and the sanity check that two sampling frames
    // agree). Both marks and the overlap come from ONE map-side
    // conditional aggregate; the Chapman correction removes the
    // classic small-overlap bias. Reported next to the true count so
    // the estimator's error is auditable.
    "samp_capture_recapture" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d).select(
          (pmod(md5Long(concat(lit("cra:"), col("doc_id").cast("string"))),
            lit(10)) === 0).cast("long").as("a"),
          (pmod(md5Long(concat(lit("crb:"), col("doc_id").cast("string"))),
            lit(10)) === 0).cast("long").as("b"))
        t.agg(count(lit(1)).as("n_true"),
            sum("a").as("n1"), sum("b").as("n2"),
            sum(col("a") * col("b")).as("n12"))
          .select(col("n_true"), col("n1"), col("n2"), col("n12"),
            when(col("n12") > 0,
              round(col("n1") * col("n2") / col("n12").cast("double"), 2))
              .as("n_lincoln"),
            round((col("n1") + 1) * (col("n2") + 1)
              / (col("n12") + 1).cast("double") - 1, 2).as("n_chapman"),
            when(col("n12") > 0,
              round(abs((col("n1") + 1) * (col("n2") + 1)
                / (col("n12") + 1).cast("double") - 1 - col("n_true"))
                / col("n_true"), 4)).as("rel_err_chapman"))
      },
      Some("""WITH t AS (
             |  SELECT CASE WHEN ('0x' || substr(md5('cra:' || doc_id::VARCHAR), 1, 15))::BIGINT
             |                   % 10 = 0 THEN 1 ELSE 0 END AS a,
             |         CASE WHEN ('0x' || substr(md5('crb:' || doc_id::VARCHAR), 1, 15))::BIGINT
             |                   % 10 = 0 THEN 1 ELSE 0 END AS b
             |  FROM documents)
             |SELECT CAST(count(*) AS BIGINT) AS n_true,
             |       CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2,
             |       CAST(sum(a * b) AS BIGINT) AS n12,
             |       CASE WHEN sum(a * b) > 0
             |            THEN round(sum(a) * sum(b) / CAST(sum(a * b) AS DOUBLE), 2)
             |       END AS n_lincoln,
             |       round((sum(a) + 1) * (sum(b) + 1)
             |             / CAST(sum(a * b) + 1 AS DOUBLE) - 1, 2) AS n_chapman,
             |       CASE WHEN sum(a * b) > 0 THEN
             |         round(abs((sum(a) + 1) * (sum(b) + 1)
             |               / CAST(sum(a * b) + 1 AS DOUBLE) - 1 - count(*))
             |               / count(*), 4)
             |       END AS rel_err_chapman
             |FROM t""".stripMargin)),

    // session-duration distribution: ev_sessionize's gap>30min ids
    // rolled into wall-clock durations and bucketed into the product
    // bands (<1m / 1-5m / 5-30m / 30m+) — the engagement-depth table
    // next to ev_session_paths' what-they-did. One per-user window
    // pass + one grouped rollup; single-event sessions land in <1m.
    "ev_session_durations" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("sid", sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          // integer floor division: `/` on longs is DOUBLE in Spark
          // while the oracle's // floors
          .agg(expr("(max(ts) - min(ts)) div 1000000000").as("dur_sec"))
        val b = sess.withColumn("bucket",
            when(col("dur_sec") < 60, "a_under_1m")
              .when(col("dur_sec") < 300, "b_1m_to_5m")
              .when(col("dur_sec") < 1800, "c_5m_to_30m")
              .otherwise("d_over_30m"))
          .localCheckpoint(eager = false) // totals + the bucket rollup
        val tot = b.agg(count(lit(1)).cast("double").as("nn"))
        b.groupBy("bucket").agg(count(lit(1)).as("n_sessions"),
            round(avg(col("dur_sec").cast("double")), 2).as("avg_dur_sec"))
          .crossJoin(broadcast(tot))
          .select(col("bucket"), col("n_sessions"),
            col("avg_dur_sec"),
            round(col("n_sessions") / col("nn"), 4).as("share"))
          .orderBy("bucket")
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sid AS (SELECT user_id, ts,
             |          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |        FROM g),
             |sess AS (SELECT user_id, sid,
             |           (max(ts) - min(ts)) // 1000000000 AS dur_sec
             |         FROM sid GROUP BY user_id, sid),
             |bk AS (SELECT *,
             |         CASE WHEN dur_sec < 60 THEN 'a_under_1m'
             |              WHEN dur_sec < 300 THEN 'b_1m_to_5m'
             |              WHEN dur_sec < 1800 THEN 'c_5m_to_30m'
             |              ELSE 'd_over_30m' END AS bucket
             |       FROM sess),
             |t AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM bk)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_sessions,
             |       round(avg(CAST(dur_sec AS DOUBLE)), 2) AS avg_dur_sec,
             |       round(count(*) / nn, 4) AS share
             |FROM bk, t GROUP BY bucket, nn ORDER BY bucket""".stripMargin)),

    // Matryoshka recall-vs-dimension curve: top-10 recall of
    // prefix-truncated cosine search at dims {8,16,32,64} against the
    // full-dim truth for 3 probes — WHERE to cut the nested
    // representation (vec_matryoshka fixes 16; this is the table that
    // justifies it). One slice + one broadcast-score pass per dim;
    // everything rank-bounded, no quadratic work.
    "vec_matryoshka_curve" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull)
        val qids = Seq(7L, 42L, 99L)
        val truthW = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
        val full = emb.crossJoin(broadcast(emb.filter(col("vec_id").isin(qids: _*))
            .select(col("vec_id").as("qid"), col("embedding").as("qv"))))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            (round(score(col("embedding"), col("qv")), 6) + lit(0.0)).as("sc"))
          .withColumn("rk", row_number().over(truthW)).filter(col("rk") <= 10)
          .select(col("qid"), col("vec_id"))
          .localCheckpoint(eager = false) // joined by all 4 dims
        val parts = Seq(8, 16, 32, 64).map { dim =>
          val e = emb.select(col("vec_id"), slice(col("embedding"), 1, dim).as("ed"))
          val got = e.crossJoin(broadcast(e.filter(col("vec_id").isin(qids: _*))
              .select(col("vec_id").as("qid"), col("ed").as("qv"))))
            .filter(col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id"),
              (round(score(col("ed"), col("qv")), 6) + lit(0.0)).as("sc"))
            .withColumn("rk", row_number().over(truthW)).filter(col("rk") <= 10)
            .select(col("qid"), col("vec_id"))
          got.join(full, Seq("qid", "vec_id"), "left_semi")
            .groupBy("qid").agg(count(lit(1)).as("n_hits"))
            .select(col("qid"), lit(dim.toLong).as("dim"),
              round(col("n_hits") / 10.0, 4).as("recall_at_10"))
        }
        parts.reduce(_ union _).orderBy("qid", "dim")
      },
      Some {
        def top(name: String, d: Int) = {
          val es = if (d == 64) "e.emb" else s"(e.emb)[1:$d]"
          val qs = if (d == 64) "q.emb" else s"(q.emb)[1:$d]"
          s"""$name AS MATERIALIZED (SELECT qid, vec_id FROM (
             |  SELECT q.vec_id AS qid, e.vec_id,
             |         row_number() OVER (PARTITION BY q.vec_id
             |           ORDER BY round(list_cosine_similarity($es, $qs), 6) + 0.0 DESC,
             |                    e.vec_id) AS rk
             |  FROM emb e, emb q
             |  WHERE q.vec_id IN (7, 42, 99) AND e.vec_id <> q.vec_id)
             |  WHERE rk <= 10)""".stripMargin
        }
        val dimCtes = Seq(8, 16, 32, 64).map(d => top(s"t$d", d)).mkString(",\n")
        val unions = Seq(8, 16, 32, 64).map { d =>
          s"""SELECT t.qid, CAST($d AS BIGINT) AS dim,
             |       round(count(*) / 10.0, 4) AS recall_at_10
             |FROM t$d t JOIN truth USING (qid, vec_id) GROUP BY t.qid""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH emb AS MATERIALIZED (
           |  SELECT vec_id, embedding::DOUBLE[] AS emb
           |  FROM embeddings WHERE embedding IS NOT NULL),
           |${top("truth", 64)},
           |$dimCtes
           |$unions
           |ORDER BY qid, dim""".stripMargin
      }))
}
