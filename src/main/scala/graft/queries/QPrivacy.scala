package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.store.VectorStore
import graft.store.VectorStore.pointsSql
import graft.QDsl._

/** Privacy: differential-privacy mechanisms and k-anon audits — SparkEntry query family (regrouped from the round-named
  * inventory files in round 15; same query names, same bodies —
  * SparkEntry assembles the full map and the driver contract). */
private[graft] object QPrivacy {

  val privQ: Seq[(String, Q)] = Seq(
      // ε=1 DP mean of the (already-[0,1]-clipped) quality score per
      // source: the private-release twin of a per-slice quality
      // report. Budget split over the two released statistics (sum
      // and count, sensitivity 1 each ⇒ Laplace scale 2); noise is
      // the same deterministic inverse-CDF draw as priv_dp_counts so
      // the release is reproducible and oracle-exact. The sum rounds
      // to 6dp BEFORE noising so partial-sum grouping can't leak
      // into the release. Count guard: max(1, noisy_n)
      "priv_dp_mean" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          def lap(tag: String) = {
            // u rounds to 6dp BEFORE the inverse-CDF on both engines —
            // the draw must be bit-identical, not just close
            val u = round((md5Long(concat(lit(tag), col("source")))
              % 1000000L + 1L) / lit(1000000.0) - 0.5, 6)
            round(-signum(u) * lit(2.0) *
              log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(u))), 6)
          }
          qualityWithLabels(s, d).groupBy("source")
            .agg(count(lit(1)).as("n_true"),
                 round(sum("quality"), 6).as("sum_true"))
            .select(col("source"), col("n_true"),
              round(col("sum_true") + lap("dpm:"), 6).as("sum_noisy"),
              round(col("n_true") + lap("dpc:"), 6).as("n_noisy"))
            .select(col("source"), col("n_true"), col("sum_noisy"), col("n_noisy"),
              round(col("sum_noisy") / greatest(lit(1.0), col("n_noisy")), 4)
                .as("dp_mean"))
            .orderBy("source")
        },
        Some(s"""WITH $qualityCteSql,
               |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_true,
               |             round(sum(quality), 6) AS sum_true,
               |             round((('0x' || substr(md5('dpm:' || source), 1, 15))::BIGINT
               |               % 1000000 + 1) / 1000000.0 - 0.5, 6) + 0.0 AS us,
               |             round((('0x' || substr(md5('dpc:' || source), 1, 15))::BIGINT
               |               % 1000000 + 1) / 1000000.0 - 0.5, 6) + 0.0 AS uc
               |      FROM q GROUP BY source),
               |n AS (SELECT source, n_true,
               |             round(sum_true + round(-sign(us) * 2.0
               |               * ln(greatest(1e-12, 1.0 - 2.0 * abs(us))), 6), 6) AS sum_noisy,
               |             round(n_true + round(-sign(uc) * 2.0
               |               * ln(greatest(1e-12, 1.0 - 2.0 * abs(uc))), 6), 6) AS n_noisy
               |      FROM g)
               |SELECT source, n_true, sum_noisy, n_noisy,
               |       round(sum_noisy / greatest(1.0, n_noisy), 4) AS dp_mean
               |FROM n ORDER BY source""".stripMargin)),

    // t-closeness audit (Li et al. 2007): per QI group (lang, source),
    // the ordered-EMD distance between the group's sensitive-value
    // distribution (length bins) and the global one —
    // t = Σ|cum(p−q)|/(m−1). Complements k-anonymity/l-diversity:
    // a group can be k-anonymous yet leak via a skewed value dist.
    // Grid = groups × bins (bounded), zero-filled; cumsum windows run
    // partitioned per group; both dists rounded to 6 pre-cumsum.
    "priv_t_closeness" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("lang"), col("source"), expr("n_chars DIV 200").as("bin"))
          .localCheckpoint(eager = false) // global dist + group dist
        val glob = docs.groupBy("bin").agg(count(lit(1)).as("gc"))
        val globN = docs.agg(count(lit(1)).as("gn"))
        val q = glob.crossJoin(broadcast(globN))
          .select(col("bin"), round(col("gc") / col("gn"), 6).as("qp"))
        val grp = docs.groupBy("lang", "source").agg(count(lit(1)).as("n_rows"))
        val cells = docs.groupBy("lang", "source", "bin").agg(count(lit(1)).as("c"))
        val grid = grp.crossJoin(broadcast(q))
          .join(cells, Seq("lang", "source", "bin"), "left")
          .select(col("lang"), col("source"), col("bin"), col("n_rows"), col("qp"),
                  round(coalesce(col("c"), lit(0L)) / col("n_rows"), 6).as("pp"))
        val wc = Window.partitionBy("lang", "source").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mBins = glob.agg(count(lit(1)).as("m"))
        grid.withColumn("cum", sum(col("pp") - col("qp")).over(wc))
          .groupBy("lang", "source")
          .agg(max("n_rows").as("n_rows"), sum(abs(col("cum"))).as("s"))
          .crossJoin(broadcast(mBins))
          .select(col("lang"), col("source"), col("n_rows"),
                  when(col("m") > 1, round(col("s") / (col("m") - 1), 4))
                    .otherwise(lit(null).cast("double")).as("t_dist"))
          .withColumn("violates_t02",
            when(col("t_dist").isNotNull, col("t_dist") > 0.2))
          .orderBy("lang", "source")
      },
      Some("""WITH docs AS (SELECT lang, source, n_chars // 200 AS bin FROM documents),
             |gl AS (SELECT bin, CAST(count(*) AS BIGINT) AS gc FROM docs GROUP BY 1),
             |gn AS (SELECT CAST(count(*) AS BIGINT) AS gn FROM docs),
             |q AS (SELECT bin, round(gc * 1.0 / gn, 6) AS qp FROM gl, gn),
             |grp AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows
             |        FROM docs GROUP BY 1, 2),
             |cells AS (SELECT lang, source, bin, CAST(count(*) AS BIGINT) AS c
             |          FROM docs GROUP BY 1, 2, 3),
             |grid AS (SELECT g.lang, g.source, q.bin, g.n_rows, q.qp,
             |                round(coalesce(c.c, 0) * 1.0 / g.n_rows, 6) AS pp
             |         FROM grp g CROSS JOIN q
             |         LEFT JOIN cells c ON c.lang = g.lang AND c.source = g.source
             |                           AND c.bin = q.bin),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM gl),
             |cm AS (SELECT lang, source, n_rows,
             |              sum(pp - qp) OVER (PARTITION BY lang, source ORDER BY bin
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |       FROM grid)
             |SELECT lang, source, n_rows,
             |       CASE WHEN m > 1 THEN round(sum(abs(cum)) / (m - 1), 4) END AS t_dist,
             |       CASE WHEN m > 1 THEN round(sum(abs(cum)) / (m - 1), 4) > 0.2
             |       END AS violates_t02
             |FROM cm, m
             |GROUP BY lang, source, n_rows, m ORDER BY lang, source""".stripMargin)),

    // ε-local-DP frequency estimation via randomized response (Warner
    // 1965): each user's true "ever purchased" bit is reported
    // truthfully with p = 0.75 (ε = ln 3) and flipped otherwise —
    // deterministic inverse-CDF draw from the md5 hash (the
    // priv_dp_mean idiom), debiased as π̂ = (λ̂ − (1−p))/(2p−1).
    // The local-DP counterpart of the central-DP priv_dp_* releases;
    // ONE per-user rollup, then 1-row arithmetic.
    "priv_rand_response" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val r = Tables.events(s, d)
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("t"))
          .withColumn("u",
            (md5Long(concat(lit("rr:"), col("user_id").cast("string"))) % 1000000)
              .cast("double") / 1000000.0)
          .withColumn("r", when(col("u") < 0.75, col("t")).otherwise(lit(1L) - col("t")))
        r.agg(count(lit(1)).as("n_users"), sum("t").as("n_true_yes"),
              sum("r").as("n_reported_yes"))
          .select(col("n_users"), col("n_true_yes"), col("n_reported_yes"),
            when(col("n_users") > 0,
              round(col("n_true_yes").cast("double") / col("n_users"), 6))
              .otherwise(lit(null).cast("double")).as("pi_true"),
            when(col("n_users") > 0,
              round((col("n_reported_yes").cast("double") / col("n_users")
                - 0.25) / 0.5, 6))
              .otherwise(lit(null).cast("double")).as("pi_hat"))
          .withColumn("abs_err", round(abs(col("pi_hat") - col("pi_true")), 6))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t
             |  FROM events GROUP BY 1),
             |r AS (SELECT t,
             |        CASE WHEN (('0x' || substr(md5('rr:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             |                   % 1000000) / 1000000.0 < 0.75
             |             THEN t ELSE 1 - t END AS r
             |      FROM u),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |              CAST(sum(t) AS BIGINT) AS n_true_yes,
             |              CAST(sum(r) AS BIGINT) AS n_reported_yes
             |       FROM r),
             |pi AS (SELECT *,
             |         CASE WHEN n_users > 0
             |              THEN round(CAST(n_true_yes AS DOUBLE) / n_users, 6) END AS pi_true,
             |         CASE WHEN n_users > 0
             |              THEN round((CAST(n_reported_yes AS DOUBLE) / n_users - 0.25) / 0.5, 6)
             |         END AS pi_hat
             |       FROM ag)
             |SELECT n_users, n_true_yes, n_reported_yes, pi_true, pi_hat,
             |       round(abs(pi_hat - pi_true), 6) AS abs_err
             |FROM pi""".stripMargin)),

    // ε=1 differentially-private MEDIAN of per-doc token counts via
    // the exponential mechanism over the DISTINCT-value grid (the
    // stat_gini bound: values, never rows): utility −|midpos − n/2|,
    // weights cnt·exp(ε·u/2) max-shifted before exp, selection by ONE
    // deterministic inverse-CDF draw (md5 of a fixed seed) so both
    // engines pick the same value. The release-vs-truth gap is the
    // privacy cost a data card would publish next to priv_dp_counts.
    "priv_dp_quantile" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.documents(s, d)
          .select(size(graft.text.TextPrimitives.tokens(col("text")))
            .cast("long").as("v"))
          .groupBy("v").agg(count(lit(1)).cast("double").as("cnt"))
          .localCheckpoint(eager = false) // below-window + totals
        val wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        val tot = g.agg(sum("cnt").as("n"))
        val base = g.withColumn("below", coalesce(sum("cnt").over(wv), lit(0.0)))
          .crossJoin(broadcast(tot))
          .withColumn("u",
            -abs(col("below") + col("cnt") / 2 - col("n") / 2))
          .localCheckpoint(eager = false) // umax + weight pass
        val um = base.agg(max("u").as("um"))
        val wts = base.crossJoin(broadcast(um))
          .withColumn("w", round(col("cnt") * exp((col("u") - col("um")) / 2), 10))
        val cum = wts
          .withColumn("cw", sum("w").over(
            Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
        val wtot = wts.agg(sum("w").as("wt"))
        val u0 = (md5Long(lit("dpq:seed")) % 1000000).cast("double") / 1000000.0
        val dp = cum.crossJoin(broadcast(wtot))
          .filter(col("cw") >= u0 * col("wt"))
          .agg(min("v").as("dp_median"))
        val tm = base.filter(col("below") + col("cnt") >= col("n") / 2)
          .agg(min("v").as("true_median"))
        dp.crossJoin(tm).crossJoin(broadcast(tot))
          .select(col("n").cast("long").as("n_docs"),
            lit(1.0).as("eps"), col("true_median"), col("dp_median"),
            abs(col("dp_median") - col("true_median")).as("abs_err"))
      },
      Some("""WITH g AS (
             |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS v,
             |         CAST(count(*) AS DOUBLE) AS cnt
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT sum(cnt) AS n FROM g),
             |base AS MATERIALIZED (
             |  SELECT v, cnt,
             |         coalesce(sum(cnt) OVER (ORDER BY v
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             |         n
             |  FROM g, tot),
             |ub AS (SELECT *, -abs(below + cnt/2 - n/2) AS u FROM base),
             |um AS (SELECT max(u) AS um FROM ub),
             |wts AS MATERIALIZED (
             |  SELECT v, cnt, below, n,
             |         round(cnt * exp((u - um) / 2), 10) AS w
             |  FROM ub, um),
             |cum AS (SELECT *, sum(w) OVER (ORDER BY v
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
             |        FROM wts),
             |wtot AS (SELECT sum(w) AS wt FROM wts),
             |dp AS (SELECT min(v) AS dp_median FROM cum, wtot
             |       WHERE cw >= (('0x' || substr(md5('dpq:seed'), 1, 15))::BIGINT
             |                    % 1000000) / 1000000.0 * wt),
             |tm AS (SELECT min(v) AS true_median FROM ub WHERE below + cnt >= n/2)
             |SELECT CAST(n AS BIGINT) AS n_docs, CAST(1.0 AS DOUBLE) AS eps,
             |       true_median, dp_median,
             |       abs(dp_median - true_median) AS abs_err
             |FROM dp, tm, tot""".stripMargin)),

    // ε=1 report-noisy-max release of the most common event type:
    // per-type Laplace(2/ε) noise by deterministic inverse-CDF draws
    // (md5 of the type name), the released argmax next to the true
    // one — the selection-mechanism sibling of priv_dp_counts (which
    // noises the WHOLE histogram; noisy-max pays less privacy budget
    // to release just the winner). |types| rows of arithmetic after
    // one grouped pass.
    "priv_noisy_max" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.events(s, d).filter(col("event_type").isNotNull)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .withColumn("u",
            (pmod(md5Long(concat(lit("nm:"), col("event_type"))), lit(1000000))
              .cast("double") + 0.5) / 1000000.0 - 0.5)
          .withColumn("noise",
            round(lit(-2.0) * signum(col("u"))
              * log(lit(1.0) - lit(2.0) * abs(col("u"))), 6))
          .withColumn("noisy_n", round(col("n") + col("noise"), 6))
        val w = Window.orderBy(col("noisy_n").desc, col("event_type"))
        val wt = Window.orderBy(col("n").desc, col("event_type"))
        g.withColumn("released_rank", row_number().over(w))
          .withColumn("true_rank", row_number().over(wt))
          .select(col("event_type"), col("n"), col("noisy_n"),
            (col("released_rank") === 1).cast("long").as("is_released_max"),
            (col("true_rank") === 1).cast("long").as("is_true_max"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
             |u AS (SELECT *,
             |        ((('0x' || substr(md5('nm:' || event_type), 1, 15))::BIGINT
             |          % 1000000) + 0.5) / 1000000.0 - 0.5 AS u
             |      FROM g),
             |nz AS (SELECT *,
             |         round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)), 6) AS noise
             |       FROM u),
             |nn AS (SELECT *, round(n + noise, 6) AS noisy_n FROM nz),
             |rk AS (SELECT *,
             |         row_number() OVER (ORDER BY noisy_n DESC, event_type) AS rr,
             |         row_number() OVER (ORDER BY n DESC, event_type) AS tr
             |       FROM nn)
             |SELECT event_type, n, noisy_n,
             |       CAST(CASE WHEN rr = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_released_max,
             |       CAST(CASE WHEN tr = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_true_max
             |FROM rk ORDER BY event_type""".stripMargin)),

    // NOMINAL-attribute t-closeness on the l-diversity QI frame
    // (source × length-bin; sensitive = lang): variational distance
    // ½·Σ|p_g − p_global| over the DENSE group × lang grid — the
    // unordered-category companion to priv_t_closeness (whose
    // ordered-EMD treats the NUMERIC length attribute). violates at
    // t > 0.3.
    "priv_t_nominal" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), expr("n_chars DIV 500").as("len_bin"),
            col("lang")) // 3-col projection: recompute beats materializing
        val glob = docs.groupBy("lang").agg(count(lit(1)).as("cg"))
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("tg"))))
        val grp = docs.groupBy("source", "len_bin", "lang")
          .agg(count(lit(1)).as("cs"))
        val gtot = grp.groupBy("source", "len_bin").agg(sum("cs").as("ts"))
        gtot.crossJoin(broadcast(glob))
          .join(grp, Seq("source", "len_bin", "lang"), "left")
          .na.fill(0L, Seq("cs"))
          .groupBy("source", "len_bin")
          .agg(max("ts").as("n"),
            round(sum(abs(col("cs") / col("ts").cast("double")
              - col("cg") / col("tg").cast("double"))) / 2, 4).as("t_dist"))
          .select(col("source"), col("len_bin"), col("n").as("n_rows"),
            col("t_dist"), (col("t_dist") > 0.3).as("violates_t03"))
          .orderBy("source", "len_bin")
      },
      Some("""WITH q AS (SELECT source, n_chars // 500 AS len_bin, lang
             |           FROM documents),
             |gl AS (SELECT lang, CAST(count(*) AS BIGINT) AS cg FROM q GROUP BY lang),
             |tg AS (SELECT CAST(count(*) AS BIGINT) AS tg FROM q),
             |grp AS (SELECT source, len_bin, lang, CAST(count(*) AS BIGINT) AS cs
             |        FROM q GROUP BY 1, 2, 3),
             |gtot AS (SELECT source, len_bin, CAST(sum(cs) AS BIGINT) AS ts
             |         FROM grp GROUP BY 1, 2),
             |dense AS (SELECT gtot.source, gtot.len_bin, gtot.ts,
             |                 gl.lang, gl.cg, tg.tg
             |          FROM gtot, gl, tg),
             |j AS (SELECT dense.*, coalesce(cs, 0) AS cs
             |      FROM dense LEFT JOIN grp USING (source, len_bin, lang))
             |SELECT source, len_bin, CAST(max(ts) AS BIGINT) AS n_rows,
             |       round(sum(abs(cs / CAST(ts AS DOUBLE)
             |             - cg / CAST(tg AS DOUBLE))) / 2, 4) AS t_dist,
             |       round(sum(abs(cs / CAST(ts AS DOUBLE)
             |             - cg / CAST(tg AS DOUBLE))) / 2, 4) > 0.3 AS violates_t03
             |FROM j GROUP BY source, len_bin
             |ORDER BY source, len_bin""".stripMargin)),

    // Exponential mechanism releasing the "largest source" under
    // ε=0.1 differential privacy — the selection-query companion to
    // priv_noisy_max's Laplace ranking: per-candidate Gumbel
    // perturbation of ε·u/2 (the Gumbel-max trick IS the exponential
    // mechanism), with md5-seeded uniforms (the priv_noisy_max
    // convention) so the draw is reproducible; exact selection
    // probabilities reported beside the draw via the max-shifted
    // softmax.
    "priv_exp_mech" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("n"))
          .withColumn("u",
            (pmod(md5Long(concat(lit("em:"), col("source"))), lit(1000000))
              .cast("double") + 0.5) / 1000000.0)
          .withColumn("gum", round(-log(-log(col("u"))), 6))
          .withColumn("score", round(lit(0.05) * col("n") + col("gum"), 6))
        val mx = g.agg(max("n").as("mx"))
        val sm = g.crossJoin(broadcast(mx))
          .withColumn("e", exp(lit(0.05) * (col("n") - col("mx"))))
        val z = sm.agg(sum("e").as("z"))
        val w = Window.orderBy(col("score").desc, col("source"))
        sm.crossJoin(broadcast(z))
          .withColumn("rk", row_number().over(w))
          .select(col("source"), col("n"),
            round(col("e") / col("z"), 6).as("select_prob"),
            col("gum").as("gumbel"),
            (col("rk") === 1).cast("long").as("is_released"))
          .orderBy("source")
      },
      Some("""WITH g AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1),
             |u AS (SELECT *,
             |        ((('0x' || substr(md5('em:' || source), 1, 15))::BIGINT
             |          % 1000000) + 0.5) / 1000000.0 AS u
             |      FROM g),
             |gu AS (SELECT *, round(-ln(-ln(u)), 6) AS gum FROM u),
             |sc AS (SELECT *, round(0.05 * n + gum, 6) AS score FROM gu),
             |mx AS (SELECT max(n) AS mx FROM sc),
             |sm AS (SELECT sc.*, exp(0.05 * (n - mx)) AS e FROM sc, mx),
             |z AS (SELECT sum(e) AS z FROM sm),
             |rk AS (SELECT *, row_number() OVER
             |         (ORDER BY score DESC, source) AS rk
             |       FROM sm)
             |SELECT source, n, round(e / (SELECT z FROM z), 6) AS select_prob,
             |       gum AS gumbel,
             |       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT)
             |         AS is_released
             |FROM rk ORDER BY source""".stripMargin)),

    // ε-DP histogram release of event-type counts (ε = 0.5,
    // sensitivity 1 ⇒ Laplace b = 2): md5-seeded uniform → inverse-CDF
    // Laplace noise (the priv_noisy_max mechanism releasing EVERY
    // cell, not just the argmax), post-processed to the nonnegative
    // integers users expect from a count table. Deterministic noise
    // makes the release reproducible AND oracle-checkable; abs_err
    // documents the utility cost per cell.
    "priv_dp_histogram" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        Tables.events(s, d).filter(col("event_type").isNotNull)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .withColumn("u",
            (pmod(md5Long(concat(lit("dh:"), col("event_type"))), lit(1000000))
              .cast("double") + 0.5) / 1000000.0 - 0.5)
          .withColumn("noise",
            round(lit(-2.0) * signum(col("u"))
              * log(lit(1.0) - lit(2.0) * abs(col("u"))), 6))
          .select(col("event_type"), col("n"),
            greatest(lit(0L), round(col("n") + col("noise"), 0).cast("long"))
              .as("released_n"))
          .withColumn("abs_err", abs(col("released_n") - col("n")))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
             |u AS (SELECT *,
             |        ((('0x' || substr(md5('dh:' || event_type), 1, 15))::BIGINT
             |          % 1000000) + 0.5) / 1000000.0 - 0.5 AS u
             |      FROM g),
             |nz AS (SELECT *,
             |         round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)), 6) AS noise
             |       FROM u),
             |r AS (SELECT event_type, n,
             |        greatest(0, CAST(round(n + noise) AS BIGINT)) AS released_n
             |      FROM nz)
             |SELECT event_type, n, released_n,
             |       CAST(abs(released_n - n) AS BIGINT) AS abs_err
             |FROM r ORDER BY event_type""".stripMargin))
  )
}
