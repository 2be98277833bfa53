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
private[graft] object QRound11d {


  val round11oQ: Seq[(String, Q)] = Seq(
    // Exact two-sided binomial test of the md5 arm split against the
    // designed 1/2 — the small-n-honest companion to ev_srm's χ²
    // gate (χ² is asymptotic; a 40-user segment needs the exact
    // tail). Support 0..n as a DISTRIBUTED spark.range (the
    // stat_fisher_exact altitude: a one-row sequence() would put n
    // elements on one task at production user counts); every term
    // closed-form through the shared Stirling lgamma so both engines
    // sum the identical tree. Two-sided by "all outcomes no more
    // likely than observed" with the 1e-7 log-slack absorbing ulp.
    "stat_binom_test" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val cts = Tables.events(s, d)
          .select(col("user_id"),
            (md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
              .as("arm")).distinct()
          .agg(count(lit(1)).as("n"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("k"))
          .withColumn("lobs",
            lfCol(col("n").cast("double")) - lfCol(col("k").cast("double"))
              - lfCol((col("n") - col("k")).cast("double"))
              + col("n") * math.log(0.5))
          .localCheckpoint(eager = false) // bound read + term join
        val row = cts.select(col("n")).collect()(0)
        val nU = if (row.isNullAt(0)) -1L else row.getLong(0)
        s.range(0L, nU + 1L).toDF("i")
          .crossJoin(broadcast(cts))
          .withColumn("lpi",
            lfCol(col("n").cast("double")) - lfCol(col("i").cast("double"))
              - lfCol((col("n") - col("i")).cast("double"))
              + col("n") * math.log(0.5))
          .groupBy("n", "k")
          .agg(round(sum(when(col("lpi") <= col("lobs") + 1e-7,
            exp(col("lpi"))).otherwise(0.0)), 6).as("p_two_sided"))
          .select(col("n").as("n_users"), col("k").as("k_arm1"),
            round(col("k") / col("n").cast("double"), 4).as("p_hat"),
            col("p_two_sided"))
      },
      Some(s"""WITH u AS (
              |  SELECT DISTINCT user_id,
              |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm
              |  FROM events),
              |ct AS (SELECT CAST(count(*) AS BIGINT) AS n,
              |              CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k
              |       FROM u),
              |ob AS (SELECT *, ${sqlLf("n")} - ${sqlLf("k")} - ${sqlLf("n - k")}
              |                 + n * ln(0.5) AS lobs
              |       FROM ct),
              |tm AS (SELECT *, ${sqlLf("n")} - ${sqlLf("i")} - ${sqlLf("n - i")}
              |                 + n * ln(0.5) AS lpi
              |       FROM (SELECT *, CAST(unnest(generate_series(0, n)) AS BIGINT) AS i
              |             FROM ob))
              |SELECT n AS n_users, k AS k_arm1,
              |       round(k / CAST(n AS DOUBLE), 4) AS p_hat,
              |       round(sum(CASE WHEN lpi <= lobs + 1e-7
              |                      THEN exp(lpi) ELSE 0.0 END), 6) AS p_two_sided
              |FROM tm GROUP BY n, k""".stripMargin)),

    // Cochran's Q across the three funnel actions (view, click,
    // purchase) as within-subject binary treatments — "is the user a
    // HEAVY (≥13-event) doer of the action", since bare incidence
    // saturates (every active user does all three at least once):
    // do the three actions have the same heavy-usage rate, accounting
    // for the fact that the SAME users generate all three columns (a
    // χ² on pooled counts would ignore that pairing — McNemar
    // generalized to k=3). ONE per-user conditional rollup; Q and its
    // exact even-df survival exp(-Q/2) (df = k-1 = 2) from integer
    // sums only — no double accumulation anywhere before the final
    // division.
    "stat_cochran_q" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            (sum(when(col("event_type") === "view", 1L).otherwise(0L)) >= 13)
              .cast("long").as("t1"),
            (sum(when(col("event_type") === "click", 1L).otherwise(0L)) >= 13)
              .cast("long").as("t2"),
            (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 13)
              .cast("long").as("t3"))
          .withColumn("r", col("t1") + col("t2") + col("t3"))
        u.agg(count(lit(1)).as("n_users"),
            sum("t1").as("c1"), sum("t2").as("c2"), sum("t3").as("c3"),
            sum("r").as("t"), sum(col("r") * col("r")).as("r2"))
          .withColumn("num",
            lit(2L) * (lit(3L) * (col("c1") * col("c1") + col("c2") * col("c2")
              + col("c3") * col("c3")) - col("t") * col("t")))
          .withColumn("den", lit(3L) * col("t") - col("r2"))
          .select(col("n_users"), col("c1").as("n_view"),
            col("c2").as("n_click"), col("c3").as("n_purchase"),
            when(col("den") > 0,
              round(col("num") / col("den").cast("double"), 4)).as("q_stat"),
            when(col("den") > 0,
              round(exp(-col("num") / col("den").cast("double") / 2.0), 6))
              .as("p_value"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |           >= 13 AS BIGINT) AS t1,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |           >= 13 AS BIGINT) AS t2,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |           >= 13 AS BIGINT) AS t3
             |  FROM events GROUP BY 1),
             |r AS (SELECT *, t1 + t2 + t3 AS r FROM u),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |             CAST(sum(t1) AS BIGINT) AS c1,
             |             CAST(sum(t2) AS BIGINT) AS c2,
             |             CAST(sum(t3) AS BIGINT) AS c3,
             |             CAST(sum(r) AS BIGINT) AS t,
             |             CAST(sum(r * r) AS BIGINT) AS r2
             |      FROM r),
             |q AS (SELECT *,
             |        2 * (3 * (c1*c1 + c2*c2 + c3*c3) - t*t) AS num,
             |        3 * t - r2 AS den
             |      FROM a)
             |SELECT n_users, c1 AS n_view, c2 AS n_click, c3 AS n_purchase,
             |       CASE WHEN den > 0
             |            THEN round(num / CAST(den AS DOUBLE), 4) END AS q_stat,
             |       CASE WHEN den > 0
             |            THEN round(exp(-num / CAST(den AS DOUBLE) / 2.0), 6)
             |       END AS p_value
             |FROM q""".stripMargin)),

    // Lin's concordance correlation between two [0,1] length scores
    // that CLAIM the same scale (chars/1000 vs tokens*5/1000 — the
    // ~5-chars-per-token rule of thumb): Pearson r says they co-vary;
    // CCC additionally penalizes the location/scale bias between
    // them — the right statistic when two scorers claim to measure
    // the SAME trait. Exact integer micro-unit sums (the
    // stat_cronbach round-11 altitude): CCC = 2(n·Sxy − SxSy) /
    // ((n·Sxx − Sx²) + (n·Syy − Sy²) + (Sx − Sy)²) is computed
    // entirely on exact integers, so the result is bitwise stable
    // under any partition merge order.
    "stat_lin_ccc" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val it = Tables.documents(s, d).select(
          round(least(col("n_chars") / 1000.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("x"),
          round(least(size(graft.text.TextPrimitives.tokens(col("text")))
            * 5.0 / 1000.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("y"))
        it.agg(count(lit(1)).as("n_docs"),
            sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
            sum((col("x") * col("x")).cast(dec)).as("qx"),
            sum((col("y") * col("y")).cast(dec)).as("qy"),
            sum((col("x") * col("y")).cast(dec)).as("qxy"))
          .select(col("n_docs"),
            (col("n_docs") * col("qx") - col("sx") * col("sx"))
              .cast("double").as("ux"),
            (col("n_docs") * col("qy") - col("sy") * col("sy"))
              .cast("double").as("uy"),
            (lit(2) * (col("n_docs") * col("qxy") - col("sx") * col("sy")))
              .cast("double").as("uxy"),
            ((col("sx") - col("sy")) * (col("sx") - col("sy")))
              .cast("double").as("dd"))
          .select(col("n_docs"),
            when(col("ux") > 0 && col("uy") > 0,
              round(col("uxy") / (lit(2.0) * sqrt(col("ux") * col("uy"))), 4))
              .as("pearson_r"),
            when(col("ux") + col("uy") + col("dd") > 0,
              round(col("uxy") / (col("ux") + col("uy") + col("dd")), 4))
              .as("lin_ccc"))
      },
      Some("""WITH it AS (
             |  SELECT CAST(round(least(n_chars / 1000.0, 1.0) * 1e6) AS BIGINT) AS x,
             |         CAST(round(least(len(regexp_split_to_array(lower(trim(text)),
             |           '\s+')) * 5.0 / 1000.0, 1.0) * 1e6) AS BIGINT) AS y
             |  FROM documents),
             |a AS (SELECT count(*) AS n_docs,
             |             sum(x) AS sx, sum(y) AS sy,
             |             sum(x*x) AS qx, sum(y*y) AS qy, sum(x*y) AS qxy
             |      FROM it),
             |u AS (SELECT n_docs,
             |             CAST(n_docs*qx - sx*sx AS DOUBLE) AS ux,
             |             CAST(n_docs*qy - sy*sy AS DOUBLE) AS uy,
             |             CAST(2 * (n_docs*qxy - sx*sy) AS DOUBLE) AS uxy,
             |             CAST((sx - sy) * (sx - sy) AS DOUBLE) AS dd
             |      FROM a)
             |SELECT CAST(n_docs AS BIGINT) AS n_docs,
             |       CASE WHEN ux > 0 AND uy > 0
             |            THEN round(uxy / (2.0 * sqrt(ux * uy)), 4)
             |       END AS pearson_r,
             |       CASE WHEN ux + uy + dd > 0
             |            THEN round(uxy / (ux + uy + dd), 4)
             |       END AS lin_ccc
             |FROM u""".stripMargin)),

    // Closed-form 2-feature ridge regression per source — token count
    // on (chars, distinct tokens), λ = 0.1·n so the shrinkage is
    // row-count invariant (the same λ' per observation at any SF):
    // β = (X'X + λI)⁻¹X'y on the CENTERED within-group Gram via the
    // explicit 2×2 adjugate. Reported next to the OLS slopes so the
    // collinearity-driven shrinkage is visible (chars and vocabulary
    // size are strongly correlated — OLS inflates, ridge tames). ONE
    // grouped pass of exact-in-double integer sums (the stat_ols_fit
    // altitude). (Round 11: z was the punctuation count, constant 0
    // on this corpus — swapped for a feature that varies.)
    "stat_ridge_fit" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select(col("source"),
          col("n_chars").cast("double").as("x"),
          size(array_distinct(graft.text.TextPrimitives.tokens(col("text"))))
            .cast("double").as("z"),
          size(graft.text.TextPrimitives.tokens(col("text")))
            .cast("double").as("y"))
        val g = base.groupBy("source")
          .agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("z").as("sz"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("z") * col("z")).as("szz"),
            sum(col("x") * col("z")).as("sxz"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("z") * col("y")).as("szy"))
          .withColumn("dxx", col("sxx") - col("sx") * col("sx") / col("n"))
          .withColumn("dzz", col("szz") - col("sz") * col("sz") / col("n"))
          .withColumn("dxz", col("sxz") - col("sx") * col("sz") / col("n"))
          .withColumn("dxy", col("sxy") - col("sx") * col("sy") / col("n"))
          .withColumn("dzy", col("szy") - col("sz") * col("sy") / col("n"))
          .withColumn("lam", col("n") * 0.1)
        val det0 = col("dxx") * col("dzz") - col("dxz") * col("dxz")
        val detR = (col("dxx") + col("lam")) * (col("dzz") + col("lam")) -
          col("dxz") * col("dxz")
        g.select(col("source"), col("n").cast("long").as("n_docs"),
            when(det0 > 0, round(
              (col("dzz") * col("dxy") - col("dxz") * col("dzy")) / det0, 6))
              .as("ols_chars"),
            when(det0 > 0, round(
              (col("dxx") * col("dzy") - col("dxz") * col("dxy")) / det0, 6))
              .as("ols_vocab"),
            when(detR > 0, round(
              ((col("dzz") + col("lam")) * col("dxy")
                - col("dxz") * col("dzy")) / detR, 6)).as("ridge_chars"),
            when(detR > 0, round(
              ((col("dxx") + col("lam")) * col("dzy")
                - col("dxz") * col("dxy")) / detR, 6)).as("ridge_vocab"))
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT source, CAST(n_chars AS DOUBLE) AS x,
             |         CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)),
             |           '\s+'))) AS DOUBLE) AS z,
             |         CAST(len(regexp_split_to_array(lower(trim(text)),
             |           '\s+')) AS DOUBLE) AS y
             |  FROM documents),
             |g AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS sx, sum(z) AS sz, sum(y) AS sy,
             |             sum(x*x) AS sxx, sum(z*z) AS szz, sum(x*z) AS sxz,
             |             sum(x*y) AS sxy, sum(z*y) AS szy
             |      FROM b GROUP BY 1),
             |c AS (SELECT source, n,
             |             sxx - sx*sx/n AS dxx, szz - sz*sz/n AS dzz,
             |             sxz - sx*sz/n AS dxz, sxy - sx*sy/n AS dxy,
             |             szy - sz*sy/n AS dzy, n * 0.1 AS lam
             |      FROM g),
             |dt AS (SELECT *, dxx*dzz - dxz*dxz AS det0,
             |              (dxx + lam)*(dzz + lam) - dxz*dxz AS detr
             |       FROM c)
             |SELECT source, CAST(n AS BIGINT) AS n_docs,
             |       CASE WHEN det0 > 0
             |            THEN round((dzz*dxy - dxz*dzy) / det0, 6) END AS ols_chars,
             |       CASE WHEN det0 > 0
             |            THEN round((dxx*dzy - dxz*dxy) / det0, 6) END AS ols_vocab,
             |       CASE WHEN detr > 0
             |            THEN round(((dzz + lam)*dxy - dxz*dzy) / detr, 6)
             |       END AS ridge_chars,
             |       CASE WHEN detr > 0
             |            THEN round(((dxx + lam)*dzy - dxz*dxy) / detr, 6)
             |       END AS ridge_vocab
             |FROM dt ORDER BY source""".stripMargin)),

    // Method-of-moments Gamma fit of per-user same-type interarrival
    // times — the parametric traffic model behind ev_interarrival's
    // histogram and ev_bot_flags' CV heuristic: shape k < 1 means
    // bursty (heavier than exponential), k ≈ 1 memoryless, k > 1
    // regular. Gaps land as INTEGER seconds (nanos DIV 1e9), so the
    // per-type Σg and Σg² are exact integer sums (decimal/HUGEINT)
    // and k = S²/(nQ−S²), θ = (nQ−S²)/(nS) are single end divisions —
    // merge-order proof. One lag window per (user,type), one rollup.
    "stat_gamma_fit" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val gaps = Tables.events(s, d)
          .withColumn("prev", lag("ts", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("event_type"),
            expr("(ts - prev) div 1000000000").as("g"))
          .filter(col("g") > 0)
        gaps.groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            sum(col("g").cast(dec)).as("sg"),
            sum((col("g") * col("g")).cast(dec)).as("qg"))
          .select(col("event_type"), col("n_gaps"),
            (col("n_gaps") * col("qg") - col("sg") * col("sg"))
              .cast("double").as("u"),
            col("sg").cast("double").as("sgd"), col("n_gaps").as("n"))
          .select(col("event_type"), col("n_gaps"),
            round(col("sgd") / col("n"), 2).as("mean_gap_s"),
            when(col("u") > 0,
              round(col("sgd") * col("sgd") / col("u"), 4)).as("shape_k"),
            when(col("u") > 0 && col("sgd") > 0,
              round(col("u") / (col("n").cast("double") * col("sgd")), 2))
              .as("scale_theta_s"))
          .orderBy("event_type")
      },
      Some("""WITH gp AS (
             |  SELECT event_type,
             |         (ts - lag(ts, 1) OVER (PARTITION BY user_id, event_type
             |            ORDER BY ts, event_id)) // 1000000000 AS g
             |  FROM events),
             |gaps AS (SELECT event_type, g FROM gp WHERE g > 0),
             |a AS (SELECT event_type, count(*) AS n, sum(g) AS sg,
             |             sum(g * g) AS qg
             |      FROM gaps GROUP BY 1),
             |u AS (SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
             |             CAST(n*qg - sg*sg AS DOUBLE) AS u,
             |             CAST(sg AS DOUBLE) AS sgd, CAST(n AS DOUBLE) AS nd
             |      FROM a)
             |SELECT event_type, n_gaps,
             |       round(sgd / nd, 2) AS mean_gap_s,
             |       CASE WHEN u > 0 THEN round(sgd * sgd / u, 4) END AS shape_k,
             |       CASE WHEN u > 0 AND sgd > 0
             |            THEN round(u / (nd * sgd), 2) END AS scale_theta_s
             |FROM u ORDER BY event_type""".stripMargin)),

    // Continuous power-law tail exponent of per-user activity
    // (Clauset–Shalizi–Newman MLE at fixed xmin = 5):
    // α = 1 + n_tail / Σ ln(x/xmin) — the one-number heavy-tail
    // summary graph_degree_dist's histogram and ev_pareto's share
    // only gesture at (α ≤ 2 ⇒ infinite mean: plan for whales). The
    // per-user ln terms are pinned to integer micro-units before the
    // sum (exact decimal/HUGEINT accumulation — the stat_cronbach
    // altitude applied to a transcendental), so the MLE is bitwise
    // reproducible; plus the Hill-style SE α−1/√n.
    "stat_powerlaw_alpha" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val tail = Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("x"))
          .filter(col("x") >= 5)
          .select(round(log(col("x") / 5.0) * 1e6, 0).cast("long").as("lx"))
        tail.agg(count(lit(1)).as("n_tail"),
            sum(col("lx").cast(dec)).as("sl"))
          .select(col("n_tail"),
            col("sl").cast("double").as("sld"), col("n_tail").as("n"))
          .select(col("n_tail"), lit(5L).as("xmin"),
            when(col("sld") > 0,
              round(lit(1.0) + col("n") * 1e6 / col("sld"), 4)).as("alpha"),
            when(col("sld") > 0,
              round((col("n") * 1e6 / col("sld")) / sqrt(col("n")), 4))
              .as("alpha_se"))
      },
      Some("""WITH ua AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |tl AS (SELECT CAST(round(ln(x / 5.0) * 1e6) AS BIGINT) AS lx
             |       FROM ua WHERE x >= 5),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n_tail, sum(lx) AS sl
             |      FROM tl),
             |u AS (SELECT n_tail, CAST(sl AS DOUBLE) AS sld,
             |             CAST(n_tail AS DOUBLE) AS nd
             |      FROM a)
             |SELECT n_tail, CAST(5 AS BIGINT) AS xmin,
             |       CASE WHEN sld > 0
             |            THEN round(1.0 + nd * 1e6 / sld, 4) END AS alpha,
             |       CASE WHEN sld > 0
             |            THEN round((nd * 1e6 / sld) / sqrt(nd), 4)
             |       END AS alpha_se
             |FROM u""".stripMargin)),

    // Many-to-one comparisons vs the reference language: Welch z of
    // every lang's doc length against 'en' with Bonferroni-adjusted
    // two-sided p — the Dunnett-style "which locales differ from the
    // flagship corpus" report (Bonferroni in place of Dunnett's
    // tabulated critical values keeps both engines closed-form while
    // staying conservative). Group moments from ONE exact-integer
    // grouped pass; the control row is a broadcast 1-row join; p via
    // the shared A&S erf polynomial.
    "stat_vs_control" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val g = Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast(dec)).as("sx"),
            sum((col("n_chars") * col("n_chars")).cast(dec)).as("qx"))
          .select(col("lang"), col("n"),
            (col("sx").cast("double") / col("n")).as("m"),
            when(col("n") > 1,
              (col("n") * col("qx") - col("sx") * col("sx")).cast("double")
                / (col("n").cast("double") * (col("n") - 1))).as("v"))
          .localCheckpoint(eager = false) // control row + treatment rows
        val ctrl = g.filter(col("lang") === "en")
          .select(col("n").as("nc"), col("m").as("mc"), col("v").as("vc"))
        val k = g.agg(count(lit(1)).as("k"))
        val se2 = col("v") / col("n") + col("vc") / col("nc")
        val z = (col("m") - col("mc")) / sqrt(se2)
        val xx = abs(z) / math.sqrt(2.0)
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        val praw = t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
          + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
          + t1 * lit(1.061405429))))) * exp(-xx * xx)
        g.filter(col("lang") =!= "en")
          .crossJoin(broadcast(ctrl)).crossJoin(broadcast(k))
          .select(col("lang"), col("n").as("n_docs"),
            round(col("m") - col("mc"), 2).as("mean_diff"),
            when(se2 > 0, round(z, 4)).as("welch_z"),
            when(se2 > 0, round(least(lit(1.0), praw * (col("k") - 1)), 6))
              .as("p_bonf"))
          .orderBy("lang")
      },
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |         sum(n_chars) AS sx, sum(n_chars * n_chars) AS qx
             |  FROM documents GROUP BY 1),
             |m AS (SELECT lang, n, CAST(sx AS DOUBLE) / n AS m,
             |             CASE WHEN n > 1 THEN CAST(n*qx - sx*sx AS DOUBLE)
             |                  / (CAST(n AS DOUBLE) * (n - 1)) END AS v
             |      FROM g),
             |c AS (SELECT n AS nc, m AS mc, v AS vc FROM m WHERE lang = 'en'),
             |k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM m),
             |z AS (SELECT lang, n, m.m, m.v, nc, mc, vc, k.k,
             |             v / n + vc / nc AS se2,
             |             (m.m - mc) / sqrt(v / n + vc / nc) AS z
             |      FROM m, c, k WHERE lang <> 'en'),
             |p AS (SELECT *, abs(z) / sqrt(2.0) AS xx,
             |             1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)) AS t1
             |      FROM z)
             |SELECT lang, n AS n_docs, round(m - mc, 2) AS mean_diff,
             |       CASE WHEN se2 > 0 THEN round(z, 4) END AS welch_z,
             |       CASE WHEN se2 > 0 THEN round(least(1.0,
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx) * (k - 1)), 6)
             |       END AS p_bonf
             |FROM p ORDER BY lang""".stripMargin)))

  val round11pQ: Seq[(String, Q)] = Seq(
    // Haar wavelet energy of the daily event series by scale (levels
    // 1–3 = 2/4/8-day details): WHERE the variance lives — day-to-day
    // jitter vs weekly structure — the multi-resolution companion to
    // ts_periodogram's global harmonics. Detail energy per level is
    // Σ_blocks (S_left − S_right)²/2^j off EXACT integer block sums
    // (absent days contribute 0 naturally — no gap-fill pass needed),
    // so the decomposition is merge-order proof; ONE daily rollup
    // fanned ×3 by the level spine.
    "ts_haar_energy" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("v"))
        val d0 = daily.agg(min("day").as("d0"))
        val lv = daily.crossJoin(broadcast(d0))
          .withColumn("t", col("day") - col("d0"))
          .crossJoin(s.range(1, 4).toDF("j"))
          .withColumn("blk", expr("t div cast(pow(2, j) as bigint)"))
          .withColumn("side", expr("(t div cast(pow(2, j - 1) as bigint)) % 2"))
          .groupBy("j", "blk")
          .agg(sum(when(col("side") === 0, col("v")).otherwise(0L)).as("sl"),
            sum(when(col("side") === 1, col("v")).otherwise(0L)).as("sr"))
          .groupBy("j")
          .agg(count(lit(1)).as("n_blocks"),
            sum((col("sl") - col("sr")) * (col("sl") - col("sr"))).as("e2"))
          .withColumn("energy", col("e2") / pow(lit(2.0), col("j")))
        val tot = lv.agg(sum("energy").as("te"))
        lv.crossJoin(broadcast(tot))
          .select(col("j").as("level"), col("n_blocks"),
            round(col("energy"), 4).as("energy"),
            when(col("te") > 0, round(col("energy") / col("te"), 4))
              .as("energy_share"))
          .orderBy("level")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS v
             |  FROM events GROUP BY 1),
             |d0 AS (SELECT min(day) AS d0 FROM daily),
             |lv AS (SELECT j, (day - d0) // CAST(pow(2, j) AS BIGINT) AS blk,
             |              ((day - d0) // CAST(pow(2, j - 1) AS BIGINT)) % 2 AS side, v
             |       FROM daily, d0,
             |            (SELECT CAST(unnest(generate_series(1, 3)) AS BIGINT) AS j)),
             |bk AS (SELECT j, blk,
             |              sum(CASE WHEN side = 0 THEN v ELSE 0 END) AS sl,
             |              sum(CASE WHEN side = 1 THEN v ELSE 0 END) AS sr
             |       FROM lv GROUP BY 1, 2),
             |en AS (SELECT j, CAST(count(*) AS BIGINT) AS n_blocks,
             |              CAST(sum((sl - sr) * (sl - sr)) AS DOUBLE)
             |                / pow(2.0, j) AS energy
             |       FROM bk GROUP BY 1),
             |tt AS (SELECT sum(energy) AS te FROM en)
             |SELECT j AS level, n_blocks, round(energy, 4) AS energy,
             |       CASE WHEN te > 0 THEN round(energy / te, 4)
             |       END AS energy_share
             |FROM en, tt ORDER BY level""".stripMargin)),

    // Peaks-over-threshold GPD tail fit of the event value (method of
    // moments over the exceedances above the exact type-1 95th
    // percentile): ξ < 0 bounded tail, ξ ≈ 0 exponential, ξ > 0
    // power-law — THE extreme-value summary behind "what will the
    // worst day cost" capacity planning, beside stat_gumbel's
    // block-maxima view. Values are exact 2dp (cents as BIGINT), the
    // percentile is an inverse-CDF walk over the DISTINCT cents
    // histogram (the stat_mwu values-never-rows bound), and all GPD
    // moments come from exact integer Σy/Σy² — merge-order proof.
    "stat_gpd_tail" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val cents = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .select(round(col("value") * 100, 0).cast("long").as("c"))
          .localCheckpoint(eager = false) // histogram + exceedances
        val h = cents.groupBy("c").agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
        val tot = h.agg(sum("cnt").as("n"))
        val u = h.withColumn("cum", sum("cnt").over(w))
          .crossJoin(broadcast(tot))
          .filter(col("cum") >= expr("(95 * n + 99) div 100"))
          .agg(min("c").as("u"))
        val ex = cents.crossJoin(broadcast(u))
          .filter(col("c") > col("u"))
          .select((col("c") - col("u")).as("y"), col("u"))
        ex.groupBy("u")
          .agg(count(lit(1)).as("n_exceed"),
            sum(col("y").cast(dec)).as("sy"),
            sum((col("y") * col("y")).cast(dec)).as("qy"))
          .select(round(col("u") / 100.0, 2).as("threshold"),
            col("n_exceed"),
            col("sy").cast("double").as("syd"),
            (col("n_exceed") * col("qy") - col("sy") * col("sy"))
              .cast("double").as("v"), col("n_exceed").as("n"))
          .select(col("threshold"), col("n_exceed"),
            round(col("syd") / col("n") / 100.0, 4).as("mean_excess"),
            when(col("v") > 0, round(lit(0.5) * (lit(1.0)
              - col("syd") * col("syd") / col("v")), 4)).as("xi"),
            when(col("v") > 0, round(lit(0.5) * (col("syd") / col("n"))
              * (lit(1.0) + col("syd") * col("syd") / col("v")) / 100.0, 4))
              .as("sigma"))
      },
      Some("""WITH cents AS (
             |  SELECT CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             |h AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt
             |      FROM cents GROUP BY 1),
             |cum AS (SELECT c, sum(cnt) OVER (ORDER BY c
             |          ROWS UNBOUNDED PRECEDING) AS cum
             |        FROM h),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
             |u AS (SELECT min(c) AS u FROM cum, tot
             |      WHERE cum >= (95 * n + 99) // 100),
             |ex AS (SELECT c - u AS y, u FROM cents, u WHERE c > u),
             |a AS (SELECT u, count(*) AS n, sum(y) AS sy, sum(y * y) AS qy
             |      FROM ex GROUP BY 1),
             |m AS (SELECT round(u / 100.0, 2) AS threshold,
             |             CAST(n AS BIGINT) AS n_exceed,
             |             CAST(sy AS DOUBLE) AS syd,
             |             CAST(n*qy - sy*sy AS DOUBLE) AS v,
             |             CAST(n AS DOUBLE) AS nd
             |      FROM a)
             |SELECT threshold, n_exceed,
             |       round(syd / nd / 100.0, 4) AS mean_excess,
             |       CASE WHEN v > 0
             |            THEN round(0.5 * (1.0 - syd * syd / v), 4) END AS xi,
             |       CASE WHEN v > 0
             |            THEN round(0.5 * (syd / nd)
             |                 * (1.0 + syd * syd / v) / 100.0, 4)
             |       END AS sigma
             |FROM m""".stripMargin)),

    // Behavioral similarity between the 20 most active users: cosine
    // between per-user event-type count vectors (5 integer dims), the
    // top-10 most similar pairs — the "which users behave alike"
    // primitive behind lookalike audiences and bot-ring detection.
    // The top-20 cut is a TakeOrdered (orderBy+limit — never a global
    // window); the 20×20 pair join is constant-size; every dot/norm
    // is an exact integer before ONE final division.
    "ev_user_similarity" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v1"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("v2"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("v3"),
            sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("v4"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("v5"))
          .orderBy(col("n").desc, col("user_id")).limit(20)
          .localCheckpoint(eager = false) // both sides of the pair join
        def q(p: String) = (1 to 5).map(i => col(s"$p$i") * col(s"$p$i"))
          .reduce(_ + _)
        val a = u.select(col("user_id").as("ua") +:
          (1 to 5).map(i => col(s"v$i").as(s"a$i")): _*)
        val b = u.select(col("user_id").as("ub") +:
          (1 to 5).map(i => col(s"v$i").as(s"b$i")): _*)
        a.join(b, col("ua") < col("ub"))
          .withColumn("dot", (1 to 5).map(i => col(s"a$i") * col(s"b$i"))
            .reduce(_ + _))
          .withColumn("qa", q("a")).withColumn("qb", q("b"))
          .filter(col("qa") > 0 && col("qb") > 0)
          .select(col("ua"), col("ub"),
            round(col("dot") / sqrt(col("qa").cast("double") * col("qb")), 6)
              .as("cosine"))
          .orderBy(col("cosine").desc, col("ua"), col("ub")).limit(10)
      },
      Some("""WITH u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS v2,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS v3,
             |         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS v4,
             |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS v5
             |  FROM events GROUP BY 1
             |  ORDER BY n DESC, user_id LIMIT 20)
             |SELECT a.user_id AS ua, b.user_id AS ub,
             |       round((a.v1*b.v1 + a.v2*b.v2 + a.v3*b.v3 + a.v4*b.v4
             |              + a.v5*b.v5)
             |             / sqrt(CAST(a.v1*a.v1 + a.v2*a.v2 + a.v3*a.v3
             |                    + a.v4*a.v4 + a.v5*a.v5 AS DOUBLE)
             |                  * (b.v1*b.v1 + b.v2*b.v2 + b.v3*b.v3
             |                    + b.v4*b.v4 + b.v5*b.v5)), 6) AS cosine
             |FROM u a JOIN u b ON a.user_id < b.user_id
             |WHERE (a.v1*a.v1 + a.v2*a.v2 + a.v3*a.v3 + a.v4*a.v4 + a.v5*a.v5) > 0
             |  AND (b.v1*b.v1 + b.v2*b.v2 + b.v3*b.v3 + b.v4*b.v4 + b.v5*b.v5) > 0
             |ORDER BY cosine DESC, ua, ub LIMIT 10""".stripMargin)),

    // NN-descent graph refinement (Dong et al. 2011) — THE build
    // primitive behind graph ANN indexes: start from a cheap ring
    // seed k-NN graph, repeatedly score neighbors-of-neighbors (both
    // directions) and keep the best 5, measure recall against the
    // exact graph after each round. Candidate scoring touches ONLY
    // the ≤55·n candidate edges (never the n² grid — that join is
    // the bounded truth oracle, the same documented altitude as
    // dedup_embed_cosine); two rounds shown converging. vec_ids are
    // dense 0..n−1 by the testdata contract, so the ring is pure
    // modular arithmetic — no global window anywhere.
    "ann_nn_descent" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val f = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull && col("vec_id") < 300)
          .select(col("vec_id").as("id"), col("embedding").as("emb"))
          .localCheckpoint(eager = false) // truth join + per-round scoring
        val fa = f.select(col("id").as("a"), col("emb").as("ea"))
        val fb = f.select(col("id").as("b"), col("emb").as("eb"))
        def top5(scored: DataFrame): DataFrame = scored
          .withColumn("rk", row_number().over(
            Window.partitionBy("a").orderBy(col("s").desc, col("b"))))
          .filter(col("rk") <= 5).select("a", "b")
        val truth = top5(fa.join(fb, col("a") =!= col("b"))
            .withColumn("s", score(col("ea"), col("eb"))))
          .localCheckpoint(eager = false) // 3 recall probes
        val seed = f.select(col("id").as("a"))
          .crossJoin(s.range(1L, 6L).toDF("i"))
          .select(col("a"), pmod(col("a") + col("i"), lit(300L)).as("b"))
        def scoreOf(g: DataFrame): DataFrame = g
          .join(fa, "a").join(fb, "b")
          .withColumn("s", score(col("ea"), col("eb")))
          .select("a", "b", "s")
        def refine(g: DataFrame): DataFrame = {
          val rev = g.select(col("b").as("a"), col("a").as("b"))
          val fwd = g.select(col("a"), col("b").as("m"))
          val nn = fwd.join(g.select(col("a").as("m"), col("b")), "m")
            .select("a", "b")
            .union(fwd.join(rev.select(col("a").as("m"), col("b")), "m")
              .select("a", "b"))
          val cand = g.select("a", "b").union(rev).union(nn)
            .filter(col("a") =!= col("b")).distinct()
          top5(scoreOf(cand))
        }
        val r1 = refine(seed).localCheckpoint(eager = false)
        val r2 = refine(r1)
        val nt = truth.agg(count(lit(1)).as("n_truth"))
        def rec(g: DataFrame, stage: String): DataFrame = g
          .join(truth, Seq("a", "b"))
          .agg(count(lit(1)).as("n_hit"))
          .crossJoin(broadcast(nt))
          .select(lit(stage).as("stage"), col("n_truth"),
            round(col("n_hit") / col("n_truth").cast("double"), 4)
              .as("recall"))
        rec(seed, "0_seed").union(rec(r1, "1_round")).union(rec(r2, "2_round"))
          .orderBy("stage")
      },
      Some("""WITH f AS MATERIALIZED (
             |  SELECT vec_id AS id, embedding::DOUBLE[] AS emb
             |  FROM embeddings WHERE embedding IS NOT NULL AND vec_id < 300),
             |p AS MATERIALIZED (
             |  SELECT a.id AS a, b.id AS b,
             |         round(list_cosine_similarity(a.emb, b.emb), 6) + 0.0 AS s
             |  FROM f a JOIN f b ON a.id <> b.id),
             |truth AS MATERIALIZED (
             |  SELECT a, b FROM (SELECT a, b, row_number() OVER
             |      (PARTITION BY a ORDER BY s DESC, b) AS rk FROM p)
             |  WHERE rk <= 5),
             |seed AS MATERIALIZED (
             |  SELECT id AS a, (id + i) % 300 AS b
             |  FROM f, (SELECT CAST(unnest(generate_series(1, 5)) AS BIGINT) AS i)),
             |c1 AS (SELECT DISTINCT a, b FROM (
             |         SELECT a, b FROM seed
             |         UNION SELECT b AS a, a AS b FROM seed
             |         UNION SELECT g1.a, g2.b FROM seed g1
             |           JOIN seed g2 ON g1.b = g2.a
             |         UNION SELECT g1.a, g2.a AS b FROM seed g1
             |           JOIN seed g2 ON g1.b = g2.b)
             |       WHERE a <> b),
             |r1 AS MATERIALIZED (
             |  SELECT a, b FROM (SELECT c1.a, c1.b, p.s, row_number() OVER
             |      (PARTITION BY c1.a ORDER BY p.s DESC, c1.b) AS rk
             |    FROM c1 JOIN p ON p.a = c1.a AND p.b = c1.b)
             |  WHERE rk <= 5),
             |c2 AS (SELECT DISTINCT a, b FROM (
             |         SELECT a, b FROM r1
             |         UNION SELECT b AS a, a AS b FROM r1
             |         UNION SELECT g1.a, g2.b FROM r1 g1
             |           JOIN r1 g2 ON g1.b = g2.a
             |         UNION SELECT g1.a, g2.a AS b FROM r1 g1
             |           JOIN r1 g2 ON g1.b = g2.b)
             |       WHERE a <> b),
             |r2 AS MATERIALIZED (
             |  SELECT a, b FROM (SELECT c2.a, c2.b, p.s, row_number() OVER
             |      (PARTITION BY c2.a ORDER BY p.s DESC, c2.b) AS rk
             |    FROM c2 JOIN p ON p.a = c2.a AND p.b = c2.b)
             |  WHERE rk <= 5),
             |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
             |SELECT stage, n_truth, recall FROM (
             |  SELECT '0_seed' AS stage, nt.n_truth,
             |         round((SELECT count(*) FROM seed g JOIN truth t
             |                ON t.a = g.a AND t.b = g.b)
             |               / CAST(nt.n_truth AS DOUBLE), 4) AS recall FROM nt
             |  UNION ALL
             |  SELECT '1_round', nt.n_truth,
             |         round((SELECT count(*) FROM r1 g JOIN truth t
             |                ON t.a = g.a AND t.b = g.b)
             |               / CAST(nt.n_truth AS DOUBLE), 4) FROM nt
             |  UNION ALL
             |  SELECT '2_round', nt.n_truth,
             |         round((SELECT count(*) FROM r2 g JOIN truth t
             |                ON t.a = g.a AND t.b = g.b)
             |               / CAST(nt.n_truth AS DOUBLE), 4) FROM nt)
             |ORDER BY stage""".stripMargin)))

  val round11qQ: Seq[(String, Q)] = Seq(
    // Two-component Gaussian mixture EM on the doc-length histogram
    // (3 unrolled iterations): is the corpus ONE length population or
    // a short/long blend (boilerplate vs articles)? E-step
    // responsibilities per DISTINCT length value; M-step moments as
    // EXACT integer micro-unit sums (the stat_cronbach altitude), so
    // every iteration is merge-order-proof and the Spark driver loop
    // and the DuckDB unrolled-CTE chain follow bit-identical
    // trajectories (params re-rounded to 4/6dp between iterations —
    // the ts_holt_linear pinning idiom). Corpus-scale work is ONE
    // value-histogram aggregate; the EM runs on ≤|distinct lengths|
    // rows driver-side (the graph_pagerank bounded-collect altitude —
    // the histogram is bounded by the length domain, not the corpus).
    "stat_mixture_em" -> Q(
      (s, d) => {
        import s.implicits._
        val h = Tables.documents(s, d).filter(col("n_chars").isNotNull)
          .groupBy(col("n_chars").cast("long").as("x"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        def r4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
        def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
        if (h.isEmpty) {
          Seq.empty[(Long, Double, Double, Double, Double, Double, Double)]
            .toDF("n_docs", "w1", "mu1", "sigma1", "mu2", "sigma2",
              "separation")
        } else {
          val n = h.map(_._2).sum
          def pct(p: Long): Long = {
            val tgt = (p * n + 99) / 100
            var cum = 0L
            h.find { case (_, c) => { cum += c; cum >= tgt } }.get._1
          }
          val sS = h.map { case (x, c) => x * c }.sum
          val qS = h.map { case (x, c) => x * x * c }.sum
          var mu1 = pct(25).toDouble
          var mu2 = pct(75).toDouble
          val v0 = r4((n.toDouble * qS - sS.toDouble * sS) / (n.toDouble * n))
          var v1 = v0; var v2 = v0; var w1 = 0.5
          for (_ <- 1 to 3) {
            var t1s = 0L; var u1s = 0L; var vt1s = 0L
            var t2s = 0L; var u2s = 0L; var vt2s = 0L
            h.foreach { case (xl, c) =>
              val x = xl.toDouble
              val e1 = math.exp(-(x - mu1) * (x - mu1) / (2 * v1)) / math.sqrt(v1)
              val e2 = math.exp(-(x - mu2) * (x - mu2) / (2 * v2)) / math.sqrt(v2)
              val den = w1 * e1 + (1 - w1) * e2
              val r1 = if (den > 0) r6(w1 * e1 / den) else 0.5
              val t1 = math.floor(c * r1 * 1e6 + 0.5).toLong
              val u1 = math.floor(c * r1 * x * 1e6 + 0.5).toLong
              val vt1 = math.floor(c * r1 * x * x * 1e6 + 0.5).toLong
              t1s += t1; u1s += u1; vt1s += vt1
              t2s += c * 1000000L - t1
              u2s += c * xl * 1000000L - u1
              vt2s += c * xl * xl * 1000000L - vt1
            }
            if (t1s > 0 && t2s > 0) {
              w1 = r6(t1s.toDouble / (1e6 * n))
              mu1 = r4(u1s.toDouble / t1s)
              v1 = r4(vt1s.toDouble / t1s - mu1 * mu1)
              mu2 = r4(u2s.toDouble / t2s)
              v2 = r4(vt2s.toDouble / t2s - mu2 * mu2)
            }
          }
          val sep =
            if (v1 > 0 && v2 > 0) r4((mu2 - mu1) / math.sqrt((v1 + v2) / 2))
            else Double.NaN
          Seq((n, w1, mu1,
            if (v1 > 0) r4(math.sqrt(v1)) else Double.NaN,
            mu2, if (v2 > 0) r4(math.sqrt(v2)) else Double.NaN, sep))
            .toDF("n_docs", "w1", "mu1", "sigma1", "mu2", "sigma2",
              "separation")
        }
      },
      Some {
        // one EM iteration: pK (params) -> p{K+1}, via responsibilities
        // rounded to 6dp and integer micro-unit moment sums
        def iter(k: Int): String = {
          val p = s"p${k - 1}"
          s"""r$k AS (SELECT h.x, h.c, $p.w1, $p.mu1, $p.v1, $p.mu2, $p.v2,
             |  round($p.w1 * (exp(-(h.x - $p.mu1)*(h.x - $p.mu1)/(2*$p.v1))/sqrt($p.v1))
             |    / ($p.w1 * (exp(-(h.x - $p.mu1)*(h.x - $p.mu1)/(2*$p.v1))/sqrt($p.v1))
             |       + (1 - $p.w1) * (exp(-(h.x - $p.mu2)*(h.x - $p.mu2)/(2*$p.v2))/sqrt($p.v2))), 6) AS r1
             |  FROM h, $p),
             |t$k AS (SELECT x, c,
             |  CAST(round(c * r1 * 1e6) AS BIGINT) AS t1,
             |  CAST(round(c * r1 * x * 1e6) AS BIGINT) AS u1,
             |  CAST(round(c * r1 * x * x * 1e6) AS BIGINT) AS vt1
             |  FROM r$k),
             |q$k AS (SELECT sum(t1) AS t1s, sum(u1) AS u1s, sum(vt1) AS vt1s,
             |  sum(c * 1000000 - t1) AS t2s,
             |  sum(c * x * 1000000 - u1) AS u2s,
             |  sum(c * x * x * 1000000 - vt1) AS vt2s,
             |  sum(c) AS n FROM t$k),
             |p$k AS (SELECT
             |  round(CAST(t1s AS DOUBLE) / (1e6 * n), 6) AS w1,
             |  round(CAST(u1s AS DOUBLE) / t1s, 4) AS mu1,
             |  round(CAST(vt1s AS DOUBLE) / t1s
             |        - round(CAST(u1s AS DOUBLE) / t1s, 4)
             |          * round(CAST(u1s AS DOUBLE) / t1s, 4), 4) AS v1,
             |  round(CAST(u2s AS DOUBLE) / t2s, 4) AS mu2,
             |  round(CAST(vt2s AS DOUBLE) / t2s
             |        - round(CAST(u2s AS DOUBLE) / t2s, 4)
             |          * round(CAST(u2s AS DOUBLE) / t2s, 4), 4) AS v2
             |  FROM q$k)""".stripMargin
        }
        s"""WITH h AS MATERIALIZED (
           |  SELECT CAST(n_chars AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS c
           |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
           |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           |              CAST(sum(x * c) AS BIGINT) AS s,
           |              CAST(sum(x * x * c) AS BIGINT) AS q
           |       FROM h),
           |cm AS (SELECT x, sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
           |         AS cum FROM h),
           |p0 AS (SELECT
           |  0.5 AS w1,
           |  CAST((SELECT min(x) FROM cm, nn WHERE cum >= (25*n+99)//100) AS DOUBLE) AS mu1,
           |  (SELECT round(CAST(n*q - s*s AS DOUBLE)/(CAST(n AS DOUBLE)*n), 4) FROM nn) AS v1,
           |  CAST((SELECT min(x) FROM cm, nn WHERE cum >= (75*n+99)//100) AS DOUBLE) AS mu2,
           |  (SELECT round(CAST(n*q - s*s AS DOUBLE)/(CAST(n AS DOUBLE)*n), 4) FROM nn) AS v2),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)}
           |SELECT nn.n AS n_docs, p3.w1, p3.mu1,
           |       round(sqrt(p3.v1), 4) AS sigma1,
           |       p3.mu2, round(sqrt(p3.v2), 4) AS sigma2,
           |       round((p3.mu2 - p3.mu1) / sqrt((p3.v1 + p3.v2) / 2), 4)
           |         AS separation
           |FROM p3, nn""".stripMargin
      }),

    // DCT perceptual hash (pHash) — the third of the perceptual trio
    // beside mm_image_ahash (global mean) and mm_image_dhash
    // (gradient): 16×16 stub luma → 8×8 DCT-II → 63 AC bits vs their
    // exact median — robust to brightness AND contrast shifts, the
    // industry near-dup screen for images. Cosines are quantized to
    // 3dp BEFORE the products (the ts_periodogram libm-vs-JDK ulp
    // defense at the term level), coefficients re-rounded to 4dp;
    // same banded hamming-NN report as the siblings. Decode is the
    // md5 stub (no codec in the sandbox) — the DCT plumbing is real.
    "mm_image_phash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val imgs = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 2 && col("doc_id") < 120 &&
            col("text").isNotNull)
        val px = imgs.select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), lit(255L))).as("pidx"))
          .select(col("doc_id"), col("text"),
            (col("pidx") % 16).as("x"), expr("pidx div 16").as("y"),
            (md5Long(concat(col("text"), lit(":ppx"),
              col("pidx").cast("string"))) % 256).as("p"))
        val freq = px.crossJoin(s.range(0L, 64L).toDF("k"))
          .withColumn("u", expr("k div 8")).withColumn("v", col("k") % 8)
          .withColumn("cu",
            round(cos(lit(math.Pi) * (col("x") * 2 + 1) * col("u") / 32.0), 3))
          .withColumn("cv",
            round(cos(lit(math.Pi) * (col("y") * 2 + 1) * col("v") / 32.0), 3))
          .groupBy("doc_id", "k")
          .agg(round(sum(col("p") * col("cu") * col("cv")), 4).as("coef"))
          .localCheckpoint(eager = false) // median + bit compare
        val med = freq.filter(col("k") > 0)
          .withColumn("rk", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("coef"), col("k"))))
          .filter(col("rk") === 32)
          .select(col("doc_id"), col("coef").as("med"))
        val bits = freq.filter(col("k") > 0).join(med, "doc_id")
          .select(col("doc_id"), col("k"),
            (col("coef") > col("med")).cast("long").as("bit"))
          .localCheckpoint(eager = false) // both sides of the pair join
        bits.select(col("doc_id").as("da"), col("k"), col("bit").as("ba"))
          .join(bits.select(col("doc_id").as("db"), col("k"),
            col("bit").as("bb")), Seq("k"))
          .filter(col("da") =!= col("db"))
          .groupBy("da", "db")
          .agg(sum(abs(col("ba") - col("bb"))).as("hamming"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("da").orderBy(col("hamming"), col("db"))))
          .filter(col("rk") === 1)
          .select(col("da").as("doc_id"), col("db").as("nn_doc"),
            col("hamming").as("nn_hamming"))
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (SELECT doc_id, text FROM documents
             |              WHERE doc_id % 3 = 2 AND doc_id < 120
             |                AND text IS NOT NULL),
             |px AS (SELECT doc_id, text, CAST(pidx AS BIGINT) AS pidx,
             |              pidx % 16 AS x, pidx // 16 AS y,
             |              ('0x' || substr(md5(text || ':ppx' || CAST(pidx AS VARCHAR)), 1, 15))::BIGINT % 256 AS p
             |       FROM imgs, LATERAL (SELECT unnest(generate_series(0, 255)) AS pidx)),
             |freq AS (SELECT doc_id, CAST(k AS BIGINT) AS k,
             |                round(sum(p
             |                  * round(cos(pi() * (x * 2 + 1) * (k // 8) / 32.0), 3)
             |                  * round(cos(pi() * (y * 2 + 1) * (k % 8) / 32.0), 3)), 4) AS coef
             |         FROM px, LATERAL (SELECT unnest(generate_series(0, 63)) AS k)
             |         GROUP BY 1, 2),
             |med AS (SELECT doc_id, coef AS med FROM (
             |          SELECT doc_id, coef, row_number() OVER
             |            (PARTITION BY doc_id ORDER BY coef, k) AS rk
             |          FROM freq WHERE k > 0)
             |        WHERE rk = 32),
             |bits AS (SELECT f.doc_id, f.k,
             |                CAST(f.coef > m.med AS BIGINT) AS bit
             |         FROM freq f JOIN med m ON m.doc_id = f.doc_id
             |         WHERE f.k > 0),
             |ham AS (SELECT a.doc_id AS da, b.doc_id AS db,
             |               CAST(sum(abs(a.bit - b.bit)) AS BIGINT) AS hamming
             |        FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id <> b.doc_id
             |        GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY da
             |                   ORDER BY hamming, db) AS rk
             |       FROM ham)
             |SELECT da AS doc_id, db AS nn_doc, hamming AS nn_hamming
             |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin)),

    // Deterministic node2vec-style random walks on the near-dup graph
    // (4 steps from every node, md5-seeded next-hop choice over the
    // row_number-indexed adjacency) + skip-gram co-visit pair counts
    // within window 2 — the walk-corpus prep behind DeepWalk/node2vec
    // graph embeddings, reproducible because the "randomness" is the
    // md5 convention every sampler here uses. Four frontier joins
    // over the |V|-row walk table; the pair fan-out is the fixed
    // 7-slot window grid. Top-20 co-visited pairs.
    "graph_node2vec" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false)
        val adj = e0.select(col("da").as("v"), col("db").as("w"))
          .union(e0.select(col("db").as("v"), col("da").as("w")))
          .withColumn("idx",
            row_number().over(Window.partitionBy("v").orderBy("w")) - 1)
          .localCheckpoint(eager = false) // one read per step
        val deg = adj.groupBy("v").agg(count(lit(1)).as("dg"))
        var walk = deg.select(col("v").as("p0"))
        for (k <- 1 to 4) {
          val prev = s"p${k - 1}"
          walk = walk
            .join(deg.select(col("v").as(prev), col("dg")), prev)
            .withColumn("pick",
              pmod(md5Long(concat(lit("n2v:"), col("p0").cast("string"),
                lit(s":$k:"), col(prev).cast("string"))), col("dg")))
            .join(adj.select(col("v").as(prev), col("idx").as("pick"),
              col("w").as(s"p$k")), Seq(prev, "pick"))
            .drop("dg", "pick")
        }
        val pairs = (for (i <- 0 to 4; j <- i + 1 to math.min(i + 2, 4))
          yield walk.select(least(col(s"p$i"), col(s"p$j")).as("a"),
            greatest(col(s"p$i"), col(s"p$j")).as("b")))
          .reduce(_ union _)
        pairs.filter(col("a") =!= col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("co_visits"))
          .orderBy(col("co_visits").desc, col("a"), col("b")).limit(20)
          .select(col("a").as("doc_a"), col("b").as("doc_b"),
            col("co_visits"))
      },
      Some {
        def key(k: Int, cur: String) =
          s"('0x' || substr(md5('n2v:' || CAST(p0 AS VARCHAR) || ':$k:' || CAST($cur AS VARCHAR)), 1, 15))::BIGINT"
        def step(k: Int): String = {
          val prev = s"p${k - 1}"
          val prevW = s"w${k - 1}"
          val keep = (0 until k).map(i => s"$prevW.p$i").mkString(", ")
          s"""w$k AS (SELECT $keep, ad.w AS p$k
             |  FROM $prevW
             |  JOIN dg ON dg.v = $prevW.$prev
             |  JOIN ad ON ad.v = $prevW.$prev
             |   AND ad.idx = ${key(k, s"$prevW.$prev")} % dg.dg)""".stripMargin
        }
        s"""WITH ${dupEdgesSql(120, 0.25)},
           |ad AS (SELECT v, w,
           |         row_number() OVER (PARTITION BY v ORDER BY w) - 1 AS idx
           |       FROM (SELECT da AS v, db AS w FROM e0
           |             UNION ALL SELECT db AS v, da AS w FROM e0)),
           |dg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM ad GROUP BY v),
           |w0 AS (SELECT v AS p0 FROM dg),
           |${step(1)},
           |${step(2)},
           |${step(3)},
           |${step(4)},
           |pr AS (SELECT least(p0, p1) AS a, greatest(p0, p1) AS b FROM w4
           |  UNION ALL SELECT least(p0, p2), greatest(p0, p2) FROM w4
           |  UNION ALL SELECT least(p1, p2), greatest(p1, p2) FROM w4
           |  UNION ALL SELECT least(p1, p3), greatest(p1, p3) FROM w4
           |  UNION ALL SELECT least(p2, p3), greatest(p2, p3) FROM w4
           |  UNION ALL SELECT least(p2, p4), greatest(p2, p4) FROM w4
           |  UNION ALL SELECT least(p3, p4), greatest(p3, p4) FROM w4)
           |SELECT a AS doc_a, b AS doc_b,
           |       CAST(count(*) AS BIGINT) AS co_visits
           |FROM pr WHERE a <> b GROUP BY a, b
           |ORDER BY co_visits DESC, doc_a, doc_b LIMIT 20""".stripMargin
      }))
}
