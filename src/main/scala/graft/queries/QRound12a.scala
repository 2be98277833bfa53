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
private[graft] object QRound12a {


  val round12Q: Seq[(String, Q)] = Seq(
    // Goh–Barabási burstiness B = (σ−μ)/(σ+μ) and memory coefficient
    // M = corr(gap_t, gap_{t+1}) of per-user same-type interarrival
    // seconds — the TWO-number signature separating bursty-human
    // (B>0, M≈0), periodic-bot (B<0) and correlated-session traffic
    // that stat_gamma_fit's shape parameter summarizes from one angle
    // only. Integer-second gaps (stat_gamma_fit's frame) make every
    // power/cross sum exact, so B and M come out of pure integer
    // arithmetic into one sqrt — both engines agree bit-for-bit.
    // Multiplying (σ−μ)/(σ+μ) through by n gives the all-integer form
    // (√(n·Σg²−(Σg)²) − Σg) / (√(n·Σg²−(Σg)²) + Σg).
    "ev_burstiness" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val gaps = Tables.events(s, d)
          .withColumn("prev", lag("ts", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
            expr("(ts - prev) div 1000000000").as("g"))
          .filter(col("g") > 0)
          .localCheckpoint(eager = false) // moment pass + lag-pair pass
        val mom = gaps.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("g").cast(dec)).as("sg"),
            sum((col("g") * col("g")).cast(dec)).as("qg"))
          .select(col("event_type"), col("n").as("n_gaps"),
            sqrt((col("n") * col("qg") - col("sg") * col("sg")).cast("double"))
              .as("rt"),
            col("sg").cast("double").as("sgd"))
          .select(col("event_type"), col("n_gaps"),
            when(col("rt") + col("sgd") > 0,
              round((col("rt") - col("sgd")) / (col("rt") + col("sgd")), 4))
              .as("burstiness_b"))
        val pr = gaps
          .withColumn("pg", lag("g", 1).over(w))
          .filter(col("pg").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("m"),
            sum(col("pg").cast(dec)).as("sa"),
            sum(col("g").cast(dec)).as("sb"),
            sum((col("pg") * col("pg")).cast(dec)).as("saa"),
            sum((col("g") * col("g")).cast(dec)).as("sbb"),
            sum((col("pg") * col("g")).cast(dec)).as("sab"))
          .select(col("event_type"),
            (col("m") * col("sab") - col("sa") * col("sb")).cast("double").as("cv"),
            (col("m") * col("saa") - col("sa") * col("sa")).cast("double").as("va"),
            (col("m") * col("sbb") - col("sb") * col("sb")).cast("double").as("vb"))
          .select(col("event_type"),
            when(col("va") > 0 && col("vb") > 0,
              round(col("cv") / (sqrt(col("va")) * sqrt(col("vb"))), 4))
              .as("memory_m"))
        mom.join(pr, Seq("event_type"), "left").orderBy("event_type")
      },
      Some("""WITH gp AS (
             |  SELECT user_id, event_type, event_id, ts,
             |         (ts - lag(ts, 1) OVER (PARTITION BY user_id, event_type
             |            ORDER BY ts, event_id)) // 1000000000 AS g
             |  FROM events),
             |gaps AS (SELECT user_id, event_type, event_id, ts, g
             |         FROM gp WHERE g > 0),
             |mom AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
             |         sqrt(CAST(count(*) * sum(g * g) - sum(g) * sum(g) AS DOUBLE)) AS rt,
             |         CAST(sum(g) AS DOUBLE) AS sgd
             |  FROM gaps GROUP BY event_type),
             |b AS (SELECT event_type, n_gaps,
             |        CASE WHEN rt + sgd > 0
             |             THEN round((rt - sgd) / (rt + sgd), 4) END AS burstiness_b
             |      FROM mom),
             |pp AS (
             |  SELECT event_type,
             |         lag(g, 1) OVER (PARTITION BY user_id, event_type
             |            ORDER BY ts, event_id) AS pg, g
             |  FROM gaps),
             |pc AS (
             |  SELECT event_type,
             |         CAST(count(*) * sum(pg * g) - sum(pg) * sum(g) AS DOUBLE) AS cv,
             |         CAST(count(*) * sum(pg * pg) - sum(pg) * sum(pg) AS DOUBLE) AS va,
             |         CAST(count(*) * sum(g * g) - sum(g) * sum(g) AS DOUBLE) AS vb
             |  FROM pp WHERE pg IS NOT NULL GROUP BY event_type),
             |m AS (SELECT event_type,
             |        CASE WHEN va > 0 AND vb > 0
             |             THEN round(cv / (sqrt(va) * sqrt(vb)), 4) END AS memory_m
             |      FROM pc)
             |SELECT b.event_type, b.n_gaps, b.burstiness_b, m.memory_m
             |FROM b LEFT JOIN m USING (event_type)
             |ORDER BY event_type""".stripMargin)),

    // Page–Hinkley sequential drift detector on the daily event-count
    // series: PH_t = Σ_{s≤t}(x_s − μ − δ) minus its running minimum,
    // alarm when PH_t > λ = 3σ — the cumulative-deviation monitor that
    // fires on slow drifts 3σ-per-point rules (ts_seasonal) never see.
    // μ and σ come from exact integer power sums and are pinned to
    // 6dp; each term is then converted to integer micro-units BEFORE
    // the running sums, so both cumsum and running-min are pure
    // integer window arithmetic — no float accumulation order anywhere
    // (a double cumsum would be at the mercy of DuckDB's segment-tree
    // summation order). Windows run on the calendar-bounded day frame.
    "stat_page_hinkley" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // moment pass + sequential scan
        val m = daily.agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("s1"),
            sum((col("x") * col("x")).cast(dec)).as("s2"))
          .select(
            round(col("s1").cast("double") / col("n"), 6).as("mu"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")) / col("n"), 6).as("sigma"))
          .select(col("mu"),
            round(col("sigma") * 0.05, 6).as("delta"),
            round(col("sigma") * 3.0, 6).as("lambda"))
          .select(col("lambda"),
            round((col("mu") + col("delta")) * 1e6, 0).cast("long").as("ref_u"))
        val wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        daily.crossJoin(broadcast(m))
          .withColumn("term_u", col("x") * 1000000L - col("ref_u"))
          .withColumn("cum_u", sum("term_u").over(wc))
          .withColumn("min_u", min("cum_u").over(wc))
          .withColumn("ph", round((col("cum_u") - col("min_u"))
            .cast("double") / 1e6, 4))
          .select(col("day"), col("x"), col("ph"),
            (col("ph") > col("lambda")).cast("long").as("alarm"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |mo AS (
             |  SELECT round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mu,
             |         round(sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x)
             |               AS DOUBLE)) / count(*), 6) AS sigma
             |  FROM daily),
             |cf AS (SELECT round(sigma * 3.0, 6) AS lambda,
             |              CAST(round((mu + round(sigma * 0.05, 6)) * 1e6)
             |                   AS BIGINT) AS ref_u
             |       FROM mo),
             |r AS (
             |  SELECT day, x,
             |         sum(x * 1000000 - ref_u) OVER (ORDER BY day
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u,
             |         lambda
             |  FROM daily, cf),
             |ph AS (
             |  SELECT day, x, lambda,
             |         round(CAST(cum_u - min(cum_u) OVER (ORDER BY day
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           AS DOUBLE) / 1e6, 4) AS ph
             |  FROM r)
             |SELECT day, x, ph, CAST(ph > lambda AS BIGINT) AS alarm
             |FROM ph ORDER BY day""".stripMargin)),

    // Grubbs max-normed-residual statistic per event type over the
    // daily-count series: G = max_t |x_t − x̄| / s with the argmax day
    // — "which single day is the biggest outlier, and how big" (the
    // one-shot companion to stat_esd's masking-proof peeling;
    // statistic-only like stat_bartlett — no hardcoded t-quantile).
    // x̄ and s are pinned to 6dp from exact integer power sums, the
    // per-day score to 6dp before the rank, so the argmax and its
    // smallest-day tie-break are engine-identical.
    "stat_grubbs" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // moment pass + score pass
        val mom = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("s1"),
            sum((col("x") * col("x")).cast(dec)).as("s2"))
          .filter(col("n") >= 3)
          .select(col("event_type"), col("n").as("n_days"),
            round(col("s1").cast("double") / col("n"), 6).as("mu"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
                .cast("double") / (col("n").cast("double") * (col("n") - 1))), 6)
              .as("sd"))
          .filter(col("sd") > 0)
        val wr = Window.partitionBy("event_type")
          .orderBy(col("g").desc, col("day"))
        daily.join(broadcast(mom), "event_type")
          .withColumn("g", round(abs(col("x") - col("mu")) / col("sd"), 6))
          .withColumn("rk", row_number().over(wr))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("n_days"), col("day").as("peak_day"),
            col("x").as("x_peak"), col("g").as("g_stat"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |mom AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |         round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mu,
             |         round(sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x)
             |               AS DOUBLE) / (CAST(count(*) AS DOUBLE) * (count(*) - 1))), 6) AS sd
             |  FROM daily GROUP BY event_type
             |  HAVING count(*) >= 3),
             |sc AS (
             |  SELECT d.event_type, m.n_days, d.day, d.x,
             |         round(abs(d.x - m.mu) / m.sd, 6) AS g,
             |         row_number() OVER (PARTITION BY d.event_type
             |           ORDER BY round(abs(d.x - m.mu) / m.sd, 6) DESC, d.day) AS rk
             |  FROM daily d JOIN mom m USING (event_type)
             |  WHERE m.sd > 0)
             |SELECT event_type, n_days, day AS peak_day, x AS x_peak,
             |       g AS g_stat
             |FROM sc WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // Delete-a-group jackknife SE of the mean order value: G = 10
    // md5-hash groups, θ̂₍g₎ = mean excluding group g, and
    // Var = (G−1)/G · Σ(θ̂₍g₎ − θ̄)² — the survey-statistics way to put
    // an honest CI on ANY pipeline statistic without rescanning (one
    // grouped pass + G-row arithmetic; Poisson bootstrap's ×32
    // fan-out is the row-level alternative). Cents are exact, each
    // leave-one-out mean is pinned to micro-units, and the spread
    // uses the all-integer G·Σt² − (Σt)² form — no float sum anywhere.
    "samp_jackknife" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val grp = Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
            (md5Long(concat(lit("jk:"), col("o_orderkey").cast("string"))) % 10)
              .as("grp"))
          .groupBy("grp")
          .agg(count(lit(1)).as("ng"), sum(col("cents").cast(dec)).as("sg"))
          .localCheckpoint(eager = false) // total + leave-one-out rows
        val tot = grp.agg(sum(col("ng")).as("n"), sum(col("sg")).as("s"))
        val loo = grp.crossJoin(broadcast(tot))
          .select(round((col("s") - col("sg")).cast("double")
            / (col("n") - col("ng")).cast("double") / 100.0 * 1e6, 0)
            .cast(dec).as("t"))
        loo.agg(count(lit(1)).as("gn"),
            sum(col("t")).as("st"),
            sum(col("t") * col("t")).as("qt"))
          .crossJoin(broadcast(tot))
          .select(col("n").as("n_orders"),
            round(col("s").cast("double") / col("n") / 100.0, 4).as("mean_price"),
            round(sqrt((col("gn") - 1).cast("double")
              * (col("gn") * col("qt") - col("st") * col("st")).cast("double"))
              / col("gn").cast("double") / 1e6, 6).as("jk_se"))
          .select(col("n_orders"), col("mean_price"), col("jk_se"),
            round(col("mean_price") - col("jk_se") * 1.96, 4).as("ci_lo"),
            round(col("mean_price") + col("jk_se") * 1.96, 4).as("ci_hi"))
      },
      Some("""WITH o AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |         ('0x' || substr(md5('jk:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 10 AS grp
             |  FROM orders),
             |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS ng, sum(cents) AS sg
             |      FROM o GROUP BY grp),
             |t AS (SELECT CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS s FROM g),
             |loo AS (
             |  SELECT CAST(round(CAST(t.s - g.sg AS DOUBLE)
             |           / CAST(t.n - g.ng AS DOUBLE) / 100.0 * 1e6) AS HUGEINT) AS tt
             |  FROM g, t),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS gn, sum(tt) AS st,
             |             sum(tt * tt) AS qt
             |      FROM loo),
             |se AS (
             |  SELECT t.n AS n_orders,
             |         round(CAST(t.s AS DOUBLE) / t.n / 100.0, 4) AS mean_price,
             |         round(sqrt(CAST(a.gn - 1 AS DOUBLE)
             |           * CAST(a.gn * a.qt - a.st * a.st AS DOUBLE))
             |           / CAST(a.gn AS DOUBLE) / 1e6, 6) AS jk_se
             |  FROM a, t)
             |SELECT n_orders, mean_price, jk_se,
             |       round(mean_price - jk_se * 1.96, 4) AS ci_lo,
             |       round(mean_price + jk_se * 1.96, 4) AS ci_hi
             |FROM se""".stripMargin)),

    // Neyman optimal stratified allocation: a 500-doc annotation /
    // eval budget split across source strata ∝ N_h·S_h (population ×
    // within-stratum sd of doc length) next to the proportional split
    // — the variance-minimizing sample design for any labeling or
    // human-eval pass over the corpus. One grouped pass of exact
    // integer power sums; the N·S weights are pinned to micro-units
    // so the shares divide identical integers on both engines.
    "samp_neyman" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val g = Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast(dec)).as("s1"),
            sum((col("n_chars") * col("n_chars")).cast(dec)).as("s2"))
          .filter(col("n") > 1)
          .select(col("source"), col("n"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
                .cast("double") / (col("n").cast("double") * (col("n") - 1))), 6)
              .as("sd"))
          .select(col("source"), col("n"), col("sd"),
            round(col("n") * col("sd") * 1e6, 0).cast("long").as("w_u"))
          .localCheckpoint(eager = false) // total + per-stratum rows
        val tot = g.agg(sum(col("w_u").cast(dec)).as("tw"),
          sum(col("n")).as("tn"))
        g.crossJoin(broadcast(tot))
          .select(col("source"), col("n").as("n_pop"), col("sd").as("sd_len"),
            round(col("w_u").cast("double") * 500.0
              / col("tw").cast("double"), 0).cast("long").as("alloc_neyman"),
            round(col("n").cast("double") * 500.0
              / col("tn").cast("double"), 0).cast("long").as("alloc_prop"))
          .orderBy("source")
      },
      Some("""WITH g0 AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n,
             |         round(sqrt(CAST(count(*) * sum(n_chars * n_chars)
             |               - sum(n_chars) * sum(n_chars) AS DOUBLE)
             |             / (CAST(count(*) AS DOUBLE) * (count(*) - 1))), 6) AS sd
             |  FROM documents GROUP BY source
             |  HAVING count(*) > 1),
             |g AS (SELECT source, n, sd,
             |             CAST(round(n * sd * 1e6) AS BIGINT) AS w_u
             |      FROM g0),
             |t AS (SELECT sum(w_u) AS tw, CAST(sum(n) AS BIGINT) AS tn FROM g)
             |SELECT source, n AS n_pop, sd AS sd_len,
             |       CAST(round(CAST(w_u AS DOUBLE) * 500.0
             |            / CAST(tw AS DOUBLE)) AS BIGINT) AS alloc_neyman,
             |       CAST(round(CAST(n AS DOUBLE) * 500.0
             |            / CAST(tn AS DOUBLE)) AS BIGINT) AS alloc_prop
             |FROM g, t ORDER BY source""".stripMargin)),

    // Corpus isotropy audit: mean pairwise cosine of the NORMALIZED
    // embeddings and the mean-resultant norm R = ‖Σu‖/n — anisotropy
    // (all vectors sharing a common direction, Mu & Viswanath 2018's
    // narrow-cone pathology) inflates every similarity score and is
    // the emb_abtt rationale measured as one number. The O(n²) pair
    // average collapses through ‖Σu‖² = Σᵢⱼ⟨uᵢ,uⱼ⟩ to ONE linear pass:
    // unit coordinates are pinned to 1e-7 units, so Σu per dim, its
    // square, and Σ‖u‖² are all exact integers — no quadratic join,
    // no float accumulation, bit-equal across engines.
    "emb_isotropy" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.sqNorm
        val dec = "decimal(38,0)"
        val u = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            sqrt(sqNorm(col("embedding"))).as("nrm"))
          .filter(col("nrm") > 0)
          .select(posexplode(col("embedding")).as(Seq("i", "x")), col("nrm"))
          .select(col("i"),
            round(col("x").cast("double") / col("nrm") * 1e7, 0)
              .cast("long").as("v"))
          .localCheckpoint(eager = false) // per-dim sums + global Σv²
        val dims = u.groupBy("i").agg(sum(col("v").cast(dec)).as("sv"))
          .agg(sum(col("sv") * col("sv")).as("ssd"))
        val glob = u.agg(sum((col("v") * col("v")).cast(dec)).as("s2"),
          expr("count(1) div 64").as("n"))
        dims.crossJoin(glob)
          .select(col("n").as("n_vecs"),
            round((col("ssd") - col("s2")).cast("double")
              / (col("n").cast("double") * (col("n") - 1)) / 1e14, 6)
              .as("avg_cos"),
            round(sqrt(col("ssd").cast("double")) / col("n") / 1e7, 6)
              .as("resultant_norm"))
      },
      Some("""WITH nv AS (
             |  SELECT vec_id, embedding,
             |         sqrt(list_inner_product(embedding::DOUBLE[],
             |                                 embedding::DOUBLE[])) AS nrm
             |  FROM embeddings),
             |u AS (
             |  SELECT CAST(round(CAST(x AS DOUBLE) / nrm * 1e7) AS BIGINT) AS v, i
             |  FROM (SELECT nrm, generate_subscripts(embedding, 1) AS i,
             |               unnest(embedding) AS x
             |        FROM nv WHERE nrm > 0)),
             |dims AS (SELECT i, sum(v) AS sv FROM u GROUP BY i),
             |sq AS (SELECT sum(sv * sv) AS ssd FROM dims),
             |gl AS (SELECT sum(v * v) AS s2,
             |              CAST(count(*) // 64 AS BIGINT) AS n FROM u)
             |SELECT n AS n_vecs,
             |       round(CAST(ssd - s2 AS DOUBLE)
             |             / (CAST(n AS DOUBLE) * (n - 1)) / 1e14, 6) AS avg_cos,
             |       round(sqrt(CAST(ssd AS DOUBLE)) / n / 1e7, 6) AS resultant_norm
             |FROM sq, gl""".stripMargin)),

    // Cross-source duplicate matrix off the SHARED cluster-label
    // table (one CC pass now amortized across 5 readers): for every
    // source pair, how many multi-doc near-dup clusters contain docs
    // from both — the "is source B just a mirror of source A"
    // pre-licensing / dedup-priority readout. Per-cluster source sets
    // are ≤|sources| distinct rows per cluster, so the pair join is
    // bounded by clusters × sources², never documents².
    "dedup_cross_source" -> Q(
      (s, d) => {
        import graft.dedup.Dedup
        val labels = Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
        val multi = labels.groupBy("cluster").agg(count(lit(1)).as("csz"))
          .filter(col("csz") >= 2)
        val cs = labels.join(multi, "cluster")
          .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
          .select("cluster", "source").distinct()
          .localCheckpoint(eager = false) // both sides of the pair join
        cs.select(col("cluster"), col("source").as("src_a"))
          .join(cs.select(col("cluster"), col("source").as("src_b")), "cluster")
          .filter(col("src_a") <= col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("n_clusters"))
          .orderBy("src_a", "src_b")
      },
      Some(s"""WITH RECURSIVE sig AS (
              |${graft.dedup.Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
              |bands AS (${(0 until 4).map(b =>
                 s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                 .mkString(" UNION ALL ")}),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
              |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
              |edges AS (SELECT da, db FROM prs UNION ALL SELECT db, da FROM prs),
              |reach(src, lbl) AS (
              |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
              |  UNION
              |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
              |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
              |mc AS (SELECT cluster FROM cc GROUP BY cluster HAVING count(*) >= 2),
              |cs AS (SELECT DISTINCT cc.cluster, d.source
              |       FROM cc JOIN mc USING (cluster)
              |       JOIN documents d USING (doc_id))
              |SELECT a.source AS src_a, b.source AS src_b,
              |       CAST(count(*) AS BIGINT) AS n_clusters
              |FROM cs a JOIN cs b ON a.cluster = b.cluster AND a.source <= b.source
              |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin)),

    // Aspect-ratio bucketing for batch shaping: every image assigned
    // to the geometrically-nearest canonical aspect (9:16, 3:4, 1:1,
    // 4:3, 16:9) so variable-resolution encoders batch same-shape
    // inputs without per-image padding waste — the image-side
    // companion to pipe_bucket_batches' token bands. Boundaries are
    // geometric midpoints of the canon ratios; w, h are integers so
    // the w/h comparisons are engine-identical. Pure map + one agg.
    "mm_aspect_buckets" -> Q(
      (s, d) => {
        val m = graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d))
          .withColumn("r", col("width").cast("double") / col("height"))
          .withColumn("bucket",
            when(col("r") < 0.649519, "9:16")
              .when(col("r") < 0.866025, "3:4")
              .when(col("r") < 1.154701, "1:1")
              .when(col("r") < 1.539601, "4:3")
              .otherwise("16:9"))
        m.groupBy("bucket")
          .agg(count(lit(1)).as("n_images"),
            round(sum(col("width") * col("height")).cast("double")
              / count(lit(1)) / 1e6, 4).as("avg_mpx"))
          .orderBy("bucket")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, width, height,
             |         CAST(width AS DOUBLE) / height AS r
             |  FROM (SELECT doc_id, hm % 1024 + 1 AS width,
             |               (hm // 1024) % 1024 + 1 AS height
             |        FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |              FROM documents))),
             |b AS (SELECT *,
             |        CASE WHEN r < 0.649519 THEN '9:16'
             |             WHEN r < 0.866025 THEN '3:4'
             |             WHEN r < 1.154701 THEN '1:1'
             |             WHEN r < 1.539601 THEN '4:3'
             |             ELSE '16:9' END AS bucket
             |      FROM m)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_images,
             |       round(CAST(sum(width * height) AS DOUBLE)
             |             / count(*) / 1e6, 4) AS avg_mpx
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

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
             |FROM r ORDER BY event_type""".stripMargin)),

    // Engagement half-life: exponential-decay fit of cohort activity
    // by account age (events at age k days after each user's first
    // event), ln a_k regressed on k over the calendar-bounded age
    // frame — THE retention one-number ("activity halves every h
    // days") behind ev_retention's fixed-day checkpoints. ln terms
    // pinned to integer micro-units before the OLS sums (the
    // stat_powerlaw altitude), so slope and half-life are bit-equal.
    "ev_half_life" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
        val first = ev.groupBy("user_id").agg(min("day").as("fday"))
        val ages = ev.join(first, "user_id")
          .select((col("day") - col("fday")).as("k"))
          .filter(col("k") <= 30)
          .groupBy("k").agg(count(lit(1)).as("a"))
          .select(col("k"), round(log(col("a").cast("double")) * 1e6, 0)
            .cast("long").as("y"))
        ages.agg(count(lit(1)).as("m"),
            sum(col("k").cast(dec)).as("sk"),
            sum(col("y").cast(dec)).as("sy"),
            sum((col("k") * col("k")).cast(dec)).as("skk"),
            sum((col("k") * col("y")).cast(dec)).as("sky"))
          .select(col("m").as("n_ages"),
            round((col("m") * col("sky") - col("sk") * col("sy")).cast("double")
              / (col("m") * col("skk") - col("sk") * col("sk")).cast("double")
              / 1e6, 6).as("slope"))
          .select(col("n_ages"), col("slope"),
            when(col("slope") < 0,
              round(lit(-0.6931471805599453) / col("slope"), 2))
              .as("half_life_days"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, ts // 86400000000000 AS day FROM events),
             |f AS (SELECT user_id, min(day) AS fday FROM ev GROUP BY user_id),
             |ag AS (
             |  SELECT ev.day - f.fday AS k, CAST(count(*) AS BIGINT) AS a
             |  FROM ev JOIN f USING (user_id)
             |  WHERE ev.day - f.fday <= 30 GROUP BY 1),
             |y AS (SELECT k, CAST(round(ln(CAST(a AS DOUBLE)) * 1e6) AS BIGINT) AS y
             |      FROM ag),
             |o AS (SELECT CAST(count(*) AS BIGINT) AS m, sum(k) AS sk, sum(y) AS sy,
             |             sum(k * k) AS skk, sum(k * y) AS sky
             |      FROM y),
             |sl AS (SELECT m AS n_ages,
             |         round(CAST(m * sky - sk * sy AS DOUBLE)
             |               / CAST(m * skk - sk * sk AS DOUBLE) / 1e6, 6) AS slope
             |       FROM o)
             |SELECT n_ages, slope,
             |       CASE WHEN slope < 0
             |            THEN round(-0.6931471805599453 / slope, 2) END AS half_life_days
             |FROM sl""".stripMargin)),

    // Simple-random-sample estimator audit with the finite-population
    // correction: a deterministic 5% md5 sample of orders estimates
    // the mean order value, SE = s·√((1−f)/n) — what a sampled QA /
    // human-eval pass should quote instead of the naive SE (the FPC
    // matters exactly when the sample is a large share of a small
    // stratum). ONE conditional pass over orders produces population
    // and sample moments; exact cents sums end-to-end, and the
    // coverage flag checks the CI against the true mean it brackets.
    "samp_srs_ci" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val o = Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("c"),
            (md5Long(concat(lit("sr:"), col("o_orderkey").cast("string"))) % 20
              === 0).as("ins"))
        o.agg(count(lit(1)).as("np"),
            sum(col("c").cast(dec)).as("sp"),
            sum(when(col("ins"), 1L).otherwise(0L)).as("n"),
            sum(when(col("ins"), col("c")).otherwise(0L).cast(dec)).as("sc"),
            sum(when(col("ins"), col("c") * col("c")).otherwise(0L).cast(dec))
              .as("qc"))
          .select(col("np").as("n_pop"), col("n").as("n_sample"),
            round(col("sc").cast("double") / col("n") / 100.0, 4)
              .as("mean_sample"),
            round(col("sp").cast("double") / col("np") / 100.0, 4)
              .as("mean_true"),
            round(sqrt(((col("n") * col("qc") - col("sc") * col("sc"))
                .cast("double")
                / (col("n").cast("double") * (col("n") - 1)))
              * (lit(1.0) - col("n").cast("double") / col("np"))
              / col("n")) / 100.0, 6).as("se_fpc"))
          .select(col("n_pop"), col("n_sample"), col("mean_sample"),
            round(col("mean_sample") - col("se_fpc") * 1.96, 4).as("ci_lo"),
            round(col("mean_sample") + col("se_fpc") * 1.96, 4).as("ci_hi"),
            col("se_fpc"), col("mean_true"))
          .withColumn("covered",
            (col("ci_lo") <= col("mean_true") &&
             col("mean_true") <= col("ci_hi")).cast("long"))
      },
      Some("""WITH o AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             |         ('0x' || substr(md5('sr:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 20 = 0 AS ins
             |  FROM orders),
             |a AS (
             |  SELECT CAST(count(*) AS BIGINT) AS np, sum(c) AS sp,
             |         CAST(sum(CASE WHEN ins THEN 1 ELSE 0 END) AS BIGINT) AS n,
             |         sum(CASE WHEN ins THEN c ELSE 0 END) AS sc,
             |         sum(CASE WHEN ins THEN c * c ELSE 0 END) AS qc
             |  FROM o),
             |e AS (
             |  SELECT np AS n_pop, n AS n_sample,
             |         round(CAST(sc AS DOUBLE) / n / 100.0, 4) AS mean_sample,
             |         round(CAST(sp AS DOUBLE) / np / 100.0, 4) AS mean_true,
             |         round(sqrt((CAST(n * qc - sc * sc AS DOUBLE)
             |                 / (CAST(n AS DOUBLE) * (n - 1)))
             |               * (1.0 - CAST(n AS DOUBLE) / np) / n) / 100.0, 6) AS se_fpc
             |  FROM a)
             |SELECT n_pop, n_sample, mean_sample,
             |       round(mean_sample - se_fpc * 1.96, 4) AS ci_lo,
             |       round(mean_sample + se_fpc * 1.96, 4) AS ci_hi,
             |       se_fpc, mean_true,
             |       CAST(round(mean_sample - se_fpc * 1.96, 4) <= mean_true
             |            AND mean_true <= round(mean_sample + se_fpc * 1.96, 4)
             |            AS BIGINT) AS covered
             |FROM e""".stripMargin)),

    // Post-filtering recall audit: for label-filtered search, how much
    // of the TRUE filtered top-10 survives the
    // "global top-50 → apply filter → take 10" shortcut every
    // pre-filter-vs-post-filter ANN design debate is about. Exact
    // cosine on both paths (the eval isolates the FILTER strategy,
    // not index approximation); 5 query vectors, scores 6dp-pinned
    // with vec_id tie-breaks, so both engines rank identically.
    "ann_filtered_recall" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("label").as("ql"),
            col("embedding").as("qv"))
        val sc = emb.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("ql"), col("vec_id"), col("label"),
            score(col("embedding"), col("qv")).as("sc"))
          .localCheckpoint(eager = false) // truth ranks + global ranks
        val wq = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
        val truth = sc.filter(col("label") === col("ql"))
          .withColumn("rk", row_number().over(wq))
          .filter(col("rk") <= 10)
          .select(col("qid"), col("vec_id"))
        val post = sc.withColumn("rka", row_number().over(wq))
          .filter(col("rka") <= 50 && col("label") === col("ql"))
          .withColumn("rp", row_number().over(
            Window.partitionBy("qid").orderBy("rka")))
          .filter(col("rp") <= 10)
          .select(col("qid"), col("vec_id").as("pv"))
        truth.join(post,
            truth("qid") === post("qid") && col("vec_id") === col("pv"),
            "left")
          .groupBy(truth("qid").as("qid"))
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("pv").isNotNull, 1L).otherwise(0L)).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_true").cast("double"), 4))
          .orderBy("qid")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |sc AS (
             |  SELECT q.qid, q.ql, e.vec_id, e.label,
             |         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) + 0.0 AS sc
             |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
             |truth AS (
             |  SELECT qid, vec_id FROM (
             |    SELECT qid, vec_id,
             |           row_number() OVER (PARTITION BY qid
             |             ORDER BY sc DESC, vec_id) AS rk
             |    FROM sc WHERE label = ql)
             |  WHERE rk <= 10),
             |ga AS (
             |  SELECT qid, ql, vec_id, label,
             |         row_number() OVER (PARTITION BY qid
             |           ORDER BY sc DESC, vec_id) AS rka
             |  FROM sc),
             |post AS (
             |  SELECT qid, vec_id FROM (
             |    SELECT qid, vec_id,
             |           row_number() OVER (PARTITION BY qid ORDER BY rka) AS rp
             |    FROM ga WHERE rka <= 50 AND label = ql)
             |  WHERE rp <= 10)
             |SELECT t.qid, CAST(count(*) AS BIGINT) AS n_true,
             |       CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_hit,
             |       round(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS recall
             |FROM truth t LEFT JOIN post p
             |  ON p.qid = t.qid AND p.vec_id = t.vec_id
             |GROUP BY t.qid ORDER BY t.qid""".stripMargin)))

  val round12bQ: Seq[(String, Q)] = {
    val stopList = graft.text.TextAnalytics.Stopwords
      .map(w => s"'$w'").mkString(",")
    // local twin of the stat_roc_auc block's quality CTE (that one is
    // scoped to its own group) — doc quality + lang/source labels
    val qualityCte =
      s"""q AS (
         |  SELECT doc_id, lang, source,
         |         CAST(n_tok AS BIGINT) AS n_tok,
         |         round((least(n_tok, 100) / 100.0) *
         |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
         |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
         |  FROM (
         |    SELECT doc_id, lang, source, length(text) AS n_chars,
         |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
         |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |               t -> t IN ($stopList))) AS stop_cnt,
         |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
         |    FROM documents WHERE doc_id < 200))""".stripMargin
    Seq(
    // Hotelling T² two-sample test of (chars, tokens) jointly, en vs
    // de — the MULTIVARIATE welch: two features that are individually
    // "significant" can be one correlated effect, and T² is the test
    // that knows the difference. One conditional pass of exact integer
    // Gram sums per group; pooled covariance entries and the mean gap
    // are 6dp-pinned before the closed-form 2×2 inverse, so the
    // statistic is engine-identical. Statistic-only (no hardcoded F
    // quantile), like stat_bartlett.
    "stat_hotelling_t2" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        val g = Tables.documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .select(when(col("lang") === "en", 1L).otherwise(0L).as("g"),
            col("n_chars").as("x"), size(toks).cast("long").as("y"))
          .groupBy("g")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
            sum((col("x") * col("x")).cast(dec)).as("sxx"),
            sum((col("y") * col("y")).cast(dec)).as("syy"),
            sum((col("x") * col("y")).cast(dec)).as("sxy"))
          .localCheckpoint(eager = false) // both arms read below
        val a = g.filter(col("g") === 1).select(col("n").as("n1"),
          col("sx").as("sx1"), col("sy").as("sy1"), col("sxx").as("sxx1"),
          col("syy").as("syy1"), col("sxy").as("sxy1"))
        val b = g.filter(col("g") === 0).select(col("n").as("n2"),
          col("sx").as("sx2"), col("sy").as("sy2"), col("sxx").as("sxx2"),
          col("syy").as("syy2"), col("sxy").as("sxy2"))
        def css(n: Column, s2: Column, s1a: Column, s1b: Column) =
          (n * s2 - s1a * s1b).cast("double") / n.cast("double")
        a.crossJoin(b)
          .select(col("n1"), col("n2"),
            round((col("sx1").cast("double") / col("n1")
              - col("sx2").cast("double") / col("n2")), 6).as("dx"),
            round((col("sy1").cast("double") / col("n1")
              - col("sy2").cast("double") / col("n2")), 6).as("dy"),
            round((css(col("n1"), col("sxx1"), col("sx1"), col("sx1"))
              + css(col("n2"), col("sxx2"), col("sx2"), col("sx2")))
              / (col("n1") + col("n2") - 2).cast("double"), 6).as("pxx"),
            round((css(col("n1"), col("syy1"), col("sy1"), col("sy1"))
              + css(col("n2"), col("syy2"), col("sy2"), col("sy2")))
              / (col("n1") + col("n2") - 2).cast("double"), 6).as("pyy"),
            round((css(col("n1"), col("sxy1"), col("sx1"), col("sy1"))
              + css(col("n2"), col("sxy2"), col("sx2"), col("sy2")))
              / (col("n1") + col("n2") - 2).cast("double"), 6).as("pxy"))
          .withColumn("det",
            col("pxx") * col("pyy") - col("pxy") * col("pxy"))
          .select(col("n1"), col("n2"),
            when(col("det") > 0 && col("n1") > 1 && col("n2") > 1, round(
              (col("n1") * col("n2")).cast("double") / (col("n1") + col("n2"))
                * (col("dx") * col("dx") * col("pyy")
                   - lit(2.0) * col("dx") * col("dy") * col("pxy")
                   + col("dy") * col("dy") * col("pxx")) / col("det"), 4))
              .as("t2"))
          .withColumn("f_stat",
            round(col("t2") * (col("n1") + col("n2") - 3).cast("double")
              / (lit(2.0) * (col("n1") + col("n2") - 2)), 4))
      },
      Some(s"""WITH f AS (
             |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g,
             |         n_chars AS x,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
             |              AS BIGINT) AS y
             |  FROM documents WHERE lang IN ('en', 'de')),
             |gm AS (
             |  SELECT g, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             |         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
             |  FROM f GROUP BY g),
             |ab AS (
             |  SELECT a.n AS n1, b.n AS n2,
             |         round(CAST(a.sx AS DOUBLE) / a.n
             |               - CAST(b.sx AS DOUBLE) / b.n, 6) AS dx,
             |         round(CAST(a.sy AS DOUBLE) / a.n
             |               - CAST(b.sy AS DOUBLE) / b.n, 6) AS dy,
             |         round((CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE) / a.n
             |              + CAST(b.n * b.sxx - b.sx * b.sx AS DOUBLE) / b.n)
             |               / CAST(a.n + b.n - 2 AS DOUBLE), 6) AS pxx,
             |         round((CAST(a.n * a.syy - a.sy * a.sy AS DOUBLE) / a.n
             |              + CAST(b.n * b.syy - b.sy * b.sy AS DOUBLE) / b.n)
             |               / CAST(a.n + b.n - 2 AS DOUBLE), 6) AS pyy,
             |         round((CAST(a.n * a.sxy - a.sx * a.sy AS DOUBLE) / a.n
             |              + CAST(b.n * b.sxy - b.sx * b.sy AS DOUBLE) / b.n)
             |               / CAST(a.n + b.n - 2 AS DOUBLE), 6) AS pxy
             |  FROM (SELECT * FROM gm WHERE g = 1) a,
             |       (SELECT * FROM gm WHERE g = 0) b),
             |t AS (
             |  SELECT n1, n2,
             |         CASE WHEN pxx * pyy - pxy * pxy > 0 AND n1 > 1 AND n2 > 1
             |              THEN round(CAST(n1 * n2 AS DOUBLE) / (n1 + n2)
             |                * (dx * dx * pyy - 2.0 * dx * dy * pxy
             |                   + dy * dy * pxx)
             |                / (pxx * pyy - pxy * pxy), 4) END AS t2
             |  FROM ab)
             |SELECT n1, n2, t2,
             |       round(t2 * CAST(n1 + n2 - 3 AS DOUBLE)
             |             / (2.0 * (n1 + n2 - 2)), 4) AS f_stat
             |FROM t""".stripMargin)),

    // Bland–Altman agreement analysis of the two [0,1] length scores
    // stat_lin_ccc compares (chars/1000 vs tokens·5/1000): bias,
    // limits of agreement, and the share of docs outside them — the
    // method-comparison plot as a table ("do the scales agree, and
    // where do they break"). The per-doc difference is the INTEGER
    // chars − 5·tokens in milli-units, so every moment is exact; the
    // LoA bounds are pinned before the outside-count comparisons.
    "stat_bland_altman" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        val dm = Tables.documents(s, d)
          .select((col("n_chars") - lit(5L) * size(toks)).as("dm"))
          .localCheckpoint(eager = false) // moments + outside count
        val m = dm.agg(count(lit(1)).as("n"),
            sum(col("dm").cast(dec)).as("s1"),
            sum((col("dm") * col("dm")).cast(dec)).as("s2"))
          .select(col("n"),
            round(col("s1").cast("double") / col("n") / 1000.0, 6).as("bias"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")
              / (col("n").cast("double") * (col("n") - 1))) / 1000.0, 6)
              .as("sd"))
          .select(col("n"), col("bias"), col("sd"),
            round(col("bias") - col("sd") * 1.96, 6).as("loa_lo"),
            round(col("bias") + col("sd") * 1.96, 6).as("loa_hi"))
        dm.crossJoin(broadcast(m))
          .agg(first("n").as("n_docs"), first("bias").as("bias"),
            first("loa_lo").as("loa_lo"), first("loa_hi").as("loa_hi"),
            round(sum(when(col("dm").cast("double") / 1000.0 < col("loa_lo")
                || col("dm").cast("double") / 1000.0 > col("loa_hi"), 1L)
              .otherwise(0L)).cast("double") / count(lit(1)), 4)
              .as("pct_outside"))
      },
      Some(s"""WITH dm AS (
             |  SELECT n_chars - 5 * len(regexp_split_to_array(lower(trim(text)),
             |           '\\s+')) AS dm
             |  FROM documents),
             |m0 AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |         round(CAST(sum(dm) AS DOUBLE) / count(*) / 1000.0, 6) AS bias,
             |         round(sqrt(CAST(count(*) * sum(dm * dm) - sum(dm) * sum(dm)
             |               AS DOUBLE) / (CAST(count(*) AS DOUBLE) * (count(*) - 1)))
             |               / 1000.0, 6) AS sd
             |  FROM dm),
             |m AS (SELECT n, bias,
             |             round(bias - sd * 1.96, 6) AS loa_lo,
             |             round(bias + sd * 1.96, 6) AS loa_hi
             |      FROM m0)
             |SELECT m.n AS n_docs, m.bias, m.loa_lo, m.loa_hi,
             |       round(CAST(sum(CASE WHEN CAST(dm.dm AS DOUBLE) / 1000.0 < m.loa_lo
             |                    OR CAST(dm.dm AS DOUBLE) / 1000.0 > m.loa_hi
             |                    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
             |         AS pct_outside
             |FROM dm, m GROUP BY m.n, m.bias, m.loa_lo, m.loa_hi""".stripMargin)),

    // Youden J optimal operating point for the quality score as an
    // "is English" classifier — stat_roc_auc says HOW WELL the score
    // ranks; this says WHERE to cut it: the threshold maximizing
    // TPR − FPR off the same DISTINCT-value histogram (values, never
    // rows), with the smallest-threshold tie-break pinned. The number
    // a filtering pipeline actually configures.
    "stat_youden" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val t = graft.text.TextAnalytics.qualityScores(docs).drop("n_tok")
          .join(docs.select("doc_id", "lang"), "doc_id")
          .select(col("quality").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
        val h = t.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
        val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
        val r = h
          .withColumn("b1", coalesce(sum("n1x").over(w), lit(0L)))
          .withColumn("ba", coalesce(sum("nx").over(w), lit(0L)))
          .localCheckpoint(eager = false) // totals + per-threshold scan
        val tot = r.agg(sum("n1x").as("n1"),
          sum(col("nx") - col("n1x")).as("n2"))
        r.crossJoin(broadcast(tot))
          .select(col("x").as("threshold"),
            round((col("n1") - col("b1")).cast("double") / col("n1"), 6)
              .as("tpr"),
            round((col("n2") - (col("ba") - col("b1"))).cast("double")
              / col("n2"), 6).as("fpr"))
          .withColumn("j_stat", round(col("tpr") - col("fpr"), 6))
          .orderBy(col("j_stat").desc, col("threshold"))
          .limit(1)
      },
      Some(s"""WITH q0 AS (
              |  SELECT round((least(n_tok, 100) / 100.0) *
              |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
              |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS x,
              |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
              |  FROM (
              |    SELECT lang, length(text) AS n_chars,
              |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
              |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
              |               t -> t IN ($stopList))) AS stop_cnt,
              |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
              |    FROM documents)),
              |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS n1x,
              |             CAST(count(*) AS BIGINT) AS nx FROM q0 GROUP BY x),
              |r AS (SELECT x, n1x, nx,
              |        CAST(coalesce(sum(n1x) OVER (ORDER BY x
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b1,
              |        CAST(coalesce(sum(nx) OVER (ORDER BY x
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ba
              |      FROM h),
              |tt AS (SELECT CAST(sum(n1x) AS BIGINT) AS n1,
              |              CAST(sum(nx - n1x) AS BIGINT) AS n2 FROM r),
              |j AS (
              |  SELECT x AS threshold,
              |         round(CAST(n1 - b1 AS DOUBLE) / n1, 6) AS tpr,
              |         round(CAST(n2 - (ba - b1) AS DOUBLE) / n2, 6) AS fpr
              |  FROM r, tt)
              |SELECT threshold, tpr, fpr,
              |       round(tpr - fpr, 6) AS j_stat
              |FROM j ORDER BY round(tpr - fpr, 6) DESC, threshold
              |LIMIT 1""".stripMargin)),

    // Yule–Walker AR(2) fit of the daily event-count series: lag-1/2
    // autocorrelations through the ALL-INTEGER form
    // r_k = (n²·Σxy − n·S1·(Sa+Sb) + m·S1²) / (n·(n·S2 − S1²)), then
    // the closed-form φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²) —
    // the "how much momentum does volume carry" model behind
    // ts_backtest's forecasts, with zero float accumulation anywhere
    // (both engines divide identical integers).
    "ts_yule_walker" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // global moments + lag joins
        val g = daily.agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("s1"),
          sum((col("x") * col("x")).cast(dec)).as("s2"))
        val a = daily.withColumn("k", explode(array(lit(1L), lit(2L))))
        val bb = daily.select(col("day").as("db"), col("x").as("xb"))
        val lagsums = a.join(bb, col("db") === col("day") + col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("m"),
            sum((col("x") * col("xb")).cast(dec)).as("sxy"),
            sum(col("x").cast(dec)).as("sa"),
            sum(col("xb").cast(dec)).as("sb"))
        val rk = lagsums.crossJoin(broadcast(g))
          .select(col("k"), col("n"),
            round((col("n") * col("n") * col("sxy")
              - col("n") * col("s1") * (col("sa") + col("sb"))
              + col("m") * col("s1") * col("s1")).cast("double")
              / (col("n") * (col("n") * col("s2") - col("s1") * col("s1")))
                .cast("double"), 6).as("r"))
        val r1 = rk.filter(col("k") === 1).select(col("n"), col("r").as("r1"))
        val r2 = rk.filter(col("k") === 2).select(col("r").as("r2"))
        r1.crossJoin(r2)
          .select(col("n").as("n_days"), col("r1"), col("r2"),
            when(abs(lit(1.0) - col("r1") * col("r1")) > 1e-12,
              round(col("r1") * (lit(1.0) - col("r2"))
                / (lit(1.0) - col("r1") * col("r1")), 6)).as("phi1"),
            when(abs(lit(1.0) - col("r1") * col("r1")) > 1e-12,
              round((col("r2") - col("r1") * col("r1"))
                / (lit(1.0) - col("r1") * col("r1")), 6)).as("phi2"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS s1,
             |             sum(x * x) AS s2 FROM daily),
             |l AS (SELECT CAST(unnest([1, 2]) AS BIGINT) AS k),
             |ls AS (
             |  SELECT l.k, CAST(count(*) AS BIGINT) AS m,
             |         sum(a.x * b.x) AS sxy, sum(a.x) AS sa, sum(b.x) AS sb
             |  FROM daily a CROSS JOIN l
             |  JOIN daily b ON b.day = a.day + l.k
             |  GROUP BY l.k),
             |rk AS (
             |  SELECT k, n,
             |         round(CAST(n * n * sxy - n * s1 * (sa + sb) + m * s1 * s1
             |               AS DOUBLE)
             |           / CAST(n * (n * s2 - s1 * s1) AS DOUBLE), 6) AS r
             |  FROM ls, g)
             |SELECT a.n AS n_days, a.r AS r1, b.r AS r2,
             |       CASE WHEN abs(1.0 - a.r * a.r) > 1e-12
             |            THEN round(a.r * (1.0 - b.r) / (1.0 - a.r * a.r), 6)
             |       END AS phi1,
             |       CASE WHEN abs(1.0 - a.r * a.r) > 1e-12
             |            THEN round((b.r - a.r * a.r) / (1.0 - a.r * a.r), 6)
             |       END AS phi2
             |FROM (SELECT * FROM rk WHERE k = 1) a,
             |     (SELECT * FROM rk WHERE k = 2) b""".stripMargin)),

    // SAX edit-distance matrix between event types: each type's daily
    // series is z-normalized (6dp-pinned μ/σ from exact integer sums),
    // PAA-averaged over 3-day blocks, symbolized at the N(0,1)
    // quartile breakpoints, and the resulting words compared pairwise
    // by levenshtein — "which metrics move alike" as symbolic
    // alignment, robust to level and scale where ts_ccf's correlation
    // is not. Words are |days|/3 symbols, so the ≤|types|² pair join
    // carries strings, never series.
    "ts_sax_dist" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // per-type moments + blocks
        val mom = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("s1"),
            sum((col("x") * col("x")).cast(dec)).as("s2"))
          .select(col("event_type"),
            round(col("s1").cast("double") / col("n"), 6).as("mu"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")) / col("n"), 6).as("sg"))
          .filter(col("sg") > 0)
        val words = daily
          .withColumn("blk", expr("day DIV 3"))
          .groupBy("event_type", "blk")
          .agg(sum("x").as("bs"), count(lit(1)).as("bc"))
          .join(broadcast(mom), "event_type")
          .withColumn("z",
            (col("bs").cast("double") / col("bc") - col("mu")) / col("sg"))
          .withColumn("sym",
            when(col("z") < -0.6745, "a").when(col("z") < 0.0, "b")
              .when(col("z") < 0.6745, "c").otherwise("d"))
          .groupBy("event_type")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("blk"), col("sym")))),
            e => e.getField("sym")), "").as("word"))
          .localCheckpoint(eager = false) // both sides of the pair join
        words.select(col("event_type").as("type_a"), col("word").as("wa"))
          .crossJoin(words.select(col("event_type").as("type_b"),
            col("word").as("wb")))
          .filter(col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"),
            levenshtein(col("wa"), col("wb")).cast("long").as("dist"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |mom AS (
             |  SELECT event_type,
             |         round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mu,
             |         round(sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x)
             |               AS DOUBLE)) / count(*), 6) AS sg
             |  FROM daily GROUP BY event_type
             |  HAVING round(sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x)
             |               AS DOUBLE)) / count(*), 6) > 0),
             |blocks AS (
             |  SELECT d.event_type, d.day // 3 AS blk,
             |         (CAST(sum(d.x) AS DOUBLE) / count(*) - any_value(m.mu))
             |           / any_value(m.sg) AS z
             |  FROM daily d JOIN mom m USING (event_type)
             |  GROUP BY d.event_type, d.day // 3, m.mu, m.sg),
             |syms AS (
             |  SELECT event_type, blk,
             |         CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
             |              WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym
             |  FROM blocks),
             |words AS (
             |  SELECT event_type, string_agg(sym, '' ORDER BY blk) AS word
             |  FROM syms GROUP BY event_type)
             |SELECT a.event_type AS type_a, b.event_type AS type_b,
             |       CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist
             |FROM words a JOIN words b ON a.event_type < b.event_type
             |ORDER BY type_a, type_b""".stripMargin)),

    // Quality × dedup ablation grid: docs and tokens by (quality
    // tercile × canonical-vs-duplicate) on the shared cluster-label
    // frame — the "what does each filter actually cost, and do they
    // overlap" planning table every curation pipeline wants before
    // committing to thresholds (cheap docs that are ALSO dups get
    // dropped once, not twice). Tercile cutoffs are one tiny
    // percentile aggregate (type-7 parity), broadcast back, binned
    // map-side.
    "pipe_quality_ablation" -> Q(
      (s, d) => {
        import graft.dedup.Dedup
        val docs = docsUnder(s, d, 200)
        val q = graft.text.TextAnalytics.qualityScores(docs)
        val labels = Dedup.clusterLabelsShared(docs, d, 5, 8, 2)
        val cuts = q.agg(
          round(expr("percentile(quality, 0.3333333333333333D)"), 6).as("c1"),
          round(expr("percentile(quality, 0.6666666666666666D)"), 6).as("c2"))
        q.join(labels, "doc_id").crossJoin(broadcast(cuts))
          .withColumn("tercile",
            when(col("quality") <= col("c1"), "1_low")
              .when(col("quality") <= col("c2"), "2_mid")
              .otherwise("3_high"))
          .withColumn("canonical",
            (col("doc_id") === col("cluster")).cast("long"))
          .groupBy("tercile", "canonical")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok").cast("long")).as("n_tokens"))
          .orderBy("tercile", "canonical")
      },
      Some(s"""WITH RECURSIVE sig AS (
              |${graft.dedup.Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
              |bands AS (${(0 until 4).map(b =>
                 s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                 .mkString(" UNION ALL ")}),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
              |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
              |edges AS (SELECT da, db FROM prs UNION ALL SELECT db, da FROM prs),
              |reach(src, lbl) AS (
              |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
              |  UNION
              |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
              |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
              |$qualityCte,
              |cuts AS (SELECT round(quantile_cont(quality, 0.3333333333333333), 6) AS c1,
              |                round(quantile_cont(quality, 0.6666666666666666), 6) AS c2
              |         FROM q)
              |SELECT CASE WHEN quality <= c1 THEN '1_low'
              |            WHEN quality <= c2 THEN '2_mid'
              |            ELSE '3_high' END AS tercile,
              |       CAST(CASE WHEN q.doc_id = cc.cluster THEN 1 ELSE 0 END
              |            AS BIGINT) AS canonical,
              |       CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
              |FROM q JOIN cc USING (doc_id), cuts
              |GROUP BY 1, 2 ORDER BY tercile, canonical""".stripMargin)))
  }
}
