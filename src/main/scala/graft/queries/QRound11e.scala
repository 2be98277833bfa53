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
private[graft] object QRound11e {


  val round11rQ: Seq[(String, Q)] = Seq(
    // Logistic regression by 3 unrolled IRLS Newton steps — the
    // workhorse classifier, fit DISTRIBUTED: P(doc is English) on
    // (scaled length, letter-'e' fraction — the classic one-letter
    // langid signal) — the language prior a router would use before
    // the full n-gram langid pass. Each step is ONE
    // map-side-combinable aggregate of the 9 weighted cross-moments
    // (every per-row term pinned to integer micro-units before the
    // exact decimal/HUGEINT sum — the stat_cronbach altitude), then a
    // closed-form 3×3 Cramer solve on the 1-row result; β re-rounded
    // to 6dp between steps so the Spark chain and the DuckDB unrolled
    // CTEs follow bit-identical trajectories. No collect anywhere —
    // three passes over the corpus, exactly what IRLS costs at
    // 100 TB. Deviance-free output: β̂ plus the fitted base rate.
    "stat_logistic_irls" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val docs = Tables.documents(s, d)
        val f = docs
          .select((col("n_chars") / 1000.0).as("x1"),
            ((length(col("text")) - length(regexp_replace(col("text"), "e", "")))
              / greatest(length(col("text")), lit(1)).cast("double")).as("x2"),
            when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
          .localCheckpoint(eager = false) // one read per IRLS step
        var params = f.sparkSession.range(1).select(
          lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"),
          lit(0L).as("n"))
        for (_ <- 1 to 3) {
          val z = col("b0") + col("b1") * col("x1") + col("b2") * col("x2")
          val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
          def mi(e: Column, nm: String) =
            sum(round(e * 1e6, 0).cast("long").cast(dec)).as(nm)
          val it = f.crossJoin(broadcast(params))
            .withColumn("p", p)
            .withColumn("w", col("p") * (lit(1.0) - col("p")))
            .withColumn("r", col("y") - col("p"))
          val q = it.agg(
            count(lit(1)).as("n"),
            mi(col("w"), "a00"), mi(col("w") * col("x1"), "a01"),
            mi(col("w") * col("x2"), "a02"),
            mi(col("w") * col("x1") * col("x1"), "a11"),
            mi(col("w") * col("x1") * col("x2"), "a12"),
            mi(col("w") * col("x2") * col("x2"), "a22"),
            mi(col("r"), "g0"), mi(col("r") * col("x1"), "g1"),
            mi(col("r") * col("x2"), "g2"),
            max("b0").as("b0"), max("b1").as("b1"), max("b2").as("b2"))
          def dv(c: String) = (col(c).cast("double") / 1e6)
          val (a00, a01, a02) = (dv("a00"), dv("a01"), dv("a02"))
          val (a11, a12, a22) = (dv("a11"), dv("a12"), dv("a22"))
          val (g0, g1, g2) = (dv("g0"), dv("g1"), dv("g2"))
          val det = a00 * (a11 * a22 - a12 * a12) -
            a01 * (a01 * a22 - a12 * a02) + a02 * (a01 * a12 - a11 * a02)
          val d0 = g0 * (a11 * a22 - a12 * a12) -
            a01 * (g1 * a22 - a12 * g2) + a02 * (g1 * a12 - a11 * g2)
          val d1 = a00 * (g1 * a22 - g2 * a12) -
            g0 * (a01 * a22 - a12 * a02) + a02 * (a01 * g2 - g1 * a02)
          val d2 = a00 * (a11 * g2 - a12 * g1) -
            a01 * (a01 * g2 - g1 * a02) + g0 * (a01 * a12 - a11 * a02)
          params = q.select(
            when(abs(det) > 1e-12, round(col("b0") + d0 / det, 6))
              .otherwise(col("b0")).as("b0"),
            when(abs(det) > 1e-12, round(col("b1") + d1 / det, 6))
              .otherwise(col("b1")).as("b1"),
            when(abs(det) > 1e-12, round(col("b2") + d2 / det, 6))
              .otherwise(col("b2")).as("b2"),
            col("n"))
        }
        val zf = col("b0") + col("b1") * col("x1") + col("b2") * col("x2")
        f.crossJoin(broadcast(params))
          .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-zf)), 6))
          .groupBy("b0", "b1", "b2", "n")
          .agg(round(sum(round(col("p") * 1e6, 0).cast("long").cast(dec))
            .cast("double") / 1e6 / max("n"), 4).as("fitted_rate"))
          .select(col("n").as("n_docs"), col("b0").as("beta0"),
            col("b1").as("beta_len"), col("b2").as("beta_efrac"),
            col("fitted_rate"))
      },
      Some {
        def iter(k: Int): String = {
          val p = s"p${k - 1}"
          s"""r$k AS (SELECT f.x1, f.x2, f.y,
             |  round(1.0 / (1.0 + exp(-($p.b0 + $p.b1 * f.x1 + $p.b2 * f.x2))), 6) AS p,
             |  $p.b0 AS b0, $p.b1 AS b1, $p.b2 AS b2
             |  FROM f, $p),
             |t$k AS (SELECT b0, b1, b2, y - p AS r, p * (1.0 - p) AS w, x1, x2
             |  FROM r$k),
             |q$k AS (SELECT count(*) AS n,
             |  sum(CAST(round(w * 1e6) AS BIGINT)) AS a00,
             |  sum(CAST(round(w * x1 * 1e6) AS BIGINT)) AS a01,
             |  sum(CAST(round(w * x2 * 1e6) AS BIGINT)) AS a02,
             |  sum(CAST(round(w * x1 * x1 * 1e6) AS BIGINT)) AS a11,
             |  sum(CAST(round(w * x1 * x2 * 1e6) AS BIGINT)) AS a12,
             |  sum(CAST(round(w * x2 * x2 * 1e6) AS BIGINT)) AS a22,
             |  sum(CAST(round(r * 1e6) AS BIGINT)) AS g0,
             |  sum(CAST(round(r * x1 * 1e6) AS BIGINT)) AS g1,
             |  sum(CAST(round(r * x2 * 1e6) AS BIGINT)) AS g2,
             |  max(b0) AS b0, max(b1) AS b1, max(b2) AS b2
             |  FROM t$k),
             |s$k AS (SELECT n, b0, b1, b2,
             |  CAST(a00 AS DOUBLE)/1e6 AS a00, CAST(a01 AS DOUBLE)/1e6 AS a01,
             |  CAST(a02 AS DOUBLE)/1e6 AS a02, CAST(a11 AS DOUBLE)/1e6 AS a11,
             |  CAST(a12 AS DOUBLE)/1e6 AS a12, CAST(a22 AS DOUBLE)/1e6 AS a22,
             |  CAST(g0 AS DOUBLE)/1e6 AS g0, CAST(g1 AS DOUBLE)/1e6 AS g1,
             |  CAST(g2 AS DOUBLE)/1e6 AS g2
             |  FROM q$k),
             |p$k AS (SELECT n,
             |  CASE WHEN abs(a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |                + a02*(a01*a12 - a11*a02)) > 1e-12
             |       THEN round(b0 + (g0*(a11*a22 - a12*a12)
             |              - a01*(g1*a22 - a12*g2) + a02*(g1*a12 - a11*g2))
             |            / (a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |               + a02*(a01*a12 - a11*a02)), 6)
             |       ELSE b0 END AS b0,
             |  CASE WHEN abs(a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |                + a02*(a01*a12 - a11*a02)) > 1e-12
             |       THEN round(b1 + (a00*(g1*a22 - g2*a12)
             |              - g0*(a01*a22 - a12*a02) + a02*(a01*g2 - g1*a02))
             |            / (a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |               + a02*(a01*a12 - a11*a02)), 6)
             |       ELSE b1 END AS b1,
             |  CASE WHEN abs(a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |                + a02*(a01*a12 - a11*a02)) > 1e-12
             |       THEN round(b2 + (a00*(a11*g2 - a12*g1)
             |              - a01*(a01*g2 - g1*a02) + g0*(a01*a12 - a11*a02))
             |            / (a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |               + a02*(a01*a12 - a11*a02)), 6)
             |       ELSE b2 END AS b2
             |  FROM s$k)"""
        }
        s"""WITH f AS MATERIALIZED (
           |  SELECT d.n_chars / 1000.0 AS x1,
           |         (length(d.text) - length(replace(d.text, 'e', '')))
           |           / CAST(greatest(length(d.text), 1) AS DOUBLE) AS x2,
           |         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
           |  FROM documents d),
           |p0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)},
           |ff AS (SELECT f.*, p3.*,
           |  round(1.0 / (1.0 + exp(-(p3.b0 + p3.b1 * f.x1 + p3.b2 * f.x2))), 6) AS p
           |  FROM f, p3)
           |SELECT CAST(max(n) AS BIGINT) AS n_docs,
           |       max(b0) AS beta0, max(b1) AS beta_len,
           |       max(b2) AS beta_efrac,
           |       round(CAST(sum(CAST(round(p * 1e6) AS BIGINT)) AS DOUBLE)
           |             / 1e6 / max(n), 4) AS fitted_rate
           |FROM ff""".stripMargin
      }))

  val round11sQ: Seq[(String, Q)] = Seq(
    // Local-level Kalman filter over the daily event count — the
    // optimal online denoiser (level ± uncertainty) behind every
    // "smoothed KPI" chart, beside ts_holt_linear's fixed-gain
    // smoothing: gain adapts from the variance recursion instead.
    // Q=25 process / R=100 observation variance; gain rounded to 6dp
    // and state to 4dp per step, so the Spark driver fold and the
    // DuckDB RECURSIVE CTE follow bit-identical trajectories (the
    // mixture-EM pinning idiom applied to a sequential recursion).
    // Corpus-scale work is ONE daily rollup; the fold runs on the
    // calendar-bounded series (ts_pettitt's bound).
    "ts_kalman_level" -> Q(
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("v"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
        def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
        if (daily.isEmpty)
          Seq.empty[(Long, Long, Double, Double, Option[Double])]
            .toDF("t", "day", "obs", "level", "gain")
        else {
          var level = daily.head._2.toDouble
          var p = 10000.0
          val rows = daily.zipWithIndex.map { case ((day, v), t) =>
            if (t == 0) (t.toLong, day, v.toDouble, level, None: Option[Double])
            else {
              val pp = p + 25.0
              val kg = r6(pp / (pp + 100.0))
              level = r4(level + kg * (v - level))
              p = r4((1 - kg) * pp)
              (t.toLong, day, v.toDouble, level, Some(kg))
            }
          }
          rows.toSeq.toDF("t", "day", "obs", "level", "gain").orderBy("t")
        }
      },
      Some("""WITH RECURSIVE d0 AS MATERIALIZED (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS v
             |  FROM events GROUP BY 1),
             |daily AS MATERIALIZED (
             |  SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t,
             |         day, v
             |  FROM d0),
             |k AS (
             |  SELECT t, day, v, v AS level, CAST(10000.0 AS DOUBLE) AS p,
             |         CAST(NULL AS DOUBLE) AS gain
             |  FROM daily WHERE t = 0
             |  UNION ALL
             |  SELECT d.t, d.day, d.v,
             |         round(k.level + round((k.p + 25.0) / (k.p + 125.0), 6)
             |               * (d.v - k.level), 4),
             |         round((1 - round((k.p + 25.0) / (k.p + 125.0), 6))
             |               * (k.p + 25.0), 4),
             |         round((k.p + 25.0) / (k.p + 125.0), 6)
             |  FROM k JOIN daily d ON d.t = k.t + 1)
             |SELECT t, day, v AS obs, level, gain
             |FROM k ORDER BY t""".stripMargin)),

    // 2-state HMM forward filter over daily purchase counts — the
    // regime detector ("normal vs elevated demand", Poisson
    // emissions at the series' own p25/p75 rates, sticky 0.9/0.1
    // transitions) that CUSUM/Pettitt's single changepoint can't
    // express: P(high | data so far) per day, online. Emissions are
    // max-shifted before exp (no overflow at production counts);
    // the posterior is re-rounded to 6dp per step, pinning the Spark
    // fold to the DuckDB RECURSIVE CTE. One daily rollup; the fold
    // is calendar-bounded.
    "ts_hmm_forward" -> Q(
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
        if (daily.isEmpty)
          Seq.empty[(Long, Long, Double, Double, Double)]
            .toDF("day", "x", "lam_lo", "lam_hi", "p_high")
        else {
          val n = daily.length
          val sorted = daily.map(_._2).sorted
          def pct(p: Int): Double = sorted(((p * n + 99) / 100 - 1).max(0))
            .toDouble
          val lamLo = pct(25).max(0.5)
          val lamHi = pct(75).max(lamLo + 0.5)
          var aHi = 0.5
          val rows = daily.map { case (day, x) =>
            val eLo = x * math.log(lamLo) - lamLo
            val eHi = x * math.log(lamHi) - lamHi
            val mx = math.max(eLo, eHi)
            val wLo = (1 - aHi) * 0.9 + aHi * 0.1
            val wHi = (1 - aHi) * 0.1 + aHi * 0.9
            val uLo = wLo * math.exp(eLo - mx)
            val uHi = wHi * math.exp(eHi - mx)
            aHi = r6(uHi / (uLo + uHi))
            (day, x, lamLo, lamHi, aHi)
          }
          rows.toSeq.toDF("day", "x", "lam_lo", "lam_hi", "p_high")
            .orderBy("day")
        }
      },
      Some("""WITH RECURSIVE d0 AS MATERIALIZED (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |daily AS MATERIALIZED (
             |  SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t,
             |         day, x
             |  FROM d0),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d0),
             |lam AS (SELECT
             |  greatest((SELECT CAST(x AS DOUBLE) FROM
             |     (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM d0), nn
             |     WHERE rn = greatest((25 * n + 99) // 100, 1)), 0.5) AS lam_lo_raw),
             |lam2 AS (SELECT lam_lo_raw AS lam_lo,
             |  greatest((SELECT CAST(x AS DOUBLE) FROM
             |     (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM d0), nn
             |     WHERE rn = greatest((75 * n + 99) // 100, 1)),
             |    lam_lo_raw + 0.5) AS lam_hi
             |  FROM lam),
             |f AS (
             |  SELECT d.t, d.day, d.x, l.lam_lo, l.lam_hi,
             |    round(
             |      (0.5 * 0.1 + 0.5 * 0.9)
             |        * exp(d.x * ln(l.lam_hi) - l.lam_hi
             |              - greatest(d.x * ln(l.lam_lo) - l.lam_lo,
             |                         d.x * ln(l.lam_hi) - l.lam_hi))
             |      / ((0.5 * 0.9 + 0.5 * 0.1)
             |           * exp(d.x * ln(l.lam_lo) - l.lam_lo
             |                 - greatest(d.x * ln(l.lam_lo) - l.lam_lo,
             |                            d.x * ln(l.lam_hi) - l.lam_hi))
             |         + (0.5 * 0.1 + 0.5 * 0.9)
             |           * exp(d.x * ln(l.lam_hi) - l.lam_hi
             |                 - greatest(d.x * ln(l.lam_lo) - l.lam_lo,
             |                            d.x * ln(l.lam_hi) - l.lam_hi))), 6)
             |      AS p_high
             |  FROM daily d, lam2 l WHERE d.t = 0
             |  UNION ALL
             |  SELECT d.t, d.day, d.x, f.lam_lo, f.lam_hi,
             |    round(
             |      ((1 - f.p_high) * 0.1 + f.p_high * 0.9)
             |        * exp(d.x * ln(f.lam_hi) - f.lam_hi
             |              - greatest(d.x * ln(f.lam_lo) - f.lam_lo,
             |                         d.x * ln(f.lam_hi) - f.lam_hi))
             |      / (((1 - f.p_high) * 0.9 + f.p_high * 0.1)
             |           * exp(d.x * ln(f.lam_lo) - f.lam_lo
             |                 - greatest(d.x * ln(f.lam_lo) - f.lam_lo,
             |                            d.x * ln(f.lam_hi) - f.lam_hi))
             |         + ((1 - f.p_high) * 0.1 + f.p_high * 0.9)
             |           * exp(d.x * ln(f.lam_hi) - f.lam_hi
             |                 - greatest(d.x * ln(f.lam_lo) - f.lam_lo,
             |                            d.x * ln(f.lam_hi) - f.lam_hi))), 6)
             |  FROM f JOIN daily d ON d.t = f.t + 1)
             |SELECT day, x, lam_lo, lam_hi, p_high
             |FROM f ORDER BY day""".stripMargin)))

  val round11tQ: Seq[(String, Q)] = Seq(
    // GARCH(1,1) volatility filter over daily log-returns of the
    // event count (α=0.1, β=0.85, ω targeting the sample variance at
    // the implied 0.95 persistence) — conditional volatility and
    // standardized residuals, the "is today's swing big GIVEN the
    // current volatility regime" lens that the fixed-σ ts_seasonal
    // z-scores lack. Returns are 6dp-pinned, the variance seed is an
    // exact micro-integer moment, and each recursion step re-rounds
    // to 8dp — the ts_kalman_level class: Spark driver fold ≡ DuckDB
    // RECURSIVE CTE on the calendar-bounded series.
    "ts_garch11" -> Q(
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("v"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
        def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
        def r8(x: Double) = math.floor(x * 1e8 + 0.5) / 1e8
        val rets = daily.sliding(2).collect { case Array((_, v0), (day, v1)) =>
          (day, r6(math.log(v1.toDouble / v0))) }.toArray
        if (rets.length < 2)
          Seq.empty[(Long, Double, Double, Double)]
            .toDF("day", "ret", "sigma2", "z")
        else {
          val n = rets.length
          val ms = rets.map { case (_, r) => math.floor(r * 1e6 + 0.5).toLong }
          val sm = ms.sum; val qm = ms.map(m => m * m).sum
          val vbar = r8((n.toDouble * qm - sm.toDouble * sm) /
            (n.toDouble * n * 1e12))
          val om = r8(0.05 * vbar)
          var s2 = vbar
          val rows = rets.zipWithIndex.map { case ((day, r), i) =>
            if (i > 0)
              s2 = r8(om + 0.1 * rets(i - 1)._2 * rets(i - 1)._2 + 0.85 * s2)
            (day, r, s2, if (s2 > 0) r4(r / math.sqrt(s2)) else 0.0)
          }
          rows.toSeq.toDF("day", "ret", "sigma2", "z").orderBy("day")
        }
      },
      Some("""WITH RECURSIVE d0 AS MATERIALIZED (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS v
             |  FROM events GROUP BY 1),
             |rs AS MATERIALIZED (
             |  SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t,
             |         day, r
             |  FROM (SELECT day, round(ln(v / lag(v) OVER (ORDER BY day)), 6) AS r
             |        FROM d0)
             |  WHERE r IS NOT NULL),
             |vb AS (SELECT round((count(*) * sum(m * m)
             |                     - sum(m) * CAST(sum(m) AS DOUBLE))
             |                    / (count(*) * CAST(count(*) AS DOUBLE) * 1e12),
             |                    8) AS vbar
             |       FROM (SELECT CAST(round(r * 1e6) AS BIGINT) AS m FROM rs)),
             |g AS (
             |  SELECT rs.t, rs.day, rs.r, vb.vbar AS s2,
             |         round(0.05 * vb.vbar, 8) AS om, rs.r AS pr
             |  FROM rs, vb WHERE rs.t = 0
             |  UNION ALL
             |  SELECT rs.t, rs.day, rs.r,
             |         round(g.om + 0.1 * g.pr * g.pr + 0.85 * g.s2, 8),
             |         g.om, rs.r
             |  FROM g JOIN rs ON rs.t = g.t + 1)
             |SELECT day, r AS ret, s2 AS sigma2,
             |       CASE WHEN s2 > 0 THEN round(r / sqrt(s2), 4)
             |            ELSE 0.0 END AS z
             |FROM g ORDER BY day""".stripMargin)))

  val round11uQ: Seq[(String, Q)] = Seq(
    // Holm step-down multiple-testing correction over the same
    // per-metric Welch z family stat_fdr BH-adjusts: padj_i =
    // cummax_j≤i min(1, (m−j+1)·p_j) — controls FWER (strictly
    // stronger than BH's FDR) with NO independence assumption, the
    // right gate when any single false positive is expensive. All
    // windows run on the ≤|event types| rollup (stat_fdr's bound).
    "stat_holm" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")) &&
                  col("event_type").isNotNull)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("event_type")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
               avg(when(col("arm") === 1, col("value"))).as("m_t"),
               avg(when(col("arm") === 0, col("value"))).as("m_c"),
               var_samp(when(col("arm") === 1, col("value"))).as("v_t"),
               var_samp(when(col("arm") === 0, col("value"))).as("v_c"))
          .withColumn("se2", col("v_t") / col("n_t") + col("v_c") / col("n_c"))
          .withColumn("z",
            when(col("n_t") < 2 || col("n_c") < 2 || col("se2") <= 0.0,
                 lit(null).cast("double"))
              .otherwise(round((col("m_t") - col("m_c")) / sqrt(col("se2")), 6)))
          .withColumn("x", abs(col("z")) / sqrt(lit(2.0)))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("x")))
          .withColumn("p",
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              col("t1") * (lit(0.254829592) + col("t1") * (lit(-0.284496736)
                + col("t1") * (lit(1.421413741) + col("t1") * (lit(-1.453152027)
                + col("t1") * lit(1.061405429)))))
              * exp(-col("x") * col("x")), 6)))
        val wR = Window.orderBy(col("p"), col("event_type"))
        val wAll = Window.partitionBy(lit(1))
        val wCum = wR.rowsBetween(Window.unboundedPreceding, 0)
        g.filter(col("p").isNotNull)
          .withColumn("rank", row_number().over(wR))
          .withColumn("m", count(lit(1)).over(wAll))
          .withColumn("step",
            round(least(lit(1.0), (col("m") - col("rank") + 1) * col("p")), 6))
          .withColumn("p_holm", round(max("step").over(wCum), 6))
          .select(col("event_type"), col("z"), col("p"),
            col("rank").cast("long").as("rank"), col("p_holm"),
            (col("p_holm") <= 0.05).cast("long").as("reject"))
          .orderBy("rank")
      },
      Some("""WITH e AS (
             |  SELECT event_type, value,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value) AND event_type IS NOT NULL),
             |g AS (
             |  SELECT event_type,
             |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |         avg(CASE WHEN arm = 1 THEN value END) AS m_t,
             |         avg(CASE WHEN arm = 0 THEN value END) AS m_c,
             |         var_samp(CASE WHEN arm = 1 THEN value END) AS v_t,
             |         var_samp(CASE WHEN arm = 0 THEN value END) AS v_c
             |  FROM e GROUP BY event_type),
             |z AS (SELECT *, v_t / n_t + v_c / n_c AS se2,
             |        CASE WHEN n_t < 2 OR n_c < 2 OR v_t / n_t + v_c / n_c <= 0.0
             |             THEN NULL
             |             ELSE round((m_t - m_c) / sqrt(v_t / n_t + v_c / n_c), 6)
             |        END AS z
             |      FROM g),
             |p AS (SELECT event_type, z,
             |        CASE WHEN z IS NULL THEN NULL ELSE round(
             |          (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |          * (0.254829592 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |            * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |              * (1.421413741 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |                * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |                  * 1.061405429))))
             |          * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0))), 6) END AS p
             |      FROM z WHERE z IS NOT NULL),
             |r AS (SELECT *, row_number() OVER (ORDER BY p, event_type) AS rank,
             |             count(*) OVER () AS m
             |      FROM p),
             |st AS (SELECT *, round(least(1.0, (m - rank + 1) * p), 6) AS step
             |       FROM r),
             |h AS (SELECT *, round(max(step) OVER (ORDER BY rank
             |               ROWS UNBOUNDED PRECEDING), 6) AS p_holm
             |      FROM st)
             |SELECT event_type, z, p, CAST(rank AS BIGINT) AS rank, p_holm,
             |       CAST(p_holm <= 0.05 AS BIGINT) AS reject
             |FROM h ORDER BY rank""".stripMargin)),

    // Fixed-effect inverse-variance meta-analysis of the per-language
    // vs-'en' length effects (stat_vs_control's family pooled into
    // ONE estimate): pooled Δ, its SE, Cochran's Q and the I²
    // heterogeneity share — "is there one cross-locale effect, or do
    // locales genuinely differ" (I² high ⇒ the pooled number is a
    // fiction). Group moments from the same exact-integer pass;
    // everything after is ≤|langs| arithmetic.
    "stat_meta_analysis" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val g = Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast(dec)).as("sx"),
            sum((col("n_chars") * col("n_chars")).cast(dec)).as("qx"))
          .filter(col("n") > 1)
          .select(col("lang"), col("n"),
            (col("sx").cast("double") / col("n")).as("m"),
            ((col("n") * col("qx") - col("sx") * col("sx")).cast("double")
              / (col("n").cast("double") * (col("n") - 1))).as("v"))
          .localCheckpoint(eager = false) // control row + effect rows
        val ctrl = g.filter(col("lang") === "en")
          .select(col("n").as("nc"), col("m").as("mc"), col("v").as("vc"))
        val eff = g.filter(col("lang") =!= "en")
          .crossJoin(broadcast(ctrl))
          .select(col("lang"),
            round(col("m") - col("mc"), 6).as("di"),
            round(col("v") / col("n") + col("vc") / col("nc"), 6).as("vi"))
          .filter(col("vi") > 0)
        val fe = eff.agg(count(lit(1)).as("k"),
          sum(lit(1.0) / col("vi")).as("sw"),
          sum(col("di") / col("vi")).as("swd"))
          .withColumn("pooled", col("swd") / col("sw"))
        eff.crossJoin(broadcast(fe))
          .agg(max("k").as("k"),
            round(max("pooled"), 4).as("pooled_diff"),
            round(lit(1.0) / sqrt(max("sw")), 4).as("pooled_se"),
            round(sum(pow(col("di") - col("pooled"), 2) / col("vi")), 4)
              .as("q_het"))
          .select(col("k").as("k_studies"), col("pooled_diff"),
            col("pooled_se"), col("q_het"),
            when(col("q_het") > 0, round(
              greatest(lit(0.0), (col("q_het") - (col("k") - 1))
                / col("q_het")), 4)).as("i2"))
      },
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |         sum(n_chars) AS sx, sum(n_chars * n_chars) AS qx
             |  FROM documents GROUP BY 1 HAVING count(*) > 1),
             |m AS (SELECT lang, n, CAST(sx AS DOUBLE) / n AS m,
             |             CAST(n*qx - sx*sx AS DOUBLE)
             |               / (CAST(n AS DOUBLE) * (n - 1)) AS v
             |      FROM g),
             |c AS (SELECT n AS nc, m AS mc, v AS vc FROM m WHERE lang = 'en'),
             |eff AS (SELECT lang, round(m.m - mc, 6) AS di,
             |               round(m.v / n + vc / nc, 6) AS vi
             |        FROM m, c WHERE lang <> 'en'),
             |ef AS (SELECT * FROM eff WHERE vi > 0),
             |fe AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |              sum(1.0 / vi) AS sw, sum(di / vi) AS swd
             |       FROM ef),
             |a AS (SELECT max(k) AS k,
             |             round(max(swd / sw), 4) AS pooled_diff,
             |             round(1.0 / sqrt(max(sw)), 4) AS pooled_se,
             |             round(sum(pow(di - swd / sw, 2) / vi), 4) AS q_het
             |      FROM ef, fe)
             |SELECT k AS k_studies, pooled_diff, pooled_se, q_het,
             |       CASE WHEN q_het > 0
             |            THEN round(greatest(0.0, (q_het - (k - 1)) / q_het), 4)
             |       END AS i2
             |FROM a""".stripMargin)),

    // Murphy decomposition of the Brier score for the same
    // out-of-sample source→P(en) prior stat_hosmer_lemeshow tests:
    // Brier = reliability − resolution + uncertainty over the p̂
    // bins — HL says WHETHER calibration fails, this says what the
    // forecast is worth (resolution) and how much of the error is
    // mis-calibration (reliability). p̂ is a 6dp ratio and y is 0/1,
    // so every sum is an exact micro-integer (the stat_cronbach
    // altitude); the identity is spec-pinned.
    "stat_brier_decomp" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val docs = Tables.documents(s, d)
        val half = md5Long(concat(lit("hl:"), col("doc_id").cast("string"))) % 2
        val prior = docs.filter(half === 0)
          .groupBy("source")
          .agg(round(sum(when(col("lang") === "en", 1L).otherwise(0L))
            / count(lit(1)).cast("double"), 6).as("phat"))
        val t = docs.filter(half === 1)
          .join(broadcast(prior), "source")
          .select(round(col("phat") * 1e6, 0).cast("long").as("pm"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
          .localCheckpoint(eager = false) // bin pass + global pass
        val bins = t.groupBy("pm")
          .agg(count(lit(1)).as("nb"), sum("y").as("yb"))
        val tot = t.agg(count(lit(1)).as("n"), sum("y").as("ny"),
          sum((col("pm") - col("y") * 1000000L)
            * (col("pm") - col("y") * 1000000L)).cast(dec).as("qb"))
        bins.crossJoin(broadcast(tot))
          .agg(max("n").as("n"), max("ny").as("ny"),
            max("qb").cast("double").as("qbd"),
            sum(col("nb")
              * pow(col("pm").cast("double") / 1e6
                - col("yb").cast("double") / col("nb"), 2)).as("rel"),
            sum(col("nb")
              * pow(col("yb").cast("double") / col("nb")
                - col("ny").cast("double") / col("n"), 2)).as("res"))
          .select(col("n").as("n_test"),
            round(col("qbd") / col("n") / 1e12, 6).as("brier"),
            round(col("rel") / col("n"), 6).as("reliability"),
            round(col("res") / col("n"), 6).as("resolution"),
            round((col("ny").cast("double") / col("n"))
              * (lit(1.0) - col("ny").cast("double") / col("n")), 6)
              .as("uncertainty"))
      },
      Some("""WITH prior AS (
             |  SELECT source,
             |         round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |               / CAST(count(*) AS DOUBLE), 6) AS phat
             |  FROM documents
             |  WHERE ('0x' || substr(md5('hl:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
             |  GROUP BY 1),
             |t AS MATERIALIZED (
             |  SELECT CAST(round(phat * 1e6) AS BIGINT) AS pm,
             |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents d JOIN prior USING (source)
             |  WHERE ('0x' || substr(md5('hl:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 1),
             |bins AS (SELECT pm, CAST(count(*) AS BIGINT) AS nb,
             |                CAST(sum(y) AS BIGINT) AS yb
             |         FROM t GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(y) AS BIGINT) AS ny,
             |               sum((pm - y * 1000000) * (pm - y * 1000000)) AS qb
             |        FROM t),
             |a AS (SELECT max(n) AS n, max(ny) AS ny,
             |             CAST(max(qb) AS DOUBLE) AS qbd,
             |             sum(nb * pow(CAST(pm AS DOUBLE) / 1e6
             |                   - CAST(yb AS DOUBLE) / nb, 2)) AS rel,
             |             sum(nb * pow(CAST(yb AS DOUBLE) / nb
             |                   - CAST(ny AS DOUBLE) / n, 2)) AS res
             |      FROM bins, tot)
             |SELECT n AS n_test,
             |       round(qbd / n / 1e12, 6) AS brier,
             |       round(rel / n, 6) AS reliability,
             |       round(res / n, 6) AS resolution,
             |       round((CAST(ny AS DOUBLE) / n)
             |             * (1.0 - CAST(ny AS DOUBLE) / n), 6) AS uncertainty
             |FROM a""".stripMargin)))
}
