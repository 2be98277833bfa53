package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.store.VectorStore
import graft.store.VectorStore.pointsSql
import graft.QDsl._

/** Time-series decomposition, fits, and backtests — SparkEntry query family (regrouped from the round-named
  * inventory files in round 15; same query names, same bodies —
  * SparkEntry assembles the full map and the driver contract). */
private[graft] object QTimeSeries {

  val tsQA: Seq[(String, Q)] = Seq(
      // Goertzel-style seasonality strength: spectral power of the
      // daily purchase series at candidate periods {2,3,7,14} days —
      // ONE pass builds the |days|-row series, then each period is a
      // cos/sin pair of sums over that bounded frame (no FFT, no
      // per-row state). Trig terms round to 10dp before the products
      // so libm-vs-JDK last-ulp drift can't reach the 4dp report.
      "ts_goertzel" -> Q(
        (s, d) => {
          val daily = Tables.events(s, d)
            .filter(col("event_type") === "purchase")
            .groupBy(expr("ts div 86400000000000").as("day"))
            .agg(count(lit(1)).cast("double").as("x"))
          val periods = Seq(2, 3, 7, 14)
          val twoPi = 2.0 * math.Pi
          val withTrig = daily.select((Seq(col("day"), col("x")) ++
            periods.flatMap { p =>
              Seq(round(cos(col("day") * (twoPi / p)), 10).as(s"c$p"),
                  round(sin(col("day") * (twoPi / p)), 10).as(s"s$p"))
            }): _*)
          val aggs = sum("x").as("total") +: periods.flatMap { p =>
            Seq(sum(col("x") * col(s"c$p")).as(s"a$p"),
                sum(col("x") * col(s"s$p")).as(s"b$p"))
          }
          withTrig.agg(count(lit(1)).as("n_days"), aggs: _*)
            .select((col("n_days") +: periods.map { p =>
              round(sqrt(col(s"a$p") * col(s"a$p") + col(s"b$p") * col(s"b$p"))
                * 2.0 / col("n_days"), 4).as(s"amp_$p")
            }): _*)
        },
        Some {
          val periods = Seq(2, 3, 7, 14)
          val terms = periods.map { p =>
            s"sum(x * round(cos(day * (2 * pi() / $p)), 10)) AS a$p, " +
              s"sum(x * round(sin(day * (2 * pi() / $p)), 10)) AS b$p"
          }.mkString(",\n             ")
          val amps = periods.map { p =>
            s"round(sqrt(a$p * a$p + b$p * b$p) * 2.0 / n_days, 4) AS amp_$p"
          }.mkString(",\n       ")
          s"""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day, CAST(count(*) AS DOUBLE) AS x
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n_days, sum(x) AS total,
             |             $terms
             |      FROM daily)
             |SELECT n_days,
             |       $amps
             |FROM s""".stripMargin
        }),

    // Ljung–Box whiteness test per type: Q = n(n+2) Σ_{k≤3} r_k²/(n−k)
    // over the hourly-count series, with r_k the ts_acf pairwise
    // autocorrelation (identical aligned-pair corr on both engines,
    // rounded to 6 before squaring). Large Q ⇒ the series is NOT
    // white noise ⇒ the seasonal/trend models downstream have signal
    // to work with. Lags with n ≤ k or undefined r are excluded on
    // both sides; the hourly rollup is ONE checkpointed fact pass.
    "ts_ljung_box" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // lag pairs ×3 + the per-type n
        val nn = hourly.groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"))
        val a = hourly.withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
        val b = hourly.select(col("event_type").as("et2"),
          col("h").as("hb"), col("c").as("cb"))
        a.join(b, col("event_type") === col("et2") &&
            col("hb") === col("h") + col("k"))
          .groupBy("event_type", "k")
          .agg(round(corr("c", "cb"), 6).as("r"))
          .join(broadcast(nn), "event_type")
          .groupBy("event_type")
          .agg(max("n_hours").as("n_hours"),
               sum(when(col("r").isNotNull && col("n_hours") > col("k"), 1L)
                 .otherwise(0L)).as("n_lags"),
               round(max("n_hours") * (max("n_hours") + lit(2)) *
                 sum(when(col("r").isNotNull && col("n_hours") > col("k"),
                       pow(col("r"), 2) / (col("n_hours") - col("k")))
                   .otherwise(lit(0.0))), 4).as("q_lb"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, ts // 3600000000000 AS h,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
             |       FROM hourly GROUP BY 1),
             |l AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
             |rk AS (SELECT a.event_type, l.k, round(corr(a.c, b.c), 6) AS r
             |       FROM hourly a CROSS JOIN l
             |       JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + l.k
             |       GROUP BY a.event_type, l.k)
             |SELECT event_type, max(n_hours) AS n_hours,
             |       CAST(sum(CASE WHEN r IS NOT NULL AND n_hours > k
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_lags,
             |       round(max(n_hours) * (max(n_hours) + 2) *
             |             sum(CASE WHEN r IS NOT NULL AND n_hours > k
             |                      THEN pow(r, 2) / (n_hours - k) ELSE 0.0 END),
             |             4) AS q_lb
             |FROM rk JOIN nn USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Mann–Kendall trend test + Sen's slope per type on the daily
    // count series: S = Σ_{i<j} sign(c_j − c_i), tie-corrected
    // var(S), continuity-corrected z, and the median pairwise slope.
    // The pair self-join is calendar²-bounded per type (the ts_pettitt
    // frame bound); the daily rollup is ONE checkpointed fact pass
    // read by pairs, ties, and the n frame.
    "ts_mann_kendall" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // pairs ×2 + ties + n
        val b = daily.select(col("event_type").as("et2"),
          col("day").as("day2"), col("c").as("c2"))
        val pr = daily.join(b, col("event_type") === col("et2") &&
            col("day2") > col("day"))
          .groupBy("event_type")
          .agg(sum(signum(col("c2") - col("c"))).cast("long").as("s_stat"),
               round(expr("percentile((c2 - c) / (day2 - day), 0.5D)"), 6)
                 .as("sen_slope"))
        val ties = daily.groupBy("event_type", "c")
          .agg(count(lit(1)).cast("double").as("t"))
          .groupBy("event_type")
          .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
            .as("tie_term"))
        val nn = daily.groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("nd"))
        val vs = (col("nd") * (col("nd") - 1) * (lit(2) * col("nd") + 5) -
                  col("tie_term")) / lit(18.0)
        nn.join(ties, "event_type")
          .join(pr, Seq("event_type"), "left")
          .select(col("event_type"), col("nd").cast("long").as("n_days"),
                  col("s_stat"), col("sen_slope"),
                  when(vs > 0 && col("s_stat").isNotNull,
                       round((col("s_stat") - signum(col("s_stat"))) /
                             sqrt(vs), 4))
                    .otherwise(lit(null).cast("double")).as("z"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |pr AS (SELECT a.event_type,
             |         CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_stat,
             |         round(quantile_cont((b.c - a.c) / (b.day - a.day), 0.5), 6)
             |           AS sen_slope
             |       FROM daily a JOIN daily b
             |         ON b.event_type = a.event_type AND b.day > a.day
             |       GROUP BY 1),
             |ties AS (SELECT event_type,
             |           sum(t * (t - 1) * (2 * t + 5)) AS tie_term
             |         FROM (SELECT event_type, CAST(count(*) AS DOUBLE) AS t
             |               FROM daily GROUP BY event_type, c)
             |         GROUP BY 1),
             |nn AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS nd
             |       FROM daily GROUP BY 1)
             |SELECT event_type, CAST(nd AS BIGINT) AS n_days, s_stat, sen_slope,
             |       CASE WHEN (nd * (nd - 1) * (2 * nd + 5) - tie_term) / 18.0 > 0
             |                 AND s_stat IS NOT NULL
             |            THEN round((s_stat - sign(s_stat)) /
             |                   sqrt((nd * (nd - 1) * (2 * nd + 5) - tie_term) / 18.0), 4)
             |       END AS z
             |FROM nn JOIN ties USING (event_type)
             |LEFT JOIN pr USING (event_type)
             |ORDER BY event_type""".stripMargin)),

    // Hurst exponent per event_type via rescaled-range analysis:
    // daily counts → blocks of w ∈ {4,8,16} days → R/S per full
    // block (cumulative-deviation range over block σ) → H = OLS
    // slope of ln(avg R/S) on ln(w). H≈0.5 random walk, >0.5
    // long-range dependence (bursty load that capacity planning
    // can't treat as iid). Everything after the ONE fact rollup is
    // calendar-bounded; cumsum windows run per (type, w, block);
    // the OLS guards n≥2 ∧ var>0 (the text_heaps_fit lesson).
    "ts_hurst" -> Q(
      (s, d) => {
        val dc = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("cnt"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("day")).cast("long") - 1)
          .localCheckpoint(eager = false) // block stats + cumdev join
        val ws = s.createDataFrame(Seq(Tuple1(4L), Tuple1(8L), Tuple1(16L)))
          .toDF("w")
        val blocks = dc.crossJoin(broadcast(ws))
          .withColumn("blk", expr("rn div w"))
        val bs = blocks.groupBy("event_type", "w", "blk")
          .agg(count(lit(1)).as("bn"), round(avg("cnt"), 6).as("mu"),
               var_pop("cnt").as("vp"))
          .filter(col("bn") === col("w")) // full blocks only
        val wb = Window.partitionBy("event_type", "w", "blk").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val rsb = blocks.join(bs, Seq("event_type", "w", "blk"))
          .withColumn("cum", sum(col("cnt") - col("mu")).over(wb))
          .groupBy("event_type", "w", "blk")
          .agg(max("cum").as("mx"), min("cum").as("mn"), max("vp").as("vp"))
          .filter(col("vp") > 0)
          .select(col("event_type"), col("w"),
                  round((col("mx") - col("mn")) / sqrt(col("vp")), 6).as("rs"))
        val pw = rsb.groupBy("event_type", "w")
          .agg(round(avg("rs"), 6).as("ars"), count(lit(1)).as("n_blocks"))
          .filter(col("ars") > 0)
        pw.select(col("event_type"), log(col("w").cast("double")).as("lx"),
                  log(col("ars")).as("ly"))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("np"),
               covar_pop("lx", "ly").as("cxy"), var_pop("lx").as("vx"))
          .select(col("event_type"), col("np").cast("long").as("n_scales"),
                  when(col("np") >= 2 && col("vx") > 0,
                       round(col("cxy") / col("vx"), 4))
                    .otherwise(lit(null).cast("double")).as("hurst"))
          .orderBy("event_type")
      },
      Some("""WITH dc AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS cnt
             |  FROM events GROUP BY 1, 2),
             |rn AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
             |                        ORDER BY day) AS BIGINT) - 1 AS rn
             |       FROM dc),
             |ws AS (SELECT CAST(unnest([4, 8, 16]) AS BIGINT) AS w),
             |blocks AS (SELECT rn.*, w, rn // w AS blk FROM rn, ws),
             |bs AS (SELECT event_type, w, blk, count(*) AS bn,
             |              round(avg(cnt), 6) AS mu, var_pop(cnt) AS vp
             |       FROM blocks GROUP BY 1, 2, 3),
             |fb AS (SELECT * FROM bs WHERE bn = w),
             |wc AS (SELECT b.event_type, b.w, b.blk, b.cnt, fb.mu, fb.vp,
             |              sum(b.cnt - fb.mu) OVER (
             |                PARTITION BY b.event_type, b.w, b.blk ORDER BY b.day
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |       FROM blocks b JOIN fb USING (event_type, w, blk)),
             |rsb AS (SELECT event_type, w,
             |               round((max(cum) - min(cum)) / sqrt(max(vp)), 6) AS rs
             |        FROM wc GROUP BY event_type, w, blk HAVING max(vp) > 0),
             |pw AS (SELECT event_type, w, round(avg(rs), 6) AS ars,
             |              count(*) AS n_blocks
             |       FROM rsb GROUP BY 1, 2 HAVING round(avg(rs), 6) > 0),
             |pts AS (SELECT event_type, ln(CAST(w AS DOUBLE)) AS lx,
             |               ln(ars) AS ly FROM pw),
             |ag AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS np,
             |              covar_pop(lx, ly) AS cxy, var_pop(lx) AS vx
             |       FROM pts GROUP BY 1)
             |SELECT event_type, CAST(np AS BIGINT) AS n_scales,
             |       CASE WHEN np >= 2 AND vx > 0 THEN round(cxy / vx, 4) END AS hurst
             |FROM ag ORDER BY event_type""".stripMargin)),

    // trend/seasonal strength of the daily series (Hyndman's F_T/F_S
    // off ts_decompose's EXACT components — same centered-7d-MA trend,
    // same integer-scaled mean-centered day-of-week seasonal):
    // F = max(0, 1 − var(resid)/var(component + resid)). The one-
    // number summary a monitoring wall shows next to the full
    // decomposition; everything after the daily rollup is
    // |days|-bounded.
    "ts_strength" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("ts DIV 86400000000000").as("day"))
          .groupBy("day").agg(count(lit(1)).cast("double").as("y"))
        val wT = Window.orderBy("day").rangeBetween(-3, 3)
        val trended = daily
          .withColumn("n_win", count(lit(1)).over(wT))
          .withColumn("trend", round(avg("y").over(wT), 6))
          .filter(col("n_win") === 7)
          .withColumn("dow", col("day") % 7)
          .withColumn("det_l",
            round((col("y") - col("trend")) * 1e6, 0).cast("long"))
          .localCheckpoint(eager = false)
        val seas = trended.groupBy("dow").agg(
          round(sum("det_l").cast("double") / count(lit(1)) / 1e6, 6).as("s_raw"))
        val m = seas.agg(
          round(sum(round(col("s_raw") * 1e6, 0).cast("long")).cast("double")
            / count(lit(1)) / 1e6, 6).as("s_mean"))
        val seasAdj = seas.crossJoin(broadcast(m))
          .select(col("dow"), round(col("s_raw") - col("s_mean"), 6).as("seasonal"))
        trended.join(broadcast(seasAdj), "dow")
          .select(
            round(col("y") - col("trend") - col("seasonal"), 6).as("resid"),
            round(col("y") - col("trend"), 6).as("det"),
            round(col("y") - col("seasonal"), 6).as("deseas"))
          .agg(count(lit(1)).as("n_days"),
               var_pop("resid").as("vr"), var_pop("det").as("vd"),
               var_pop("deseas").as("vds"))
          .select(col("n_days"),
            when(col("vds") > 0, round(greatest(lit(0.0),
              lit(1.0) - col("vr") / col("vds")), 4))
              .otherwise(lit(null).cast("double")).as("strength_trend"),
            when(col("vd") > 0, round(greatest(lit(0.0),
              lit(1.0) - col("vr") / col("vd")), 4))
              .otherwise(lit(null).cast("double")).as("strength_seasonal"))
      },
      Some("""WITH daily AS (SELECT ts // 86400000000000 AS day,
             |                      CAST(count(*) AS DOUBLE) AS y
             |               FROM events GROUP BY day),
             |t AS (SELECT day, y, count(*) OVER w AS n_win,
             |             round(avg(y) OVER w, 6) AS trend
             |      FROM daily
             |      WINDOW w AS (ORDER BY day RANGE BETWEEN 3 PRECEDING
             |                   AND 3 FOLLOWING)),
             |f AS (SELECT day, day % 7 AS dow, y, trend,
             |             CAST(round((y - trend) * 1000000) AS BIGINT) AS det_l
             |      FROM t WHERE n_win = 7),
             |sr AS (SELECT dow, round(sum(det_l) * 1.0 / count(*) / 1000000.0, 6) AS s_raw
             |       FROM f GROUP BY dow),
             |sm AS (SELECT round(sum(CAST(round(s_raw * 1000000) AS BIGINT)) * 1.0
             |                    / count(*) / 1000000.0, 6) AS s_mean FROM sr),
             |se AS (SELECT dow, round(s_raw - s_mean, 6) AS seasonal FROM sr, sm),
             |comp AS (SELECT round(f.y - f.trend - se.seasonal, 6) AS resid,
             |                round(f.y - f.trend, 6) AS det,
             |                round(f.y - se.seasonal, 6) AS deseas
             |         FROM f JOIN se USING (dow)),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_days, var_pop(resid) AS vr,
             |              var_pop(det) AS vd, var_pop(deseas) AS vds
             |       FROM comp)
             |SELECT n_days,
             |       CASE WHEN vds > 0
             |            THEN round(greatest(0.0, 1.0 - vr / vds), 4) END AS strength_trend,
             |       CASE WHEN vd > 0
             |            THEN round(greatest(0.0, 1.0 - vr / vd), 4) END AS strength_seasonal
             |FROM ag""".stripMargin)),

    // normalized spectral entropy over the Goertzel power grid
    // {2,3,7,14}d: how CONCENTRATED the periodic energy is (0 = one
    // dominant cycle, 1 = white across the probed periods) — the
    // one-number "is there a rhythm" gate in front of ts_goertzel's
    // per-period amplitudes. Same single-pass trig aggregate, powers
    // rounded to 6 before normalization.
    "ts_spectral_entropy" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("x"))
        val periods = Seq(2, 3, 7, 14)
        val twoPi = 2.0 * math.Pi
        val withTrig = daily.select((Seq(col("day"), col("x")) ++
          periods.flatMap { p =>
            Seq(round(cos(col("day") * (twoPi / p)), 10).as(s"c$p"),
                round(sin(col("day") * (twoPi / p)), 10).as(s"s$p"))
          }): _*)
        val aggs = periods.flatMap { p =>
          Seq(sum(col("x") * col(s"c$p")).as(s"a$p"),
              sum(col("x") * col(s"s$p")).as(s"b$p"))
        }
        val pw = withTrig.agg(count(lit(1)).as("n_days"), aggs: _*)
          .select((col("n_days") +: periods.map { p =>
            round(col(s"a$p") * col(s"a$p") + col(s"b$p") * col(s"b$p"), 6)
              .as(s"p$p")
          }): _*)
        val tot = periods.map(p => col(s"p$p")).reduce(_ + _)
        val shared = pw.select((col("n_days") +: periods.map { p =>
          when(tot > 0, round(col(s"p$p") / tot, 6))
            .otherwise(lit(null).cast("double")).as(s"share_$p")
        }): _*)
        val h = periods.map { p =>
          val q = col(s"share_$p")
          when(q > 0, -q * log(q)).otherwise(lit(0.0))
        }.reduce(_ + _)
        shared.select((col("n_days") +:
          periods.map(p => col(s"share_$p"))) :+
          when(col("share_2").isNull, lit(null).cast("double"))
            .otherwise(round(h / log(lit(4.0)), 4)).as("spectral_entropy_norm"): _*)
      },
      Some {
        val periods = Seq(2, 3, 7, 14)
        val terms = periods.map { p =>
          s"sum(x * round(cos(day * (2 * pi() / $p)), 10)) AS a$p, " +
            s"sum(x * round(sin(day * (2 * pi() / $p)), 10)) AS b$p"
        }.mkString(",\n             ")
        val pows = periods.map { p =>
          s"round(a$p * a$p + b$p * b$p, 6) AS p$p"
        }.mkString(",\n       ")
        val totE = periods.map(p => s"p$p").mkString(" + ")
        val shares = periods.map { p =>
          s"CASE WHEN $totE > 0 THEN round(p$p / ($totE), 6) END AS share_$p"
        }.mkString(",\n       ")
        val hTerms = periods.map { p =>
          s"CASE WHEN share_$p > 0 THEN -share_$p * ln(share_$p) ELSE 0.0 END"
        }.mkString(" + ")
        s"""WITH daily AS (
           |  SELECT ts // 86400000000000 AS day, CAST(count(*) AS DOUBLE) AS x
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           |s AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
           |             $terms
           |      FROM daily),
           |p AS (SELECT n_days,
           |       $pows
           |      FROM s),
           |sh AS (SELECT n_days,
           |       $shares
           |       FROM p)
           |SELECT n_days, share_2, share_3, share_7, share_14,
           |       CASE WHEN share_2 IS NULL THEN NULL
           |            ELSE round(($hTerms) / ln(4.0), 4) END AS spectral_entropy_norm
           |FROM sh""".stripMargin
      }),

    // Granger-style lag-1 predictive test: do yesterday's CLICKS help
    // predict today's PURCHASES beyond yesterday's purchases alone?
    // Both daily series come out of ONE conditional rollup over the
    // facts (the ts_ccf idiom); the lag alignment is a day = day+1
    // equi-join on the checkpointed O(days) frame, and the full vs
    // restricted OLS is the closed-form 2-regressor Gram solution on
    // CENTERED sums — exact integer count sums feed every term, so
    // both engines compute bit-identical inputs. F ~ F(1, n-3).
    "ts_granger" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("y"),
               sum(when(col("event_type") === "click", 1L).otherwise(0L))
                 .cast("double").as("x"))
          .localCheckpoint(eager = false) // both sides of the lag join
        val prev = daily.select(col("day").as("dp"),
          col("y").as("yl"), col("x").as("xl"))
        val g = daily.join(prev, col("dp") === col("day") - 1)
          .agg(count(lit(1)).cast("double").as("n"),
               sum("y").as("sy"), sum("yl").as("syl"), sum("xl").as("sxl"),
               sum(col("y") * col("y")).as("syy"),
               sum(col("yl") * col("yl")).as("sylyl"),
               sum(col("xl") * col("xl")).as("sxlxl"),
               sum(col("y") * col("yl")).as("syyl"),
               sum(col("y") * col("xl")).as("syxl"),
               sum(col("yl") * col("xl")).as("sylxl"))
        g.withColumn("s11", col("sylyl") - col("syl") * col("syl") / col("n"))
          .withColumn("s22", col("sxlxl") - col("sxl") * col("sxl") / col("n"))
          .withColumn("s12", col("sylxl") - col("syl") * col("sxl") / col("n"))
          .withColumn("t1", col("syyl") - col("sy") * col("syl") / col("n"))
          .withColumn("t2", col("syxl") - col("sy") * col("sxl") / col("n"))
          .withColumn("syc", col("syy") - col("sy") * col("sy") / col("n"))
          .withColumn("det", col("s11") * col("s22") - col("s12") * col("s12"))
          .withColumn("ok", col("n") >= 4 && col("det") > 0 && col("s11") > 0)
          .withColumn("b", when(col("ok"),
            (col("t1") * col("s22") - col("t2") * col("s12")) / col("det")))
          .withColumn("c", when(col("ok"),
            (col("s11") * col("t2") - col("s12") * col("t1")) / col("det")))
          .withColumn("rssf", when(col("ok"),
            col("syc") - col("b") * col("t1") - col("c") * col("t2")))
          .withColumn("rssr", when(col("ok"),
            col("syc") - col("t1") * col("t1") / col("s11")))
          .select(col("n").cast("long").as("n_pairs"),
            round(col("b"), 6).as("ar1"),
            round(col("c"), 6).as("beta_clicks"),
            when(col("ok") && col("rssf") > 0,
              round((col("rssr") - col("rssf"))
                / (col("rssf") / (col("n") - 3)), 4)).as("f_stat"),
            when(col("ok") && col("syc") > 0,
              round(lit(1.0) - col("rssf") / col("syc"), 6)).as("r2_full"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS x
             |  FROM events GROUP BY 1),
             |p AS (SELECT a.y, b.y AS yl, b.x AS xl
             |      FROM daily a JOIN daily b ON b.day = a.day - 1),
             |g AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(y) AS sy,
             |             sum(yl) AS syl, sum(xl) AS sxl, sum(y*y) AS syy,
             |             sum(yl*yl) AS sylyl, sum(xl*xl) AS sxlxl,
             |             sum(y*yl) AS syyl, sum(y*xl) AS syxl,
             |             sum(yl*xl) AS sylxl
             |      FROM p),
             |c1 AS (SELECT n, sylyl - syl*syl/n AS s11, sxlxl - sxl*sxl/n AS s22,
             |              sylxl - syl*sxl/n AS s12, syyl - sy*syl/n AS t1,
             |              syxl - sy*sxl/n AS t2, syy - sy*sy/n AS syc
             |       FROM g),
             |c2 AS (SELECT *, s11*s22 - s12*s12 AS det,
             |              (n >= 4 AND s11*s22 - s12*s12 > 0 AND s11 > 0) AS ok
             |       FROM c1),
             |c3 AS (SELECT *,
             |              CASE WHEN ok THEN (t1*s22 - t2*s12) / det END AS b,
             |              CASE WHEN ok THEN (s11*t2 - s12*t1) / det END AS c
             |       FROM c2),
             |c4 AS (SELECT *,
             |              CASE WHEN ok THEN syc - b*t1 - c*t2 END AS rssf,
             |              CASE WHEN ok THEN syc - t1*t1/s11 END AS rssr
             |       FROM c3)
             |SELECT CAST(n AS BIGINT) AS n_pairs, round(b, 6) AS ar1,
             |       round(c, 6) AS beta_clicks,
             |       CASE WHEN ok AND rssf > 0
             |            THEN round((rssr - rssf) / (rssf / (n - 3)), 4)
             |       END AS f_stat,
             |       CASE WHEN ok AND syc > 0
             |            THEN round(1.0 - rssf / syc, 6) END AS r2_full
             |FROM c4""".stripMargin)),

    // partial autocorrelation at lags 1..3 per event type via the
    // closed-form Durbin-Levinson recursion on ts_acf's aligned-pair
    // correlations — PACF is what separates "AR(1) echo" from real
    // higher-order memory when picking a forecast model. The r_k basis
    // is rounded to 4 (ts_acf's published precision) BEFORE the
    // recursion so every engine runs identical arithmetic; zero
    // denominators (degenerate constant series) yield NULL.
    "ts_pacf" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // both sides of the lag alignment
        val a = hourly
          .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
        val b = hourly.select(col("event_type").as("et2"),
          col("h").as("hb"), col("c").as("cb"))
        val r = a.join(b, col("event_type") === col("et2") &&
            col("hb") === col("h") + col("k"))
          .groupBy("event_type", "k")
          .agg(round(corr("c", "cb"), 4).as("r"))
        val piv = r.groupBy("event_type")
          .agg(max(when(col("k") === 1, col("r"))).as("r1"),
               max(when(col("k") === 2, col("r"))).as("r2"),
               max(when(col("k") === 3, col("r"))).as("r3"))
        piv
          .withColumn("d2", lit(1.0) - col("r1") * col("r1"))
          .withColumn("p22", when(col("d2") =!= 0,
            round((col("r2") - col("r1") * col("r1")) / col("d2"), 6)))
          .withColumn("p21", round(col("r1") - col("p22") * col("r1"), 6))
          .withColumn("d3",
            lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2"))
          .withColumn("p33", when(col("d3") =!= 0,
            round((col("r3") - col("p21") * col("r2") - col("p22") * col("r1"))
              / col("d3"), 6)))
          .select(col("event_type"),
            round(col("r1"), 4).as("pacf_1"),
            round(col("p22"), 4).as("pacf_2"),
            round(col("p33"), 4).as("pacf_3"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, ts // 3600000000000 AS h,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |l AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
             |p AS (SELECT a.event_type, l.k, a.c AS ca, b.c AS cb
             |      FROM hourly a CROSS JOIN l
             |      JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + l.k),
             |r AS (SELECT event_type, k, round(corr(ca, cb), 4) AS r
             |      FROM p GROUP BY event_type, k),
             |piv AS (SELECT event_type,
             |               max(CASE WHEN k = 1 THEN r END) AS r1,
             |               max(CASE WHEN k = 2 THEN r END) AS r2,
             |               max(CASE WHEN k = 3 THEN r END) AS r3
             |        FROM r GROUP BY event_type),
             |s1 AS (SELECT *, 1.0 - r1*r1 AS d2 FROM piv),
             |s2 AS (SELECT *, CASE WHEN d2 <> 0
             |              THEN round((r2 - r1*r1) / d2, 6) END AS p22
             |       FROM s1),
             |s3 AS (SELECT *, round(r1 - p22*r1, 6) AS p21 FROM s2),
             |s4 AS (SELECT *, 1.0 - p21*r1 - p22*r2 AS d3 FROM s3),
             |s5 AS (SELECT *, CASE WHEN d3 <> 0
             |              THEN round((r3 - p21*r2 - p22*r1) / d3, 6) END AS p33
             |       FROM s4)
             |SELECT event_type, round(r1, 4) AS pacf_1, round(p22, 4) AS pacf_2,
             |       round(p33, 4) AS pacf_3
             |FROM s5 ORDER BY event_type""".stripMargin)),

    // Theil's U2 forecast-quality ratio per type: the trailing-7-day
    // mean (ts_backtest's model) scored against the no-change naive
    // forecast — U2 < 1 is the only evidence a forecasting model has
    // earned its complexity. ONE daily rollup; both forecasts are
    // per-type windows over O(days) rows; integer count sums make
    // every residual engine-exact before the 4dp output round.
    "ts_theil_u" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val wf = w.rowsBetween(-7, -1)
        val scored = daily
          .withColumn("f", when(count(lit(1)).over(wf) === 7, avg("y").over(wf)))
          .withColumn("yl", lag("y", 1).over(w))
          .filter(col("f").isNotNull && col("yl").isNotNull)
        scored.groupBy("event_type")
          .agg(count(lit(1)).as("n_scored"),
               sum(pow(col("f") - col("y"), 2)).as("sm"),
               sum(pow(col("yl") - col("y"), 2)).as("sn"))
          .select(col("event_type"), col("n_scored"),
            round(sqrt(col("sm") / col("n_scored")), 4).as("rmse_model"),
            round(sqrt(col("sn") / col("n_scored")), 4).as("rmse_naive"),
            when(col("sn") > 0, round(sqrt(col("sm") / col("sn")), 4))
              .as("theil_u2"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |sc AS (SELECT event_type, y,
             |         CASE WHEN count(*) OVER w7 = 7
             |              THEN avg(y) OVER w7 END AS f,
             |         lag(y) OVER (PARTITION BY event_type ORDER BY day) AS yl
             |       FROM daily
             |       WINDOW w7 AS (PARTITION BY event_type ORDER BY day
             |                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
             |       round(sqrt(sum((f - y)*(f - y)) / count(*)), 4) AS rmse_model,
             |       round(sqrt(sum((yl - y)*(yl - y)) / count(*)), 4) AS rmse_naive,
             |       CASE WHEN sum((yl - y)*(yl - y)) > 0
             |            THEN round(sqrt(sum((f - y)*(f - y))
             |                       / sum((yl - y)*(yl - y))), 4)
             |       END AS theil_u2
             |FROM sc WHERE f IS NOT NULL AND yl IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Wald-Wolfowitz runs test per type: are the daily up/down moves
    // random, or does the series trend/oscillate beyond chance? Signs
    // come from one lag window on the daily rollup (zero-change days
    // dropped, standard practice); the run count is a second bounded
    // window over the nonzero signs; z uses the exact run-count
    // moments and p the shared A&S erfc. Everything after the rollup
    // is O(days) per type.
    "ts_runs_test" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val sg = daily
          .withColumn("dlt", col("c") - lag("c", 1).over(w))
          .filter(col("dlt").isNotNull && col("dlt") =!= 0)
          .withColumn("sgn", when(col("dlt") > 0, 1L).otherwise(-1L))
        val runs = sg
          .withColumn("ps", lag("sgn", 1).over(w))
          .groupBy("event_type")
          .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_up"),
               sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_down"),
               (sum(when(col("ps").isNotNull && col("ps") =!= col("sgn"), 1L)
                 .otherwise(0L)) + 1).as("n_runs"))
        val nn = (col("n_up") + col("n_down")).cast("double")
        val p2 = lit(2.0) * col("n_up") * col("n_down")
        val mu = p2 / nn + 1.0
        val s2 = p2 * (p2 - nn) / (nn * nn * (nn - 1.0))
        val zc = runs
          .withColumn("z",
            when(col("n_up") > 0 && col("n_down") > 0 && nn > 1 && s2 > 0,
              round((col("n_runs") - mu) / sqrt(s2), 4)))
        val xx = abs(col("z")) / sqrt(lit(2.0))
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        zc.select(col("event_type"), col("n_up"), col("n_down"), col("n_runs"),
            col("z"),
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
                + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
                + t1 * lit(1.061405429)))))
              * exp(-xx * xx), 6)).as("p_value"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |df AS (SELECT event_type, day,
             |         c - lag(c) OVER (PARTITION BY event_type ORDER BY day) AS dlt
             |       FROM daily),
             |sg AS (SELECT event_type, day,
             |         CASE WHEN dlt > 0 THEN 1 ELSE -1 END AS sgn
             |       FROM df WHERE dlt IS NOT NULL AND dlt <> 0),
             |rn AS (SELECT event_type,
             |         CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             |         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
             |         CAST(sum(CASE WHEN ps IS NOT NULL AND ps <> sgn
             |                       THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
             |       FROM (SELECT event_type, sgn,
             |               lag(sgn) OVER (PARTITION BY event_type ORDER BY day) AS ps
             |             FROM sg)
             |       GROUP BY event_type),
             |zc AS (SELECT *,
             |         CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down > 1
             |               AND 2.0*n_up*n_down * (2.0*n_up*n_down - (n_up + n_down))
             |                   / (CAST(n_up + n_down AS DOUBLE)
             |                      * (n_up + n_down) * (n_up + n_down - 1.0)) > 0
             |              THEN round((n_runs - (2.0*n_up*n_down
             |                          / CAST(n_up + n_down AS DOUBLE) + 1.0))
             |                / sqrt(2.0*n_up*n_down
             |                       * (2.0*n_up*n_down - (n_up + n_down))
             |                       / (CAST(n_up + n_down AS DOUBLE)
             |                          * (n_up + n_down) * (n_up + n_down - 1.0))), 4)
             |         END AS z
             |       FROM rn),
             |pv AS (SELECT *, abs(z) / sqrt(2.0) AS xx,
             |              1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t1
             |       FROM zc)
             |SELECT event_type, n_up, n_down, n_runs, z,
             |       CASE WHEN z IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p_value
             |FROM pv ORDER BY event_type""".stripMargin)),

    // Engle-Granger cointegration check clicks ↔ purchases: OLS the
    // two daily series against each other, then a lag-0 Dickey-Fuller
    // regression of Δe on e_{t-1} over the residuals — a deeply
    // negative t says the series share a common trend (forecast one
    // from the other), near-zero says the relation is spurious. The
    // residual pass reuses the PINNED (rounded-6) OLS coefficients;
    // lag alignment is the Granger day=day+1 equi-join (no window).
    "ts_cointegration" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("y"),
               sum(when(col("event_type") === "click", 1L).otherwise(0L))
                 .cast("double").as("x"))
          .localCheckpoint(eager = false) // OLS + residual + alignment
        val cf = daily.agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
          .filter(col("dx") > 0)
          .select(col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) / col("dx"), 6)
              .as("beta"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / col("dx") * col("sx")) / col("n"), 6).as("alpha"))
        val e = daily.crossJoin(broadcast(cf))
          .select(col("day"), col("n"),
            (col("y") - col("alpha") - col("beta") * col("x")).as("e"),
            col("beta"))
          .localCheckpoint(eager = false) // both sides of the lag join
        val prev = e.select(col("day").as("dp"), col("e").as("el"))
        val adf = e.join(prev, col("dp") === col("day") - 1)
          .agg(max("n").as("n"), max("beta").as("beta"),
               count(lit(1)).cast("double").as("m"),
               sum(col("el") * (col("e") - col("el"))).as("sed"),
               sum(col("el") * col("el")).as("see"),
               sum(col("e") * col("e")).as("s2"),
               sum(col("e") * col("el")).as("sel"))
        adf.withColumn("rho", when(col("see") > 0, col("sed") / col("see")))
          .withColumn("rss",
            col("s2") - lit(2.0) * (lit(1.0) + col("rho")) * col("sel")
              + pow(lit(1.0) + col("rho"), 2) * col("see"))
          .withColumn("se2",
            when(col("m") > 1 && col("see") > 0,
              col("rss") / (col("m") - 1) / col("see")))
          .select(col("n").cast("long").as("n_days"), col("beta"),
            round(col("rho"), 6).as("rho"),
            when(col("se2") > 0, round(col("rho") / sqrt(col("se2")), 4))
              .as("adf_t"),
            when(col("se2") > 0,
              (col("rho") / sqrt(col("se2")) < -2.86).cast("long"))
              .as("cointegrated_05"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS x
             |  FROM events GROUP BY 1),
             |cf AS (SELECT n, round((n*sxy - sx*sy) / dx, 6) AS beta,
             |              round((sy - (n*sxy - sx*sy) / dx * sx) / n, 6) AS alpha
             |       FROM (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
             |                    sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy,
             |                    count(*) * sum(x*x) - sum(x) * sum(x) AS dx
             |             FROM daily)
             |       WHERE dx > 0),
             |e AS (SELECT day, n, beta, y - alpha - beta * x AS e
             |      FROM daily, cf),
             |p AS (SELECT a.n, a.beta, a.e, b.e AS el
             |      FROM e a JOIN e b ON b.day = a.day - 1),
             |ag AS (SELECT max(n) AS n, max(beta) AS beta,
             |              CAST(count(*) AS DOUBLE) AS m,
             |              sum(el * (e - el)) AS sed, sum(el * el) AS see,
             |              sum(e * e) AS s2, sum(e * el) AS sel
             |       FROM p),
             |rr AS (SELECT *, CASE WHEN see > 0 THEN sed / see END AS rho FROM ag),
             |rs AS (SELECT *,
             |         s2 - 2.0 * (1.0 + rho) * sel + (1.0 + rho) * (1.0 + rho) * see AS rss
             |       FROM rr),
             |sz AS (SELECT *, CASE WHEN m > 1 AND see > 0
             |              THEN rss / (m - 1) / see END AS se2
             |       FROM rs)
             |SELECT CAST(n AS BIGINT) AS n_days, beta, round(rho, 6) AS rho,
             |       CASE WHEN se2 > 0 THEN round(rho / sqrt(se2), 4) END AS adf_t,
             |       CASE WHEN se2 > 0 THEN
             |         CAST(CASE WHEN rho / sqrt(se2) < -2.86 THEN 1 ELSE 0 END AS BIGINT)
             |       END AS cointegrated_05
             |FROM sz""".stripMargin)),

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
             |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )

  val tsQB: Seq[(String, Q)] = Seq(
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

    // last-observation-carried-forward imputation per user (the
    // telemetry-gap filler next to ts_gap_fill's dense spine):
    // Spark's last(ignoreNulls) over the per-user ordered frame ==
    // DuckDB's last_value IGNORE NULLS — no self-join, no fact-scale
    // state beyond the running window. Per-user rollup keeps the
    // report bounded.
    "ts_locf" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, d).filter(col("user_id") < 20)
          .withColumn("filled", last(col("value"), ignoreNulls = true).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
            sum(when(col("value").isNull && col("filled").isNotNull, 1L)
              .otherwise(0L)).as("n_filled"),
            round(sum("filled"), 4).as("sum_filled"))
          .orderBy("user_id")
      },
      Some("""WITH f AS (
             |  SELECT user_id, value,
             |         last_value(value IGNORE NULLS) OVER (
             |           PARTITION BY user_id ORDER BY ts, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
             |  FROM events WHERE user_id < 20)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |       CAST(sum(CASE WHEN value IS NULL AND filled IS NOT NULL
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
             |       round(sum(filled), 4) AS sum_filled
             |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Theil–Sen robust trend of daily purchase counts — the slope
    // ESTIMATOR to ts_mann_kendall's trend TEST: median of all
    // pairwise slopes over the calendar-bounded daily frame (days²
    // pairs of a ≤100-row frame — never fact-scale), immune to the
    // spike that drags OLS. Median by the type-7 percentile parity.
    "ts_theil_sen" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val pairs = daily.toDF("d1", "y1")
          .join(daily.toDF("d2", "y2"), col("d1") < col("d2"))
          .select(((col("y2") - col("y1")) /
            (col("d2") - col("d1")).cast("double")).as("slope"))
        pairs.agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope, 0.5D)"), 4).as("ts_slope"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |p AS (SELECT (b.y - a.y) / CAST(b.day - a.day AS DOUBLE) AS slope
             |      FROM daily a JOIN daily b ON a.day < b.day)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |       round(quantile_cont(slope, 0.5), 4) AS ts_slope
             |FROM p""".stripMargin)),

    // SAX symbolization of the hourly event-rate series (Lin et al.
    // 2003): per-type z-normalize, PAA over 4-hour frames, map to a
    // 4-symbol alphabet at the N(0,1) quartile breakpoints ±0.6745,
    // and report each type's 3 most common daily words — the motif
    // view behind cheap whole-series indexing/anomaly grouping.
    // Hourly counts are exact ints; μ is an exact int mean; only the
    // σ pass sums rounded-mean deviations (round-6 absorbed).
    "ts_sax" -> Q(
      (s, d) => {
        val hc = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 3600000000000").as("hr"))
          .agg(count(lit(1)).cast("double").as("c"))
        // r17: μ and σ become full-partition windows on the per-type
        // exchange the plan needs anyway, and ride the PAA groupBy as
        // max() of a per-type constant — replacing the checkpoint, the
        // two aggregate jobs and their broadcast join-backs (guide
        // §2.4). Every groupBy downstream keys on a superset of
        // event_type, so ONE exchange serves the entire tail. Same μ/σ
        // values (round-6 pins the trajectory, as the oracle's
        // different summation order already requires).
        val wt = Window.partitionBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val hs = hc.withColumn("mu", round(avg("c").over(wt), 6))
          .withColumn("sd", round(sqrt(
            avg((col("c") - col("mu")) * (col("c") - col("mu"))).over(wt)), 6))
        val sym = hs
          .groupBy(col("event_type"), expr("hr div 24").as("day"),
            expr("(hr % 24) div 4").as("slot"))
          .agg(avg("c").as("pc"), max("mu").as("mu"), max("sd").as("sd"))
          .withColumn("z", round((col("pc") - col("mu"))
            / nullif(col("sd"), lit(0.0)), 4))
          .withColumn("sym", when(col("z") < -0.6745, "a")
            .when(col("z") < 0, "b").when(col("z") < 0.6745, "c")
            .otherwise("d"))
        val words = sym.groupBy("event_type", "day")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("slot"), col("sym")))),
            x => x.getField("sym")), "").as("word"))
          .groupBy("event_type", "word")
          .agg(count(lit(1)).as("n_days"))
        words.withColumn("rk", row_number().over(Window
            .partitionBy("event_type")
            .orderBy(col("n_days").desc, col("word"))))
          .filter(col("rk") <= 3)
          .select(col("event_type"), col("word"), col("n_days"))
          .orderBy(col("event_type"), col("n_days").desc, col("word"))
      },
      Some("""WITH hc AS (
             |  SELECT event_type, ts // 3600000000000 AS hr,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT event_type, round(avg(c), 6) AS mu
             |       FROM hc GROUP BY 1),
             |s2 AS (SELECT h.event_type,
             |              round(sqrt(avg((c - mu) * (c - mu))), 6) AS sd,
             |              max(mu) AS mu
             |       FROM hc h JOIN st USING (event_type) GROUP BY 1),
             |paa AS (SELECT event_type, hr // 24 AS day,
             |               (hr % 24) // 4 AS slot, avg(c) AS pc
             |        FROM hc GROUP BY 1, 2, 3),
             |z AS (SELECT p.event_type, day, slot,
             |             round((pc - mu) / nullif(sd, 0.0), 4) AS z
             |      FROM paa p JOIN s2 USING (event_type)),
             |sym AS (SELECT event_type, day, slot,
             |               CASE WHEN z < -0.6745 THEN 'a'
             |                    WHEN z < 0 THEN 'b'
             |                    WHEN z < 0.6745 THEN 'c'
             |                    ELSE 'd' END AS sym
             |        FROM z),
             |words AS (SELECT event_type, day,
             |                 string_agg(sym, '' ORDER BY slot) AS word
             |          FROM sym GROUP BY 1, 2),
             |wc AS (SELECT event_type, word,
             |              CAST(count(*) AS BIGINT) AS n_days
             |       FROM words GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
             |                 ORDER BY n_days DESC, word) AS rk
             |       FROM wc)
             |SELECT event_type, word, n_days FROM rk WHERE rk <= 3
             |ORDER BY event_type, n_days DESC, word""".stripMargin)),

    // Local-maximum peak detection with an INTEGER prominence gate on
    // daily counts per type: a day is a peak when it beats both
    // neighbors and c·(k−1)·10 ≥ 12·(Σ±3 − c) — i.e. ≥1.2× its
    // excluded-self ±3-day neighborhood mean, compared in exact
    // integer arithmetic so the gate can never flake. The event-
    // detection companion to ts_hampel (outliers) and ts_seasonal
    // (baseline deviations); windows are type-partitioned.
    "ts_peak_detect" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val wo = Window.partitionBy("event_type").orderBy("day")
        val wn = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-3, 3)
        daily
          .withColumn("pl", lag("c", 1).over(wo))
          .withColumn("pn", lead("c", 1).over(wo))
          .withColumn("ns", sum("c").over(wn))
          .withColumn("nk", count(lit(1)).over(wn))
          .filter(col("pl").isNotNull && col("pn").isNotNull &&
            col("c") > col("pl") && col("c") > col("pn") &&
            col("nk") > 1 &&
            col("c") * (col("nk") - 1) * 10 >= (col("ns") - col("c")) * 12)
          .select(col("event_type"), col("day"), col("c").as("n_events"),
            round(col("c") * (col("nk") - 1)
              / (col("ns") - col("c")).cast("double"), 4).as("prominence"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |w AS (SELECT *,
             |        lag(c) OVER (PARTITION BY event_type ORDER BY day) AS pl,
             |        lead(c) OVER (PARTITION BY event_type ORDER BY day) AS pn,
             |        CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
             |          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS ns,
             |        CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
             |          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS nk
             |      FROM daily)
             |SELECT event_type, day, c AS n_events,
             |       round(c * (nk - 1) / CAST(ns - c AS DOUBLE), 4)
             |         AS prominence
             |FROM w
             |WHERE pl IS NOT NULL AND pn IS NOT NULL
             |  AND c > pl AND c > pn AND nk > 1
             |  AND c * (nk - 1) * 10 >= (ns - c) * 12
             |ORDER BY event_type, day""".stripMargin)),

    // Holt double exponential smoothing (level + linear trend,
    // α=0.3, β=0.1) of the daily event count, with a 7-day-ahead
    // forecast and one-step RMSE — the trend-aware forecaster beside
    // ts_backtest's seasonal-naive and ev_ewma_bounded's level-only
    // smoother. The series is calendar-bounded, so the fold runs
    // driver-side on the collected days (graph_pagerank altitude),
    // 7dp-pinned per step and mirrored by an unrolled CTE chain.
    "ts_holt_linear" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.embed.CovMoments.r
        val series = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("v"))
          .orderBy("day").collect()
          .map(row => row.getLong(1).toDouble)
        if (series.isEmpty)
          Seq.empty[(Long, Double, Double, Double, Double)]
            .toDF("n_days", "level", "trend", "forecast_7d", "rmse_1step")
        else {
          var l = series.head; var b = 0.0; var sse = 0.0
          series.tail.foreach { x =>
            val pred = l + b
            sse = r(sse + (x - pred) * (x - pred), 7)
            val lNew = r(0.3 * x + 0.7 * (l + b), 7)
            b = r(0.1 * (lNew - l) + 0.9 * b, 7)
            l = lNew
          }
          val n = series.length
          val rmse = if (n > 1) r(math.sqrt(sse / (n - 1)), 4) else 0.0
          Seq((n.toLong, r(l, 4), r(b, 4), r(l + 7 * b, 4), rmse))
            .toDF("n_days", "level", "trend", "forecast_7d", "rmse_1step")
        }
      },
      Some(s"""WITH daily AS (
              |  SELECT ts // 86400000000000 AS day,
              |         CAST(count(*) AS BIGINT) AS v
              |  FROM events GROUP BY 1),
              |dd AS (SELECT v, row_number() OVER (ORDER BY day) AS rn
              |       FROM daily),
              |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dd),
              |st1 AS (SELECT CAST(v AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b,
              |               CAST(0 AS DOUBLE) AS sse
              |        FROM dd WHERE rn = 1),
              |${holtIterSql(30)}
              |SELECT n AS n_days, round(l, 4) AS level, round(b, 4) AS trend,
              |       round(l + 7 * b, 4) AS forecast_7d,
              |       CASE WHEN n > 1 THEN round(sqrt(sse / (n - 1)), 4)
              |            ELSE 0.0 END AS rmse_1step
              |FROM st30, nn""".stripMargin)),

    // Piecewise-linear trend around the Pettitt changepoint: locate
    // the break on the daily purchase series (the ts_pettitt argmax),
    // then fit an exact-integer OLS slope to each side — "how fast
    // was it moving before vs after the break", the effect-size
    // companion to ts_pettitt's detection p-value. Day frame is
    // calendar-bounded; slopes come off exact BIGINT sums.
    "ts_segmented_trend" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("v"))
          .localCheckpoint(eager = false) // pettitt pair frame + segments
        val st = daily.select(col("day").as("t"), col("v").as("vt"))
          .crossJoin(daily.select(col("v").as("vj")))
          .groupBy("t")
          .agg(sum(signum(col("vt") - col("vj"))).cast("long").as("s"))
        val w = Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cp = st.withColumn("u", sum("s").over(w))
          .withColumn("au", abs(col("u")))
          .orderBy(col("au").desc, col("t")).limit(1)
          .select(col("t").as("cp"))
        daily.crossJoin(broadcast(cp))
          .withColumn("seg",
            when(col("day") <= col("cp"), "pre").otherwise("post"))
          .groupBy("seg")
          .agg(max("cp").as("cp_day"), count(lit(1)).as("n_days"),
            sum("day").as("sx"), sum("v").as("sy"),
            sum(col("day") * col("v")).as("sxy"),
            sum(col("day") * col("day")).as("sx2"))
          .select(col("seg"), col("cp_day"), col("n_days"),
            round((col("n_days") * col("sxy") - col("sx") * col("sy"))
              .cast("double")
              / (col("n_days") * col("sx2") - col("sx") * col("sx"))
                .cast("double"), 6).as("slope"),
            round(col("sy") / col("n_days").cast("double"), 4)
              .as("mean_level"))
          .orderBy(col("seg").desc) // pre before post
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS v
             |  FROM events GROUP BY 1),
             |s AS (SELECT a.day AS t, CAST(sum(sign(a.v - b.v)) AS BIGINT) AS s
             |      FROM daily a CROSS JOIN daily b GROUP BY a.day),
             |u AS (SELECT t, CAST(sum(s) OVER (ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |        AS BIGINT) AS u
             |      FROM s),
             |cp AS (SELECT t AS cp FROM u ORDER BY abs(u) DESC, t LIMIT 1),
             |seg AS (SELECT CASE WHEN day <= cp THEN 'pre' ELSE 'post' END
             |          AS seg, cp, day, v
             |        FROM daily, cp),
             |f AS (SELECT seg, CAST(max(cp) AS BIGINT) AS cp_day,
             |             CAST(count(*) AS BIGINT) AS n_days,
             |             CAST(sum(day) AS BIGINT) AS sx,
             |             CAST(sum(v) AS BIGINT) AS sy,
             |             CAST(sum(day * v) AS BIGINT) AS sxy,
             |             CAST(sum(day * day) AS BIGINT) AS sx2
             |      FROM seg GROUP BY 1)
             |SELECT seg, cp_day, n_days,
             |       round(CAST(n_days * sxy - sx * sy AS DOUBLE)
             |             / CAST(n_days * sx2 - sx * sx AS DOUBLE), 6)
             |         AS slope,
             |       round(sy / CAST(n_days AS DOUBLE), 4) AS mean_level
             |FROM f ORDER BY seg DESC""".stripMargin)),

    // Schuster periodogram of the daily event count at harmonics
    // k = 1..14 — the full spectral profile beside ts_goertzel's
    // single probe and ts_spectral_entropy's scalar. t = day − min
    // (broadcast, no rank window), span n = max−min+1, so gapped
    // calendars keep honest phases; A/B sums are pinned to 6dp before
    // squaring so the libm-vs-JDK cos ulp never reaches the output.
    "ts_periodogram" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("v"))
        val span = daily.agg(min("day").as("d0"),
          (max("day") - min("day") + 1).as("n"))
        daily.crossJoin(broadcast(span))
          .withColumn("t", (col("day") - col("d0")).cast("double"))
          .crossJoin(s.range(1, 15).toDF("k"))
          .withColumn("arg",
            lit(2.0) * lit(math.Pi) * col("k") * col("t") / col("n"))
          .groupBy("k", "n")
          .agg(round(sum(col("v") * cos(col("arg"))), 6).as("a"),
            round(sum(col("v") * sin(col("arg"))), 6).as("b"))
          .select(col("k"), round(col("n") / col("k").cast("double"), 2)
              .as("period_days"),
            round((col("a") * col("a") + col("b") * col("b")) / col("n"), 4)
              .as("power"))
          .orderBy("k")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS v
             |  FROM events GROUP BY 1),
             |span AS (SELECT min(day) AS d0,
             |                CAST(max(day) - min(day) + 1 AS BIGINT) AS n
             |         FROM daily),
             |g AS (SELECT k, n,
             |        round(sum(v * cos(2.0 * pi() * k * CAST(day - d0 AS DOUBLE) / n)), 6) AS a,
             |        round(sum(v * sin(2.0 * pi() * k * CAST(day - d0 AS DOUBLE) / n)), 6) AS b
             |      FROM daily, span,
             |           (SELECT unnest(generate_series(1, 14)) AS k)
             |      GROUP BY 1, 2)
             |SELECT CAST(k AS BIGINT) AS k,
             |       round(n / CAST(k AS DOUBLE), 2) AS period_days,
             |       round((a * a + b * b) / n, 4) AS power
             |FROM g ORDER BY k""".stripMargin)),

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
             |FROM f ORDER BY day""".stripMargin)),

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
             |FROM g ORDER BY day""".stripMargin))
  )

  val tsQC: Seq[(String, Q)] = Seq(
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

    // Bandt–Pompe permutation entropy of the daily series per event
    // type (order-3 ordinal patterns from two leads, comparison-coded
    // so ties are deterministic): the model-free complexity score —
    // low H = predictable rhythm, high H = noise — beside
    // ts_spectral_entropy's frequency view, but robust to any
    // monotone transform of the counts. Pattern counts are exact
    // integers; each c·ln c term is pinned to micro-units before the
    // sum (the text_entropy altitude).
    "ts_perm_entropy" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val w = Window.partitionBy("event_type").orderBy("day")
        val pat = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("x2", lead("x", 1).over(w))
          .withColumn("x3", lead("x", 2).over(w))
          .filter(col("x3").isNotNull)
          .select(col("event_type"),
            (when(col("x") < col("x2"), 4L).otherwise(0L)
              + when(col("x2") < col("x3"), 2L).otherwise(0L)
              + when(col("x") < col("x3"), 1L).otherwise(0L)).as("pat"))
          .groupBy("event_type", "pat")
          .agg(count(lit(1)).as("c"))
        pat.groupBy("event_type")
          .agg(sum(col("c")).as("n"),
            count(lit(1)).as("n_patterns"),
            sum(round(col("c") * log(col("c").cast("double")) * 1e6, 0)
              .cast(dec)).as("sclc"))
          .select(col("event_type"), col("n").as("n_windows"),
            col("n_patterns"),
            round(log(col("n").cast("double"))
              - col("sclc").cast("double") / 1e6 / col("n"), 6)
              .as("perm_entropy"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |tri AS (
             |  SELECT event_type, x,
             |         lead(x, 1) OVER w AS x2, lead(x, 2) OVER w AS x3
             |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
             |pat AS (
             |  SELECT event_type,
             |         (CASE WHEN x < x2 THEN 4 ELSE 0 END
             |          + CASE WHEN x2 < x3 THEN 2 ELSE 0 END
             |          + CASE WHEN x < x3 THEN 1 ELSE 0 END) AS pat,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM tri WHERE x3 IS NOT NULL GROUP BY 1, 2)
             |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_windows,
             |       CAST(count(*) AS BIGINT) AS n_patterns,
             |       round(ln(CAST(sum(c) AS DOUBLE))
             |             - CAST(sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1e6)
             |                   AS BIGINT)) AS DOUBLE) / 1e6 / sum(c), 6)
             |         AS perm_entropy
             |FROM pat GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // AR(2) one-step backtest vs seasonal-naive: Yule–Walker params
    // frozen on the first ⅔ of the calendar, one-step forecasts
    // scored on the rest against the x_{t−7} baseline — "does volume
    // momentum beat just reading last week". Lags come from
    // day-arithmetic equi-joins (the ts_acf idiom, no window over the
    // series); AR errors are pinned to micro-units and snaive errors
    // are exact integers, so both RMSEs are exact-sum arithmetic.
    "ts_backtest_ar2" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // train fit + test joins
        val span = daily.agg(min("day").as("mn"), max("day").as("mx"))
          .select(expr("mn + (mx - mn) * 2 div 3").as("cut"))
        val train = daily.crossJoin(broadcast(span))
          .filter(col("day") <= col("cut"))
          .localCheckpoint(eager = false) // moments + lag joins
        val g = train.agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("s1"),
          sum((col("x") * col("x")).cast(dec)).as("s2"))
        val a = train.withColumn("k", explode(array(lit(1L), lit(2L))))
        val bb = train.select(col("day").as("db"), col("x").as("xb"))
        val rk = a.join(bb, col("db") === col("day") + col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("m"),
            sum((col("x") * col("xb")).cast(dec)).as("sxy"),
            sum(col("x").cast(dec)).as("sa"),
            sum(col("xb").cast(dec)).as("sb"))
          .crossJoin(broadcast(g))
          .select(col("k"),
            round((col("n") * col("n") * col("sxy")
              - col("n") * col("s1") * (col("sa") + col("sb"))
              + col("m") * col("s1") * col("s1")).cast("double")
              / (col("n") * (col("n") * col("s2") - col("s1") * col("s1")))
                .cast("double"), 6).as("r"))
        val fit = rk.filter(col("k") === 1).select(col("r").as("r1"))
          .crossJoin(rk.filter(col("k") === 2).select(col("r").as("r2")))
          .crossJoin(broadcast(g.select(
            round(col("s1").cast("double") / col("n"), 6).as("mu"))))
          .select(col("mu"),
            round(col("r1") * (lit(1.0) - col("r2"))
              / (lit(1.0) - col("r1") * col("r1")), 6).as("phi1"),
            round((col("r2") - col("r1") * col("r1"))
              / (lit(1.0) - col("r1") * col("r1")), 6).as("phi2"))
        val l1 = daily.select(col("day").as("d1"), col("x").as("xl1"))
        val l2 = daily.select(col("day").as("d2"), col("x").as("xl2"))
        val l7 = daily.select(col("day").as("d7"), col("x").as("xl7"))
        daily.crossJoin(broadcast(span))
          .filter(col("day") > col("cut"))
          .join(l1, col("d1") === col("day") - 1)
          .join(l2, col("d2") === col("day") - 2)
          .join(l7, col("d7") === col("day") - 7)
          .crossJoin(broadcast(fit))
          .select(col("x"), col("xl7"),
            round((col("x") - (col("mu")
              + col("phi1") * (col("xl1") - col("mu"))
              + col("phi2") * (col("xl2") - col("mu")))) * 1e3, 0)
              .cast("long").as("em")) // AR error in milli-units
          .agg(count(lit(1)).as("n_test"),
            sum((col("em") * col("em")).cast(dec)).as("se_ar"),
            sum(((col("x") - col("xl7")) * (col("x") - col("xl7"))).cast(dec))
              .as("se_sn"))
          .select(col("n_test"),
            round(sqrt(col("se_ar").cast("double") / col("n_test")) / 1e3, 4)
              .as("rmse_ar2"),
            round(sqrt(col("se_sn").cast("double") / col("n_test")), 4)
              .as("rmse_snaive"))
          .withColumn("skill",
            round(lit(1.0) - col("rmse_ar2") / col("rmse_snaive"), 4))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |sp AS (SELECT min(day) + (max(day) - min(day)) * 2 // 3 AS cut
             |       FROM daily),
             |train AS (SELECT d.* FROM daily d, sp WHERE d.day <= sp.cut),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS s1,
             |             sum(x * x) AS s2 FROM train),
             |l AS (SELECT CAST(unnest([1, 2]) AS BIGINT) AS k),
             |rk AS (
             |  SELECT l.k,
             |         round(CAST(g.n * g.n * sum(a.x * b.x)
             |               - g.n * g.s1 * (sum(a.x) + sum(b.x))
             |               + count(*) * g.s1 * g.s1 AS DOUBLE)
             |           / CAST(g.n * (g.n * g.s2 - g.s1 * g.s1) AS DOUBLE), 6) AS r
             |  FROM train a CROSS JOIN l
             |  JOIN train b ON b.day = a.day + l.k, g
             |  GROUP BY l.k, g.n, g.s1, g.s2),
             |fit AS (
             |  SELECT round(CAST(g.s1 AS DOUBLE) / g.n, 6) AS mu,
             |         round(a.r * (1.0 - b.r) / (1.0 - a.r * a.r), 6) AS phi1,
             |         round((b.r - a.r * a.r) / (1.0 - a.r * a.r), 6) AS phi2
             |  FROM (SELECT r FROM rk WHERE k = 1) a,
             |       (SELECT r FROM rk WHERE k = 2) b, g),
             |test AS (
             |  SELECT d.x, l7.x AS xl7,
             |         CAST(round((d.x - (f.mu + f.phi1 * (l1.x - f.mu)
             |           + f.phi2 * (l2.x - f.mu))) * 1e3) AS BIGINT) AS em
             |  FROM daily d
             |  JOIN daily l1 ON l1.day = d.day - 1
             |  JOIN daily l2 ON l2.day = d.day - 2
             |  JOIN daily l7 ON l7.day = d.day - 7, sp, fit f
             |  WHERE d.day > sp.cut)
             |SELECT CAST(count(*) AS BIGINT) AS n_test,
             |       round(sqrt(CAST(sum(em * em) AS DOUBLE) / count(*)) / 1e3, 4)
             |         AS rmse_ar2,
             |       round(sqrt(CAST(sum((x - xl7) * (x - xl7)) AS DOUBLE)
             |             / count(*)), 4) AS rmse_snaive,
             |       round(1.0 - round(sqrt(CAST(sum(em * em) AS DOUBLE)
             |               / count(*)) / 1e3, 4)
             |             / round(sqrt(CAST(sum((x - xl7) * (x - xl7)) AS DOUBLE)
             |               / count(*)), 4), 4) AS skill
             |FROM test""".stripMargin)),

    // Holt–Winters additive seasonal smoothing of daily volume
    // (α=.3 β=.1 γ=.2, period 7): level/trend/weekly-seasonal state,
    // initialized on the first two weeks, fitted one-step-ahead on
    // the rest — THE operational forecaster for anything with a
    // weekly pulse, completing ts_holt_linear (no seasonality) and
    // ts_seasonal (seasonality but no trend). Driver fold over the
    // calendar-bounded series with 6/7dp-pinned steps; the oracle is
    // the same trajectory as unrolled CTEs carrying the seasonal ring
    // as a list.
    "ts_holt_winters" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.embed.CovMoments.r
        val series = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("v"))
          .orderBy("day").collect().map(_.getLong(1).toDouble)
        val n = series.length
        if (n < 15)
          Seq.empty[(Long, Double, Double, Double, Double)]
            .toDF("n_days", "level", "trend", "forecast_next", "rmse_1step")
        else {
          val m1 = series.take(7).sum / 7
          val m2 = series.slice(7, 14).sum / 7
          var l = r(m2, 6)
          var b = r((m2 - m1) / 7.0, 6)
          var sArr = Array.tabulate(7)(i =>
            r(((series(i) - m1) + (series(i + 7) - m2)) / 2.0, 6))
          var sse = 0.0
          (14 until n).foreach { t =>
            val x = series(t)
            val pred = l + b + sArr(0)
            sse = r(sse + (x - pred) * (x - pred), 7)
            val lNew = r(0.3 * (x - sArr(0)) + 0.7 * (l + b), 6)
            val bNew = r(0.1 * (lNew - l) + 0.9 * b, 6)
            val sNew = r(0.2 * (x - lNew) + 0.8 * sArr(0), 6)
            sArr = sArr.drop(1) :+ sNew
            l = lNew; b = bNew
          }
          Seq((n.toLong, r(l, 4), r(b, 4), r(l + b + sArr(0), 4),
            r(math.sqrt(sse / (n - 14)), 4)))
            .toDF("n_days", "level", "trend", "forecast_next", "rmse_1step")
        }
      },
      Some(s"""WITH daily AS (
              |  SELECT ts // 86400000000000 AS day,
              |         CAST(count(*) AS BIGINT) AS v
              |  FROM events GROUP BY 1),
              |dd AS (SELECT v, row_number() OVER (ORDER BY day) AS rn FROM daily),
              |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dd),
              |ini AS (
              |  SELECT avg(CASE WHEN rn <= 7 THEN CAST(v AS DOUBLE) END) AS m1,
              |         avg(CASE WHEN rn BETWEEN 8 AND 14
              |                  THEN CAST(v AS DOUBLE) END) AS m2
              |  FROM dd),
              |sinit AS (
              |  SELECT list(round(((a.v - i.m1) + (b.v - i.m2)) / 2.0, 6)
              |              ORDER BY a.rn) AS s
              |  FROM dd a JOIN dd b ON b.rn = a.rn + 7, ini i
              |  WHERE a.rn <= 7),
              |st14 AS (SELECT round(i.m2, 6) AS l,
              |                round((i.m2 - i.m1) / 7.0, 6) AS b,
              |                CAST(0 AS DOUBLE) AS sse, sinit.s AS s
              |         FROM ini i, sinit),
              |${holtWintersIterSql(30)}
              |SELECT n AS n_days, round(l, 4) AS level, round(b, 4) AS trend,
              |       round(l + b + s[1], 4) AS forecast_next,
              |       round(sqrt(sse / (n - 14)), 4) AS rmse_1step
              |FROM st30, nn WHERE n >= 15""".stripMargin)),

    // Fano factor of hourly event counts per type over the DENSE hour
    // spine (empty hours are real zeros — the point-process
    // convention): variance-to-mean of window counts, the COUNT-side
    // dispersion signature beside ev_burstiness' gap-side B (Poisson
    // ⇒ 1, clumped ⇒ >1, regular ⇒ <1). Exact integer power sums into
    // one ratio.
    "ts_fano" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // spine bounds + the join
        val sp = hourly.agg(min("h").as("mn"), max("h").as("mx"))
        val grid = hourly.select("event_type").distinct()
          .crossJoin(broadcast(sp))
          .select(col("event_type"), explode(sequence(col("mn"), col("mx")))
            .as("h"))
        grid.join(hourly, Seq("event_type", "h"), "left")
          .na.fill(0L, Seq("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"),
            sum(col("x").cast(dec)).as("s1"),
            sum((col("x") * col("x")).cast(dec)).as("s2"))
          .filter(col("s1") > 0)
          .select(col("event_type"), col("n_hours"),
            round(col("s1").cast("double") / col("n_hours"), 4)
              .as("mean_per_hour"),
            round((col("n_hours") * col("s2") - col("s1") * col("s1"))
              .cast("double")
              / ((col("n_hours") - 1) * col("s1")).cast("double"), 4)
              .as("fano"))
          .orderBy("event_type")
      },
      Some("""WITH h AS (
             |  SELECT event_type, ts // 3600000000000 AS h,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |sp AS (SELECT min(h) AS mn, max(h) AS mx FROM h),
             |grid AS (
             |  SELECT t.event_type, unnest(range(sp.mn, sp.mx + 1)) AS hh
             |  FROM (SELECT DISTINCT event_type FROM h) t, sp),
             |d AS (SELECT g.event_type, coalesce(h.x, 0) AS x
             |      FROM grid g LEFT JOIN h
             |        ON h.event_type = g.event_type AND h.h = g.hh),
             |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             |             sum(x) AS s1, sum(x * x) AS s2
             |      FROM d GROUP BY event_type)
             |SELECT event_type, n_hours,
             |       round(CAST(s1 AS DOUBLE) / n_hours, 4) AS mean_per_hour,
             |       round(CAST(n_hours * s2 - s1 * s1 AS DOUBLE)
             |             / CAST((n_hours - 1) * s1 AS DOUBLE), 4) AS fano
             |FROM a WHERE s1 > 0 ORDER BY event_type""".stripMargin)),

    // Maximum drawdown of the daily-volume series: deepest drop from
    // a running peak, with the peak/trough days — the capacity/health
    // readout ("how bad did the worst slump get") beside ts_cusum's
    // changepoint view. Pure integer arithmetic: running max and the
    // gap are exact, tie-breaks pinned to the earliest day; the peak
    // day is recovered by an equi-join back on the exact peak value.
    "ts_drawdown" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // running max + peak lookup
        val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        val trough = daily
          .withColumn("runmax", max("x").over(w))
          .withColumn("dd", col("runmax") - col("x"))
          .orderBy(col("dd").desc, col("day")).limit(1)
          .select(col("day").as("trough_day"), col("x").as("trough_x"),
            col("runmax").as("peak_x"), col("dd").as("dd_abs"))
        daily.crossJoin(broadcast(trough))
          .filter(col("x") === col("peak_x") && col("day") <= col("trough_day"))
          .agg(min("day").as("peak_day"), first("trough_day").as("trough_day"),
            first("peak_x").as("peak_x"), first("trough_x").as("trough_x"),
            first("dd_abs").as("dd_abs"))
          .withColumn("dd_pct",
            round(col("dd_abs") / col("peak_x").cast("double"), 4))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |r AS (SELECT day, x,
             |        max(x) OVER (ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
             |      FROM daily),
             |t AS (SELECT day AS trough_day, x AS trough_x, runmax AS peak_x,
             |             runmax - x AS dd_abs
             |      FROM r ORDER BY runmax - x DESC, day LIMIT 1)
             |SELECT CAST(min(d.day) AS BIGINT) AS peak_day,
             |       t.trough_day, t.peak_x, t.trough_x, t.dd_abs,
             |       round(t.dd_abs / CAST(t.peak_x AS DOUBLE), 4) AS dd_pct
             |FROM daily d, t
             |WHERE d.x = t.peak_x AND d.day <= t.trough_day
             |GROUP BY t.trough_day, t.peak_x, t.trough_x, t.dd_abs""".stripMargin)),

    // Bollinger bands on daily volume: trailing 7-day mean ± 2σ with
    // breakout flags — the ops-dashboard "is today unusual given the
    // LAST WEEK" view, complementing ts_seasonal's fixed profile and
    // stat_page_hinkley's cumulative drift. Window sums are exact
    // integers (the band math divides identical integers on both
    // engines); days 1–6 have no band by construction.
    // Band arithmetic in exact integer units end-to-end: the sf3
    // flush caught round(mid + 2·sd, 4) landing on a .00005 display
    // boundary. mid is the exact half-up of s1/7 in 1e-4 units; sd
    // rides ⌊x·10⁶+0.5⌋ off the bit-equal sqrt (irrational); the
    // bands then combine and re-round as pure integer arithmetic, so
    // display AND the breakout compare are engine-identical. Caveat:
    // when a band numerator goes negative (sd > mid/2 makes lo < 0),
    // Spark DIV and DuckDB // both truncate toward ZERO, so the
    // negative-lo rounding is half-DOWN rather than half-up — still
    // bit-identical across engines (which is what the gate needs),
    // just not the half-up convention the positive range follows.
    "ts_bollinger" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val w = Window.orderBy("day").rowsBetween(-6, 0)
        daily
          .withColumn("cnt", count(lit(1)).over(w))
          .withColumn("s1", sum("x").over(w))
          .withColumn("s2", sum(col("x") * col("x")).over(w))
          .filter(col("cnt") === 7)
          .withColumn("mid_u", expr("(2 * s1 * 10000 + 7) DIV 14"))
          .withColumn("sd_u", floor(sqrt((lit(7) * col("s2") - col("s1") * col("s1"))
            .cast("double") / 42.0) * 1000000 + 0.5).cast("long"))
          .withColumn("lo_u", expr("(2 * (mid_u * 100 - 2 * sd_u) + 100) DIV 200"))
          .withColumn("hi_u", expr("(2 * (mid_u * 100 + 2 * sd_u) + 100) DIV 200"))
          .select(col("day"), col("x"),
            (col("mid_u").cast("double") / 10000.0).as("mid"),
            (col("lo_u").cast("double") / 10000.0).as("lo"),
            (col("hi_u").cast("double") / 10000.0).as("hi"),
            (col("x") * 10000 < col("lo_u") || col("x") * 10000 > col("hi_u"))
              .cast("long").as("breakout"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |r AS (
             |  SELECT day, x,
             |         count(*) OVER w AS cnt,
             |         sum(x) OVER w AS s1,
             |         sum(x * x) OVER w AS s2
             |  FROM daily
             |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
             |b AS (
             |  SELECT day, x,
             |         (2 * s1 * 10000 + 7) // 14 AS mid_u,
             |         CAST(floor(sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE) / 42.0)
             |                    * 1000000 + 0.5) AS BIGINT) AS sd_u
             |  FROM r WHERE cnt = 7),
             |u AS (
             |  SELECT day, x, mid_u,
             |         (2 * (mid_u * 100 - 2 * sd_u) + 100) // 200 AS lo_u,
             |         (2 * (mid_u * 100 + 2 * sd_u) + 100) // 200 AS hi_u
             |  FROM b)
             |SELECT day, x,
             |       CAST(mid_u AS DOUBLE) / 10000.0 AS mid,
             |       CAST(lo_u AS DOUBLE) / 10000.0 AS lo,
             |       CAST(hi_u AS DOUBLE) / 10000.0 AS hi,
             |       CAST(x * 10000 < lo_u OR x * 10000 > hi_u AS BIGINT) AS breakout
             |FROM u ORDER BY day""".stripMargin)),

    // Lo–MacKinlay variance-ratio test of daily log-volume changes at
    // q = 2, 4: VR ≈ 1 under a random walk, < 1 mean-reverting, > 1
    // trending — the econometric cousin of ts_hurst run as pure
    // aggregate arithmetic. Per-day log returns are pinned to integer
    // micro-units, q-period overlapping sums are exact integer window
    // sums over the calendar-bounded frame, and both variances divide
    // exact integers; z is the homoskedastic closed form.
    "ts_variance_ratio" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val wD = Window.orderBy("day")
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("xl", lag("x", 1).over(wD))
          .filter(col("xl").isNotNull && col("xl") > 0 && col("x") > 0)
          .select(col("day"),
            round((log(col("x").cast("double"))
              - log(col("xl").cast("double"))) * 1e6, 0).cast("long").as("r"))
          .localCheckpoint(eager = false) // base var + q-sums
        val base = daily.agg(count(lit(1)).as("n"),
          sum(col("r").cast(dec)).as("s1"),
          sum((col("r") * col("r")).cast(dec)).as("s2"))
        def vr(q: Int) = {
          val wQ = Window.orderBy("day").rowsBetween(-(q - 1), 0)
          daily
            .withColumn("c", count(lit(1)).over(wQ))
            .withColumn("sq", sum("r").over(wQ))
            .filter(col("c") === q)
            .agg(count(lit(1)).as("m"),
              sum(col("sq").cast(dec)).as("t1"),
              sum((col("sq") * col("sq")).cast(dec)).as("t2"))
            .crossJoin(broadcast(base))
            .select(lit(q.toLong).as("q"),
              col("n").as("n_returns"),
              round((col("m") * col("t2") - col("t1") * col("t1")).cast("double")
                / (col("m").cast("double") * (col("m") - 1)) / q
                / ((col("n") * col("s2") - col("s1") * col("s1")).cast("double")
                  / (col("n").cast("double") * (col("n") - 1))), 4).as("vr"))
            .withColumn("z", round((col("vr") - 1.0)
              / sqrt(lit(2.0 * (2 * q - 1) * (q - 1))
                / (lit(3.0 * q) * col("n_returns"))), 4))
        }
        vr(2).unionAll(vr(4)).orderBy("q")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |r0 AS (
             |  SELECT day, x, lag(x) OVER (ORDER BY day) AS xl FROM daily),
             |r AS (
             |  SELECT day,
             |         CAST(round((ln(CAST(x AS DOUBLE)) - ln(CAST(xl AS DOUBLE)))
             |              * 1e6) AS BIGINT) AS r
             |  FROM r0 WHERE xl IS NOT NULL AND xl > 0 AND x > 0),
             |base AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(r) AS s1,
             |                sum(r * r) AS s2 FROM r),
             |q2 AS (
             |  SELECT CAST(count(*) AS BIGINT) AS m, sum(sq) AS t1,
             |         sum(sq * sq) AS t2
             |  FROM (SELECT sum(r) OVER (ORDER BY day
             |          ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS sq,
             |               count(*) OVER (ORDER BY day
             |          ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c
             |        FROM r) WHERE c = 2),
             |q4 AS (
             |  SELECT CAST(count(*) AS BIGINT) AS m, sum(sq) AS t1,
             |         sum(sq * sq) AS t2
             |  FROM (SELECT sum(r) OVER (ORDER BY day
             |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sq,
             |               count(*) OVER (ORDER BY day
             |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS c
             |        FROM r) WHERE c = 4),
             |v AS (
             |  SELECT CAST(2 AS BIGINT) AS q, base.n AS n_returns,
             |         round(CAST(q2.m * q2.t2 - q2.t1 * q2.t1 AS DOUBLE)
             |           / (CAST(q2.m AS DOUBLE) * (q2.m - 1)) / 2
             |           / (CAST(base.n * base.s2 - base.s1 * base.s1 AS DOUBLE)
             |             / (CAST(base.n AS DOUBLE) * (base.n - 1))), 4) AS vr
             |  FROM q2, base
             |  UNION ALL
             |  SELECT CAST(4 AS BIGINT), base.n,
             |         round(CAST(q4.m * q4.t2 - q4.t1 * q4.t1 AS DOUBLE)
             |           / (CAST(q4.m AS DOUBLE) * (q4.m - 1)) / 4
             |           / (CAST(base.n * base.s2 - base.s1 * base.s1 AS DOUBLE)
             |             / (CAST(base.n AS DOUBLE) * (base.n - 1))), 4)
             |  FROM q4, base)
             |SELECT q, n_returns, vr,
             |       round((vr - 1.0) / sqrt(2.0 * (2 * q - 1) * (q - 1)
             |             / (3.0 * q * n_returns)), 4) AS z
             |FROM v ORDER BY q""".stripMargin)),

    // day-of-week seasonality index: per-dow mean daily volume over
    // the overall mean (index 1.0 = flat) — the multiplicative
    // profile a seasonal-naive forecaster divides out. Facts collapse
    // to the |days| rollup first; the index math runs on ≤7 rows.
    "ts_dow_index" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // per-dow + overall means
        val overall = daily.agg(
          (sum("x").cast("double") / count(lit(1))).as("om"))
        daily.groupBy(pmod(col("day") + 4, lit(7)).as("dow"))
          .agg(count(lit(1)).as("n_days"),
            (sum("x").cast("double") / count(lit(1))).as("dm"))
          .crossJoin(broadcast(overall))
          .select(col("dow"), col("n_days"),
            round(col("dm"), 4).as("mean_daily"),
            round(col("dm") / col("om"), 4).as("dow_index"))
          .orderBy("dow")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day, CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |o AS (SELECT CAST(sum(x) AS DOUBLE) / count(*) AS om FROM daily)
             |SELECT (day + 4) % 7 AS dow, CAST(count(*) AS BIGINT) AS n_days,
             |       round(CAST(sum(x) AS DOUBLE) / count(*), 4) AS mean_daily,
             |       round((CAST(sum(x) AS DOUBLE) / count(*)) / om, 4) AS dow_index
             |FROM daily, o GROUP BY 1, om ORDER BY dow""".stripMargin)),

    // month-of-year order seasonality (the annual cycle beside
    // ts_dow_index's weekly one): per-month mean daily order count /
    // overall mean — facts collapse to the |days| rollup first, index
    // math on ≤12 rows.
    "ts_month_index" -> Q(
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"),
                   month(col("o_orderdate")).cast("long").as("moy"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // per-month + overall means
        val overall = daily.agg(
          (sum("x").cast("double") / count(lit(1))).as("om"))
        daily.groupBy("moy")
          .agg(count(lit(1)).as("n_days"),
            (sum("x").cast("double") / count(lit(1))).as("mm"))
          .crossJoin(broadcast(overall))
          .select(col("moy"), col("n_days"),
            round(col("mm"), 4).as("mean_daily"),
            round(col("mm") / col("om"), 4).as("month_index"))
          .orderBy("moy")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |         month(o_orderdate) AS moy,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM orders GROUP BY 1, 2),
             |o AS (SELECT CAST(sum(x) AS DOUBLE) / count(*) AS om FROM daily)
             |SELECT moy, CAST(count(*) AS BIGINT) AS n_days,
             |       round(CAST(sum(x) AS DOUBLE) / count(*), 4) AS mean_daily,
             |       round((CAST(sum(x) AS DOUBLE) / count(*)) / om, 4) AS month_index
             |FROM daily, o GROUP BY moy, om ORDER BY moy""".stripMargin))
  )

  val tsQ: Seq[(String, Q)] = tsQA ++ tsQB ++ tsQC
}
