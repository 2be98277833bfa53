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
private[graft] object QRound12c {


  val round12gQ: Seq[(String, Q)] = Seq(
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

    // Benjamini–Yekutieli FDR control for the per-metric Welch z
    // family — BH (stat_fdr) assumes independence/PRDS; BY's harmonic
    // c(m) factor keeps FDR ≤ α under ARBITRARY dependence, the honest
    // choice when one experiment moves correlated metrics. c(m) is an
    // ordered list fold (identical sequential sum both engines,
    // 9dp-pinned); windows run on the ≤|event types| rollup.
    "stat_fdr_by" -> Q(
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
          .withColumn("xx", abs(col("z")) / sqrt(lit(2.0)))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("xx")))
          .withColumn("p",
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              col("t1") * (lit(0.254829592) + col("t1") * (lit(-0.284496736)
                + col("t1") * (lit(1.421413741) + col("t1") * (lit(-1.453152027)
                + col("t1") * lit(1.061405429)))))
              * exp(-col("xx") * col("xx")), 6)))
        val wR = Window.orderBy(col("p"), col("event_type"))
        val wAll = Window.partitionBy(lit(1))
        val wUp = Window.orderBy(col("rank").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        g.filter(col("p").isNotNull)
          .withColumn("rank", row_number().over(wR))
          .withColumn("m", count(lit(1)).over(wAll))
          .withColumn("cm", expr(
            "round(aggregate(sequence(1L, m), 0D, (a, i) -> a + 1.0 / i), 9)"))
          .withColumn("step",
            round(least(lit(1.0),
              col("cm") * col("m") * col("p") / col("rank")), 6))
          .withColumn("p_by", round(min("step").over(wUp), 6))
          .select(col("event_type"), col("z"), col("p"),
            col("rank").cast("long").as("rank"), col("p_by"),
            (col("p_by") <= 0.05).cast("long").as("reject"))
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
             |cm AS (SELECT *, round(list_sum(list_transform(range(1, m + 1),
             |               i -> 1.0 / i)), 9) AS cm
             |       FROM r),
             |st AS (SELECT *, round(least(1.0, cm * m * p / rank), 6) AS step
             |       FROM cm),
             |h AS (SELECT *, round(min(step) OVER (ORDER BY rank DESC
             |               ROWS UNBOUNDED PRECEDING), 6) AS p_by
             |      FROM st)
             |SELECT event_type, z, p, CAST(rank AS BIGINT) AS rank, p_by,
             |       CAST(p_by <= 0.05 AS BIGINT) AS reject
             |FROM h ORDER BY rank""".stripMargin)),

    // Two-stage cluster-sampling design effect: if evaluation samples
    // USERS and takes all their events, correlated within-user values
    // shrink the information content — DEFF = 1 + (m̄−1)·ICC and
    // n_eff = n/DEFF is the honest sample size (the survey-design
    // companion to samp_ess's weight-based N_eff). Values pinned to
    // exact cents; every between/within sum-of-squares term is a
    // per-user integer pinned BEFORE the global sum, so ICC is
    // engine-exact at 3000+ clusters where stat_icc's 20-source
    // double sums would start to wobble.
    "samp_two_stage" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val u = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("v"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("ni"),
            sum(col("v").cast(dec)).as("si"),
            sum((col("v") * col("v")).cast(dec)).as("qi"))
          .select(col("ni"), col("qi"), col("si"),
            round(col("si").cast("double") * col("si").cast("double")
              / col("ni"), 0).cast(dec).as("ti"))
        u.agg(count(lit(1)).as("k"), sum(col("ni")).as("nn"),
            sum(col("si")).as("st"), sum(col("qi")).as("sst"),
            sum(col("ti")).as("sb"),
            sum((col("ni") * col("ni")).cast(dec)).as("n2"))
          .select(col("k"), col("nn"),
            ((col("sb").cast("double") - col("st").cast("double")
              * col("st").cast("double") / col("nn").cast("double"))
              / (col("k") - 1)).as("msb"),
            ((col("sst") - col("sb")).cast("double")
              / (col("nn") - col("k")).cast("double")).as("msw"),
            ((col("nn").cast("double") - col("n2").cast("double")
              / col("nn").cast("double")) / (col("k") - 1)).as("k0"))
          .select(col("nn").as("n_events"), col("k").as("n_users"),
            round((col("msb") - col("msw"))
              / (col("msb") + (col("k0") - 1) * col("msw")), 4).as("icc"))
          .withColumn("deff",
            round(lit(1.0) + (col("n_events").cast("double") / col("n_users")
              - 1.0) * col("icc"), 4))
          .withColumn("n_eff",
            round(col("n_events") / col("deff"), 0).cast("long"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             |u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS ni,
             |         sum(v) AS si, sum(v * v) AS qi
             |  FROM v GROUP BY user_id),
             |uu AS (SELECT ni, qi, si,
             |              CAST(round(CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
             |                / ni) AS HUGEINT) AS ti
             |       FROM u),
             |a AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS BIGINT) AS nn,
             |         sum(si) AS st, sum(qi) AS sst, sum(ti) AS sb,
             |         sum(ni * ni) AS n2
             |  FROM uu),
             |m AS (
             |  SELECT k, nn,
             |         (CAST(sb AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
             |            / CAST(nn AS DOUBLE)) / (k - 1) AS msb,
             |         CAST(sst - sb AS DOUBLE) / CAST(nn - k AS DOUBLE) AS msw,
             |         (CAST(nn AS DOUBLE) - CAST(n2 AS DOUBLE)
             |            / CAST(nn AS DOUBLE)) / (k - 1) AS k0
             |  FROM a),
             |i AS (SELECT nn AS n_events, k AS n_users,
             |             round((msb - msw) / (msb + (k0 - 1) * msw), 4) AS icc
             |      FROM m)
             |SELECT n_events, n_users, icc,
             |       round(1.0 + (CAST(n_events AS DOUBLE) / n_users - 1.0)
             |             * icc, 4) AS deff,
             |       CAST(round(n_events / round(1.0
             |         + (CAST(n_events AS DOUBLE) / n_users - 1.0) * icc, 4))
             |         AS BIGINT) AS n_eff
             |FROM i""".stripMargin)))

  val round12hQ: Seq[(String, Q)] = Seq(
    // IVF cell-balance audit: per-cell population and deviation from
    // the even share under the same deterministic-centroid cosine
    // assignment ann_ivf_probe serves from — a skewed cell is tail
    // latency (every probe touching it scans it all) and the signal
    // to re-train or split. One assignment pass + a tiny rollup.
    "ann_cell_balance" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val w = Window.partitionBy("vec_id")
          .orderBy(col("sc").desc, col("cid"))
        val assigned = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("cid"),
            score(col("embedding"), col("cv")).as("sc"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy("cid").agg(count(lit(1)).as("n_vecs"))
          .localCheckpoint(eager = false) // total + per-cell rows
        val tot = assigned.agg(sum("n_vecs").as("nn"), count(lit(1)).as("nc"))
        assigned.crossJoin(broadcast(tot))
          .select(col("cid"), col("n_vecs"),
            round(col("n_vecs") / col("nn").cast("double"), 4).as("share"),
            round(col("n_vecs").cast("double")
              / (col("nn").cast("double") / col("nc")) - 1.0, 4).as("dev_pct"))
          .orderBy("cid")
      },
      Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             |               FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT e.vec_id, c.cid,
             |         row_number() OVER (PARTITION BY e.vec_id
             |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
             |  FROM embeddings e, cents c),
             |a AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs
             |      FROM scored WHERE rn = 1 GROUP BY cid),
             |t AS (SELECT sum(n_vecs) AS nn, CAST(count(*) AS BIGINT) AS nc FROM a)
             |SELECT cid, n_vecs,
             |       round(n_vecs / CAST(nn AS DOUBLE), 4) AS share,
             |       round(CAST(n_vecs AS DOUBLE)
             |             / (CAST(nn AS DOUBLE) / nc) - 1.0, 4) AS dev_pct
             |FROM a, t ORDER BY cid""".stripMargin)),

    // Quantization code-utilization audit: per-dimension entropy and
    // distinct-code count of the int8 scalar codes — dead codewords
    // are wasted bits (a dimension whose 256 levels carry 2 bits of
    // entropy wants fewer bits or a different transform; the audit
    // behind vec_int4_quant's 8→4-bit decision). Exact integer code
    // counts; c·ln c terms micro-unit-pinned (the text_entropy
    // altitude).
    "vec_code_entropy" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val codes = graft.ann.Quant.encode(Tables.embeddings(s, d))
          .select(posexplode(col("codes")).as(Seq("i", "c")))
          .groupBy(col("i").cast("long").as("i"), col("c"))
          .agg(count(lit(1)).as("n"))
        codes.groupBy("i")
          .agg(sum(col("n")).as("nn"),
            count(lit(1)).as("n_codes"),
            sum(round(col("n") * log(col("n").cast("double")) * 1e6, 0)
              .cast(dec)).as("sclc"))
          .select(col("i"), col("n_codes"),
            round((log(col("nn").cast("double"))
              - col("sclc").cast("double") / 1e6 / col("nn"))
              / log(lit(2.0)), 4).as("entropy_bits"))
          .orderBy("i")
      },
      Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |                     unnest(embedding) AS x
             |              FROM embeddings),
             |p AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
             |      FROM dims GROUP BY i),
             |codes AS (SELECT CAST(d.i - 1 AS BIGINT) AS i,
             |                 CASE WHEN mx = mn THEN 0
             |                      ELSE CAST(round((x::DOUBLE - mn) / (mx - mn) * 255.0) AS BIGINT)
             |                 END AS c
             |          FROM dims d JOIN p USING (i)),
             |cnt AS (SELECT i, c, CAST(count(*) AS BIGINT) AS n
             |        FROM codes GROUP BY i, c)
             |SELECT i, CAST(count(*) AS BIGINT) AS n_codes,
             |       round((ln(CAST(sum(n) AS DOUBLE))
             |              - CAST(sum(CAST(round(n * ln(CAST(n AS DOUBLE)) * 1e6)
             |                    AS BIGINT)) AS DOUBLE) / 1e6 / sum(n))
             |             / ln(2.0), 4) AS entropy_bits
             |FROM cnt GROUP BY i ORDER BY i""".stripMargin)),

    // Hash-quality audit for the md5 machinery every deterministic
    // split/arm/shard in this engine rides on: chi-square uniformity
    // of the md5-derived uniform over 1000 equal bins, with the
    // Wilson–Hilferty normal approximation for a p-value — if THIS
    // fails, every samp_hash_split/ab-arm result upstream is suspect.
    // Exact integer bin counts; the statistic is integer arithmetic
    // into one ratio.
    "stat_hash_uniformity" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val bins = Tables.orders(s, d)
          .select((pmod(md5Long(concat(lit("hu:"),
            col("o_orderkey").cast("string"))), lit(1000000)) / 1000)
            .cast("long").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("o"))
        bins.agg(sum(col("o")).as("n"), count(lit(1)).as("k"),
            sum((col("o") * col("o")).cast(dec)).as("q"),
            max(col("o")).as("mx"))
          .select(col("n"), col("k"),
            // χ² = Σ(o−e)²/e = K·Σo²/n − n over the FULL 1000-bin
            // spine; empty bins add (0−e)²/e = e each, i.e. the
            // identity still holds with K = 1000 even if k < 1000
            round(lit(1000.0) * col("q").cast("double")
              / col("n").cast("double") - col("n"), 4).as("chi2"),
            round(col("mx").cast("double")
              / (col("n").cast("double") / 1000.0) - 1.0, 4)
              .as("max_bin_excess"))
          .withColumn("wh_z", round(
            (pow(col("chi2") / 999.0, 1.0 / 3.0)
              - (lit(1.0) - lit(2.0) / (9.0 * 999.0)))
              / sqrt(lit(2.0) / (9.0 * 999.0)), 4))
          .select(col("n").as("n_keys"), col("chi2"), col("wh_z"),
            col("max_bin_excess"),
            (abs(col("wh_z")) <= 3.0).cast("long").as("uniform_ok"))
      },
      Some("""WITH b AS (
             |  SELECT (('0x' || substr(md5('hu:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
             |          % 1000000) // 1000 AS bin
             |  FROM orders),
             |c AS (SELECT bin, CAST(count(*) AS BIGINT) AS o FROM b GROUP BY bin),
             |a AS (SELECT CAST(sum(o) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             |             sum(o * o) AS q, CAST(max(o) AS BIGINT) AS mx
             |      FROM c),
             |s AS (SELECT n, k,
             |        round(1000.0 * CAST(q AS DOUBLE) / CAST(n AS DOUBLE) - n, 4) AS chi2,
             |        round(CAST(mx AS DOUBLE) / (CAST(n AS DOUBLE) / 1000.0) - 1.0, 4)
             |          AS max_bin_excess
             |      FROM a),
             |w AS (SELECT *, round((pow(chi2 / 999.0, 1.0 / 3.0)
             |               - (1.0 - 2.0 / (9.0 * 999.0)))
             |               / sqrt(2.0 / (9.0 * 999.0)), 4) AS wh_z
             |      FROM s)
             |SELECT n AS n_keys, chi2, wh_z, max_bin_excess,
             |       CAST(abs(wh_z) <= 3.0 AS BIGINT) AS uniform_ok
             |FROM w""".stripMargin)),

    // New-vs-returning daily active users: each day's DAU split by
    // whether it is the user's FIRST day — the growth-vs-retention
    // decomposition every product dashboard leads with (users
    // collapse in the per-(user, day) distinct first, so the daily
    // rollup never sees raw events).
    "ev_new_returning" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
          .distinct()
          .localCheckpoint(eager = false) // first-day agg + daily rollup
        val first = ud.groupBy("user_id").agg(min("day").as("fday"))
        ud.join(first, "user_id")
          .groupBy("day")
          .agg(count(lit(1)).as("dau"),
            sum(when(col("day") === col("fday"), 1L).otherwise(0L))
              .as("new_users"))
          .withColumn("returning", col("dau") - col("new_users"))
          .withColumn("new_share",
            round(col("new_users") / col("dau").cast("double"), 4))
          .orderBy("day")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, ts // 86400000000000 AS day FROM events),
             |f AS (SELECT user_id, min(day) AS fday FROM ud GROUP BY user_id)
             |SELECT day, CAST(count(*) AS BIGINT) AS dau,
             |       CAST(sum(CASE WHEN day = fday THEN 1 ELSE 0 END) AS BIGINT)
             |         AS new_users,
             |       CAST(count(*) - sum(CASE WHEN day = fday THEN 1 ELSE 0 END)
             |            AS BIGINT) AS returning,
             |       round(sum(CASE WHEN day = fday THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS new_share
             |FROM ud JOIN f USING (user_id)
             |GROUP BY day ORDER BY day""".stripMargin)),

    // Embedding-norm distribution audit (p01/p25/p50/p75/p99 + mean):
    // dot-product search silently favors long vectors, so the norm
    // spread is the one-row check that decides between cosine and
    // dot — and the before/after gate for emb_whiten. Norms pinned to
    // 6dp before the type-7 percentiles so both engines interpolate
    // identical values.
    "emb_norm_quantiles" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.sqNorm
        val n = Tables.embeddings(s, d)
          .select(round(sqrt(sqNorm(col("embedding"))), 6).as("nrm"))
        n.agg(count(lit(1)).as("n_vecs"),
            round(avg("nrm"), 4).as("mean_norm"),
            expr("percentile(nrm, array(0.01D, 0.25D, 0.5D, 0.75D, 0.99D))")
              .as("ps"))
          .select(col("n_vecs"), col("mean_norm"),
            round(element_at(col("ps"), 1), 4).as("p01"),
            round(element_at(col("ps"), 2), 4).as("p25"),
            round(element_at(col("ps"), 3), 4).as("p50"),
            round(element_at(col("ps"), 4), 4).as("p75"),
            round(element_at(col("ps"), 5), 4).as("p99"))
      },
      Some("""WITH n AS (
             |  SELECT round(sqrt(list_inner_product(embedding::DOUBLE[],
             |                                       embedding::DOUBLE[])), 6) AS nrm
             |  FROM embeddings)
             |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
             |       round(avg(nrm), 4) AS mean_norm,
             |       round(quantile_cont(nrm, 0.01), 4) AS p01,
             |       round(quantile_cont(nrm, 0.25), 4) AS p25,
             |       round(quantile_cont(nrm, 0.5), 4) AS p50,
             |       round(quantile_cont(nrm, 0.75), 4) AS p75,
             |       round(quantile_cont(nrm, 0.99), 4) AS p99
             |FROM n""".stripMargin)))

  val round12iQ: Seq[(String, Q)] = Seq(
    // Winnowing fingerprints (Schleimer et al. 2003 — the MOSS
    // algorithm): hash every 5-token gram, keep each window-of-4's
    // MINIMUM hash (dedup'd), and candidate near-dup pairs are docs
    // sharing ≥ 2 fingerprints. The guarantee minhash doesn't give:
    // any shared run of ≥ 8 tokens is DETECTED (no per-band luck),
    // with fingerprint density ~2/(w+1). Per-doc windows partition by
    // doc (bounded by doc length); the pair join runs on the selected
    // fingerprints only, orders of magnitude below the gram fan-out.
    "dedup_winnowing" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        // tokenGrams doesn't carry the gram's order in the doc, and
        // winnowing needs it — posexplode keeps the position
        val docs = docsUnder(s, d, 200)
          .select(col("doc_id"),
            graft.text.TextPrimitives.tokens(col("text")).as("toks"))
          .select(col("doc_id"), posexplode(transform(
            sequence(lit(0), greatest(size(col("toks")) - 5, lit(0))),
            i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(5)))))
            .as(Seq("pos", "g")))
          .select(col("doc_id"), col("pos"), md5Long(col("g")).as("h"))
        val w = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(0, 3)
        val fps = docs
          .withColumn("wm", min("h").over(w))
          .select(col("doc_id"), col("wm").as("fp")).distinct()
          .localCheckpoint(eager = false) // stats + the pair join
        val pairs = fps.select(col("doc_id").as("da"), col("fp"))
          .join(fps.select(col("doc_id").as("db"), col("fp")), "fp")
          .filter(col("da") < col("db"))
          .groupBy("da", "db").agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2)
        pairs.orderBy("da", "db")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
             |  FROM documents WHERE doc_id < 200),
             |g AS (
             |  SELECT doc_id, i AS pos,
             |         ('0x' || substr(md5(array_to_string(t[i+1:i+5], ' ')), 1, 15))::BIGINT AS h
             |  FROM (SELECT doc_id, t,
             |               unnest(generate_series(0, greatest(len(t) - 5, 0))) AS i
             |        FROM toks)),
             |fp AS (
             |  SELECT DISTINCT doc_id,
             |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
             |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
             |  FROM g)
             |SELECT a.doc_id AS da, b.doc_id AS db,
             |       CAST(count(*) AS BIGINT) AS shared
             |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |GROUP BY da, db HAVING count(*) >= 2
             |ORDER BY da, db""".stripMargin)),

    // Held-out OOV-rate curve: vocabulary learned on the md5 half,
    // token coverage measured on the OTHER half at top-{1k, 5k, 20k}
    // — text_vocab_coverage's in-sample curve flatters the vocab;
    // this is the number a tokenizer actually ships with. Vocab ranks
    // are TakeOrdered-bounded; the held-out join is a broadcast.
    "text_oov_rate" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val toks = Tables.documents(s, d)
          .withColumn("h",
            md5Long(concat(lit("ov:"), col("doc_id").cast("string"))) % 2)
          .select(col("h"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .localCheckpoint(eager = false) // train vocab + held-out scan
        val vocab = toks.filter(col("h") === 0)
          .groupBy("tok").agg(count(lit(1)).as("wc"))
          .orderBy(col("wc").desc, col("tok")).limit(20000)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("wc").desc, col("tok"))))
          .select(col("tok"), col("rnk"))
        val held = toks.filter(col("h") === 1)
          .join(broadcast(vocab), Seq("tok"), "left")
        held.agg(count(lit(1)).as("n_held"),
            sum(when(col("rnk").isNotNull && col("rnk") <= 1000, 1L)
              .otherwise(0L)).as("in1k"),
            sum(when(col("rnk").isNotNull && col("rnk") <= 5000, 1L)
              .otherwise(0L)).as("in5k"),
            sum(when(col("rnk").isNotNull, 1L).otherwise(0L)).as("in20k"))
          .select(col("n_held"),
            round(lit(1.0) - col("in1k") / col("n_held").cast("double"), 4)
              .as("oov_1k"),
            round(lit(1.0) - col("in5k") / col("n_held").cast("double"), 4)
              .as("oov_5k"),
            round(lit(1.0) - col("in20k") / col("n_held").cast("double"), 4)
              .as("oov_20k"))
      },
      Some("""WITH t AS (
             |  SELECT ('0x' || substr(md5('ov:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS h,
             |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rnk
             |      FROM t WHERE h = 0 GROUP BY tok
             |      ORDER BY count(*) DESC, tok LIMIT 20000),
             |hd AS (SELECT t.tok, v.rnk FROM t LEFT JOIN v USING (tok)
             |       WHERE t.h = 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_held,
             |       round(1.0 - sum(CASE WHEN rnk <= 1000 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS oov_1k,
             |       round(1.0 - sum(CASE WHEN rnk <= 5000 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS oov_5k,
             |       round(1.0 - sum(CASE WHEN rnk IS NOT NULL THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS oov_20k
             |FROM hd""".stripMargin)),

    // Poisson rate-ratio test of purchases per user between md5 arms
    // (counts, not values — ev_ab_test's mean-spend z can't see a
    // pure frequency effect): RR with the Wald CI on ln RR,
    // exposure-adjusted by arm user counts. Exact integer counts into
    // two lns; significant = CI excludes 1.
    "stat_poisson_ratio" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("x"))
        u.agg(
            sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("x1"),
            sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("x0"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"))
          .filter(col("x1") > 0 && col("x0") > 0)
          .select(col("x1"), col("x0"), col("n1"), col("n0"),
            round((col("x1").cast("double") / col("n1"))
              / (col("x0").cast("double") / col("n0")), 4).as("rate_ratio"),
            round(sqrt(lit(1.0) / col("x1") + lit(1.0) / col("x0")), 6)
              .as("se_lnrr"))
          .select(col("x1"), col("x0"), col("n1"), col("n0"),
            col("rate_ratio"),
            round(exp(log(col("rate_ratio")) - lit(1.96) * col("se_lnrr")), 4)
              .as("ci_lo"),
            round(exp(log(col("rate_ratio")) + lit(1.96) * col("se_lnrr")), 4)
              .as("ci_hi"))
          .withColumn("significant",
            (col("ci_lo") > 1.0 || col("ci_hi") < 1.0).cast("long"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |a AS (
             |  SELECT CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS x1,
             |         CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS x0,
             |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
             |  FROM u),
             |r AS (
             |  SELECT x1, x0, n1, n0,
             |         round((CAST(x1 AS DOUBLE) / n1)
             |               / (CAST(x0 AS DOUBLE) / n0), 4) AS rate_ratio,
             |         round(sqrt(1.0 / x1 + 1.0 / x0), 6) AS se_lnrr
             |  FROM a WHERE x1 > 0 AND x0 > 0)
             |SELECT x1, x0, n1, n0, rate_ratio,
             |       round(exp(ln(rate_ratio) - 1.96 * se_lnrr), 4) AS ci_lo,
             |       round(exp(ln(rate_ratio) + 1.96 * se_lnrr), 4) AS ci_hi,
             |       CAST(round(exp(ln(rate_ratio) - 1.96 * se_lnrr), 4) > 1.0
             |            OR round(exp(ln(rate_ratio) + 1.96 * se_lnrr), 4) < 1.0
             |            AS BIGINT) AS significant
             |FROM r""".stripMargin)),

    // Frequency-capping simulation: if each user's events were capped
    // at k per day (k = 3, 5, 10), what share of raw volume survives —
    // the ads/notification-policy what-if, computed from the
    // per-(user, day) count rollup (never a second scan of facts).
    "ev_freq_cap" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .groupBy(col("user_id"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("c"))
        ud.agg(sum(col("c")).as("n_events"),
            sum(least(col("c"), lit(3L))).as("k3"),
            sum(least(col("c"), lit(5L))).as("k5"),
            sum(least(col("c"), lit(10L))).as("k10"))
          .select(col("n_events"),
            round(col("k3") / col("n_events").cast("double"), 4).as("keep_cap3"),
            round(col("k5") / col("n_events").cast("double"), 4).as("keep_cap5"),
            round(col("k10") / col("n_events").cast("double"), 4)
              .as("keep_cap10"))
      },
      Some("""WITH ud AS (
             |  SELECT user_id, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2)
             |SELECT CAST(sum(c) AS BIGINT) AS n_events,
             |       round(sum(least(c, 3)) / CAST(sum(c) AS DOUBLE), 4) AS keep_cap3,
             |       round(sum(least(c, 5)) / CAST(sum(c) AS DOUBLE), 4) AS keep_cap5,
             |       round(sum(least(c, 10)) / CAST(sum(c) AS DOUBLE), 4) AS keep_cap10
             |FROM ud""".stripMargin)),

    // Bollinger bands on daily volume: trailing 7-day mean ± 2σ with
    // breakout flags — the ops-dashboard "is today unusual given the
    // LAST WEEK" view, complementing ts_seasonal's fixed profile and
    // stat_page_hinkley's cumulative drift. Window sums are exact
    // integers (the band math divides identical integers on both
    // engines); days 1–6 have no band by construction.
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
          .select(col("day"), col("x"),
            round(col("s1").cast("double") / 7, 4).as("mid"),
            round(sqrt((lit(7) * col("s2") - col("s1") * col("s1"))
              .cast("double") / 42.0), 6).as("sd"))
          .select(col("day"), col("x"), col("mid"),
            round(col("mid") - col("sd") * 2, 4).as("lo"),
            round(col("mid") + col("sd") * 2, 4).as("hi"))
          .withColumn("breakout",
            (col("x") < col("lo") || col("x") > col("hi")).cast("long"))
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
             |         round(CAST(s1 AS DOUBLE) / 7, 4) AS mid,
             |         round(sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE) / 42.0), 6) AS sd
             |  FROM r WHERE cnt = 7)
             |SELECT day, x, mid,
             |       round(mid - sd * 2, 4) AS lo,
             |       round(mid + sd * 2, 4) AS hi,
             |       CAST(x < round(mid - sd * 2, 4)
             |            OR x > round(mid + sd * 2, 4) AS BIGINT) AS breakout
             |FROM b ORDER BY day""".stripMargin)),

    // 5-fold cross-validated ridge: tokens regressed on (chars,
    // distinct tokens) at λ = c·n_train for c ∈ {0.01, 0.1, 1} — the
    // missing model-SELECTION step behind stat_ridge_fit's fixed
    // λ = 0.1n. All nine Gram sums are exact integers per md5 fold;
    // each fold's TRAIN sums are total − fold (no second scan), the
    // closed-form 2×2 adjugate solves per (fold, c), and per-row
    // squared residuals are pinned to 1e-4 units so every CV-MSE is
    // an exact decimal sum. One grouped pass + one broadcast-join
    // eval pass.
    "stat_ridge_cv" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        val base = Tables.documents(s, d)
          .select(
            (md5Long(concat(lit("cv:"), col("doc_id").cast("string"))) % 5)
              .as("f"),
            col("n_chars").as("x"),
            size(array_distinct(toks)).cast("long").as("z"),
            size(toks).cast("long").as("y"))
          .localCheckpoint(eager = false) // fold sums + the eval pass
        val folds = base.groupBy("f")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("sx"), sum(col("z").cast(dec)).as("sz"),
            sum(col("y").cast(dec)).as("sy"),
            sum((col("x") * col("x")).cast(dec)).as("sxx"),
            sum((col("z") * col("z")).cast(dec)).as("szz"),
            sum((col("x") * col("z")).cast(dec)).as("sxz"),
            sum((col("x") * col("y")).cast(dec)).as("sxy"),
            sum((col("z") * col("y")).cast(dec)).as("szy"))
          .localCheckpoint(eager = false) // totals + per-fold trains
        val tot = folds.agg(sum("n").as("tn"), sum("sx").as("tsx"),
          sum("sz").as("tsz"), sum("sy").as("tsy"), sum("sxx").as("tsxx"),
          sum("szz").as("tszz"), sum("sxz").as("tsxz"), sum("sxy").as("tsxy"),
          sum("szy").as("tszy"))
        val train = folds.crossJoin(broadcast(tot))
          .select(col("f"),
            (col("tn") - col("n")).cast("double").as("n"),
            (col("tsx") - col("sx")).cast("double").as("sx"),
            (col("tsz") - col("sz")).cast("double").as("sz"),
            (col("tsy") - col("sy")).cast("double").as("sy"),
            (col("tsxx") - col("sxx")).cast("double").as("sxx"),
            (col("tszz") - col("szz")).cast("double").as("szz"),
            (col("tsxz") - col("sxz")).cast("double").as("sxz"),
            (col("tsxy") - col("sxy")).cast("double").as("sxy"),
            (col("tszy") - col("szy")).cast("double").as("szy"))
          .withColumn("lc", explode(array(lit(0.01), lit(0.1), lit(1.0))))
          .withColumn("dxx", col("sxx") - col("sx") * col("sx") / col("n"))
          .withColumn("dzz", col("szz") - col("sz") * col("sz") / col("n"))
          .withColumn("dxz", col("sxz") - col("sx") * col("sz") / col("n"))
          .withColumn("dxy", col("sxy") - col("sx") * col("sy") / col("n"))
          .withColumn("dzy", col("szy") - col("sz") * col("sy") / col("n"))
          .withColumn("lam", col("lc") * col("n"))
          .withColumn("det", (col("dxx") + col("lam")) * (col("dzz") + col("lam"))
            - col("dxz") * col("dxz"))
          .select(col("f"), col("lc"),
            round(((col("dzz") + col("lam")) * col("dxy")
              - col("dxz") * col("dzy")) / col("det"), 6).as("b1"),
            round(((col("dxx") + col("lam")) * col("dzy")
              - col("dxz") * col("dxy")) / col("det"), 6).as("b2"),
            round(col("sx") / col("n"), 6).as("xb"),
            round(col("sz") / col("n"), 6).as("zb"),
            round(col("sy") / col("n"), 6).as("yb"))
        base.withColumn("lc", explode(array(lit(0.01), lit(0.1), lit(1.0))))
          .join(broadcast(train), Seq("f", "lc"))
          .withColumn("e", col("y") - (col("yb")
            + col("b1") * (col("x") - col("xb"))
            + col("b2") * (col("z") - col("zb"))))
          .groupBy("lc")
          .agg(count(lit(1)).as("n"),
            sum(round(col("e") * col("e") * 1e4, 0).cast(dec)).as("se"))
          .select(col("lc").as("lambda_c"),
            round(col("se").cast("double") / 1e4 / col("n"), 4).as("cv_mse"))
          .orderBy("lambda_c")
      },
      Some("""WITH b AS (
             |  SELECT ('0x' || substr(md5('cv:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS f,
             |         n_chars AS x,
             |         CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) AS z,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS y
             |  FROM documents),
             |fs AS (
             |  SELECT f, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(z) AS sz,
             |         sum(y) AS sy, sum(x * x) AS sxx, sum(z * z) AS szz,
             |         sum(x * z) AS sxz, sum(x * y) AS sxy, sum(z * y) AS szy
             |  FROM b GROUP BY f),
             |t AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sz) AS tsz,
             |             sum(sy) AS tsy, sum(sxx) AS tsxx, sum(szz) AS tszz,
             |             sum(sxz) AS tsxz, sum(sxy) AS tsxy, sum(szy) AS tszy
             |      FROM fs),
             |lcs AS (SELECT CAST(unnest([0.01, 0.1, 1.0]) AS DOUBLE) AS lc),
             |tr0 AS (
             |  SELECT f, CAST(tn - n AS DOUBLE) AS n,
             |         CAST(tsx - sx AS DOUBLE) AS sx, CAST(tsz - sz AS DOUBLE) AS sz,
             |         CAST(tsy - sy AS DOUBLE) AS sy, CAST(tsxx - sxx AS DOUBLE) AS sxx,
             |         CAST(tszz - szz AS DOUBLE) AS szz, CAST(tsxz - sxz AS DOUBLE) AS sxz,
             |         CAST(tsxy - sxy AS DOUBLE) AS sxy, CAST(tszy - szy AS DOUBLE) AS szy
             |  FROM fs, t),
             |tr1 AS (
             |  SELECT f, lc,
             |         sxx - sx * sx / n AS dxx, szz - sz * sz / n AS dzz,
             |         sxz - sx * sz / n AS dxz, sxy - sx * sy / n AS dxy,
             |         szy - sz * sy / n AS dzy, lc * n AS lam,
             |         sx / n AS xb0, sz / n AS zb0, sy / n AS yb0
             |  FROM tr0, lcs),
             |tr AS (
             |  SELECT f, lc,
             |         round(((dzz + lam) * dxy - dxz * dzy)
             |               / ((dxx + lam) * (dzz + lam) - dxz * dxz), 6) AS b1,
             |         round(((dxx + lam) * dzy - dxz * dxy)
             |               / ((dxx + lam) * (dzz + lam) - dxz * dxz), 6) AS b2,
             |         round(xb0, 6) AS xb, round(zb0, 6) AS zb,
             |         round(yb0, 6) AS yb
             |  FROM tr1),
             |ev AS (
             |  SELECT tr.lc,
             |         CAST(round((b.y - (tr.yb + tr.b1 * (b.x - tr.xb)
             |           + tr.b2 * (b.z - tr.zb)))
             |           * (b.y - (tr.yb + tr.b1 * (b.x - tr.xb)
             |           + tr.b2 * (b.z - tr.zb))) * 1e4) AS HUGEINT) AS e2
             |  FROM b JOIN tr ON tr.f = b.f)
             |SELECT lc AS lambda_c,
             |       round(CAST(sum(e2) AS DOUBLE) / 1e4 / count(*), 4) AS cv_mse
             |FROM ev GROUP BY lc ORDER BY lambda_c""".stripMargin)),

    // Epoch-shuffle independence audit: Pearson correlation between
    // two md5 epoch orders (seeds ep1/ep2) over every doc — if
    // consecutive epochs correlate, the "reshuffled" curriculum is a
    // lie and batch composition repeats. Exact integer hash units
    // into the all-integer correlation form; the companion to
    // stat_hash_uniformity's marginal check (uniform marginals can
    // still be jointly dependent).
    "pipe_shuffle_independence" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val h = Tables.documents(s, d)
          .select(
            pmod(md5Long(concat(lit("ep1:"), col("doc_id").cast("string"))),
              lit(1000000)).as("a"),
            pmod(md5Long(concat(lit("ep2:"), col("doc_id").cast("string"))),
              lit(1000000)).as("b"))
        h.agg(count(lit(1)).as("n"),
            sum(col("a").cast(dec)).as("sa"), sum(col("b").cast(dec)).as("sb"),
            sum((col("a") * col("a")).cast(dec)).as("saa"),
            sum((col("b") * col("b")).cast(dec)).as("sbb"),
            sum((col("a") * col("b")).cast(dec)).as("sab"))
          .select(col("n").as("n_docs"),
            round((col("n") * col("sab") - col("sa") * col("sb")).cast("double")
              / (sqrt((col("n") * col("saa") - col("sa") * col("sa"))
                  .cast("double"))
                * sqrt((col("n") * col("sbb") - col("sb") * col("sb"))
                  .cast("double"))), 6).as("pearson_r"))
          .withColumn("independent_ok",
            (abs(col("pearson_r")) < lit(3.0)
              / sqrt(col("n_docs").cast("double"))).cast("long"))
      },
      Some("""WITH h AS (
             |  SELECT ('0x' || substr(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS a,
             |         ('0x' || substr(md5('ep2:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS b
             |  FROM documents),
             |s AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, sum(a) AS sa, sum(b) AS sb,
             |         sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab
             |  FROM h),
             |r AS (
             |  SELECT n AS n_docs,
             |         round(CAST(n * sab - sa * sb AS DOUBLE)
             |               / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
             |                  * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6)
             |           AS pearson_r
             |  FROM s)
             |SELECT n_docs, pearson_r,
             |       CAST(abs(pearson_r) < 3.0 / sqrt(CAST(n_docs AS DOUBLE))
             |            AS BIGINT) AS independent_ok
             |FROM r""".stripMargin)),

    // Payload-filtered scroll (the reference's scroll with a Qdrant
    // Filter): the title predicate prunes inside the partition-pruned
    // user scan, vector_id paging order preserved — completing the
    // payload-filter surface vs_search_payload opened on the search
    // side.
    "vs_scroll_payload" -> Q(
      (s, d) => {
        val coll = VectorStore.pointsPartitioned(s, d)
        coll.filter(col("user_id") === 3 && col("title").startsWith("t1"))
          .select(col("vector_id"), col("doc_id"), col("chunk_id"), col("title"))
          .orderBy("vector_id").limit(10)
      },
      Some(s"""$pointsSql
              |SELECT vector_id, doc_id, chunk_id, title FROM points
              |WHERE user_id = 3 AND title LIKE 't1%'
              |ORDER BY vector_id LIMIT 10""".stripMargin)),

    // Odds ratio of heavy-purchaser (≥13 purchases) incidence between
    // md5 arms with the Woolf log CI — THE reporting staple between
    // stat_fisher_exact's p-value and stat_breslow_day's
    // across-strata question: one 2×2 table, exact integer cells,
    // two lns.
    "stat_odds_ratio" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 13).cast("long").as("heavy"))
        u.agg(
            sum(when(col("arm") === 1 && col("heavy") === 1, 1L).otherwise(0L))
              .as("a"),
            sum(when(col("arm") === 1 && col("heavy") === 0, 1L).otherwise(0L))
              .as("b"),
            sum(when(col("arm") === 0 && col("heavy") === 1, 1L).otherwise(0L))
              .as("c"),
            sum(when(col("arm") === 0 && col("heavy") === 0, 1L).otherwise(0L))
              .as("dd"))
          .filter(col("a") > 0 && col("b") > 0 && col("c") > 0 && col("dd") > 0)
          .select(col("a"), col("b"), col("c"), col("dd").as("d"),
            round((col("a") * col("dd")).cast("double")
              / (col("b") * col("c")), 4).as("odds_ratio"),
            round(sqrt(lit(1.0) / col("a") + lit(1.0) / col("b")
              + lit(1.0) / col("c") + lit(1.0) / col("dd")), 6).as("se_lnor"))
          .select(col("a"), col("b"), col("c"), col("d"), col("odds_ratio"),
            round(exp(log(col("odds_ratio")) - lit(1.96) * col("se_lnor")), 4)
              .as("ci_lo"),
            round(exp(log(col("odds_ratio")) + lit(1.96) * col("se_lnor")), 4)
              .as("ci_hi"))
          .withColumn("significant",
            (col("ci_lo") > 1.0 || col("ci_hi") < 1.0).cast("long"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 13 AS BIGINT) AS heavy
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT CAST(sum(CASE WHEN arm = 1 AND heavy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |         CAST(sum(CASE WHEN arm = 1 AND heavy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |         CAST(sum(CASE WHEN arm = 0 AND heavy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |         CAST(sum(CASE WHEN arm = 0 AND heavy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM u),
             |r AS (
             |  SELECT a, b, c, d,
             |         round(CAST(a * d AS DOUBLE) / (b * c), 4) AS odds_ratio,
             |         round(sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d), 6) AS se_lnor
             |  FROM t WHERE a > 0 AND b > 0 AND c > 0 AND d > 0)
             |SELECT a, b, c, d, odds_ratio,
             |       round(exp(ln(odds_ratio) - 1.96 * se_lnor), 4) AS ci_lo,
             |       round(exp(ln(odds_ratio) + 1.96 * se_lnor), 4) AS ci_hi,
             |       CAST(round(exp(ln(odds_ratio) - 1.96 * se_lnor), 4) > 1.0
             |            OR round(exp(ln(odds_ratio) + 1.96 * se_lnor), 4) < 1.0
             |            AS BIGINT) AS significant
             |FROM r""".stripMargin)))
}
