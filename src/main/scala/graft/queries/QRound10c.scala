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
private[graft] object QRound10c {


  val round10dQ: Seq[(String, Q)] = Seq(
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

    // Durbin-Watson autocorrelation-of-residuals audit per event type:
    // fit daily count ~ day by closed-form OLS (exact integer sums),
    // broadcast the |types|-row coefficient table back onto the SAME
    // checkpointed daily frame, and run DW = sum((e_t - e_{t-1})^2) /
    // sum(e^2) as one per-type lag window over O(days) rows. DW ~ 2
    // means the linear-trend residuals are white; ~0 means the trend
    // model is missing strong positive autocorrelation. Slope and
    // intercept are rounded to 6 BEFORE the residual pass so both
    // engines compute identical residuals.
    "stat_durbin_watson" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // coefficient fit + residual pass
        val coef = daily.groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"),
               sum(col("day").cast("double")).as("sx"), sum("c").as("sy"),
               sum(col("day").cast("double") * col("day")).as("sxx"),
               sum(col("day").cast("double") * col("c")).as("sxy"))
          .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
          .filter(col("dx") > 0)
          .select(col("event_type"), col("n").cast("long").as("n_days"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) / col("dx"), 6)
              .as("slope"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / col("dx") * col("sx")) / col("n"), 6).as("icept"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.join(broadcast(coef), "event_type")
          .withColumn("e", col("c") - col("icept") - col("slope") * col("day"))
          .withColumn("el", lag("e", 1).over(w))
          .groupBy("event_type")
          .agg(max("n_days").as("n_days"), max("slope").as("slope"),
               sum(col("e") * col("e")).as("see"),
               sum(pow(col("e") - col("el"), 2)).as("sd"))
          .select(col("event_type"), col("n_days"), col("slope"),
            when(col("see") > 0 && col("n_days") >= 2,
              round(col("sd") / col("see"), 4)).as("dw"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |coef AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             |                sum(CAST(day AS DOUBLE)) AS sx, sum(c) AS sy,
             |                sum(CAST(day AS DOUBLE) * day) AS sxx,
             |                sum(CAST(day AS DOUBLE) * c) AS sxy
             |         FROM daily GROUP BY 1),
             |cf AS (SELECT event_type, CAST(n AS BIGINT) AS n_days,
             |              round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
             |              round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS icept
             |       FROM coef WHERE n*sxx - sx*sx > 0),
             |r AS (SELECT d.event_type, cf.n_days, cf.slope,
             |             d.c - cf.icept - cf.slope * d.day AS e,
             |             lag(d.c - cf.icept - cf.slope * d.day)
             |               OVER (PARTITION BY d.event_type ORDER BY d.day) AS el
             |      FROM daily d JOIN cf ON cf.event_type = d.event_type)
             |SELECT event_type, max(n_days) AS n_days, max(slope) AS slope,
             |       CASE WHEN sum(e*e) > 0 AND max(n_days) >= 2
             |            THEN round(sum((e - el)*(e - el)) / sum(e*e), 4)
             |       END AS dw
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Breusch-Pagan heteroscedasticity test on lineitem price ~
    // quantity: does residual VARIANCE drift with quantity,
    // invalidating constant-variance
    // OLS inference? The whole test - main fit, squared residuals,
    // auxiliary regression of e^2 on x, LM = n*R^2_aux - collapses to
    // closed-form arithmetic over the 14 raw mixed moments
    // sum(x^i y^j), i+j <= 4, from ONE hash aggregate (the
    // stat_moments power-sum idiom; y pre-scaled by 1e-4 to keep
    // 4th-power sums well inside double range). p from the chi^2_1
    // survival erfc(sqrt(LM/2)) via the shared A&S 7.1.26 polynomial.
    "stat_breusch_pagan" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_quantity").cast("double").as("x"),
          (col("l_extendedprice") / 10000.0).as("y"))
        val m = li.agg(count(lit(1)).cast("double").as("n"),
          sum("x").as("m10"), sum("y").as("m01"),
          sum(expr("x*x")).as("m20"), sum(expr("x*y")).as("m11"),
          sum(expr("y*y")).as("m02"),
          sum(expr("x*x*x")).as("m30"), sum(expr("x*x*y")).as("m21"),
          sum(expr("x*y*y")).as("m12"), sum(expr("y*y*y")).as("m03"),
          sum(expr("x*x*x*x")).as("m40"), sum(expr("x*x*x*y")).as("m31"),
          sum(expr("x*x*y*y")).as("m22"), sum(expr("x*y*y*y")).as("m13"),
          sum(expr("y*y*y*y")).as("m04"))
        val withCoef = m
          .withColumn("dxm", col("n") * col("m20") - col("m10") * col("m10"))
          .filter(col("dxm") > 0)
          .withColumn("b", (col("n") * col("m11") - col("m10") * col("m01")) / col("dxm"))
          .withColumn("a", (col("m01") - col("b") * col("m10")) / col("n"))
        val u = withCoef
          .withColumn("su",
            col("m02") - lit(2) * col("a") * col("m01") - lit(2) * col("b") * col("m11")
              + col("n") * col("a") * col("a")
              + lit(2) * col("a") * col("b") * col("m10")
              + col("b") * col("b") * col("m20"))
          .withColumn("sxu",
            col("m12") - lit(2) * col("a") * col("m11") - lit(2) * col("b") * col("m21")
              + col("a") * col("a") * col("m10")
              + lit(2) * col("a") * col("b") * col("m20")
              + col("b") * col("b") * col("m30"))
          .withColumn("su2",
            col("m04") - lit(4) * col("a") * col("m03") - lit(4) * col("b") * col("m13")
              + lit(6) * (col("a") * col("a") * col("m02")
                + lit(2) * col("a") * col("b") * col("m12")
                + col("b") * col("b") * col("m22"))
              - lit(4) * (col("a") * col("a") * col("a") * col("m01")
                + lit(3) * col("a") * col("a") * col("b") * col("m11")
                + lit(3) * col("a") * col("b") * col("b") * col("m21")
                + col("b") * col("b") * col("b") * col("m31"))
              + col("n") * pow(col("a"), 4)
              + lit(4) * pow(col("a"), 3) * col("b") * col("m10")
              + lit(6) * col("a") * col("a") * col("b") * col("b") * col("m20")
              + lit(4) * col("a") * pow(col("b"), 3) * col("m30")
              + pow(col("b"), 4) * col("m40"))
          .withColumn("du", col("n") * col("su2") - col("su") * col("su"))
          .withColumn("cvu", col("n") * col("sxu") - col("m10") * col("su"))
          .withColumn("bp",
            when(col("du") > 0,
              round(col("n") * col("cvu") * col("cvu")
                / (col("dxm") * col("du")), 4)))
        u.withColumn("xx", sqrt(col("bp") / 2))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("xx")))
          .select(col("n").cast("long").as("n_rows"),
            round(col("b"), 6).as("slope"),
            col("bp").as("bp_stat"),
            when(col("bp").isNull, lit(null).cast("double")).otherwise(round(
              col("t1") * (lit(0.254829592) + col("t1") * (lit(-0.284496736)
                + col("t1") * (lit(1.421413741) + col("t1") * (lit(-1.453152027)
                + col("t1") * lit(1.061405429)))))
              * exp(-col("xx") * col("xx")), 6)).as("p_value"))
      },
      Some("""WITH t AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
             |                  l_extendedprice / 10000.0 AS y FROM lineitem),
             |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS m10, sum(y) AS m01, sum(x*x) AS m20,
             |             sum(x*y) AS m11, sum(y*y) AS m02, sum(x*x*x) AS m30,
             |             sum(x*x*y) AS m21, sum(x*y*y) AS m12, sum(y*y*y) AS m03,
             |             sum(x*x*x*x) AS m40, sum(x*x*x*y) AS m31,
             |             sum(x*x*y*y) AS m22, sum(x*y*y*y) AS m13,
             |             sum(y*y*y*y) AS m04
             |      FROM t),
             |c1 AS (SELECT *, n*m20 - m10*m10 AS dxm FROM m WHERE n*m20 - m10*m10 > 0),
             |c2 AS (SELECT *, (n*m11 - m10*m01) / dxm AS b FROM c1),
             |c3 AS (SELECT *, (m01 - b*m10) / n AS a FROM c2),
             |c4 AS (SELECT *,
             |         m02 - 2*a*m01 - 2*b*m11 + n*a*a + 2*a*b*m10 + b*b*m20 AS su,
             |         m12 - 2*a*m11 - 2*b*m21 + a*a*m10 + 2*a*b*m20 + b*b*m30 AS sxu,
             |         m04 - 4*a*m03 - 4*b*m13
             |           + 6*(a*a*m02 + 2*a*b*m12 + b*b*m22)
             |           - 4*(a*a*a*m01 + 3*a*a*b*m11 + 3*a*b*b*m21 + b*b*b*m31)
             |           + n*a*a*a*a + 4*a*a*a*b*m10 + 6*a*a*b*b*m20
             |           + 4*a*b*b*b*m30 + b*b*b*b*m40 AS su2
             |       FROM c3),
             |c5 AS (SELECT *, n*su2 - su*su AS du, n*sxu - m10*su AS cvu FROM c4),
             |c6 AS (SELECT *, CASE WHEN du > 0
             |                 THEN round(n*cvu*cvu / (dxm*du), 4) END AS bp
             |       FROM c5),
             |c7 AS (SELECT *, sqrt(bp / 2) AS xx,
             |              1.0 / (1.0 + 0.3275911 * sqrt(bp / 2)) AS t1
             |       FROM c6)
             |SELECT CAST(n AS BIGINT) AS n_rows, round(b, 6) AS slope,
             |       bp AS bp_stat,
             |       CASE WHEN bp IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p_value
             |FROM c7""".stripMargin)),

    // Cronbach's alpha internal-consistency of the size rubric: do
    // the three per-doc items (capped char score, capped token score,
    // capped distinct-token score) measure ONE underlying "document
    // size" trait, or is the composite averaging unrelated signals?
    // (Round 11: items rebuilt on QUANTITIES THAT VARY in this corpus
    // — the old alpha-fraction/non-punct items are constant 1.0 on
    // the synthetic text, which made alpha a degenerate 0.) alpha = k/(k-1) * (1 - sum(var_i)/var_total)
    // over population variances - one map-side item projection (the
    // text_charclass regex-strip idiom) and ONE 4-variance aggregate.
    // Cronbach's alpha over three doc-quality items. EXACT-INTEGER
    // sums (round-11): the round-8 two-pass centered altitude still
    // summed doubles, whose partial-merge order flipped a boundary
    // value's 4dp round between runs (round-10 verdict). Now each item
    // is scaled to integer micro-units (round(i*1e6) AS BIGINT) per
    // row; the ONE aggregate sums x and x^2 as exact integers (Spark
    // decimal(38,0), DuckDB HUGEINT) - bitwise identical regardless of
    // partition merge order. var_pop = (n*Sxx - Sx^2)/n^2 off the
    // exact sums; the only double ops are single divisions at the end,
    // which are order-free. alpha = 1.5*(1 - sum(num_i)/num_t) shares
    // the n^2 factor so it divides the exact numerators directly.
    "stat_cronbach" -> Q(
      (s, d) => {
        val tk = graft.text.TextPrimitives.tokens(col("text"))
        val dec = "decimal(38,0)"
        val items = Tables.documents(s, d).select(
          round(least(col("n_chars") / 2000.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("x1"),
          round(least(size(tk) / 100.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("x2"),
          round(least(size(array_distinct(tk)) / 60.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("x3"))
          .withColumn("xt", col("x1") + col("x2") + col("x3"))
        items.agg(
          count(lit(1)).as("n_docs"),
          sum(col("x1").cast(dec)).as("s1"),
          sum(col("x2").cast(dec)).as("s2"),
          sum(col("x3").cast(dec)).as("s3"),
          sum(col("xt").cast(dec)).as("st"),
          sum((col("x1") * col("x1")).cast(dec)).as("q1"),
          sum((col("x2") * col("x2")).cast(dec)).as("q2"),
          sum((col("x3") * col("x3")).cast(dec)).as("q3"),
          sum((col("xt") * col("xt")).cast(dec)).as("qt"))
          .select(col("n_docs"),
            (col("n_docs") * col("q1") - col("s1") * col("s1"))
              .cast("double").as("u1"),
            (col("n_docs") * col("q2") - col("s2") * col("s2"))
              .cast("double").as("u2"),
            (col("n_docs") * col("q3") - col("s3") * col("s3"))
              .cast("double").as("u3"),
            (col("n_docs") * col("qt") - col("st") * col("st"))
              .cast("double").as("ut"))
          .select(col("n_docs"),
            round(col("u1") / (col("n_docs") * col("n_docs") * 1e12), 6)
              .as("var_len"),
            round(col("u2") / (col("n_docs") * col("n_docs") * 1e12), 6)
              .as("var_tok"),
            round(col("u3") / (col("n_docs") * col("n_docs") * 1e12), 6)
              .as("var_vocab"),
            when(col("ut") > 0,
              round(lit(1.5) * (lit(1.0)
                - (col("u1") + col("u2") + col("u3")) / col("ut")), 4))
              .as("alpha"))
      },
      Some("""WITH it AS MATERIALIZED (
             |  SELECT CAST(round(least(n_chars / 2000.0, 1.0) * 1e6) AS BIGINT) AS x1,
             |         CAST(round(least(len(regexp_split_to_array(lower(trim(text)),
             |           '\s+')) / 100.0, 1.0) * 1e6) AS BIGINT) AS x2,
             |         CAST(round(least(len(list_distinct(regexp_split_to_array(
             |           lower(trim(text)), '\s+'))) / 60.0, 1.0) * 1e6) AS BIGINT) AS x3
             |  FROM documents),
             |it2 AS (SELECT *, x1 + x2 + x3 AS xt FROM it),
             |cm AS (
             |  SELECT count(*) AS n_docs,
             |         sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3, sum(xt) AS st,
             |         sum(x1*x1) AS q1, sum(x2*x2) AS q2,
             |         sum(x3*x3) AS q3, sum(xt*xt) AS qt
             |  FROM it2),
             |u AS (
             |  SELECT n_docs,
             |         CAST(n_docs*q1 - s1*s1 AS DOUBLE) AS u1,
             |         CAST(n_docs*q2 - s2*s2 AS DOUBLE) AS u2,
             |         CAST(n_docs*q3 - s3*s3 AS DOUBLE) AS u3,
             |         CAST(n_docs*qt - st*st AS DOUBLE) AS ut
             |  FROM cm)
             |SELECT CAST(n_docs AS BIGINT) AS n_docs,
             |       round(u1 / (CAST(n_docs AS DOUBLE) * n_docs * 1e12), 6) AS var_len,
             |       round(u2 / (CAST(n_docs AS DOUBLE) * n_docs * 1e12), 6) AS var_tok,
             |       round(u3 / (CAST(n_docs AS DOUBLE) * n_docs * 1e12), 6) AS var_vocab,
             |       CASE WHEN ut > 0
             |            THEN round(1.5 * (1.0 - (u1 + u2 + u3) / ut), 4)
             |       END AS alpha
             |FROM u""".stripMargin)),

    // HITS hubs & authorities on the DIRECTED event-type transition
    // graph (the undirected eigencentrality can't separate "sends
    // users onward" from "receives users"): 4 unrolled rounds of
    // a <- M'h / h <- Ma off the SHARED transitionCells table -
    // corpus-scale work is the one materialized lead() pass; every
    // iteration is joins over <= |types|^2 cells. L1-normalized and
    // rounded to 7 per half-step so the trajectory is engine-pinned.
    "graph_hits" -> Q(
      (s, d) => {
        val e = transitionCells(s, d)
          .filter(col("to_type").isNotNull && col("from_type").isNotNull)
          .select(col("from_type").as("u"), col("to_type").as("v"),
                  col("n").cast("double").as("wt"))
          .localCheckpoint(eager = false) // read in all 8 half-steps
        val nodes = e.select(col("u").as("t"))
          .union(e.select(col("v").as("t"))).distinct()
          .localCheckpoint(eager = false)
        var h = nodes.withColumn("h", lit(1.0))
          .localCheckpoint(eager = false)
        var a: DataFrame = null
        for (_ <- 1 to 4) {
          val ar = e.join(h.select(col("t").as("u"), col("h")), "u")
            .groupBy(col("v").as("t")).agg(sum(col("wt") * col("h")).as("raw"))
          val at = ar.agg(sum("raw").as("sm"))
          a = nodes.join(ar, Seq("t"), "left").na.fill(0.0, Seq("raw"))
            .crossJoin(broadcast(at))
            .select(col("t"), when(col("sm") === 0, lit(null).cast("double"))
              .otherwise(round(col("raw") / col("sm"), 7)).as("a"))
            .localCheckpoint(eager = false)
          val hr = e.join(a.select(col("t").as("v"), col("a")), "v")
            .groupBy(col("u").as("t")).agg(sum(col("wt") * col("a")).as("raw"))
          val ht = hr.agg(sum("raw").as("sm"))
          h = nodes.join(hr, Seq("t"), "left").na.fill(0.0, Seq("raw"))
            .crossJoin(broadcast(ht))
            .select(col("t"), when(col("sm") === 0, lit(null).cast("double"))
              .otherwise(round(col("raw") / col("sm"), 7)).as("h"))
            .localCheckpoint(eager = false)
        }
        h.join(a, "t")
          .select(col("t").as("event_type"), col("h").as("hub"),
                  col("a").as("authority"))
          .orderBy("event_type")
      },
      Some(s"""WITH tr AS (
              |  SELECT event_type AS u,
              |         lead(event_type, 1) OVER (PARTITION BY user_id
              |           ORDER BY ts, event_id) AS v
              |  FROM events),
              |e AS MATERIALIZED (SELECT u, v, CAST(count(*) AS DOUBLE) AS wt
              |      FROM tr WHERE u IS NOT NULL AND v IS NOT NULL GROUP BY 1, 2),
              |nodes AS MATERIALIZED (SELECT DISTINCT t
              |          FROM (SELECT u AS t FROM e UNION ALL SELECT v FROM e)),
              |h0 AS MATERIALIZED (SELECT t, 1.0 AS h FROM nodes),
              |${hitsIterSql(4)}
              |SELECT h4.t AS event_type, h4.h AS hub, a4.a AS authority
              |FROM h4 JOIN a4 ON a4.t = h4.t ORDER BY event_type""".stripMargin)),

    // effective sample size of the DSIR importance weights
    // (samp_importance's hashed-unigram LLR model): ESS =
    // (sum w)^2 / sum w^2 per source, w = exp(llr - max llr) - the
    // "how many uniform docs is this weighted corpus worth" diagnostic
    // that decides whether importance-weighted training is viable or
    // the weights have collapsed onto a few docs. Per-doc log-weights
    // are rounded to 4 BEFORE exp (and the shift is the broadcast
    // global max) so the exponentials are engine-pinned; the per-source
    // rollup is one hash aggregate.
    "samp_ess" -> Q(
      (s, d) => {
        val t = graft.text.TextPrimitives.tokens(col("text"))
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"), explode(t).as("tok"))
          .withColumn("b", graft.functions.VectorFunctions.md5Long(col("tok")) % 64)
        val src = tok.groupBy("b").agg(count(lit(1)).as("cs"))
        val tgt = tok.filter(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).as("ct"))
        val probs = src.join(tgt, Seq("b"), "left")
          .na.fill(0L, Seq("ct"))
          .crossJoin(broadcast(src.agg(sum("cs").as("ts"))))
          .crossJoin(broadcast(tgt.agg(sum("ct").as("tt"))))
          .select(col("b"),
            (log((col("ct") + lit(1.0)) / (col("tt") + lit(64.0)))
             - log((col("cs") + lit(1.0)) / (col("ts") + lit(64.0)))).as("llr"))
        val docw = tok.join(broadcast(probs), "b")
          .groupBy("doc_id", "source")
          .agg(round(sum("llr"), 4).as("lw"))
          .localCheckpoint(eager = false) // global max + per-source rollup
        val mx = docw.agg(max("lw").as("m"))
        docw.crossJoin(broadcast(mx))
          .withColumn("w", round(exp(col("lw") - col("m")), 8))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("w").as("sw"),
               sum(col("w") * col("w")).as("sw2"))
          .select(col("source"), col("n_docs"),
            when(col("sw2") > 0,
              round(col("sw") * col("sw") / col("sw2"), 4)).as("ess"),
            when(col("sw2") > 0,
              round(col("sw") * col("sw") / col("sw2") / col("n_docs"), 4))
              .as("ess_ratio"))
          .orderBy("source")
      },
      Some("""WITH tb AS (
             |  SELECT doc_id, source, lang,
             |         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
             |  FROM (SELECT doc_id, source, lang,
             |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)),
             |src AS (SELECT b, CAST(count(*) AS BIGINT) AS cs FROM tb GROUP BY b),
             |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct
             |        FROM tb WHERE lang = 'en' GROUP BY b),
             |tot AS (SELECT (SELECT CAST(sum(cs) AS BIGINT) FROM src) AS ts,
             |               (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS tt),
             |probs AS (SELECT b,
             |                 ln((coalesce(ct, 0) + 1.0) / (tt + 64.0))
             |               - ln((cs + 1.0) / (ts + 64.0)) AS llr
             |          FROM src LEFT JOIN tgt USING (b), tot),
             |docw AS (SELECT doc_id, source, round(sum(llr), 4) AS lw
             |         FROM tb JOIN probs USING (b) GROUP BY 1, 2),
             |mx AS (SELECT max(lw) AS m FROM docw),
             |ws AS (SELECT source, round(exp(lw - m), 8) AS w FROM docw, mx)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CASE WHEN sum(w*w) > 0
             |            THEN round(sum(w)*sum(w) / sum(w*w), 4) END AS ess,
             |       CASE WHEN sum(w*w) > 0
             |            THEN round(sum(w)*sum(w) / sum(w*w) / count(*), 4)
             |       END AS ess_ratio
             |FROM ws GROUP BY source ORDER BY source""".stripMargin)))

  val round10eQ: Seq[(String, Q)] = Seq(
    // Katz centrality of the near-dup graph (x = Σ α^k A^k 1): unlike
    // degree it credits being near hubs, unlike eigencentrality it
    // doesn't starve nodes outside the dominant component — 6 unrolled
    // x ← 1 + α·A·x rounds (α=0.1 << 1/λmax so the series converges)
    // on the SHARED bounded edge build; every iteration is a join over
    // the |E|-row neighbor table, rounded to 7 per round.
    "graph_katz" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false)
        val nbr = e0.select(col("da").as("v"), col("db").as("n"))
          .union(e0.select(col("db").as("v"), col("da").as("n")))
          .localCheckpoint(eager = false) // read once per round
        val nodes = nbr.select(col("v")).distinct()
          .localCheckpoint(eager = false)
        var x = nodes.withColumn("c", lit(1.0))
          .localCheckpoint(eager = false)
        for (_ <- 1 to 6) {
          val sm = nbr.join(x.select(col("v").as("n"), col("c")), "n")
            .groupBy("v").agg(sum("c").as("sm"))
          x = nodes.join(sm, Seq("v"), "left").na.fill(0.0, Seq("sm"))
            .select(col("v"), round(lit(1.0) + lit(0.1) * col("sm"), 7).as("c"))
            .localCheckpoint(eager = false) // next round + final sort
        }
        x.orderBy(col("c").desc, col("v")).limit(10)
          .select(col("v").as("doc_id"), col("c").as("katz"))
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |nbr AS MATERIALIZED (SELECT da AS v, db AS n FROM e0
              |        UNION ALL SELECT db AS v, da AS n FROM e0),
              |nodes AS MATERIALIZED (SELECT DISTINCT v FROM nbr),
              |x0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS c FROM nodes),
              |${katzIterSql(6, 0.1)}
              |SELECT v AS doc_id, c AS katz
              |FROM x6 ORDER BY c DESC, v LIMIT 10""".stripMargin)),

    // harmonic closeness within 4 hops, EVERY node a source: 4
    // unrolled multi-source BFS rounds keyed by (src, node) — the
    // graph_bfs frontier loop on a pair table bounded by |V|² of the
    // bounded dup subgraph (never by document rows). Harmonic form
    // (Σ 1/d) so disconnected pairs contribute 0 instead of ∞ —
    // truncation at 4 hops is exact on this graph class because
    // near-dup components are shallow.
    "graph_closeness" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false)
        val nbr = e0.select(col("da").as("v"), col("db").as("n"))
          .union(e0.select(col("db").as("v"), col("da").as("n")))
          .localCheckpoint(eager = false) // read once per round
        var dt = nbr.select(col("v")).distinct()
          .select(col("v").as("src"), col("v").as("nd"))
          .withColumn("depth", lit(0L))
          .localCheckpoint(eager = false)
        for (k <- 1 to 4) {
          val fr = dt.filter(col("depth") === (k - 1).toLong)
          val nxt = fr.join(nbr, col("nd") === col("v"))
            .select(col("src"), col("n").as("nd")).distinct()
            .join(dt, Seq("src", "nd"), "left_anti")
            .withColumn("depth", lit(k.toLong))
          dt = dt.union(nxt)
            .localCheckpoint(eager = false) // next round reads twice
        }
        dt.filter(col("depth") > 0)
          .groupBy("src")
          .agg(count(lit(1)).as("n_reached"),
               round(sum(lit(1.0) / col("depth")), 4).as("harmonic"))
          .orderBy(col("harmonic").desc, col("src"))
          .limit(10)
          .select(col("src").as("doc_id"), col("n_reached"), col("harmonic"))
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |nbr AS MATERIALIZED (SELECT da AS v, db AS n FROM e0
              |        UNION ALL SELECT db AS v, da AS n FROM e0),
              |c0 AS MATERIALIZED (SELECT v AS src, v AS nd, CAST(0 AS BIGINT) AS depth
              |       FROM (SELECT DISTINCT v FROM nbr)),
              |${closeIterSql(4)}
              |SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS n_reached,
              |       round(sum(1.0 / depth), 4) AS harmonic
              |FROM c4 WHERE depth > 0 GROUP BY src
              |ORDER BY harmonic DESC, doc_id LIMIT 10""".stripMargin)),

    // hubness audit of the embedding space (Radovanović 2010): the
    // k-occurrence distribution N_5(x) off the dense-kernel 5-NN
    // graph — high-dim spaces grow "hubs" that appear in everyone's
    // neighbor lists and antihubs that appear in none, which silently
    // skews kNN-based dedup/eval. Occurrence moments come from exact
    // integer power sums (mean is k BY CONSTRUCTION — a free
    // invariant); corpus-scale work is the one TopK kernel pass.
    "emb_hubness" -> Q(
      (s, d) => {
        import graft.ann.Ann
        val emb = Tables.embeddings(s, d)
        val edges = Ann.bruteForceTopKDense(emb,
            emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), 5)
          .select(col("qid"), col("vec_id").as("nid"))
        val occ = emb.select(col("vec_id"))
          .join(edges.groupBy("nid").agg(count(lit(1)).as("occ")),
            col("vec_id") === col("nid"), "left")
          .na.fill(0L, Seq("occ"))
        occ.agg(count(lit(1)).cast("double").as("n"),
            sum("occ").as("s1"),
            sum(col("occ") * col("occ")).as("s2"),
            sum(col("occ") * col("occ") * col("occ")).as("s3"),
            max("occ").as("mx"),
            sum(when(col("occ") === 0, 1L).otherwise(0L)).as("anti"),
            sum(when(col("occ") >= 10, 1L).otherwise(0L)).as("hubs"))
          .withColumn("mu", col("s1") / col("n"))
          .withColumn("m2", col("s2") / col("n") - col("mu") * col("mu"))
          .withColumn("m3", col("s3") / col("n")
            - lit(3.0) * col("mu") * col("s2") / col("n")
            + lit(2.0) * col("mu") * col("mu") * col("mu"))
          .select(col("n").cast("long").as("n_vecs"),
            round(col("mu"), 4).as("mean_occ"),
            col("mx").as("max_occ"),
            col("anti").as("n_antihubs"),
            col("hubs").as("n_hubs"),
            when(col("m2") > 0,
              round(col("m3") / pow(col("m2"), 1.5), 4)).as("skew_occ"))
      },
      Some("""WITH sc AS (
             |  SELECT q.vec_id AS qid, e.vec_id AS nid,
             |         round(list_cosine_similarity(e.embedding::DOUBLE[],
             |               q.embedding::DOUBLE[]), 6) + 0.0 AS score
             |  FROM embeddings e, embeddings q WHERE e.vec_id <> q.vec_id),
             |ed AS MATERIALIZED (SELECT qid, nid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid
             |           ORDER BY score DESC, nid) AS rnk FROM sc)
             |  WHERE rnk <= 5),
             |oc AS (SELECT e.vec_id,
             |              coalesce(g.occ, 0) AS occ
             |       FROM embeddings e LEFT JOIN
             |         (SELECT nid, CAST(count(*) AS BIGINT) AS occ
             |          FROM ed GROUP BY nid) g ON g.nid = e.vec_id),
             |ag AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(occ) AS s1,
             |              sum(occ*occ) AS s2, sum(occ*occ*occ) AS s3,
             |              max(occ) AS mx,
             |              sum(CASE WHEN occ = 0 THEN 1 ELSE 0 END) AS nanti,
             |              sum(CASE WHEN occ >= 10 THEN 1 ELSE 0 END) AS hubs
             |       FROM oc),
             |mm AS (SELECT *, s1/n AS mu, s2/n - (s1/n)*(s1/n) AS m2,
             |              s3/n - 3.0*(s1/n)*s2/n + 2.0*(s1/n)*(s1/n)*(s1/n) AS m3
             |       FROM ag)
             |SELECT CAST(n AS BIGINT) AS n_vecs, round(mu, 4) AS mean_occ,
             |       CAST(mx AS BIGINT) AS max_occ,
             |       CAST(nanti AS BIGINT) AS n_antihubs,
             |       CAST(hubs AS BIGINT) AS n_hubs,
             |       CASE WHEN m2 > 0 THEN round(m3 / power(m2, 1.5), 4)
             |       END AS skew_occ
             |FROM mm""".stripMargin)),

    // top eigenvalue of the embedding covariance by 8 unrolled power
    // iterations over the SAME 4096-cell cross-moment aggregate as
    // emb_participation_ratio — λ₁/tr(C) is the "one direction owns
    // the variance" share that PCA would report, without ever forming
    // a dense matrix outside the bounded cell table. Corpus-scale work
    // is ONE map-side-combinable aggregate; every iteration is a join
    // over 4096 rows, L1-normalized (abs: eigenvector components carry
    // sign) and rounded to 7.
    "emb_top_eigen" -> Q(
      (s, d) => {
        // ONE array-sum aggregate over the embeddings scan (no N·d²
        // row fan-out), then the 8 power steps run driver-side on the
        // bounded d² cells — kills both scale problems the
        // double-posexplode + 8-cluster-job form had (CovMoments doc)
        import graft.embed.CovMoments._
        import s.implicits._
        val cv = covCells(moments(Tables.embeddings(s, d)))
        val dim = cv.length
        val v = powerIterate(cv, 8)
        val ray = rayleigh(cv, v)
        var trc = 0.0
        (0 until dim).foreach(i => trc += cv(i)(i))
        Seq((dim.toLong, r(trc, 6),
             ray.map(x => r(x, 6)),
             ray.filter(_ => trc > 0).map(x => r(x / trc, 4))))
          .toDF("dim", "tr_c", "lambda1", "top_share")
      },
      Some(s"""WITH px AS (SELECT vec_id,
              |              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS a,
              |              CAST(unnest(embedding) AS DOUBLE) AS xa
              |            FROM embeddings WHERE embedding IS NOT NULL),
              |cells AS MATERIALIZED (
              |  SELECT p.a, q.a AS b,
              |         round(sum(p.xa * q.xa) / count(*) -
              |               (sum(p.xa) / count(*)) * (sum(q.xa) / count(*)), 7) AS cv
              |  FROM px p JOIN px q ON p.vec_id = q.vec_id
              |  GROUP BY 1, 2),
              |v0 AS MATERIALIZED (SELECT a AS i, 1.0 AS x FROM cells WHERE a = b),
              |${covPowIterSql(8)},
              |num AS (SELECT sum(c.cv * va.x * vb.x) AS num
              |        FROM cells c JOIN v8 va ON va.i = c.a
              |                     JOIN v8 vb ON vb.i = c.b),
              |den AS (SELECT sum(x*x) AS den FROM v8),
              |tr AS (SELECT sum(cv) AS trc, max(a) + 1 AS dim
              |       FROM cells WHERE a = b)
              |SELECT CAST(dim AS BIGINT) AS dim, round(trc, 6) AS tr_c,
              |       CASE WHEN den > 0 THEN round(num / den, 6) END AS lambda1,
              |       CASE WHEN den > 0 AND trc > 0
              |            THEN round(num / den / trc, 4) END AS top_share
              |FROM tr, num, den""".stripMargin)),

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
             |FROM dp, tm, tot""".stripMargin)))

  val round10fQ: Seq[(String, Q)] = Seq(
    // deterministic 5-fold cross-validation assignment + balance
    // audit: folds are md5(doc_id) — stable under re-runs and
    // repartitioning (the samp_hash_split contract) — and the audit
    // reports what fold assignment actually controls: doc share,
    // token share, and per-fold drift of the en-language share vs the
    // corpus. ONE map-side projection + one grouped pass; the corpus
    // share is a broadcast 1-row aggregate.
    "samp_kfold" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val t = Tables.documents(s, d).select(
          pmod(md5Long(concat(lit("kfold:"), col("doc_id").cast("string"))),
            lit(5)).as("fold"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
            .as("n_tok"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en"))
          .localCheckpoint(eager = false) // global share + per-fold rollup
        val g = t.agg((sum("is_en") / count(lit(1))).as("g_en"),
                      sum("n_tok").as("g_tok"))
        t.groupBy("fold")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
               (sum("is_en") / count(lit(1))).as("en_s"))
          .crossJoin(broadcast(g))
          .select(col("fold"), col("n_docs"), col("n_tokens"),
            round(col("n_tokens") / col("g_tok").cast("double"), 4)
              .as("tok_share"),
            round(col("en_s"), 4).as("en_share"),
            round(abs(col("en_s") - col("g_en")), 4).as("en_dev"))
          .orderBy("fold")
      },
      Some("""WITH t AS (
             |  SELECT ('0x' || substr(md5('kfold:' || doc_id::VARCHAR), 1, 15))::BIGINT
             |           % 5 AS fold,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok,
             |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
             |  FROM documents),
             |g AS (SELECT sum(is_en) * 1.0 / count(*) AS g_en,
             |             CAST(sum(n_tok) AS BIGINT) AS g_tok FROM t)
             |SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |       round(sum(n_tok) / CAST(g_tok AS DOUBLE), 4) AS tok_share,
             |       round(sum(is_en) * 1.0 / count(*), 4) AS en_share,
             |       round(abs(sum(is_en) * 1.0 / count(*) - g_en), 4) AS en_dev
             |FROM t, g GROUP BY fold, g_tok, g_en ORDER BY fold""".stripMargin)),

    // bloom-filter incremental dedup (the 100 TB daily-increment
    // screen): a 2^16-bit / 3-hash bloom over the EXISTING corpus's
    // content hashes, probed by the new batch — the filter is a
    // DISTINCT bit-position table bounded by m (broadcastable at any
    // corpus size), membership is "all 3 positions present" via one
    // semi-join + HAVING, and the report quantifies exactly what a
    // bloom buys: hits vs true dups vs false positives at the
    // measured load factor. All-md5 arithmetic, bit-exact on both
    // engines; the exact-dup flag comes from the content-hash set.
    "dedup_bloom_incremental" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ks = array(lit(0), lit(1), lit(2))
        def positions(df: DataFrame) = df
          .withColumn("h", md5(col("text")))
          .select(col("doc_id"), col("h"), explode(ks).as("k"))
          .withColumn("pos",
            pmod(md5Long(concat(col("h"), lit(":"), col("k").cast("string"))),
              lit(65536)))
        val corpus = Tables.documents(s, d).filter(col("doc_id") < 150)
        val batch = Tables.documents(s, d)
          .filter(col("doc_id") >= 150 && col("doc_id") < 250)
        val bloom = positions(corpus).select("pos").distinct()
          .localCheckpoint(eager = false) // bits_set + the probe join
        val corpusH = corpus.select(md5(col("text")).as("h")).distinct()
        val probed = positions(batch)
          .join(broadcast(bloom), Seq("pos"), "left_semi")
          .groupBy("doc_id", "h").agg(count(lit(1)).as("n_pos_hit"))
        val flags = batch.select(col("doc_id"), md5(col("text")).as("h"))
          .join(probed.select(col("doc_id"), col("n_pos_hit")), Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_pos_hit"))
          .withColumn("bloom_hit", (col("n_pos_hit") === 3).cast("long"))
          .join(broadcast(corpusH.withColumn("exact", lit(1L))), Seq("h"), "left")
          .na.fill(0L, Seq("exact"))
        val bits = bloom.agg(count(lit(1)).as("bits_set"))
        flags.agg(count(lit(1)).as("n_batch"),
            sum("bloom_hit").as("n_bloom_hits"),
            sum("exact").as("n_exact_dups"),
            sum(when(col("bloom_hit") === 1 && col("exact") === 0, 1L)
              .otherwise(0L)).as("n_false_pos"))
          .crossJoin(broadcast(bits))
          .select(col("n_batch"), col("n_bloom_hits"), col("n_exact_dups"),
            col("n_false_pos"),
            round(col("n_false_pos") / col("n_batch").cast("double"), 6)
              .as("fp_rate"),
            col("bits_set"),
            round(col("bits_set") / lit(65536.0), 4).as("load_factor"))
      },
      Some("""WITH ks AS (SELECT CAST(unnest([0, 1, 2]) AS INT) AS k),
             |cp AS (SELECT DISTINCT
             |         ('0x' || substr(md5(md5(text) || ':' || k::VARCHAR), 1, 15))::BIGINT
             |           % 65536 AS pos
             |       FROM documents, ks WHERE doc_id < 150),
             |bh AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 150),
             |bp AS (SELECT doc_id, md5(text) AS h, k,
             |         ('0x' || substr(md5(md5(text) || ':' || k::VARCHAR), 1, 15))::BIGINT
             |           % 65536 AS pos
             |       FROM documents, ks WHERE doc_id >= 150 AND doc_id < 250),
             |pr AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS n_pos_hit
             |       FROM bp WHERE pos IN (SELECT pos FROM cp)
             |       GROUP BY doc_id, h),
             |fl AS (SELECT b.doc_id,
             |              CASE WHEN coalesce(pr.n_pos_hit, 0) = 3 THEN 1 ELSE 0 END AS bloom_hit,
             |              CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END AS exact
             |       FROM (SELECT doc_id, md5(text) AS h FROM documents
             |             WHERE doc_id >= 150 AND doc_id < 250) b
             |       LEFT JOIN pr ON pr.doc_id = b.doc_id
             |       LEFT JOIN bh ON bh.h = b.h),
             |bits AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM cp)
             |SELECT CAST(count(*) AS BIGINT) AS n_batch,
             |       CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
             |       CAST(sum(exact) AS BIGINT) AS n_exact_dups,
             |       CAST(sum(CASE WHEN bloom_hit = 1 AND exact = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_false_pos,
             |       round(sum(CASE WHEN bloom_hit = 1 AND exact = 0 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 6) AS fp_rate,
             |       bits_set, round(bits_set / 65536.0, 4) AS load_factor
             |FROM fl, bits GROUP BY bits_set""".stripMargin)),

    // process-conformance audit (process mining): which observed
    // event-type transitions fall OUTSIDE the declared process model?
    // Pure projection over the SHARED transition cells — zero
    // additional fact scans — with the model as a literal allowlist
    // (the form a process owner writes down). The rate column is the
    // one-number conformance KPI; the rows localize the deviations.
    "ev_conformance" -> Q(
      (s, d) => {
        val allowed = Seq("signup>click", "click>click", "click>purchase",
          "click>error", "error>click")
        val cells = transitionCells(s, d).filter(col("to_type").isNotNull)
          .select(col("from_type"), col("to_type"), col("n"))
          .withColumn("is_allowed",
            when(concat(col("from_type"), lit(">"), col("to_type"))
              .isin(allowed: _*), 1L).otherwise(0L))
          .localCheckpoint(eager = false) // totals + output rows
        val tot = cells.agg(sum("n").as("tn"),
          sum(when(col("is_allowed") === 1, col("n")).otherwise(0L)).as("cn"))
        cells.crossJoin(broadcast(tot))
          .select(col("from_type"), col("to_type"), col("n"), col("is_allowed"),
            round(col("cn") / col("tn").cast("double"), 4)
              .as("conformance_rate"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type, 1) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cells AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
             |                 CASE WHEN from_type || '>' || to_type IN
             |                   ('signup>click', 'click>click', 'click>purchase',
             |                    'click>error', 'error>click')
             |                 THEN 1 ELSE 0 END AS is_allowed
             |          FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT sum(n) AS tn,
             |               sum(CASE WHEN is_allowed = 1 THEN n ELSE 0 END) AS cn
             |        FROM cells)
             |SELECT from_type, to_type, n, CAST(is_allowed AS BIGINT) AS is_allowed,
             |       round(cn / CAST(tn AS DOUBLE), 4) AS conformance_rate
             |FROM cells, tot ORDER BY from_type, to_type""".stripMargin)),

    // video keyframe selection: one keyframe per detected shot (frame
    // 0 + every mm_shot_bounds cut) — the frame set a vision encoder
    // would actually ingest, with the compression it buys. Same
    // decode-stub feature stream; per-video fan-out bounded at 240
    // frames; the keyframe pick is the same per-video lag window.
    "mm_video_keyframes" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val frames = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 2) // kind = video
          .select(col("doc_id"),
            (md5Long(col("text")) % 240 + 1).as("n_frames"))
          .select(col("doc_id"), col("n_frames"),
            explode(sequence(lit(0L), col("n_frames") - 1)).as("f"))
          .withColumn("feat",
            md5Long(concat(col("doc_id").cast("string"), lit("#"),
              col("f").cast("string"))) % 1000)
        val w = Window.partitionBy("doc_id").orderBy("f")
        frames.withColumn("pf", lag(col("feat"), 1).over(w))
          .withColumn("kf",
            when(col("pf").isNull || abs(col("feat") - col("pf")) > 600, 1L)
              .otherwise(0L))
          .groupBy("doc_id", "n_frames")
          .agg(sum("kf").as("n_keyframes"),
               max(when(col("kf") === 1, col("f"))).as("last_keyframe"))
          .select(col("doc_id"), col("n_frames"), col("n_keyframes"),
            col("last_keyframe"),
            round(col("n_keyframes") / col("n_frames").cast("double"), 4)
              .as("keep_ratio"),
            round(col("n_frames") / col("n_keyframes").cast("double"), 2)
              .as("mean_shot_len"))
          .orderBy("doc_id")
      },
      Some("""WITH fr AS (
             |  SELECT doc_id, n_frames,
             |         CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS f
             |  FROM (SELECT doc_id,
             |               ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1 AS n_frames
             |        FROM documents WHERE doc_id % 3 = 2)),
             |ft AS (SELECT doc_id, n_frames, f,
             |         ('0x' || substr(md5(doc_id::VARCHAR || '#' || f::VARCHAR), 1, 15))::BIGINT
             |           % 1000 AS feat
             |       FROM fr),
             |lg AS (SELECT doc_id, n_frames, f, feat,
             |         lag(feat) OVER (PARTITION BY doc_id ORDER BY f) AS pf FROM ft),
             |kf AS (SELECT doc_id, n_frames, f,
             |         CASE WHEN pf IS NULL OR abs(feat - pf) > 600 THEN 1 ELSE 0 END AS kf
             |       FROM lg)
             |SELECT doc_id, n_frames, CAST(sum(kf) AS BIGINT) AS n_keyframes,
             |       CAST(max(CASE WHEN kf = 1 THEN f END) AS BIGINT) AS last_keyframe,
             |       round(sum(kf) / CAST(n_frames AS DOUBLE), 4) AS keep_ratio,
             |       round(n_frames / CAST(sum(kf) AS DOUBLE), 2) AS mean_shot_len
             |FROM kf GROUP BY doc_id, n_frames ORDER BY doc_id""".stripMargin)),

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
             |FROM pv ORDER BY event_type""".stripMargin)))
}
