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
private[graft] object QEvents {


  val eventsQ: Seq[(String, Q)] = Seq(
    // `ts` is read as epoch-nanos Long (Tables.events) — gap and window
    // arithmetic is exact integer math on both engines.
    "ev_sessionize" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("session_id",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id,
             |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
             |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    "ev_json_extract" -> Q(
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "ev_error_rate" -> Q(
      (s, d) => {
        val isErr = when(col("event_type") === "error", 1).otherwise(0)
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum(isErr).as("n_errors"))
          .filter(col("n_events") >= 20)
          .withColumn("err_rate",
            round(col("n_errors") * lit(1.0) / col("n_events"), 4))
          .orderBy(col("err_rate").desc, col("user_id"))
          .limit(5)
      },
      Some("""SELECT user_id, n_events, n_errors,
             |       round(n_errors * 1.0 / n_events, 4) AS err_rate FROM (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
             |  FROM events GROUP BY user_id HAVING count(*) >= 20)
             |ORDER BY err_rate DESC, user_id LIMIT 5""".stripMargin)),

    // as-of join: each error event matched to the latest click at or
    // before it (per user) — union + one ordered window pass, no
    // inequality join (graft.ops.Joins.asofJoin)
    "ev_asof_join" -> Q(
      (s, d) => {
        // µs resolution both sides: DuckDB truncates the nanos parquet
        // to µs TIMESTAMP, so the oracle can't see sub-µs digits
        val ev = Tables.events(s, d)
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ats"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), expr("ts DIV 1000").as("bts"), col("event_id"))
          .groupBy("user_id", "bts").agg(max("event_id").as("click_id"))
        graft.ops.Joins.asofJoin(errs, clicks, Seq("user_id"), "ats", "bts")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_err"),
               count(col("asof.bts")).as("n_matched"),
               sum(col("ats") - col("asof.bts")).as("sum_lag_us"))
          .orderBy("user_id")
      },
      Some("""WITH a AS (SELECT user_id, event_id, epoch_us(ts) AS ats
             |           FROM events WHERE event_type = 'error'),
             |b AS (SELECT user_id, epoch_us(ts) AS bts, max(event_id) AS click_id
             |      FROM events WHERE event_type = 'click' GROUP BY user_id, bts),
             |j AS (SELECT a.user_id, a.ats, b.bts
             |      FROM a ASOF LEFT JOIN b
             |        ON a.user_id = b.user_id AND a.ats >= b.bts)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_err,
             |       CAST(count(bts) AS BIGINT) AS n_matched,
             |       CAST(sum(ats - bts) AS BIGINT) AS sum_lag_us
             |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // range join: clicks attributed to the 5-minute window before each
    // purchase — bucketed equi-join, not a nested-loop BETWEEN join
    // (graft.ops.Joins.rangeJoinBucketed)
    "ev_range_join" -> Q(
      (s, d) => {
        // µs resolution both sides (see ev_asof_join)
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), expr("ts DIV 1000").as("cts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
                  (expr("ts DIV 1000") - lit(300000000L)).as("st"),
                  expr("ts DIV 1000").as("en"))
        val pairs = graft.ops.Joins.rangeJoinBucketed(
          clicks, purch, Seq("user_id"), "cts", "st", "en", 300000000L)
        val pu = purch.groupBy("user_id").agg(count(lit(1)).as("n_purch"))
        val pp = pairs.groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"), countDistinct("pid").as("n_purch_matched"))
        pu.join(pp, Seq("user_id"), "left")
          .select(col("user_id"), col("n_purch"),
                  coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
                  coalesce(col("n_purch_matched"), lit(0L)).as("n_purch_matched"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, epoch_us(ts) AS cts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pts
             |      FROM events WHERE event_type = 'purchase'),
             |pairs AS (SELECT p.user_id, p.pid FROM p JOIN c
             |          ON p.user_id = c.user_id
             |         AND c.cts BETWEEN p.pts - 300000000 AND p.pts),
             |pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch
             |       FROM p GROUP BY user_id),
             |pp AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
             |              CAST(count(DISTINCT pid) AS BIGINT) AS n_purch_matched
             |       FROM pairs GROUP BY user_id)
             |SELECT pu.user_id, n_purch, coalesce(n_pairs, 0) AS n_pairs,
             |       coalesce(n_purch_matched, 0) AS n_purch_matched
             |FROM pu LEFT JOIN pp ON pu.user_id = pp.user_id
             |ORDER BY pu.user_id""".stripMargin)),

    // ordered string aggregation (deterministic: sorted before join)
    "q_string_agg" -> Q(
      (s, d) => Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .filter(col("s_acctbal") > 9000)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
             array_join(sort_array(collect_list(col("s_name"))), ",").as("names"))
        .orderBy("n_name"),
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             |       string_agg(s_name, ',' ORDER BY s_name) AS names
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE s_acctbal > 9000
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // correlation / covariance per group
    "stat_corr" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
             round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             |       round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // z-score outlier counting per event type (3σ rule)
    // robust outliers: median absolute deviation (3×MAD rule) —
    // immune to the heavy tail that inflates stddev in ev_outliers;
    // med/mad rounded to 6 BEFORE the comparison so the boundary
    // test is bit-identical in both engines
    "stat_mad" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val med = ev.groupBy(col("event_type").as("et"))
          .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
        val mad = ev.join(broadcast(med), col("event_type") === col("et"))
          .select(col("event_type").as("et2"), abs(col("value") - col("med")).as("dev"))
          .groupBy("et2")
          .agg(round(expr("percentile(dev, 0.5D)"), 6).as("mad"))
        ev.join(broadcast(med), col("event_type") === col("et"))
          .join(broadcast(mad), col("event_type") === col("et2"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max("med").as("med"), max("mad").as("mad"),
               sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1L)
                 .otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH med AS (SELECT event_type AS et, round(quantile_cont(value, 0.5), 6) AS med
             |             FROM events GROUP BY event_type),
             |mad AS (SELECT event_type AS et2, round(quantile_cont(abs(value - med), 0.5), 6) AS mad
             |        FROM events JOIN med ON event_type = et GROUP BY event_type)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(med) AS med, max(mad) AS mad,
             |       CAST(sum(CASE WHEN abs(value - med) > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM events JOIN med ON event_type = et JOIN mad ON event_type = et2
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // mergeable approximate-quantile sketch (deterministic KLL/MRL
    // compactors, ops/QuantileSketch.scala): the sketch shuffles
    // O(k·log(n/k)) values per partition instead of sorting the group.
    // The oracled subset is bounded (≤ k values per group), where the
    // sketch is provably EXACT under any partitioning and matches
    // DuckDB quantile_disc bit-for-bit — the ev_heavy_hitters pattern;
    // the rank-error bound under real compaction is property-tested
    // (QuantileSketchPropSpec).
    // The bound must hold by CONSTRUCTION, not corpus shape: the
    // original `user_id < 40` subset was small only because user ids
    // were uniform — the skewed sf3 flush (zipf s=1.5) put 1.5M rows
    // per group behind it, compaction engaged, and the approximate
    // answers diverged from quantile_disc. `event_id < 2000` bounds
    // the subset at ≤2000 rows for ANY key/type distribution and any
    // SF, and k=2048 keeps n ≤ k per group even if one type took the
    // whole subset.
    "stat_approx_quantiles" -> Q(
      (s, d) => {
        val qagg = graft.ops.QuantileSketch.approxQuantiles(
          2048, Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
        Tables.events(s, d).filter(col("event_id") < 2000)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), qagg(col("value")).as("qs"))
          .select(col("event_type"), col("n"),
            element_at(col("qs"), 1).as("q10"),
            element_at(col("qs"), 2).as("q25"),
            element_at(col("qs"), 3).as("q50"),
            element_at(col("qs"), 4).as("q75"),
            element_at(col("qs"), 5).as("q90"),
            element_at(col("qs"), 6).as("q99"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       quantile_disc(value, 0.1) AS q10,
             |       quantile_disc(value, 0.25) AS q25,
             |       quantile_disc(value, 0.5) AS q50,
             |       quantile_disc(value, 0.75) AS q75,
             |       quantile_disc(value, 0.9) AS q90,
             |       quantile_disc(value, 0.99) AS q99
             |FROM events WHERE event_id < 2000
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // OHLC resampling: 1h bars per event type (open/close by first/
    // last event in the bar, ties broken by event_id; per-bar windows
    // are bounded, never global)
    "ts_ohlc" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("value"), col("event_id"),
                  expr("ts DIV 1000").as("ats"))
          .withColumn("bucket", expr("ats DIV 3600000000"))
        val wo = Window.partitionBy("event_type", "bucket")
          .orderBy(col("ats"), col("event_id"))
        val wc = Window.partitionBy("event_type", "bucket")
          .orderBy(col("ats").desc, col("event_id").desc)
        ev.withColumn("ro", row_number().over(wo))
          .withColumn("rc", row_number().over(wc))
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n"),
               max(when(col("ro") === 1, col("value"))).as("open"),
               round(max("value"), 4).as("high"),
               round(min("value"), 4).as("low"),
               max(when(col("rc") === 1, col("value"))).as("close"))
          .orderBy("event_type", "bucket")
      },
      Some("""SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
             |       max(CASE WHEN ro = 1 THEN value END) AS open,
             |       round(max(value), 4) AS high, round(min(value), 4) AS low,
             |       max(CASE WHEN rc = 1 THEN value END) AS close
             |FROM (
             |  SELECT event_type, value, epoch_us(ts) // 3600000000 AS bucket,
             |         row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
             |                            ORDER BY epoch_us(ts), event_id) AS ro,
             |         row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
             |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rc
             |  FROM events)
             |GROUP BY event_type, bucket ORDER BY event_type, bucket""".stripMargin)),

    "ev_outliers" -> Q(
      (s, d) => {
        val stats = Tables.events(s, d).groupBy(col("event_type").as("et"))
          .agg(avg("value").as("mu"), stddev("value").as("sd"))
        Tables.events(s, d)
          .join(broadcast(stats), col("event_type") === col("et"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
               sum(when(abs((col("value") - col("mu")) / col("sd")) > 3, 1L)
                 .otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH stats AS (SELECT event_type AS et, avg(value) AS mu, stddev_samp(value) AS sd
             |               FROM events GROUP BY event_type)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN abs((value - mu) / sd) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM events JOIN stats ON event_type = et
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // fixed-width histogram of a measure column (20 × 25-unit bins)
    "ev_histogram" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(least(floor(col("value") / 25.0), lit(19.0)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("bin"),
      Some("""SELECT CAST(least(floor(value / 25.0), 19.0) AS BIGINT) AS bin,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY bin ORDER BY bin""".stripMargin)),

    // heavy hitters via a mergeable Space-Saving sketch: m counters
    // per map task, m rows per partition through the shuffle — the
    // 100 TB answer to "top tokens" without grouping every distinct
    // key. Oracled on the bounded event_type domain, where m exceeds
    // the true distinct count and the sketch is provably exact
    // (err = 0); the N/m frequency + error-bound guarantees on a
    // genuinely-sketched domain are covered by HeavyHittersSpec.
    "ev_heavy_hitters" -> Q(
      (s, d) => Tables.events(s, d)
        .agg(graft.ops.HeavyHitters.heavyHitters(64)(col("event_type")).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.key").as("key"), col("h.count").as("count"),
          col("h.err").as("err"))
        .orderBy(col("count").desc, col("key")),
      Some("""SELECT event_type AS key, CAST(count(*) AS BIGINT) AS count,
             |       CAST(0 AS BIGINT) AS err
             |FROM events GROUP BY event_type
             |ORDER BY count DESC, key""".stripMargin)),

    // ordered funnel: signup → first click after signup → first
    // purchase after that click, per user (µs both sides)
    "ev_funnel" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("ats"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ats").as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("ats") >= col("t1"))
          .groupBy("user_id").agg(min("ats").as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("ats") >= col("t2"))
          .groupBy("user_id").agg(min("ats").as("t3"))
        s1.agg(count(lit(1)).as("n_signup"))
          .crossJoin(s2.agg(count(lit(1)).as("n_click_after")))
          .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after")))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ats FROM events),
             |s1 AS (SELECT user_id, min(ats) AS t1 FROM ev
             |       WHERE event_type = 'signup' GROUP BY user_id),
             |s2 AS (SELECT ev.user_id, min(ats) AS t2 FROM ev JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND ats >= t1 GROUP BY ev.user_id),
             |s3 AS (SELECT ev.user_id, min(ats) AS t3 FROM ev JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND ats >= t2 GROUP BY ev.user_id)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_after,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_after""".stripMargin)),

    // cohort retention: users active in their first day who return in
    // any of days 2..7 (µs days both sides)
    "ev_retention" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"))
        val d0 = ev.groupBy("user_id").agg(min("day").as("day0"))
        // retained := a HEAVY (>=14-event) return week — with bare
        // "appeared again" every user of this corpus retains (round-11
        // degeneracy fix)
        val ret = ev.join(d0, "user_id")
          .filter(col("day") > col("day0") && col("day") <= col("day0") + 7)
          .groupBy("user_id").agg(count(lit(1)).as("k"))
          .filter(col("k") >= 14).select("user_id")
        d0.agg(count(lit(1)).as("n_users"))
          .crossJoin(ret.agg(count(lit(1)).as("n_retained")))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
             |d0 AS (SELECT user_id, min(day) AS day0 FROM ev GROUP BY user_id),
             |ret AS (SELECT user_id FROM ev JOIN d0 USING (user_id)
             |        WHERE day > day0 AND day <= day0 + 7
             |        GROUP BY user_id HAVING count(*) >= 14)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d0) AS n_users,
             |       (SELECT CAST(count(*) AS BIGINT) FROM ret) AS n_retained""".stripMargin)),

    // bounded-lookback EWMA per user (the streaming-safe form of
    // exponential smoothing): 8 explicit lag terms with weights
    // α(1-α)^k, α=0.5, normalized over the lags actually present.
    // A truly recursive EWMA is order-dependent and non-mergeable;
    // the bounded form is a fixed-size window expression — per-user
    // partitions, 8-row frames, identical left-associated arithmetic
    // on both engines
    "ev_ewma_bounded" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val terms = (0 to 7).map { k =>
          val lv = if (k == 0) col("value") else lag(col("value"), k).over(w)
          val wk = lit(0.5 * math.pow(0.5, k))
          (when(lv.isNotNull, lv * wk).otherwise(lit(0.0)),
           when(lv.isNotNull, wk).otherwise(lit(0.0)))
        }
        val num = terms.map(_._1).reduceLeft(_ + _)
        val den = terms.map(_._2).reduceLeft(_ + _)
        // all-lags-null (e.g. a user whose every value is NULL) makes
        // den 0 → NULL the smoothed value on both engines instead of
        // inheriting a 0/0 convention
        ev.withColumn("ewma",
            when(den === 0, lit(null).cast("double")).otherwise(round(num / den, 4)))
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("event_id"), round(col("value"), 4).as("v"),
                  col("ewma"))
          .orderBy("user_id", "event_id")
      },
      Some {
        val lags = (0 to 7).map { k =>
          val lv = if (k == 0) "value"
                   else s"lag(value, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
          (s"l$k", lv, 0.5 * math.pow(0.5, k))
        }
        val defs = lags.map { case (n, e, _) => s"$e AS $n" }.mkString(", ")
        val num = lags.map { case (n, _, w) => s"CASE WHEN $n IS NOT NULL THEN $n * $w ELSE 0.0 END" }
          .mkString(" + ")
        val den = lags.map { case (n, _, w) => s"CASE WHEN $n IS NOT NULL THEN $w ELSE 0.0 END" }
          .mkString(" + ")
        s"""SELECT user_id, event_id, round(value, 4) AS v,
           |       CASE WHEN ($den) = 0 THEN NULL
           |            ELSE round(($num) / ($den), 4) END AS ewma
           |FROM (SELECT user_id, event_id, value, $defs FROM events)
           |WHERE user_id < 20
           |ORDER BY user_id, event_id""".stripMargin
      }),

    // event-type transition matrix (Markov chain over each user's
    // ordered event stream): lead() inside the per-user partition is
    // bounded by session length; transition probabilities come from a
    // broadcast per-from_type total join, NOT a global window — the
    // counts table is |event_type|² rows regardless of corpus size
    "ev_transitions" -> Q(
      (s, d) => {
        // derives from the shared transitionCells materialization:
        // zero fact scans here — the lead() pass ran once per process
        val pairs = transitionCells(s, d).filter(col("to_type").isNotNull)
        val totals = pairs.groupBy("from_type").agg(sum("n").as("tot"))
        pairs.join(broadcast(totals), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
                  round(col("n") / col("tot"), 4).as("p"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |        FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
             |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY from_type)
             |SELECT from_type, to_type, n, round(n * 1.0 / tot, 4) AS p
             |FROM cnt JOIN tot USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // higher-moment distribution stats (skewness / excess kurtosis)
    // per group, computed from raw power sums in ONE hash aggregate —
    // the formulas are written identically on both sides so the
    // engines agree bit-for-bit after rounding (built-in skewness()
    // differs between engines on sample-vs-population convention)
    "stat_moments" -> Q(
      (s, d) => {
        // TWO-PASS centered moments: a per-type mean (tiny broadcast)
        // then sums of (v − μ)^k. Raw power sums cancel catastrophically
        // on large-mean data (Σv⁴ − 4μΣv³ + … subtracts huge nearly-
        // equal terms); the centered form keeps every addend small, so
        // the 4-decimal round is stable under Spark's nondeterministic
        // partial-agg order. The broadcast μ is ROUNDED to 6 so both
        // engines center on the identical value. Zero-variance guard:
        // a constant group NULLs skew/kurt on both engines rather than
        // surfacing either's divide-by-zero convention.
        val ev = Tables.events(s, d)
        val mus = ev.groupBy("event_type")
          .agg(round(sum("value") / count(lit(1)), 6).as("mu"))
        val vr = col("m2s") / col("n")
        ev.join(broadcast(mus), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"), max("mu").as("mu"),
               sum(pow(col("value") - col("mu"), 2)).as("m2s"),
               sum(pow(col("value") - col("mu"), 3)).as("m3s"),
               sum(pow(col("value") - col("mu"), 4)).as("m4s"))
          .select(col("event_type"), col("n").cast("long").as("n_rows"),
                  round(col("mu"), 4).as("mean"),
                  round(vr, 4).as("var_pop"),
                  when(vr <= 0, lit(null).cast("double")).otherwise(
                    round((col("m3s") / col("n")) / pow(vr, 1.5), 4)).as("skew"),
                  when(vr <= 0, lit(null).cast("double")).otherwise(
                    round((col("m4s") / col("n")) / pow(vr, 2) - lit(3), 4)).as("kurt"))
          .orderBy("event_type")
      },
      Some("""WITH mus AS (
             |  SELECT event_type, round(sum(value) / count(*), 6) AS mu
             |  FROM events GROUP BY event_type),
             |cm AS (
             |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n, max(mu) AS mu,
             |         sum(pow(value - mu, 2)) AS m2s,
             |         sum(pow(value - mu, 3)) AS m3s,
             |         sum(pow(value - mu, 4)) AS m4s
             |  FROM events JOIN mus USING (event_type)
             |  GROUP BY event_type)
             |SELECT event_type, CAST(n AS BIGINT) AS n_rows,
             |       round(mu, 4) AS mean,
             |       round(m2s / n, 4) AS var_pop,
             |       CASE WHEN m2s / n <= 0 THEN NULL ELSE
             |         round((m3s / n) / pow(m2s / n, 1.5), 4) END AS skew,
             |       CASE WHEN m2s / n <= 0 THEN NULL ELSE
             |         round((m4s / n) / pow(m2s / n, 2) - 3, 4) END AS kurt
             |FROM cm ORDER BY event_type""".stripMargin)),

    // winsorized robust aggregation: per-type p01/p99 cutoffs as ONE
    // tiny aggregate broadcast back (the text_ccnet_bins shape on the
    // measure axis), values clipped map-side — the outlier-tolerant
    // mean a metrics pipeline reports next to the raw one. Cutoffs
    // rounded to 6 before the comparison so an interpolation ulp
    // can't flip a boundary row on one engine only
    "ev_winsorize" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cuts = ev.groupBy("event_type")
          .agg(expr("percentile(value, array(0.01D, 0.99D))").as("ps"))
          .select(col("event_type"), round(element_at(col("ps"), 1), 6).as("lo"),
                  round(element_at(col("ps"), 2), 6).as("hi"))
        // NULL measurements stay NULL: least/greatest SKIP nulls on
        // both engines, so an unguarded clip would impute hi for a
        // missing value and silently inflate mean_wins
        ev.join(broadcast(cuts), "event_type")
          .select(col("event_type"), col("value"),
                  when(col("value").isNull, lit(null).cast("double"))
                    .otherwise(greatest(least(col("value"), col("hi")), col("lo")))
                    .as("wv"),
                  when(col("value") < col("lo") || col("value") > col("hi"), 1)
                    .otherwise(0).as("clipped"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("clipped").as("n_clipped"),
               round(avg("value"), 4).as("mean_raw"),
               round(avg("wv"), 4).as("mean_wins"))
          .orderBy("event_type")
      },
      Some("""WITH cuts AS (
             |  SELECT event_type, round(quantile_cont(value, 0.01), 6) AS lo,
             |         round(quantile_cont(value, 0.99), 6) AS hi
             |  FROM events GROUP BY event_type)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
             |       round(avg(value), 4) AS mean_raw,
             |       round(avg(CASE WHEN value IS NULL THEN NULL
             |                 ELSE greatest(least(value, hi), lo) END), 4) AS mean_wins
             |FROM events JOIN cuts USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // last-touch attribution: every purchase credited to the campaign
    // (props.k mod 10) of the user's latest click at or before it —
    // one RUNNING per-user window (last(...ignoreNulls) over an
    // incremental frame, O(1) per row in WindowExec), then a tiny
    // groupBy; no self-join, no inequality join
    "ev_attribution" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
                  col("value"),
                  get_json_object(col("props"), "$.k").cast("long").as("k"))
          .withColumn("lck",
            last(when(col("event_type") === "click", col("k")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "purchase")
          .select(coalesce(pmod(col("lck"), lit(10)), lit(-1L)).as("campaign"),
                  col("value"))
          .groupBy("campaign")
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("revenue"))
          .orderBy("campaign")
      },
      Some("""WITH a AS (
             |  SELECT event_type, value,
             |         last_value(CASE WHEN event_type = 'click'
             |                    THEN json_extract_string(props, '$.k')::BIGINT END
             |                    IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lck
             |  FROM events)
             |SELECT coalesce(((lck % 10) + 10) % 10, -1) AS campaign,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS revenue
             |FROM a WHERE event_type = 'purchase'
             |GROUP BY campaign ORDER BY campaign""".stripMargin)),

    // RFM segmentation: per-user purchase frequency/monetary rolled
    // into quintile scores against GLOBAL cutoffs computed as one
    // 1-row aggregate and broadcast (the text_ccnet_bins idiom on the
    // user axis); recency reported as average days-since-last-purchase
    // per segment. Cutoffs rounded to 6 so an interpolation ulp can't
    // move a user across a quintile edge on one engine only
    "ev_rfm" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val mx = ev.agg(max("ts").as("mts"))
        // a user whose every purchase value is NULL has m = NULL and
        // would fall through all quintile predicates to otherwise(5) —
        // exclude unknown-revenue users instead of mis-ranking them top
        val pur = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("f"), round(sum("value"), 6).as("m"),
               max("ts").as("uts"))
          .filter(col("m").isNotNull)
        val cuts = pur.agg(
            expr("percentile(f, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fc"),
            expr("percentile(m, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mc"))
          .select((1 to 4).flatMap(k => Seq(
            round(element_at(col("fc"), k), 6).as(s"fc$k"),
            round(element_at(col("mc"), k), 6).as(s"mc$k"))): _*)
        def score(v: Column, p: String): Column =
          when(v <= col(p + "1"), 1).when(v <= col(p + "2"), 2)
            .when(v <= col(p + "3"), 3).when(v <= col(p + "4"), 4).otherwise(5)
        pur.crossJoin(broadcast(cuts)).crossJoin(broadcast(mx))
          .select(score(col("f"), "fc").as("fscore"),
                  score(col("m"), "mc").as("mscore"),
                  expr("(mts - uts) DIV 86400000000000").as("rdays"))
          .groupBy("fscore", "mscore")
          .agg(count(lit(1)).as("n_users"),
               round(avg("rdays"), 2).as("avg_recency_days"))
          .orderBy("fscore", "mscore")
      },
      Some("""WITH pur AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS f,
             |         round(sum(value), 6) AS m, max(epoch_ns(ts)) AS uts
             |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
             |  HAVING sum(value) IS NOT NULL),
             |mx AS (SELECT max(epoch_ns(ts)) AS mts FROM events),
             |cuts AS (SELECT round(quantile_cont(f, 0.2), 6) AS fc1,
             |                round(quantile_cont(f, 0.4), 6) AS fc2,
             |                round(quantile_cont(f, 0.6), 6) AS fc3,
             |                round(quantile_cont(f, 0.8), 6) AS fc4,
             |                round(quantile_cont(m, 0.2), 6) AS mc1,
             |                round(quantile_cont(m, 0.4), 6) AS mc2,
             |                round(quantile_cont(m, 0.6), 6) AS mc3,
             |                round(quantile_cont(m, 0.8), 6) AS mc4
             |         FROM pur)
             |SELECT fscore, mscore, CAST(count(*) AS BIGINT) AS n_users,
             |       round(avg(rdays), 2) AS avg_recency_days
             |FROM (
             |  SELECT CASE WHEN f <= fc1 THEN 1 WHEN f <= fc2 THEN 2
             |              WHEN f <= fc3 THEN 3 WHEN f <= fc4 THEN 4 ELSE 5 END AS fscore,
             |         CASE WHEN m <= mc1 THEN 1 WHEN m <= mc2 THEN 2
             |              WHEN m <= mc3 THEN 3 WHEN m <= mc4 THEN 4 ELSE 5 END AS mscore,
             |         (mts - uts) // 86400000000000 AS rdays
             |  FROM pur, cuts, mx)
             |GROUP BY fscore, mscore ORDER BY fscore, mscore""".stripMargin)),

    // Benford first-digit audit (fraud/data-quality screen): leading
    // digit via floor(v / 10^floor(log10 v)) — exact for powers of 10
    // on both engines (Java documents log10(10^n) = n; glibc is
    // correctly rounded) — vs the Benford expectation log10(1 + 1/d),
    // with the per-digit chi-square contribution. One hash agg + a
    // 1-row broadcast total; 9 output rows
    "ev_benford" -> Q(
      (s, d) => {
        // NaN > 0 is TRUE on both engines, and DuckDB errors on
        // CAST(NaN AS BIGINT) — screen NaN out explicitly
        val pos = Tables.events(s, d)
          .filter(col("value") > 0 && !isnan(col("value")))
          .select(floor(col("value") / pow(lit(10.0), floor(log10(col("value")))))
            .cast("long").as("digit"))
        val tot = pos.agg(count(lit(1)).cast("double").as("n"))
        val expP = round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
        pos.groupBy("digit").agg(count(lit(1)).as("obs"))
          .crossJoin(broadcast(tot))
          .select(col("digit"), col("obs"),
            round(col("obs") / col("n"), 4).as("obs_p"), expP.as("exp_p"),
            round(col("n") * pow(col("obs") / col("n") - expP, 2) / expP, 4)
              .as("chi2_term"))
          .orderBy("digit")
      },
      Some("""WITH pos AS (
             |  SELECT CAST(floor(value / pow(10.0, floor(log10(value)))) AS BIGINT) AS digit
             |  FROM events WHERE value > 0 AND NOT isnan(value)),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pos)
             |SELECT digit, CAST(count(*) AS BIGINT) AS obs,
             |       round(count(*) / n, 4) AS obs_p,
             |       round(log10(1.0 + 1.0 / digit), 6) AS exp_p,
             |       round(n * pow(count(*) / n - round(log10(1.0 + 1.0 / digit), 6), 2)
             |             / round(log10(1.0 + 1.0 / digit), 6), 4) AS chi2_term
             |FROM pos, tot GROUP BY digit, n ORDER BY digit""".stripMargin)),

    // DAU / rolling-7-day WAU: daily active users from one distinct
    // agg; the weekly window is NOT a sliding distinct (not
    // decomposable) but a bounded 7-way fan-out of the (day, user)
    // DISTINCT pairs — each pair contributes to 7 target days, then
    // one distinct agg per target day. Shuffle scales with active
    // (day, user) pairs, never raw events
    "ev_dau_wau" -> Q(
      (s, d) => {
        val du = Tables.events(s, d)
          .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
          .distinct()
        // du is already distinct on (day, user): dau is a plain count
        // (no second distinct expand); only the wau branch needs
        // countDistinct because the fan-out duplicates users across
        // target days
        val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = du
          .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
                  col("user_id"))
          .groupBy("day").agg(countDistinct("user_id").as("wau"))
        dau.join(wau, "day").orderBy("day")
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id
             |  FROM events),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
             |        FROM du GROUP BY day),
             |fan AS (SELECT CAST(unnest(generate_series(day, day + 6)) AS BIGINT) AS day,
             |               user_id
             |        FROM du),
             |wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
             |        FROM fan GROUP BY day)
             |SELECT day, dau, wau FROM dau JOIN wau USING (day)
             |ORDER BY day""".stripMargin)),

    // Pareto concentration: what share of all events comes from the
    // top-decile users — the skew audit that motivates every salted
    // aggregation in this engine. Cutoff = one 1-row percentile
    // aggregate broadcast back (rounded to 6, the quintile idiom)
    "ev_pareto" -> Q(
      (s, d) => {
        val cnt = Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("n"))
        val cut = cnt.agg(round(expr("percentile(n, 0.9D)"), 6).as("c"),
                          sum("n").as("tot"), count(lit(1)).as("n_users"))
        cnt.crossJoin(broadcast(cut))
          .groupBy("c", "tot", "n_users")
          .agg(sum(when(col("n") >= col("c"), col("n")).otherwise(0L)).as("te"),
               sum(when(col("n") >= col("c"), 1L).otherwise(0L)).as("top_users"))
          .select(col("n_users"), col("top_users"),
                  round(col("te") / col("tot").cast("double"), 4).as("top_share"),
                  round(col("c"), 4).as("p90_cut"))
      },
      Some("""WITH cnt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
             |             FROM events GROUP BY user_id),
             |cut AS (SELECT round(quantile_cont(n, 0.9), 6) AS c,
             |               CAST(sum(n) AS BIGINT) AS tot,
             |               CAST(count(*) AS BIGINT) AS n_users FROM cnt)
             |SELECT n_users,
             |       CAST(sum(CASE WHEN n >= c THEN 1 ELSE 0 END) AS BIGINT) AS top_users,
             |       round(sum(CASE WHEN n >= c THEN n ELSE 0 END)
             |             / CAST(tot AS DOUBLE), 4) AS top_share,
             |       round(c, 4) AS p90_cut
             |FROM cnt, cut GROUP BY n_users, c, tot""".stripMargin)),

    // signup→purchase conversion latency: first event of each type per
    // user (two tiny per-user aggs), then hour-latency percentiles —
    // the funnel-timing complement to ev_funnel's ordering counts
    "ev_conversion_lag" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        def firstOf(t: String, as: String) = ev
          .filter(col("event_type") === t)
          .groupBy("user_id").agg(min("ts").as(as))
        firstOf("signup", "su").join(firstOf("purchase", "pu"), "user_id")
          .filter(col("pu") >= col("su"))
          .select(((col("pu") - col("su")) / lit(3600000000000.0)).as("h"))
          .agg(count(lit(1)).as("n_converted"),
               expr("percentile(h, array(0.5D, 0.9D))").as("ps"))
          .select(col("n_converted"),
                  round(element_at(col("ps"), 1), 4).as("p50_h"),
                  round(element_at(col("ps"), 2), 4).as("p90_h"))
      },
      Some("""WITH su AS (SELECT user_id, min(epoch_ns(ts)) AS su
             |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |pu AS (SELECT user_id, min(epoch_ns(ts)) AS pu
             |       FROM events WHERE event_type = 'purchase' GROUP BY user_id),
             |h AS (SELECT (pu - su) / 3600000000000.0 AS h
             |      FROM su JOIN pu USING (user_id) WHERE pu >= su)
             |SELECT CAST(count(*) AS BIGINT) AS n_converted,
             |       round(quantile_cont(h, 0.5), 4) AS p50_h,
             |       round(quantile_cont(h, 0.9), 4) AS p90_h
             |FROM h""".stripMargin)),

    "ev_window_agg" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("hour_bucket", expr("ts DIV 3600000000000"))
        .groupBy("hour_bucket", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("hour_bucket", "event_type"),
      Some("""SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour_bucket, event_type,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value),4) AS sum_value
             |FROM events GROUP BY hour_bucket, event_type
             |ORDER BY hour_bucket, event_type""".stripMargin)),

    // throttle-style debounce: an event is dropped when it arrives
    // within 5 s of the PREVIOUS RAW event of the same (user, type) —
    // one lag over the per-key window, exact integer nanos on both
    // engines. The dedup a clickstream pipeline runs before counting.
    "ev_debounce" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("kept",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(5000000000L), 1L).otherwise(0L))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_raw"), sum("kept").as("n_kept"))
          .orderBy("event_type")
      },
      Some("""WITH k AS (
             |  SELECT event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 5000000000
             |              THEN 1 ELSE 0 END AS kept
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw,
             |       CAST(sum(kept) AS BIGINT) AS n_kept
             |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // top-10 session path prefixes: sessionize (gap>30min), take each
    // session's first 3 event types in (ts, event_id) order, count
    // paths. The per-session slice is bounded (3) and the path
    // vocabulary ≤ |types|^3, so the final agg is tiny at any scale;
    // sort_array on the collected (ts,event_id,type) structs makes
    // the slice deterministic where collect_list alone is not.
    "ev_session_paths" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1).otherwise(0))
          .withColumn("session_id",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
          .select(array_join(
            expr("transform(slice(evs, 1, 3), x -> x.event_type)"), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(10)
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g),
             |r AS (SELECT user_id, session_id, event_type,
             |             row_number() OVER (PARTITION BY user_id, session_id
             |                                ORDER BY ts, event_id) AS rn
             |      FROM s),
             |p AS (SELECT user_id, session_id,
             |             string_agg(event_type, '>' ORDER BY rn) AS path
             |      FROM r WHERE rn <= 3 GROUP BY user_id, session_id)
             |SELECT path, CAST(count(*) AS BIGINT) AS n
             |FROM p GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    // full weekly cohort retention triangle (generalizes the single
    // 7-day cell of ev_retention): cohort week = first active week,
    // one row per (cohort, week offset). Active set is distinct
    // (user, week) BEFORE the join, so shuffle ∝ active pairs; cohort
    // sizes are a tiny broadcast frame.
    "ev_cohort_triangle" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000 DIV 7").as("wk"))
        val c0 = ev.groupBy("user_id").agg(min("wk").as("w0"))
        val sz = c0.groupBy("w0").agg(count(lit(1)).as("n_cohort"))
        // active cell := a HEAVY (>=14-event) week — bare incidence
        // keeps every cell at 100% on this corpus (round-11 fix)
        ev.groupBy("user_id", "wk").agg(count(lit(1)).as("k"))
          .filter(col("k") >= 14).select("user_id", "wk")
          .join(c0, "user_id")
          .groupBy(col("w0"), (col("wk") - col("w0")).as("wk_off"))
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sz), "w0")
          .select(col("w0"), col("wk_off"), col("n_active"),
            round(col("n_active") / col("n_cohort"), 4).as("pct"))
          .orderBy("w0", "wk_off")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS wk FROM events),
             |c0 AS (SELECT user_id, min(wk) AS w0 FROM ev GROUP BY user_id),
             |sz AS (SELECT w0, CAST(count(*) AS BIGINT) AS n_cohort FROM c0 GROUP BY w0),
             |act AS (SELECT w0, wk - w0 AS wk_off, CAST(count(*) AS BIGINT) AS n_active
             |        FROM (SELECT user_id, wk FROM ev
             |              GROUP BY 1, 2 HAVING count(*) >= 14) du JOIN c0 USING (user_id)
             |        GROUP BY w0, wk_off)
             |SELECT w0, wk_off, n_active, round(n_active * 1.0 / n_cohort, 4) AS pct
             |FROM act JOIN sz USING (w0) ORDER BY w0, wk_off""".stripMargin)),

    // seasonal-baseline anomaly detection: the 3σ rule of ev_outliers
    // but against a PER-HOUR-OF-DAY profile per type (≤ 24·|types|
    // rows, broadcast), so a nightly lull doesn't mask a daytime
    // spike. The profile is one agg over the facts; flagging is a
    // broadcast join — two passes, no windows.
    "ts_seasonal" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("hod", expr("(ts DIV 3600000000000) % 24"))
        val prof = ev.groupBy(col("event_type").as("et"), col("hod").as("h"))
          .agg(avg("value").as("mu"), stddev("value").as("sd"))
        ev.join(broadcast(prof), col("event_type") === col("et") && col("hod") === col("h"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
               sum(when(abs((col("value") - col("mu")) / col("sd")) > 3, 1L)
                 .otherwise(0L)).as("n_anom"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, value,
             |                  (epoch_ns(ts) // 3600000000000) % 24 AS hod
             |           FROM events),
             |prof AS (SELECT event_type AS et, hod AS h, avg(value) AS mu,
             |                stddev_samp(value) AS sd
             |         FROM e GROUP BY et, h)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN abs((value - mu) / sd) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
             |FROM e JOIN prof ON event_type = et AND hod = h
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // association rules over per-user event-type sets: support /
    // confidence / lift for every ordered type pair. The self-join is
    // on user_id over the DISTINCT (user, type) table, so per-user
    // fan-out is bounded by |types| choose 2 and the partial agg
    // collapses to ≤ |types|² groups map-side; totals broadcast.
    // Lift's n_a·n_b product goes through double — at 1e9 users a
    // long×long product would wrap.
    "ev_assoc_rules" -> Q(
      (s, d) => {
        // heavy (>=13-event) per-user type memberships: with bare
        // incidence every user holds every type and all rules have
        // support 1.0 (round-11 degeneracy fix, the stat_cochran_q
        // threshold)
        val ut = Tables.events(s, d).groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("k")).filter(col("k") >= 13)
          .select("user_id", "event_type")
        val nu = ut.select("user_id").distinct().agg(count(lit(1)).as("n_users"))
        val pair = ut.toDF("user_id", "ta").join(ut.toDF("user_id", "tb"), "user_id")
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_both"))
        val cnt = ut.groupBy("event_type").agg(count(lit(1)).as("c"))
        pair.join(broadcast(cnt.toDF("ta", "n_a")), "ta")
          .join(broadcast(cnt.toDF("tb", "n_b")), "tb")
          .crossJoin(broadcast(nu))
          .select(col("ta"), col("tb"), col("n_both"),
            round(col("n_both") / col("n_users"), 4).as("support"),
            round(col("n_both") / col("n_a"), 4).as("conf"),
            round(col("n_both").cast("double") * col("n_users")
              / (col("n_a").cast("double") * col("n_b")), 4).as("lift"))
          .orderBy("ta", "tb")
      },
      Some("""WITH ut AS (SELECT user_id, event_type FROM events
             |        GROUP BY 1, 2 HAVING count(*) >= 13),
             |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
             |pair AS (SELECT a.event_type AS ta, b.event_type AS tb,
             |                CAST(count(*) AS BIGINT) AS n_both
             |         FROM ut a JOIN ut b ON a.user_id = b.user_id
             |                           AND a.event_type < b.event_type
             |         GROUP BY ta, tb),
             |cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM ut GROUP BY event_type)
             |SELECT ta, tb, n_both,
             |       round(n_both * 1.0 / n_users, 4) AS support,
             |       round(n_both * 1.0 / ca.c, 4) AS conf,
             |       round(CAST(n_both AS DOUBLE) * n_users / (CAST(ca.c AS DOUBLE) * cb.c), 4) AS lift
             |FROM pair JOIN cnt ca ON ca.event_type = ta
             |          JOIN cnt cb ON cb.event_type = tb
             |          CROSS JOIN nu
             |ORDER BY ta, tb""".stripMargin)),

    // PageRank over the event-type transition graph, 10 fixed
    // iterations (damping 0.85, no dangling redistribution — every
    // observed type has outgoing mass here and the oracle mirrors the
    // simplification). The data-scale work is ONE distributed pass
    // building the ≤|types|²-row edge table; the power loop then runs
    // driver-side over those bounded rows (the Ann-probe bounded-
    // collect altitude) — composing 10 iterations into the plan
    // re-derives the fact-table lineage per iteration, i.e. 10 full
    // scans at 100 TB for a 5×5 matrix-vector product.
    "graph_pagerank" -> Q(
      (s, d) => {
        // edge counts AND the node set both come from the shared
        // transitionCells table (to_type-NULL rows kept there mean
        // distinct from_type = distinct event_type over all events)
        val cells0 = transitionCells(s, d)
        val cntE = cells0
          .filter(col("to_type").isNotNull && col("from_type").isNotNull)
          .select(col("from_type").as("src"), col("to_type").as("dst"), col("n"))
        val tot = cntE.groupBy("src").agg(sum("n").as("tot"))
        val edges = cntE.join(broadcast(tot), "src")
          .select(col("src"), col("dst"), (col("n") / col("tot")).as("p"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        val nodes = cells0.filter(col("from_type").isNotNull)
          .select(col("from_type")).distinct()
          .collect().map(_.getString(0)).sorted
        val nN = nodes.length
        var rank = nodes.map(t => t -> 1.0 / nN).toMap
        for (_ <- 1 to 10) {
          val inr = edges.groupBy(_._2).map { case (dst, es) =>
            dst -> es.map(e => e._3 * rank(e._1)).sum }
          rank = nodes.map(t => t -> (0.15 / nN + 0.85 * inr.getOrElse(t, 0.0))).toMap
        }
        import s.implicits._
        rank.toSeq.sortBy(_._1).toDF("t", "r0")
          .select(col("t"), round(col("r0"), 6).as("pr"))
      },
      Some(s"""WITH tr AS (
              |  SELECT event_type AS src,
              |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
              |  FROM events),
              |cnt AS (SELECT src, dst, count(*) AS n FROM tr
              |        WHERE dst IS NOT NULL AND src IS NOT NULL GROUP BY src, dst),
              |tot AS (SELECT src, sum(n) AS tot FROM cnt GROUP BY src),
              |e AS (SELECT src, dst, n * 1.0 / tot AS p FROM cnt JOIN tot USING (src)),
              |nodes AS (SELECT DISTINCT event_type AS t FROM events
              |          WHERE event_type IS NOT NULL),
              |nn AS (SELECT count(*) AS nn FROM nodes),
              |it0 AS (SELECT t, 1.0 / nn AS r FROM nodes, nn),
              |${pagerankIterSql(10)}
              |SELECT t, round(r, 6) AS pr FROM it10 ORDER BY t""".stripMargin)),

    // SCD type-2 interval build: collapse each user's event stream
    // into validity intervals of the current event type (the
    // dimension-history construction warehouses run nightly). Change
    // points survive a lag(type) filter; valid_to is lead(ts) over
    // the FILTERED frame — two per-user windows over one fact scan,
    // no self-join, no global sort; output ∝ type CHANGES, not events.
    // valid_to is NULL on each user's open (current) interval.
    "ev_scd2" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("pt", lag(col("event_type"), 1).over(w))
          .filter(col("pt").isNull || !(col("pt") <=> col("event_type")))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          // μs, not ns: DuckDB truncates TIMESTAMP(NANOS) to micros on
          // read, so emitted bounds must be micro-granular to compare
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("ts DIV 1000").as("valid_from"),
                  expr("valid_to DIV 1000").as("valid_to"))
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""WITH ch AS (
             |  SELECT user_id, event_id, event_type, ts,
             |         lag(event_type) OVER w AS pt,
             |         CASE WHEN lag(event_type) OVER w IS NULL THEN 1
             |              WHEN lag(event_type) OVER w IS DISTINCT FROM event_type THEN 1
             |              ELSE 0 END AS chg
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |iv AS (
             |  SELECT user_id, event_id, event_type,
             |         epoch_ns(ts) // 1000 AS valid_from,
             |         epoch_ns(lead(ts) OVER (PARTITION BY user_id
             |                                 ORDER BY ts, event_id)) // 1000 AS valid_to
             |  FROM ch WHERE chg = 1)
             |SELECT user_id, event_id, event_type, valid_from, valid_to
             |FROM iv ORDER BY user_id, valid_from, event_id""".stripMargin)),

    // lag-k autocorrelation (k = 1..3) of the hourly event-count
    // series per type, computed on the AGGREGATED (type, hour) frame
    // (≤ |types|·|hours| rows): the facts are scanned ONCE into the
    // hourly rollup; lag alignment is an equi-join of that tiny frame
    // with itself on hour+k — no window over facts, no dense spine.
    // Hours missing from the series simply contribute no pair (the
    // irregular-sampling ACF convention).
    "ts_acf" -> Q(
      (s, d) => {
        // materialized once (the Dedup localCheckpoint idiom): both
        // sides of the lag alignment read this tiny rollup, and the
        // fact table must not be scanned twice to build it
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false)
        val a = hourly
          .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
        val b = hourly.select(col("event_type").as("et2"),
          col("h").as("hb"), col("c").as("cb"))
        // hb = h + k is an equality between a left expression and a
        // right attribute, so Catalyst keys the shuffle on it — the
        // join stays an equi-join on (type, aligned hour), never a
        // per-type cross of hours
        a.join(b, col("event_type") === col("et2") &&
            col("hb") === col("h") + col("k"))
          .groupBy("event_type", "k")
          .agg(count(lit(1)).as("n_pairs"), round(corr("c", "cb"), 4).as("acf"))
          .orderBy("event_type", "k")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |l AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
             |p AS (SELECT a.event_type, l.k, a.c AS ca, b.c AS cb
             |      FROM hourly a CROSS JOIN l
             |      JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + l.k)
             |SELECT event_type, k, CAST(count(*) AS BIGINT) AS n_pairs,
             |       round(corr(ca, cb), 4) AS acf
             |FROM p GROUP BY event_type, k ORDER BY event_type, k""".stripMargin)),

    // cross-correlation function clicks→purchases at lags −3..+3
    // days: does click volume LEAD purchase volume (positive lag) or
    // lag it — the campaign-attribution sanity check next to ts_acf.
    // Both series come out of ONE conditional grouped pass over the
    // facts (never two scans); the lag alignment is the ts_acf
    // equi-join idiom (day+k on the left keys the shuffle), on the
    // checkpointed O(days) frame.
    "ts_ccf" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
                 .cast("double").as("x"),
               sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("y"))
          .localCheckpoint(eager = false) // both sides of the alignment
        val a = daily.withColumn("k",
          explode(array((-3 to 3).map(i => lit(i.toLong)): _*)))
        val b = daily.select(col("day").as("db"), col("y").as("yb"))
        a.join(b, col("db") === col("day") + col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("n_pairs"), round(corr(col("x"), col("yb")), 4).as("ccf"))
          .orderBy("k")
      },
      Some("""WITH daily AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS x,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |l AS (SELECT CAST(unnest([-3, -2, -1, 0, 1, 2, 3]) AS BIGINT) AS k),
             |p AS (SELECT l.k, a.x, b.y AS yb
             |      FROM daily a CROSS JOIN l
             |      JOIN daily b ON b.day = a.day + l.k)
             |SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
             |       round(corr(x, yb), 4) AS ccf
             |FROM p GROUP BY k ORDER BY k""".stripMargin)),

    // Pettitt changepoint test on the daily purchase series: the
    // rank-based (outlier-proof) "did the level shift, and when"
    // test. s_t = Σ_j sign(v_t − v_j) comes from the |days|² pair
    // frame — bounded by the CALENDAR squared (3650² ≈ 13M at a
    // 10-year retention horizon), never by corpus rows — and
    // U_t = cumsum(s_t) is the standard Pettitt recurrence. All
    // integer arithmetic until the final p-value, so both engines
    // agree bit-for-bit on K and the changepoint day.
    "ts_pettitt" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("v"))
          .localCheckpoint(eager = false) // pair frame ×2 + day count
        val st = daily.select(col("day").as("t"), col("v").as("vt"))
          .crossJoin(daily.select(col("v").as("vj")))
          .groupBy("t")
          .agg(sum(signum(col("vt") - col("vj"))).cast("long").as("s"))
        val w = Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val nn = daily.agg(count(lit(1)).as("n_days"))
        st.withColumn("u", sum("s").over(w))
          .withColumn("au", abs(col("u")))
          .orderBy(col("au").desc, col("t")).limit(1)
          .crossJoin(broadcast(nn))
          .select(col("n_days"), col("t").as("cp_day"), col("au").as("k_stat"),
            round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) * col("au") * col("au")
              / (col("n_days").cast("double") * col("n_days") * col("n_days")
                 + col("n_days").cast("double") * col("n_days")))), 6).as("p_value"))
      },
      Some("""WITH daily AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS v
             |  FROM events GROUP BY 1),
             |s AS (SELECT a.day AS t, CAST(sum(sign(a.v - b.v)) AS BIGINT) AS s
             |      FROM daily a CROSS JOIN daily b GROUP BY a.day),
             |u AS (SELECT t, CAST(sum(s) OVER (ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u
             |      FROM s),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
             |best AS (SELECT t, abs(u) AS au FROM u ORDER BY au DESC, t LIMIT 1)
             |SELECT n_days, t AS cp_day, au AS k_stat,
             |       round(least(1.0, 2.0 * exp(-6.0 * au * au
             |         / (CAST(n_days AS DOUBLE) * n_days * n_days
             |            + CAST(n_days AS DOUBLE) * n_days))), 6) AS p_value
             |FROM best, nn""".stripMargin)),

    // longest consecutive-day activity streak per user (the
    // gaps-and-islands idiom): distinct (user, day) first — so the
    // window ranks DAYS, bounded by the calendar, never raw events —
    // then island id = day − row_number, longest island per user,
    // and a tiny histogram of streak lengths. The retention-quality
    // metric DAU counts can't see.
    "ev_streaks" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        ud.withColumn("island", col("day") - row_number().over(w))
          .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
          .groupBy("user_id").agg(max("len").as("streak"))
          .groupBy("streak").agg(count(lit(1)).as("n_users"))
          .orderBy("streak")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
             |                   epoch_ns(ts) // 86400000000000 AS day
             |            FROM events),
             |i AS (SELECT user_id, day,
             |             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
             |      FROM ud),
             |st AS (SELECT user_id, CAST(max(len) AS BIGINT) AS streak FROM (
             |         SELECT user_id, island, count(*) AS len
             |         FROM i GROUP BY user_id, island)
             |       GROUP BY user_id)
             |SELECT streak, CAST(count(*) AS BIGINT) AS n_users
             |FROM st GROUP BY streak ORDER BY streak""".stripMargin)),

    // time-window-constrained funnel (signup → click ≤1h → purchase
    // ≤1h after the click): the product-analytics variant where each
    // step must happen within a window of the previous. Earliest-
    // qualifying-chain semantics keeps it deterministic and each step
    // is one filtered grouped-min + equi-join on user — the unbounded
    // ev_funnel plan with one extra predicate, no windows, no
    // self-join of the fact table.
    "ev_funnel_windowed" -> Q(
      (s, d) => {
        val H = 3600000000L // 1h in micros
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("ats"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ats").as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("ats") >= col("t1") && col("ats") <= col("t1") + H)
          .groupBy("user_id").agg(min("ats").as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("ats") >= col("t2") && col("ats") <= col("t2") + H)
          .groupBy("user_id").agg(min("ats").as("t3"))
        s1.agg(count(lit(1)).as("n_signup"))
          .crossJoin(s2.agg(count(lit(1)).as("n_click_1h")))
          .crossJoin(s3.agg(count(lit(1)).as("n_purchase_1h")))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ats FROM events),
             |s1 AS (SELECT user_id, min(ats) AS t1 FROM ev
             |       WHERE event_type = 'signup' GROUP BY user_id),
             |s2 AS (SELECT ev.user_id, min(ats) AS t2 FROM ev JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND ats >= t1 AND ats <= t1 + 3600000000
             |       GROUP BY ev.user_id),
             |s3 AS (SELECT ev.user_id, min(ats) AS t3 FROM ev JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND ats >= t2 AND ats <= t2 + 3600000000
             |       GROUP BY ev.user_id)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_1h,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_1h""".stripMargin)),

    // time-decay multi-touch attribution: every click in the hour
    // before a purchase shares the credit, weighted exp(−Δt/15min)
    // and normalized per purchase. The click×purchase pairing is the
    // bucketed range join (ops.Joins.rangeJoinBucketed — equi-join on
    // (user, time bucket) + residual predicate, never a per-user
    // cross), and the per-purchase normalizer is a grouped sum
    // re-joined on pid. Output: when do the clicks that actually
    // drive purchases happen (credit by click hour-of-day).
    "ev_attribution_decay" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("ts DIV 1000").as("ats"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ats").as("cts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
                  (col("ats") - lit(3600000000L)).as("st"),
                  (col("ats") - 1).as("en"), col("ats").as("pts"))
        val pairs = graft.ops.Joins.rangeJoinBucketed(
            clicks, purch, Seq("user_id"), "cts", "st", "en", 3600000000L)
          .withColumn("w",
            exp((col("cts") - col("pts")).cast("double") / lit(900000000.0)))
          .localCheckpoint(eager = false) // read again for the normalizer
        val tot = pairs.groupBy("pid").agg(sum("w").as("sw"))
        pairs.join(tot, "pid")
          .withColumn("credit", col("w") / col("sw"))
          .withColumn("hod", expr("(cts DIV 3600000000) % 24"))
          .groupBy("hod")
          .agg(round(sum("credit"), 4).as("credit"), count(lit(1)).as("n_pairs"))
          .orderBy("hod")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ats
             |           FROM events),
             |c AS (SELECT user_id, ats AS cts FROM ev WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id AS pid, ats AS pts FROM ev
             |      WHERE event_type = 'purchase'),
             |pr AS (SELECT c.user_id, pid, cts, pts,
             |              exp((cts - pts) / 900000000.0) AS w
             |       FROM c JOIN p ON c.user_id = p.user_id
             |        AND cts BETWEEN pts - 3600000000 AND pts - 1),
             |tot AS (SELECT pid, sum(w) AS sw FROM pr GROUP BY pid)
             |SELECT (cts // 3600000000) % 24 AS hod, round(sum(w / sw), 4) AS credit,
             |       CAST(count(*) AS BIGINT) AS n_pairs
             |FROM pr JOIN tot USING (pid) GROUP BY hod ORDER BY hod""".stripMargin)),

    // peak concurrent users per day: sessions (same 30-min gap as
    // ev_sessionize) become ±1 sweep-line boundaries, and the running
    // count is a TWO-PHASE prefix sum — a per-day window over that
    // day's boundaries plus a carry-in equal to the net delta of all
    // prior days (a #days-row aggregate, broadcast back). No global
    // window ever touches the boundary set, so the plan scales with
    // executors; ties at one instant order starts before ends
    // (delta DESC), making the per-day max deterministic.
    "ev_concurrency" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("sid",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          .agg(min("ts").as("st"), max("ts").as("en"))
        val bounds = sess.select(col("st").as("t"), lit(1).as("delta"))
          .unionAll(sess.select(col("en").as("t"), lit(-1).as("delta")))
          .withColumn("day", expr("t DIV 86400000000000"))
          .localCheckpoint(eager = false) // read twice: local run + carry
        val wd = Window.partitionBy("day")
          .orderBy(col("t"), col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val local = bounds.withColumn("run", sum("delta").over(wd))
        val carry = bounds.groupBy("day").agg(sum("delta").as("net"))
          .withColumn("carry",
            coalesce(sum("net").over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("day", "carry")
        local.join(broadcast(carry), "day")
          .groupBy("day")
          .agg(max(col("run") + col("carry")).as("peak"))
          .orderBy("day")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, epoch_ns(ts) AS tns,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM g),
             |iv AS (SELECT user_id, sid, min(tns) AS st, max(tns) AS en
             |       FROM s GROUP BY user_id, sid),
             |b AS (SELECT st AS t, 1 AS delta FROM iv
             |      UNION ALL SELECT en, -1 FROM iv),
             |r AS (SELECT t // 86400000000000 AS day,
             |             sum(delta) OVER (ORDER BY t, delta DESC
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
             |      FROM b)
             |SELECT day, CAST(max(conc) AS BIGINT) AS peak
             |FROM r GROUP BY day ORDER BY day""".stripMargin)),

    // bot / automation detection by inter-arrival regularity: humans
    // are bursty (gap CV ≈ 1, Poisson-like — measured 0.78–1.12 on
    // this corpus), schedulers are metronomes. One user-partitioned
    // lag pass (hash-partitioned, never global) then a grouped
    // moment aggregate over EXACT INTEGER nano-gaps (Σg, Σg² as
    // DECIMAL/HUGEINT): float appears only in the final
    // sqrt/divide, which both engines compute from the same exact
    // integers — the sf1 flush caught the float-aggregate form
    // landing a 4dp display round on a .5 boundary (0.81095). The
    // display rounds ride the exact-integer half-up idiom
    // (mean_gap_s) and the ⌊x·10⁴+0.5⌋ fixed-point idiom (cv, which
    // has an irrational sqrt numerator), never Spark/DuckDB round()
    // of an aggregate-noisy quotient.
    "ev_bot_flags" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val dec = "decimal(38,0)"
        Tables.events(s, d)
          .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
               count(col("gap")).as("ng"),
               sum(col("gap").cast(dec)).as("sg"),
               sum((col("gap").cast(dec) * col("gap").cast(dec))).as("sq"))
          .filter(col("n_events") >= 50)
          .withColumn("m_ns", col("sg").cast("double") / col("ng"))
          .withColumn("sd_ns", sqrt(
            (col("ng") * col("sq") - col("sg") * col("sg")).cast("double")
              / (col("ng") * (col("ng") - 1)).cast("double")))
          .withColumn("cv",
            floor(col("sd_ns") / col("m_ns") * 10000 + 0.5) / 10000.0)
          .filter(col("cv") < 0.85)
          .select(col("user_id"), col("n_events"),
            (expr("CAST((sg * 2 + ng * 1000000) DIV (ng * 2000000) AS DOUBLE)")
              / 1000.0).as("mean_gap_s"),
            col("cv"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |         epoch_ns(ts) - lag(epoch_ns(ts)) OVER
             |            (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |  FROM events),
             |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |             count(gap) AS ng,
             |             sum(CAST(gap AS HUGEINT)) AS sg,
             |             sum(CAST(gap AS HUGEINT) * gap) AS sq
             |      FROM g GROUP BY user_id),
             |c AS (SELECT user_id, n_events, ng, sg,
             |             floor(sqrt(CAST(ng * sq - sg * sg AS DOUBLE)
             |                        / CAST(ng * (ng - 1) AS DOUBLE))
             |                   / (CAST(sg AS DOUBLE) / ng) * 10000 + 0.5)
             |               / 10000.0 AS cv
             |      FROM s WHERE n_events >= 50)
             |SELECT user_id, n_events,
             |       CAST((sg * 2 + ng * 1000000) // (ng * 2000000) AS DOUBLE)
             |         / 1000.0 AS mean_gap_s,
             |       cv
             |FROM c WHERE cv < 0.85
             |ORDER BY user_id""".stripMargin)),

    // Kaplan–Meier survival of time-to-first-purchase after signup,
    // right-censored at the corpus observation end. The heavy work is
    // two per-user aggregates + one equi-join on user_id; the KM life
    // table itself is |distinct day| rows, so the cumulative windows
    // (trailing at-risk sum n_k = Σ_{j≥k}(d_j+c_j) — no global-N
    // join — and the survival product as exp of summed logs) run on
    // a days-bounded frame at ANY user count. A greatest(ε,·) floor
    // under the log makes a last-day full-event bucket read S=0 on
    // both engines instead of surfacing either's ln(0) convention.
    "ev_survival" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("su"))
          .localCheckpoint(eager = false) // reused by pu AND life: one signup scan
        val pu = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts").join(su, "user_id")
          .filter(col("ts") >= col("su"))
          .groupBy("user_id").agg(min("ts").as("pu"))
        val end = ev.agg(max("ts").as("te"))
        val life = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(end))
          .select(expr("(coalesce(pu, te) - su) div 86400000000000").as("day"),
                  when(col("pu").isNotNull, 1L).otherwise(0L).as("e"))
          .groupBy("day")
          .agg(sum("e").as("n_event"), sum(lit(1L) - col("e")).as("n_cens"))
        val wRisk = Window.orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val wSurv = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        life
          .withColumn("n_risk", sum(col("n_event") + col("n_cens")).over(wRisk))
          .withColumn("surv", round(exp(sum(log(greatest(lit(1e-300),
            lit(1.0) - col("n_event") / col("n_risk")))).over(wSurv)), 4))
          .select("day", "n_risk", "n_event", "n_cens", "surv")
          .orderBy("day")
      },
      Some("""WITH su AS (SELECT user_id, min(epoch_ns(ts)) AS su
             |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |pu AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS pu
             |       FROM events e JOIN su ON su.user_id = e.user_id
             |       WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= su.su
             |       GROUP BY e.user_id),
             |te AS (SELECT max(epoch_ns(ts)) AS te FROM events),
             |life AS (SELECT (coalesce(pu, te) - su) // 86400000000000 AS day,
             |                CASE WHEN pu IS NULL THEN 0 ELSE 1 END AS e
             |         FROM su LEFT JOIN pu USING (user_id), te),
             |tab AS (SELECT day, CAST(sum(e) AS BIGINT) AS n_event,
             |               CAST(sum(1 - e) AS BIGINT) AS n_cens
             |        FROM life GROUP BY day),
             |rk AS (SELECT day, n_event, n_cens,
             |              CAST(sum(n_event + n_cens) OVER (ORDER BY day
             |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
             |       FROM tab)
             |SELECT day, n_risk, n_event, n_cens,
             |       round(exp(sum(ln(greatest(1e-300, 1 - n_event * 1.0 / n_risk)))
             |         OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4) AS surv
             |FROM rk ORDER BY day""".stripMargin)),

    // Stationary distribution of the event-type Markov chain: the
    // ev_transitions row-stochastic matrix (probs rounded to 6 so
    // both engines iterate identical inputs) power-iterated 12 rounds
    // from uniform. The corpus is scanned ONCE into the checkpointed
    // |types|² cells frame; each round is then a broadcast join of
    // the |types|-row vector against it plus a tiny aggregate, so
    // iteration cost is independent of event count. Per-round
    // rounding to 7 pins the trajectory bit-for-bit across engines
    // (partial-agg summation order differs; 1e-17 assoc noise never
    // reaches the 7th decimal).
    "ev_stationary" -> Q(
      (s, d) => {
        // shares the one-per-process lead() pass with ev_transitions /
        // graph_pagerank (the round-9 super-linear edge, now amortized).
        // r17: the 12 power rounds fold DRIVER-side over the collected
        // ≤|types|² cells (the graph_pagerank / emb_top_eigen
        // altitude) — the in-plan form paid 12 broadcast-exchange jobs
        // for a |types|-row vector product, ~100 ms scheduling floor
        // each, and at 100 TB re-derived nothing (cells are already a
        // bounded materialization). Join semantics replicated exactly:
        // v₀ spans distinct from_type (k counts a null group too; a
        // null state never matches the equi-join), each round keys the
        // vector by the to_types its contributing cells reach. Per-
        // round round-to-7 pins the trajectory (the argument the
        // in-plan version already relied on across engines).
        val rows = transitionCells(s, d).filter(col("to_type").isNotNull)
          .select("from_type", "to_type", "n").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val tt = rows.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._3).sum }
        def r(x: Double, sc: Int) = graft.embed.CovMoments.r(x, sc)
        val cells = rows.map { case (f, t, n) => (f, t, r(n.toDouble / tt(f), 6)) }
        val k = cells.map(_._1).distinct.length
        var v: Map[String, Double] = cells.map(_._1).distinct
          .filter(_ != null).map(_ -> r(1.0 / k, 7)).toMap
        for (_ <- 1 to 12)
          v = cells.filter(c => c._1 != null && v.contains(c._1)).groupBy(_._2)
            .map { case (to, cs) =>
              to -> r(cs.sortBy(_._1).map(c => c._3 * v(c._1)).sum, 7) }
        import s.implicits._
        v.toSeq.sortBy(_._1).toDF("state", "vv")
          .select(col("state"), round(col("vv"), 4).as("pi")).orderBy("state")
      },
      Some(s"""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cnt AS (SELECT from_type, to_type, count(*) AS n
             |        FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
             |tot AS (SELECT from_type, sum(n) AS tt FROM cnt GROUP BY from_type),
             |cells AS (SELECT from_type, to_type, round(n * 1.0 / tt, 6) AS p
             |          FROM cnt JOIN tot USING (from_type)),
             |kk AS (SELECT count(DISTINCT from_type) AS k FROM cells),
             |v0 AS (SELECT DISTINCT from_type AS state, round(1.0 / k, 7) AS v
             |       FROM cells, kk),
             |${stationaryIterSql(12)}
             |SELECT state, round(v, 4) AS pi FROM v12 ORDER BY state""".stripMargin)),

    // CUSUM change-point scan on the per-type daily event-count
    // series: C_k = Σ_{j≤k}(cnt_j − mean) peaks at the most likely
    // level-shift day (Page's statistic without reset). The raw
    // stream collapses in ONE grouped pass; every window then runs
    // on the |types|×|days| daily frame. The per-type mean is
    // rounded to 6 BEFORE subtraction so both engines accumulate
    // identical deviations (integer counts − fixed-decimal mean →
    // the ordered cumulative sum is bit-identical); the argmax
    // tie-breaks to the earliest day.
    "ts_cusum" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false) // |types|×|days| rows, read 2×: ONE event scan
        val mu = daily.groupBy("event_type")
          .agg(round(avg("cnt"), 6).as("mu"), count(lit(1)).as("n_days"))
        val wc = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wr = Window.partitionBy("event_type")
          .orderBy(abs(col("cusum")).desc, col("day"))
        daily.join(broadcast(mu), "event_type")
          .withColumn("cusum", sum(col("cnt") - col("mu")).over(wc))
          .withColumn("rk", row_number().over(wr))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("n_days"),
                  col("day").as("change_day"),
                  round(abs(col("cusum")), 4).as("max_abs_cusum"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY event_type, day),
             |mu AS (SELECT event_type, round(avg(cnt), 6) AS mu,
             |              CAST(count(*) AS BIGINT) AS n_days
             |       FROM daily GROUP BY event_type),
             |cs AS (SELECT event_type, day, n_days,
             |              sum(cnt - mu) OVER (PARTITION BY event_type ORDER BY day
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
             |       FROM daily JOIN mu USING (event_type)),
             |rk AS (SELECT event_type, n_days, day, cusum,
             |              row_number() OVER (PARTITION BY event_type
             |                ORDER BY abs(cusum) DESC, day) AS rk
             |       FROM cs)
             |SELECT event_type, n_days, day AS change_day,
             |       round(abs(cusum), 4) AS max_abs_cusum
             |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // two-proportion z-test of an A/B split: arm assignment is the
    // salted content-stable hash of user_id (the Sampling idiom — the
    // assignment a real experiment framework would persist, and
    // re-runs/repartitioning never move a user between arms),
    // conversion = repeat purchaser (≥14 purchases; "any purchase"
    // saturates on this corpus — every user converts and the pooled
    // variance is 0). ONE per-user aggregate then a 2-row arm rollup
    // collapsed map-side into the single stats row — no window, no
    // join, corpus scanned once. A degenerate pool (0 or 1) NULLs z
    // on both engines rather than surfacing a divide-by-zero.
    "ev_ab_test" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val users = Tables.events(s, d)
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) >= 14).cast("long").as("conv"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
        users.agg(
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
            sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x_t"),
            sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x_c"))
          .select(col("n_t"), col("n_c"), col("x_t"), col("x_c"),
            when(col("n_t") === 0, lit(null).cast("double"))
              .otherwise(round(col("x_t") / col("n_t").cast("double"), 4)).as("cr_t"),
            when(col("n_c") === 0, lit(null).cast("double"))
              .otherwise(round(col("x_c") / col("n_c").cast("double"), 4)).as("cr_c"),
            round((col("x_t") + col("x_c"))
              / (col("n_t") + col("n_c")).cast("double"), 6).as("pool"))
          .select(col("n_t"), col("n_c"), col("x_t"), col("x_c"),
            col("cr_t"), col("cr_c"),
            round(col("cr_t") - col("cr_c"), 4).as("lift"),
            when(col("n_t") === 0 || col("n_c") === 0 ||
                 col("pool") <= 0.0 || col("pool") >= 1.0,
                lit(null).cast("double"))
              .otherwise(round((col("x_t") / col("n_t").cast("double")
                 - col("x_c") / col("n_c").cast("double"))
                / sqrt(col("pool") * (lit(1.0) - col("pool"))
                  * (lit(1.0) / col("n_t") + lit(1.0) / col("n_c"))), 4))
              .as("z"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
             |              THEN 1 ELSE 0 END AS conv,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events GROUP BY user_id),
             |a AS (SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |             CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_t,
             |             CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_c
             |      FROM u),
             |b AS (SELECT *,
             |             CASE WHEN n_t = 0 THEN NULL
             |                  ELSE round(x_t / CAST(n_t AS DOUBLE), 4) END AS cr_t,
             |             CASE WHEN n_c = 0 THEN NULL
             |                  ELSE round(x_c / CAST(n_c AS DOUBLE), 4) END AS cr_c,
             |             round((x_t + x_c) / CAST(n_t + n_c AS DOUBLE), 6) AS pool
             |      FROM a)
             |SELECT n_t, n_c, x_t, x_c, cr_t, cr_c,
             |       round(cr_t - cr_c, 4) AS lift,
             |       CASE WHEN n_t = 0 OR n_c = 0 OR pool <= 0.0 OR pool >= 1.0 THEN NULL
             |            ELSE round((x_t / CAST(n_t AS DOUBLE) - x_c / CAST(n_c AS DOUBLE))
             |             / sqrt(pool * (1.0 - pool) * (1.0 / n_t + 1.0 / n_c)), 4) END AS z
             |FROM b""".stripMargin)),

    // decile lift & cumulative gains: score users by activity volume,
    // response = any purchase — "does the score rank responders to
    // the top?" in the table a targeting/curation pipeline reads.
    // Deciles come from BROADCAST interpolated-percentile cutoffs
    // (rounded to 6 so both engines bucket identically), NEVER a
    // global ntile sort; the only window runs over the ≤10 decile
    // rows. Integer-valued scores tie heavily, so buckets are
    // unequal by construction — lift is computed against each
    // bucket's own size, which keeps the report honest under ties.
    "ev_lift_gain" -> Q(
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
               (sum(when(col("event_type") === "purchase", 1L)
                 .otherwise(0L)) >= 13).cast("long").as("resp"))
          .localCheckpoint(eager = false) // read 2×: cutoffs + bucketing
        val cuts = users.agg(expr(
          "transform(percentile(n, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)), " +
          "x -> round(x, 6))").as("bs"))
        val bucketed = users.crossJoin(broadcast(cuts))
          .withColumn("decile", lit(10) - expr(
            "aggregate(bs, 0, (acc, b) -> acc + CASE WHEN n > b THEN 1 ELSE 0 END)"))
        val tot = bucketed.agg(sum("resp").as("tr"), count(lit(1)).as("tn"))
        val wCum = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed.groupBy("decile")
          .agg(count(lit(1)).as("n_users"), sum("resp").as("resp"))
          .crossJoin(broadcast(tot))
          .withColumn("cum_resp", sum("resp").over(wCum))
          .select(col("decile"), col("n_users"),
            round(col("resp") / col("n_users").cast("double"), 4).as("resp_rate"),
            // zero-responder corpus: lift/gain undefined, NULL not ÷0
            when(col("tr") === 0, lit(null).cast("double"))
              .otherwise(round((col("resp") / col("n_users").cast("double"))
                / (col("tr") / col("tn").cast("double")), 4)).as("lift"),
            when(col("tr") === 0, lit(null).cast("double"))
              .otherwise(round(col("cum_resp") / col("tr").cast("double"), 4))
              .as("cum_gain"))
          .orderBy("decile")
      },
      Some("""WITH u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 13 AS BIGINT) AS resp
             |  FROM events GROUP BY user_id),
             |c AS (SELECT round(quantile_cont(n, 0.1), 6) AS b1, round(quantile_cont(n, 0.2), 6) AS b2,
             |             round(quantile_cont(n, 0.3), 6) AS b3, round(quantile_cont(n, 0.4), 6) AS b4,
             |             round(quantile_cont(n, 0.5), 6) AS b5, round(quantile_cont(n, 0.6), 6) AS b6,
             |             round(quantile_cont(n, 0.7), 6) AS b7, round(quantile_cont(n, 0.8), 6) AS b8,
             |             round(quantile_cont(n, 0.9), 6) AS b9
             |      FROM u),
             |bk AS (SELECT u.*, 10 - ((n > b1)::INT + (n > b2)::INT + (n > b3)::INT
             |              + (n > b4)::INT + (n > b5)::INT + (n > b6)::INT
             |              + (n > b7)::INT + (n > b8)::INT + (n > b9)::INT) AS decile
             |       FROM u, c),
             |tot AS (SELECT CAST(sum(resp) AS BIGINT) AS tr, CAST(count(*) AS BIGINT) AS tn FROM bk),
             |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             |             CAST(sum(resp) AS BIGINT) AS resp
             |      FROM bk GROUP BY decile)
             |SELECT decile, n_users,
             |       round(resp / CAST(n_users AS DOUBLE), 4) AS resp_rate,
             |       CASE WHEN tr = 0 THEN NULL
             |            ELSE round((resp / CAST(n_users AS DOUBLE)) / (tr / CAST(tn AS DOUBLE)), 4) END AS lift,
             |       CASE WHEN tr = 0 THEN NULL
             |            ELSE round(sum(resp) OVER (ORDER BY decile
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / CAST(tr AS DOUBLE), 4) END AS cum_gain
             |FROM g, tot ORDER BY decile""".stripMargin)),

    // rolling-origin forecast backtest: forecast each day's count per
    // type as the trailing-7-day mean, score MAPE/RMSE/bias on every
    // day with a full window — the evaluation harness that validates
    // a capacity forecast before anyone trusts it. The stream
    // collapses in ONE grouped pass; forecast + scoring windows all
    // run on the checkpointed |types|×|days| frame. Forecasts round
    // to 6 before the error metrics so both engines score identical
    // residuals.
    "ts_backtest" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false)
        val wF = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        val wN = Window.partitionBy("event_type").orderBy("day")
        daily
          .withColumn("f", round(avg("cnt").over(wF), 6))
          .withColumn("rn", row_number().over(wN))
          .filter(col("rn") > 7)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
               round(avg(abs(col("f") - col("cnt")) / col("cnt")), 4).as("mape"),
               round(sqrt(avg(pow(col("f") - col("cnt"), 2))), 4).as("rmse"),
               round(avg(col("f") - col("cnt")), 4).as("bias"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY event_type, day),
             |f AS (SELECT event_type, day, cnt,
             |             round(avg(cnt) OVER (PARTITION BY event_type ORDER BY day
             |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 6) AS f,
             |             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
             |      FROM daily)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
             |       round(avg(abs(f - cnt) / cnt), 4) AS mape,
             |       round(sqrt(avg(pow(f - cnt, 2))), 4) AS rmse,
             |       round(avg(f - cnt), 4) AS bias
             |FROM f WHERE rn > 7 GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // minimum-detectable-effect curve for the ev_ab_test design:
    // MDE(n) = (z_{α/2} + z_{power})·√(2p(1-p)/n) at α=0.05, 80%
    // power, with the baseline p measured from the corpus (rounded to
    // 6 so both engines plug in the same rate). ONE per-user pass for
    // p; the curve is an explode over the n-grid of the single
    // baseline row — the pre-experiment sizing table next to the
    // post-experiment z-test.
    "stat_mde_curve" -> Q(
      (s, d) => {
        val p = Tables.events(s, d)
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) >= 14).cast("long").as("conv"))
          .agg(round(avg("conv"), 6).as("p"))
        p.select(col("p"), explode(expr(
            "array(1000L, 5000L, 10000L, 50000L, 100000L)")).as("n_per_arm"))
          .select(col("n_per_arm"), col("p").as("baseline"),
            when(col("p").isNull || col("p") <= 0.0 || col("p") >= 1.0,
                lit(null).cast("double"))
              .otherwise(round(lit(1.96 + 0.8416)
                * sqrt(lit(2.0) * col("p") * (lit(1.0) - col("p"))
                  / col("n_per_arm")), 6)).as("mde_abs"))
          .withColumn("mde_rel",
            when(col("mde_abs").isNull, lit(null).cast("double"))
              .otherwise(round(col("mde_abs") / col("baseline"), 4)))
          .orderBy("n_per_arm")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
             |              THEN 1 ELSE 0 END AS conv
             |  FROM events GROUP BY user_id),
             |p AS (SELECT round(avg(conv), 6) AS p FROM u),
             |g AS (SELECT p, unnest([1000, 5000, 10000, 50000, 100000]) AS n_per_arm FROM p)
             |SELECT CAST(n_per_arm AS BIGINT) AS n_per_arm, p AS baseline,
             |       CASE WHEN p IS NULL OR p <= 0.0 OR p >= 1.0 THEN NULL
             |            ELSE round((1.96 + 0.8416) * sqrt(2.0 * p * (1.0 - p) / n_per_arm), 6)
             |       END AS mde_abs,
             |       CASE WHEN p IS NULL OR p <= 0.0 OR p >= 1.0 THEN NULL
             |            ELSE round(round((1.96 + 0.8416)
             |              * sqrt(2.0 * p * (1.0 - p) / n_per_arm), 6) / p, 4)
             |       END AS mde_rel
             |FROM g ORDER BY n_per_arm""".stripMargin)),

    // weekly growth accounting: every active user classified as
    // new / retained / resurrected per week via ONE per-user lag
    // pass (hash-partitioned window); churned(w) is derived as
    // active(w-1) - retained(w) by joining the tiny |weeks| rollup
    // to itself shifted one week — no second fact scan, no per-user
    // churn window. Quick ratio NULL (not ÷0) when nothing churned.
    "ev_growth_accounting" -> Q(
      (s, d) => {
        // active := a HEAVY (>=14-event) week — bare incidence keeps
        // every user active every week on this corpus (round-11 fix)
        val wkAct = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 86400000000000 DIV 7").as("wk"))
          .groupBy("user_id", "wk").agg(count(lit(1)).as("k"))
          .filter(col("k") >= 14).select("user_id", "wk")
        val wU = Window.partitionBy("user_id").orderBy("wk")
        val classified = wkAct
          .withColumn("pw", lag("wk", 1).over(wU))
          .groupBy("wk").agg(
            count(lit(1)).as("n_active"),
            sum(when(col("pw").isNull, 1L).otherwise(0L)).as("n_new"),
            sum(when(col("pw") === col("wk") - 1, 1L).otherwise(0L))
              .as("n_retained"),
            sum(when(col("pw").isNotNull && col("pw") < col("wk") - 1, 1L)
              .otherwise(0L)).as("n_resurrected"))
          .localCheckpoint(eager = false)
        val prev = classified
          .select((col("wk") + 1).as("wk"), col("n_active").as("prev_active"))
        classified.join(prev, Seq("wk"), "left")
          .withColumn("n_churned",
            coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
          .withColumn("quick_ratio",
            when(col("n_churned") > 0,
              round((col("n_new") + col("n_resurrected")).cast("double")
                / col("n_churned"), 4)))
          .select("wk", "n_active", "n_new", "n_retained",
            "n_resurrected", "n_churned", "quick_ratio")
          .orderBy("wk")
      },
      Some("""WITH a AS (SELECT user_id,
             |                  epoch_ns(ts) // 86400000000000 // 7 AS wk
             |           FROM events GROUP BY 1, 2 HAVING count(*) >= 14),
             |c AS (SELECT user_id, wk,
             |             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS pw
             |      FROM a),
             |g AS (SELECT wk,
             |        CAST(count(*) AS BIGINT) AS n_active,
             |        CAST(sum(CASE WHEN pw IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             |        CAST(sum(CASE WHEN pw = wk - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             |        CAST(sum(CASE WHEN pw IS NOT NULL AND pw < wk - 1 THEN 1 ELSE 0 END)
             |          AS BIGINT) AS n_resurrected
             |      FROM c GROUP BY wk)
             |SELECT g.wk, g.n_active, g.n_new, g.n_retained, g.n_resurrected,
             |       CAST(coalesce(p.n_active, 0) - g.n_retained AS BIGINT) AS n_churned,
             |       CASE WHEN coalesce(p.n_active, 0) - g.n_retained > 0
             |            THEN round((g.n_new + g.n_resurrected) * 1.0
             |                       / (coalesce(p.n_active, 0) - g.n_retained), 4)
             |       END AS quick_ratio
             |FROM g LEFT JOIN g p ON p.wk = g.wk - 1
             |ORDER BY g.wk""".stripMargin)),

    // classical additive decomposition of the daily event count:
    // trend = centered 7-day moving average (RANGE frame on the day
    // VALUE so calendar gaps shrink the window and the full-window
    // filter drops them), seasonal = mean-centered day-of-week index
    // from the detrended full-window rows, residual = the rest. The
    // fact table collapses to |days| rows in ONE scan; every window
    // and join after that runs on that tiny frame (the 7-row
    // seasonal map broadcasts back). Detrended values average in
    // EXACT micro-unit longs (×1e6), not doubles — double summation
    // order differs between engines and flips the 6th decimal.
    "ts_decompose" -> Q(
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
          round(sum("det_l").cast("double") / count(lit(1)) / 1e6, 6)
            .as("s_raw"))
        val m = seas.agg(
          round(sum(round(col("s_raw") * 1e6, 0).cast("long")).cast("double")
            / count(lit(1)) / 1e6, 6).as("s_mean"))
        val seasAdj = seas.crossJoin(broadcast(m))
          .select(col("dow"),
            round(col("s_raw") - col("s_mean"), 6).as("seasonal"))
        trended.join(broadcast(seasAdj), "dow")
          .select(col("day"), col("dow"), col("y"), col("trend"),
            col("seasonal"),
            round(col("y") - col("trend") - col("seasonal"), 6).as("resid"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             |                      CAST(count(*) AS DOUBLE) AS y
             |               FROM events GROUP BY day),
             |t AS (SELECT day, y,
             |        count(*) OVER w AS n_win,
             |        round(avg(y) OVER w, 6) AS trend
             |      FROM daily
             |      WINDOW w AS (ORDER BY day RANGE BETWEEN 3 PRECEDING
             |                   AND 3 FOLLOWING)),
             |f AS (SELECT day, day % 7 AS dow, y, trend,
             |             CAST(round((y - trend) * 1000000) AS BIGINT) AS det_l
             |      FROM t WHERE n_win = 7),
             |sr AS (SELECT dow, round(sum(det_l) * 1.0 / count(*) / 1000000.0, 6) AS s_raw
             |       FROM f GROUP BY dow),
             |sm AS (SELECT round(sum(CAST(round(s_raw * 1000000) AS BIGINT)) * 1.0
             |                     / count(*) / 1000000.0, 6) AS s_mean FROM sr),
             |se AS (SELECT dow, round(s_raw - s_mean, 6) AS seasonal FROM sr, sm)
             |SELECT f.day, f.dow, f.y, f.trend, se.seasonal,
             |       round(f.y - f.trend - se.seasonal, 6) AS resid
             |FROM f JOIN se USING (dow)
             |ORDER BY f.day""".stripMargin)),

    // Simpson's-paradox audit: hash-parity arms compared on a
    // success rate pooled AND stratified by event_type, so a
    // confounded rollup is visible as a sign flip between the
    // `_pooled` and `_stratified` summary rows. ONE fact scan builds
    // the |types|-row stratum frame (checkpointed — the three
    // output shapes are all rollups of it); the stratified summary
    // is the (n_a+n_b)-weighted average of per-stratum ROUNDED
    // rates, so both engines combine identical cells. Empty arms
    // yield NULL rates, never ÷0.
    "ev_simpson" -> Q(
      (s, d) => {
        val base = Tables.events(s, d)
          .select(col("event_type"),
            when(col("user_id") % 2 === 0, 1).otherwise(0).as("grp_a"),
            when(col("value") > 50.0, 1L).otherwise(0L).as("succ"))
        val strata = base.groupBy("event_type").agg(
            sum(when(col("grp_a") === 1, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("grp_a") === 1, col("succ")).otherwise(0L)).as("s_a"),
            sum(when(col("grp_a") === 0, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("grp_a") === 0, col("succ")).otherwise(0L)).as("s_b"))
          .withColumn("rate_a", when(col("n_a") > 0,
            round(col("s_a").cast("double") / col("n_a"), 6)))
          .withColumn("rate_b", when(col("n_b") > 0,
            round(col("s_b").cast("double") / col("n_b"), 6)))
          .localCheckpoint(eager = false)
        val per = strata.select(col("event_type").as("scope"),
          col("n_a"), col("n_b"), col("rate_a"), col("rate_b"),
          round(col("rate_a") - col("rate_b"), 6).as("diff"))
        val pooled = strata.agg(
            sum("n_a").as("n_a"), sum("s_a").as("s_a"),
            sum("n_b").as("n_b"), sum("s_b").as("s_b"))
          .select(lit("_pooled").as("scope"), col("n_a"), col("n_b"),
            when(col("n_a") > 0,
              round(col("s_a").cast("double") / col("n_a"), 6)).as("rate_a"),
            when(col("n_b") > 0,
              round(col("s_b").cast("double") / col("n_b"), 6)).as("rate_b"))
          .withColumn("diff", round(col("rate_a") - col("rate_b"), 6))
        val stratW = strata.agg(
            sum("n_a").as("n_a"), sum("n_b").as("n_b"),
            round(sum((col("n_a") + col("n_b")) * col("rate_a"))
              / sum(col("n_a") + col("n_b")), 6).as("ra"),
            round(sum((col("n_a") + col("n_b")) * col("rate_b"))
              / sum(col("n_a") + col("n_b")), 6).as("rb"))
          .select(lit("_stratified").as("scope"), col("n_a"), col("n_b"),
            col("ra").as("rate_a"), col("rb").as("rate_b"))
          .withColumn("diff", round(col("rate_a") - col("rate_b"), 6))
        per.unionByName(pooled).unionByName(stratW).orderBy("scope")
      },
      Some("""WITH base AS (SELECT event_type,
             |                CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS grp_a,
             |                CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS succ
             |              FROM events),
             |st AS (SELECT event_type,
             |         CAST(sum(CASE WHEN grp_a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |         sum(CASE WHEN grp_a = 1 THEN succ ELSE 0 END) AS s_a,
             |         CAST(sum(CASE WHEN grp_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |         sum(CASE WHEN grp_a = 0 THEN succ ELSE 0 END) AS s_b
             |       FROM base GROUP BY event_type),
             |r AS (SELECT event_type, n_a, n_b, s_a, s_b,
             |        CASE WHEN n_a > 0 THEN round(s_a * 1.0 / n_a, 6) END AS rate_a,
             |        CASE WHEN n_b > 0 THEN round(s_b * 1.0 / n_b, 6) END AS rate_b
             |      FROM st)
             |SELECT event_type AS scope, n_a, n_b, rate_a, rate_b,
             |       round(rate_a - rate_b, 6) AS diff
             |FROM r
             |UNION ALL
             |SELECT '_pooled', CAST(sum(n_a) AS BIGINT), CAST(sum(n_b) AS BIGINT),
             |       CASE WHEN sum(n_a) > 0 THEN round(sum(s_a) * 1.0 / sum(n_a), 6) END,
             |       CASE WHEN sum(n_b) > 0 THEN round(sum(s_b) * 1.0 / sum(n_b), 6) END,
             |       round(CASE WHEN sum(n_a) > 0 THEN round(sum(s_a) * 1.0 / sum(n_a), 6) END
             |             - CASE WHEN sum(n_b) > 0 THEN round(sum(s_b) * 1.0 / sum(n_b), 6) END, 6)
             |FROM r
             |UNION ALL
             |SELECT '_stratified', CAST(sum(n_a) AS BIGINT), CAST(sum(n_b) AS BIGINT),
             |       round(sum((n_a + n_b) * rate_a) / sum(n_a + n_b), 6),
             |       round(sum((n_a + n_b) * rate_b) / sum(n_a + n_b), 6),
             |       round(round(sum((n_a + n_b) * rate_a) / sum(n_a + n_b), 6)
             |             - round(sum((n_a + n_b) * rate_b) / sum(n_a + n_b), 6), 6)
             |FROM r
             |ORDER BY scope""".stripMargin)))

  // regrouped from the round-named inventory files in round 15
  // (pure move — same query names, same bodies)
  val eventsRA: Seq[(String, Q)] = Seq(
      // count-min sketch (depth 4 × width 64, explicit md5 row-hash
      // family) over event types, with per-key estimate vs exact truth
      // on the bounded type domain. The sketch build is ONE map-side-
      // combinable groupBy of d·N rows into ≤256 cells — mergeable
      // across shards/days by cell-wise addition, which is the whole
      // point of CMS at 100 TB (heavy-hitter counts without a
      // per-key shuffle). overest ≥ 0 always (one-sided error), and
      // the spec asserts the ε=e/w bound on the bounded domain.
      "ev_countmin" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val depth = 4
          val width = 64
          val ev = Tables.events(s, d)
          def cmCell = pmod(md5Long(concat(lit("cm"), col("d").cast("string"),
            lit(":"), col("event_type"))), lit(width))
          // cell build shared with the streaming twin (StreamingSpec
          // asserts micro-batched cells equal these)
          val cells = graft.streaming.StreamOps.countMinCells(ev, depth, width)
          val keys = ev.groupBy("event_type").agg(count(lit(1)).as("exact"))
          val keyCells = keys.select(col("event_type"), col("exact"),
              explode(sequence(lit(0), lit(depth - 1))).as("d"))
            .withColumn("cell", cmCell)
          keyCells.join(cells, Seq("d", "cell"))
            .groupBy("event_type")
            .agg(max("exact").as("exact"), min("cnt").as("cms_est"))
            .select(col("event_type"), col("exact"), col("cms_est"),
              (col("cms_est") - col("exact")).as("overest"))
            .orderBy("event_type")
        },
        Some("""WITH rows_ AS (
               |  SELECT event_type, d,
               |         ('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || ':' || event_type), 1, 15))::BIGINT % 64 AS cell
               |  FROM events, (SELECT unnest(range(4)) AS d)),
               |cells AS (SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt
               |          FROM rows_ GROUP BY d, cell),
               |keys AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact
               |         FROM events GROUP BY event_type),
               |kc AS (SELECT event_type, exact, d,
               |              ('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || ':' || event_type), 1, 15))::BIGINT % 64 AS cell
               |       FROM keys, (SELECT unnest(range(4)) AS d))
               |SELECT kc.event_type, CAST(max(exact) AS BIGINT) AS exact,
               |       CAST(min(cnt) AS BIGINT) AS cms_est,
               |       CAST(min(cnt) - max(exact) AS BIGINT) AS overest
               |FROM kc JOIN cells ON kc.d = cells.d AND kc.cell = cells.cell
               |GROUP BY kc.event_type ORDER BY kc.event_type""".stripMargin)),

      // Qini/uplift curve by pre-period-activity decile: score users
      // on first-half event volume, treat = md5 arm, response =
      // second-half purchase — "does targeting high-score users
      // concentrate the treatment effect?", the decision curve an
      // uplift-targeting rollout reads. Deciles from BROADCAST
      // percentile cutoffs (ev_lift_gain's shape, never a global
      // ntile sort); the only window is the cumulative over ≤10
      // decile rows, best deciles first. Qini_k = X_t − X_c·N_t/N_c
      // on cumulative counts; NULL (not ÷0) when a cum control side
      // is empty
      "ev_qini" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val ev = Tables.events(s, d)
          val bounds = ev.agg(min(expr("ts div 86400000000000")).as("mn"),
                              max(expr("ts div 86400000000000")).as("mx"))
          val users = ev
            .select(col("user_id"), expr("ts div 86400000000000").as("day"),
                    col("event_type"))
            .crossJoin(broadcast(bounds))
            // integer DIV, matching the oracle's `// 2` exactly even
            // when mn+mx+1 is odd
            .withColumn("post",
              (col("day") >= expr("(mn + mx + 1) DIV 2")).cast("long"))
            .groupBy("user_id")
            .agg(sum(lit(1L) - col("post")).as("score"),
                 (sum(when(col("post") === 1 && col("event_type") === "purchase",
                   1L).otherwise(0L)) >= 7).cast("long").as("resp"))
            .withColumn("arm",
              md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
            .localCheckpoint(eager = false) // cutoffs + bucketing
          val cuts = users.agg(expr(
            "transform(percentile(score, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)), " +
            "x -> round(x, 6))").as("bs"))
          val bucketed = users.crossJoin(broadcast(cuts))
            .withColumn("decile", lit(10) - expr(
              "aggregate(bs, 0, (acc, b) -> acc + CASE WHEN score > b THEN 1 ELSE 0 END)"))
          val wCum = Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          bucketed.groupBy("decile")
            .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
                 sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
                 sum(when(col("arm") === 1, col("resp")).otherwise(0L)).as("x_t"),
                 sum(when(col("arm") === 0, col("resp")).otherwise(0L)).as("x_c"))
            .withColumn("cnt", sum("n_t").over(wCum))
            .withColumn("cnc", sum("n_c").over(wCum))
            .withColumn("cxt", sum("x_t").over(wCum))
            .withColumn("cxc", sum("x_c").over(wCum))
            .select(col("decile"), col("n_t"), col("n_c"), col("x_t"), col("x_c"),
              when(col("n_t") === 0 || col("n_c") === 0, lit(null).cast("double"))
                .otherwise(round(col("x_t") / col("n_t").cast("double")
                  - col("x_c") / col("n_c").cast("double"), 4)).as("uplift"),
              when(col("cnc") === 0, lit(null).cast("double"))
                .otherwise(round(col("cxt")
                  - col("cxc") * col("cnt").cast("double") / col("cnc"), 4)).as("qini"))
            .orderBy("decile")
        },
        Some("""WITH b AS (SELECT min(ts // 86400000000000) AS mn,
               |                  max(ts // 86400000000000) AS mx FROM events),
               |u AS (
               |  SELECT user_id,
               |         CAST(sum(CASE WHEN (ts // 86400000000000) >= (mn + mx + 1) // 2
               |                       THEN 0 ELSE 1 END) AS BIGINT) AS score,
               |         CAST(sum(CASE WHEN (ts // 86400000000000) >= (mn + mx + 1) // 2
               |                  AND event_type = 'purchase' THEN 1 ELSE 0 END) >= 7 AS BIGINT) AS resp,
               |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
               |  FROM events, b GROUP BY user_id),
               |c AS (SELECT round(quantile_cont(score, 0.1), 6) AS b1, round(quantile_cont(score, 0.2), 6) AS b2,
               |             round(quantile_cont(score, 0.3), 6) AS b3, round(quantile_cont(score, 0.4), 6) AS b4,
               |             round(quantile_cont(score, 0.5), 6) AS b5, round(quantile_cont(score, 0.6), 6) AS b6,
               |             round(quantile_cont(score, 0.7), 6) AS b7, round(quantile_cont(score, 0.8), 6) AS b8,
               |             round(quantile_cont(score, 0.9), 6) AS b9
               |      FROM u),
               |bk AS (SELECT u.*, 10 - ((score > b1)::INT + (score > b2)::INT + (score > b3)::INT
               |              + (score > b4)::INT + (score > b5)::INT + (score > b6)::INT
               |              + (score > b7)::INT + (score > b8)::INT + (score > b9)::INT) AS decile
               |       FROM u, c),
               |g AS (SELECT decile,
               |             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               |             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
               |             CAST(sum(CASE WHEN arm = 1 THEN resp ELSE 0 END) AS BIGINT) AS x_t,
               |             CAST(sum(CASE WHEN arm = 0 THEN resp ELSE 0 END) AS BIGINT) AS x_c
               |      FROM bk GROUP BY decile),
               |w AS (SELECT *,
               |             CAST(sum(n_t) OVER o AS BIGINT) AS cnt, CAST(sum(n_c) OVER o AS BIGINT) AS cnc,
               |             CAST(sum(x_t) OVER o AS BIGINT) AS cxt, CAST(sum(x_c) OVER o AS BIGINT) AS cxc
               |      FROM g WINDOW o AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               |SELECT decile, n_t, n_c, x_t, x_c,
               |       CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
               |            ELSE round(x_t / CAST(n_t AS DOUBLE) - x_c / CAST(n_c AS DOUBLE), 4) END AS uplift,
               |       CASE WHEN cnc = 0 THEN NULL
               |            ELSE round(cxt - cxc * CAST(cnt AS DOUBLE) / cnc, 4) END AS qini
               |FROM w ORDER BY decile""".stripMargin)),

      // inter-arrival time fit: exponential-rate MLE λ=1/mean over
      // per-user event gaps + KS distance of the empirical gap CDF
      // from Exp(λ̂) — the Poissonity check behind every queueing/
      // capacity assumption. Gaps collapse to a DISTINCT-second
      // histogram (the samp_ks_test bound: values, never rows);
      // λ rounds to 10dp and the model CDF to 8dp so both engines
      // score identical deviations. KS evaluated at the observed
      // points (right-continuous form), documented + mirrored.
      "ev_interarrival" -> Q(
        (s, d) => {
          val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          val gaps = Tables.events(s, d)
            .withColumn("pts", lag("ts", 1).over(w))
            .filter(col("pts").isNotNull)
            .select(expr("(ts - pts) DIV 1000000000").as("gs"))
          val h = gaps.groupBy("gs").agg(count(lit(1)).as("c"))
            .localCheckpoint(eager = false) // stats + ECDF passes
          val st = h.agg(sum("c").as("n"),
            round(sum(col("gs") * col("c")) / sum("c").cast("double"), 6).as("m"))
          val wc = Window.orderBy("gs").rowsBetween(Window.unboundedPreceding, 0)
          h.crossJoin(broadcast(st))
            .withColumn("lam", round(lit(1.0) / col("m"), 10))
            .withColumn("femp", sum("c").over(wc) / col("n").cast("double"))
            .withColumn("fexp",
              round(lit(1.0) - exp(-col("lam") * col("gs")), 8))
            .agg(max("n").as("n_gaps"), max(round(col("m"), 4)).as("mean_gap_s"),
              max(col("lam")).as("lambda_per_s"),
              round(max(abs(col("femp") - col("fexp"))), 4).as("ks_stat"))
        },
        Some("""WITH g AS (
               |  SELECT (ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               |           // 1000000000 AS gs
               |  FROM events),
               |h AS (SELECT gs, CAST(count(*) AS BIGINT) AS c FROM g
               |      WHERE gs IS NOT NULL GROUP BY gs),
               |st AS (SELECT CAST(sum(c) AS BIGINT) AS n,
               |              round(sum(gs * c) / CAST(sum(c) AS DOUBLE), 6) AS m FROM h),
               |e AS (SELECT gs, c, n, m, round(1.0 / m, 10) AS lam,
               |             sum(c) OVER (ORDER BY gs) / CAST(n AS DOUBLE) AS femp
               |      FROM h, st)
               |SELECT CAST(max(n) AS BIGINT) AS n_gaps, max(round(m, 4)) AS mean_gap_s,
               |       max(lam) AS lambda_per_s,
               |       round(max(abs(femp - round(1.0 - exp(-lam * gs), 8))), 4) AS ks_stat
               |FROM e""".stripMargin)),

    // next-event majority-class baseline: predict argmax p(to|from)
    // and score it — the sanity floor every sequence model must beat.
    // Pure projection over the shared transitionCells table (zero
    // fact scans here); ties break to the lexicographically first
    // target on both engines.
    "ev_markov_accuracy" -> Q(
      (s, d) => {
        val pairs = transitionCells(s, d).filter(col("to_type").isNotNull)
        val wb = Window.partitionBy("from_type")
          .orderBy(col("n").desc, col("to_type"))
        val tot = pairs.groupBy("from_type").agg(sum("n").as("n_total"))
        pairs.withColumn("rk", row_number().over(wb))
          .filter(col("rk") === 1)
          .join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type").as("best_to"),
                  col("n").as("n_best"), col("n_total"),
                  round(col("n") / col("n_total"), 4).as("acc"))
          .orderBy("from_type")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |        FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |best AS (SELECT from_type, to_type, n,
             |           row_number() OVER (PARTITION BY from_type
             |                              ORDER BY n DESC, to_type) AS rk
             |         FROM cnt),
             |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_total
             |        FROM cnt GROUP BY 1)
             |SELECT from_type, b.to_type AS best_to, b.n AS n_best, n_total,
             |       round(b.n * 1.0 / n_total, 4) AS acc
             |FROM best b JOIN tot USING (from_type)
             |WHERE rk = 1 ORDER BY from_type""".stripMargin)),

    // entropy rate of the event-type Markov chain: H = −Σᵢ πᵢ Σⱼ
    // p_ij ln p_ij with π from the same 12 pinned power-iteration
    // rounds as ev_stationary — how predictable is the NEXT event
    // given the current one, on a 0 (deterministic) … ln k (uniform)
    // scale. Everything iterates off the shared transitionCells
    // materialization; rounded-to-0 cell probabilities (< 5e-7) are
    // excluded from the p·ln p sum on BOTH engines.
    "ev_markov_entropy" -> Q(
      (s, d) => {
        // r17: folded DRIVER-side over the collected ≤|types|² cells —
        // the ev_stationary rewrite's twin (same 12-round trajectory,
        // same join-semantics replication, same round-7 pinning); the
        // in-plan form paid ~14 broadcast-exchange jobs for bounded
        // vector products. See ev_stationary above for the altitude
        // argument.
        val rows = transitionCells(s, d).filter(col("to_type").isNotNull)
          .select("from_type", "to_type", "n").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val tt = rows.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._3).sum }
        def r(x: Double, sc: Int) = graft.embed.CovMoments.r(x, sc)
        val cells = rows.map { case (f, t, n) => (f, t, r(n.toDouble / tt(f), 6)) }
        val k = cells.map(_._1).distinct.length
        var v: Map[String, Double] = cells.map(_._1).distinct
          .filter(_ != null).map(_ -> r(1.0 / k, 7)).toMap
        for (_ <- 1 to 12)
          v = cells.filter(c => c._1 != null && v.contains(c._1)).groupBy(_._2)
            .map { case (to, cs) =>
              to -> r(cs.sortBy(_._1).map(c => c._3 * v(c._1)).sum, 7) }
        val hi = cells.filter(c => c._1 != null && c._3 > 0).groupBy(_._1)
          .map { case (f, cs) =>
            f -> r(-cs.sortBy(_._2).map(c => c._3 * math.log(c._3)).sum, 6) }
        val common = hi.keySet intersect v.keySet
        val er: Option[Double] =
          if (common.isEmpty) None
          else Some(r(common.toSeq.sorted.map(st => v(st) * hi(st)).sum, 4))
        val maxEnt = if (k > 1) Some(r(math.log(k.toDouble), 4)) else None
        val eff =
          if (k > 1 && er.isDefined) Some(r(er.get / maxEnt.get, 4)) else None
        import s.implicits._
        Seq((k.toLong, er, maxEnt, eff))
          .toDF("n_states", "entropy_rate", "max_entropy", "efficiency")
      },
      Some(s"""WITH tr AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |cnt AS (SELECT from_type, to_type, count(*) AS n
             |        FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
             |tot AS (SELECT from_type, sum(n) AS tt FROM cnt GROUP BY from_type),
             |cells AS MATERIALIZED (
             |  SELECT from_type, to_type, round(n * 1.0 / tt, 6) AS p
             |  FROM cnt JOIN tot USING (from_type)),
             |kk AS (SELECT count(DISTINCT from_type) AS k FROM cells),
             |v0 AS (SELECT DISTINCT from_type AS state, round(1.0 / k, 7) AS v
             |       FROM cells, kk),
             |${stationaryIterSql(12)},
             |hh AS (SELECT from_type AS state, round(-sum(p * ln(p)), 6) AS h_i
             |       FROM cells WHERE p > 0 GROUP BY from_type),
             |er AS (SELECT round(sum(v.v * h_i), 4) AS entropy_rate
             |       FROM v12 v JOIN hh USING (state))
             |SELECT CAST(k AS BIGINT) AS n_states, entropy_rate,
             |       CASE WHEN k > 1 THEN round(ln(k), 4) END AS max_entropy,
             |       CASE WHEN k > 1 AND entropy_rate IS NOT NULL
             |            THEN round(entropy_rate / round(ln(k), 4), 4)
             |       END AS efficiency
             |FROM er, kk""".stripMargin)),

    // CUPED variance reduction (Deng et al. 2013): pre-period
    // purchases as the covariate, θ = cov(X,Y)/var(X) estimated once
    // globally (rounded to 6 on both engines), per-arm adjusted means
    // + the realized variance-reduction factor. The experiment
    // sensitivity upgrade every A/B platform ships; one fact rollup,
    // θ and the pre-mean broadcast as a 1-row frame.
    "ev_cuped" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ud = Tables.events(s, d)
          .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
          .localCheckpoint(eager = false) // bounds + the per-user xy rollup
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val uxy = ud.crossJoin(broadcast(bounds))
          // div not /: Spark's long `/` is double division, which
          // would ceil the midpoint when mn+mx+1 is odd while the
          // oracle's `//` floors it (even on current testdata, but
          // the split must not depend on that)
          .withColumn("post", (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg(sum(when(col("post") === 0, col("p")).otherwise(0L))
                 .cast("double").as("x"),
               sum(when(col("post") === 1, col("p")).otherwise(0L))
                 .cast("double").as("y"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .localCheckpoint(eager = false) // theta pass + per-arm pass
        val th = uxy.agg(
          when(var_pop("x") > 0, round(covar_pop("x", "y") / var_pop("x"), 6))
            .otherwise(lit(0.0)).as("theta"),
          round(avg("x"), 6).as("x_bar"))
        uxy.crossJoin(broadcast(th))
          .withColumn("y_adj", col("y") - col("theta") * (col("x") - col("x_bar")))
          .groupBy("arm")
          .agg(count(lit(1)).as("n_users"),
               round(avg("y"), 6).as("mean_y"),
               round(avg("y_adj"), 6).as("mean_y_cuped"),
               round(var_pop("y"), 6).as("var_y"),
               round(var_pop("y_adj"), 6).as("var_y_cuped"),
               when(var_pop("y") > 0,
                    round(lit(1.0) - var_pop("y_adj") / var_pop("y"), 4))
                 .otherwise(lit(null).cast("double")).as("var_reduction"))
          .orderBy("arm")
      },
      Some("""WITH ud AS (
             |  SELECT user_id, ts // 86400000000000 AS day,
             |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
             |uxy AS MATERIALIZED (
             |  SELECT user_id,
             |         CAST(sum(CASE WHEN day >= (mn + mx + 1) // 2 THEN 0 ELSE p END)
             |              AS DOUBLE) AS x,
             |         CAST(sum(CASE WHEN day >= (mn + mx + 1) // 2 THEN p ELSE 0 END)
             |              AS DOUBLE) AS y,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             |           % 2 AS arm
             |  FROM ud, b GROUP BY user_id),
             |th AS (SELECT CASE WHEN var_pop(x) > 0
             |                   THEN round(covar_pop(x, y) / var_pop(x), 6)
             |                   ELSE 0.0 END AS theta,
             |              round(avg(x), 6) AS x_bar
             |       FROM uxy),
             |adj AS (SELECT arm, y, y - theta * (x - x_bar) AS y_adj FROM uxy, th)
             |SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             |       round(avg(y), 6) AS mean_y,
             |       round(avg(y_adj), 6) AS mean_y_cuped,
             |       round(var_pop(y), 6) AS var_y,
             |       round(var_pop(y_adj), 6) AS var_y_cuped,
             |       CASE WHEN var_pop(y) > 0
             |            THEN round(1.0 - var_pop(y_adj) / var_pop(y), 4)
             |       END AS var_reduction
             |FROM adj GROUP BY arm ORDER BY arm""".stripMargin)),

    // second-order Markov next-event model: trigram cells from ONE
    // two-lead window pass, best next event per (prev2, prev1)
    // context with its accuracy, vs the first-order baseline
    // p(to | prev1) computed from the SAME trigram population's
    // margins — lift > 0 is the memory the one-step ev_markov_accuracy
    // model leaves on the table. Cells bounded by |types|³.
    "ev_markov2" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val tri = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("t1", lead("event_type", 1).over(w))
          .withColumn("t2", lead("event_type", 2).over(w))
          .filter(col("t1").isNotNull && col("t2").isNotNull)
          .groupBy(col("event_type").as("t0"), col("t1"), col("t2"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(eager = false) // best-per-context + margins
        val wb = Window.partitionBy("t0", "t1").orderBy(col("n").desc, col("t2"))
        val tot = tri.groupBy("t0", "t1").agg(sum("n").as("n_total"))
        val m1 = tri.groupBy("t1", "t2").agg(sum("n").as("m"))
        val w1 = Window.partitionBy("t1").orderBy(col("m").desc, col("t2"))
        val best1 = m1
          .join(broadcast(m1.groupBy("t1").agg(sum("m").as("mt"))), "t1")
          .withColumn("rk", row_number().over(w1)).filter(col("rk") === 1)
          .select(col("t1"), round(col("m") / col("mt"), 4).as("acc1"))
        tri.withColumn("rk", row_number().over(wb)).filter(col("rk") === 1)
          .join(broadcast(tot), Seq("t0", "t1"))
          .join(broadcast(best1), "t1")
          .select(col("t0"), col("t1"), col("t2").as("best_to"),
                  col("n").as("n_best"), col("n_total"),
                  round(col("n") / col("n_total"), 4).as("acc2"), col("acc1"),
                  round(round(col("n") / col("n_total"), 4) - col("acc1"), 4)
                    .as("lift"))
          .orderBy("t0", "t1")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS t0,
             |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
             |         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2
             |  FROM events),
             |tri AS (SELECT t0, t1, t2, CAST(count(*) AS BIGINT) AS n
             |        FROM tr WHERE t1 IS NOT NULL AND t2 IS NOT NULL
             |        GROUP BY 1, 2, 3),
             |tot AS (SELECT t0, t1, CAST(sum(n) AS BIGINT) AS n_total
             |        FROM tri GROUP BY 1, 2),
             |m1 AS (SELECT t1, t2, CAST(sum(n) AS BIGINT) AS m
             |       FROM tri GROUP BY 1, 2),
             |tot1 AS (SELECT t1, CAST(sum(m) AS BIGINT) AS mt FROM m1 GROUP BY 1),
             |b1 AS (SELECT t1, acc1 FROM (
             |         SELECT m1.t1, round(m * 1.0 / mt, 4) AS acc1,
             |                row_number() OVER (PARTITION BY m1.t1
             |                                   ORDER BY m DESC, t2) AS rk
             |         FROM m1 JOIN tot1 USING (t1))
             |       WHERE rk = 1),
             |best AS (SELECT *, row_number() OVER (PARTITION BY t0, t1
             |                     ORDER BY n DESC, t2) AS rk
             |         FROM tri)
             |SELECT b.t0, b.t1, b.t2 AS best_to, b.n AS n_best, t.n_total,
             |       round(b.n * 1.0 / t.n_total, 4) AS acc2, b1.acc1,
             |       round(round(b.n * 1.0 / t.n_total, 4) - b1.acc1, 4) AS lift
             |FROM best b JOIN tot t USING (t0, t1) JOIN b1 USING (t1)
             |WHERE b.rk = 1 ORDER BY t0, t1""".stripMargin)),

    // power-law fit of the retention curve: mean cohort retention per
    // week-of-age (ev_cohort_triangle's cells, age ≥ 1), OLS on the
    // log-log grid → decay exponent + fitted week-1 retention + r².
    // The "shape of forgetting" summary a growth team tracks as one
    // number; the fit runs on ≤ |weeks| rows, n≥2 ∧ var>0 guarded.
    "ev_retention_fit" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000 DIV 7").as("wk"))
        val c0 = ev.groupBy("user_id").agg(min("wk").as("w0"))
        val sz = c0.groupBy("w0").agg(count(lit(1)).as("n_cohort"))
        // active week := >=14 events (bare incidence retains everyone)
        val act = ev.groupBy("user_id", "wk").agg(count(lit(1)).as("k"))
          .filter(col("k") >= 14).select("user_id", "wk")
        val ages = act.join(c0, "user_id")
          .groupBy(col("w0"), (col("wk") - col("w0")).as("wk_off"))
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sz), "w0")
          .select(col("wk_off"),
            round(col("n_active") / col("n_cohort"), 4).as("pct"))
          .filter(col("wk_off") >= 1)
          .groupBy("wk_off")
          .agg(round(avg("pct"), 6).as("ret"))
          .filter(col("ret") > 0)
        val b = col("cxy") / col("vx")
        val ok = col("np") >= 2 && col("vx") > 0
        ages.select(log(col("wk_off").cast("double")).as("lx"),
                    log(col("ret")).as("ly"))
          .agg(count(lit(1)).cast("double").as("np"),
               avg("lx").as("mx"), avg("ly").as("my"),
               covar_pop("lx", "ly").as("cxy"), var_pop("lx").as("vx"),
               var_pop("ly").as("vy"))
          .select(col("np").cast("long").as("n_ages"),
            when(ok, round(b, 4)).otherwise(lit(null).cast("double")).as("decay_exp"),
            when(ok, round(exp(col("my") - b * col("mx")), 4))
              .otherwise(lit(null).cast("double")).as("ret_w1_fit"),
            when(ok && col("vy") > 0,
              round(col("cxy") * col("cxy") / (col("vx") * col("vy")), 4))
              .otherwise(lit(null).cast("double")).as("r2"))
      },
      Some("""WITH ev AS (SELECT user_id, ts // 1000 // 86400000000 // 7 AS wk
             |            FROM events),
             |c0 AS (SELECT user_id, min(wk) AS w0 FROM ev GROUP BY user_id),
             |sz AS (SELECT w0, CAST(count(*) AS BIGINT) AS n_cohort
             |       FROM c0 GROUP BY w0),
             |cells AS (SELECT wk - w0 AS wk_off, CAST(count(*) AS BIGINT) AS n_active, w0
             |          FROM (SELECT user_id, wk FROM ev
             |                GROUP BY 1, 2 HAVING count(*) >= 14) du
             |          JOIN c0 USING (user_id) GROUP BY w0, wk_off),
             |ages AS (SELECT wk_off, round(avg(pct), 6) AS ret FROM (
             |           SELECT wk_off, round(n_active * 1.0 / n_cohort, 4) AS pct
             |           FROM cells JOIN sz USING (w0) WHERE wk_off >= 1)
             |         GROUP BY wk_off HAVING round(avg(pct), 6) > 0),
             |pts AS (SELECT ln(CAST(wk_off AS DOUBLE)) AS lx, ln(ret) AS ly
             |        FROM ages),
             |ag AS (SELECT CAST(count(*) AS DOUBLE) AS np, avg(lx) AS mx,
             |              avg(ly) AS my, covar_pop(lx, ly) AS cxy,
             |              var_pop(lx) AS vx, var_pop(ly) AS vy
             |       FROM pts)
             |SELECT CAST(np AS BIGINT) AS n_ages,
             |       CASE WHEN np >= 2 AND vx > 0
             |            THEN round(cxy / vx, 4) END AS decay_exp,
             |       CASE WHEN np >= 2 AND vx > 0
             |            THEN round(exp(my - (cxy / vx) * mx), 4) END AS ret_w1_fit,
             |       CASE WHEN np >= 2 AND vx > 0 AND vy > 0
             |            THEN round(cxy * cxy / (vx * vy), 4) END AS r2
             |FROM ag""".stripMargin)),

    // daily sample-ratio-mismatch trend: the ev_srm gate per day
    // (distinct users per day × md5 arm, χ² vs 50/50 at the 0.001
    // bar) — a ramp or assignment bug shows as WHEN the imbalance
    // started, which the single global χ² can't say. |days| output
    // rows, one distinct pass.
    "ev_srm_daily" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val half = col("n").cast("double") / 2
        Tables.events(s, d)
          .select(expr("ts div 86400000000000").as("day"), col("user_id"))
          .distinct()
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("day")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"))
          .withColumn("n", col("n_t") + col("n_c"))
          .withColumn("chi2",
            when(col("n") > 0,
              round(pow(col("n_t") - half, 2) / half
                + pow(col("n_c") - half, 2) / half, 6))
              .otherwise(lit(null).cast("double")))
          .withColumn("srm_flag",
            when(col("chi2").isNull, lit(null).cast("boolean"))
              .otherwise(col("chi2") > 10.828)) // chi2(1) at alpha=0.001
          .select(col("day"), col("n_t"), col("n_c"), col("chi2"), col("srm_flag"))
          .orderBy("day")
      },
      Some("""WITH du AS (SELECT DISTINCT ts // 86400000000000 AS day, user_id
             |            FROM events),
             |g AS (SELECT day,
             |        CAST(sum(CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 1
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |        CAST(sum(CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_c
             |      FROM du GROUP BY day),
             |z AS (SELECT day, n_t, n_c, n_t + n_c AS n,
             |        CASE WHEN n_t + n_c > 0 THEN round(
             |          pow(n_t - CAST(n_t + n_c AS DOUBLE) / 2, 2) / (CAST(n_t + n_c AS DOUBLE) / 2)
             |          + pow(n_c - CAST(n_t + n_c AS DOUBLE) / 2, 2) / (CAST(n_t + n_c AS DOUBLE) / 2), 6)
             |        END AS chi2
             |      FROM g)
             |SELECT day, n_t, n_c, chi2,
             |       CASE WHEN chi2 IS NULL THEN NULL
             |            ELSE chi2 > 10.828 END AS srm_flag
             |FROM z ORDER BY day""".stripMargin)),

    // session abandonment by exit event: ev_sessionize's session ids,
    // each session keyed by its LAST event type (deterministic
    // last-row pick) and whether it converted — the "where do users
    // give up" table. Both windows are per-user; the session rollup
    // is one grouped pass.
    "ev_abandonment" -> Q(
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
        val wLast = Window.partitionBy("user_id", "sid")
          .orderBy(col("ts").desc, col("event_id").desc)
        val per = sess
          .withColumn("rl", row_number().over(wLast))
          .groupBy("user_id", "sid")
          .agg(max(when(col("rl") === 1, col("event_type"))).as("last_type"),
               max(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .as("conv"))
        per.groupBy("last_type")
          .agg(count(lit(1)).as("n_sessions"),
               sum(lit(1L) - col("conv")).as("n_abandoned"))
          .withColumn("abandon_rate",
            round(col("n_abandoned") / col("n_sessions"), 4))
          .orderBy("last_type")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sd AS (SELECT *,
             |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
             |       FROM g),
             |s AS (SELECT *,
             |        row_number() OVER (PARTITION BY user_id, sid
             |          ORDER BY ts DESC, event_id DESC) AS rl
             |      FROM sd),
             |per AS (SELECT user_id, sid,
             |          max(CASE WHEN rl = 1 THEN event_type END) AS last_type,
             |          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |        FROM s GROUP BY 1, 2)
             |SELECT last_type, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(1 - conv) AS BIGINT) AS n_abandoned,
             |       round(sum(1 - conv) * 1.0 / count(*), 4) AS abandon_rate
             |FROM per GROUP BY last_type ORDER BY last_type""".stripMargin)),

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

    // interrupted-time-series (segmented regression): fit daily
    // purchases ~ day SEPARATELY before and after the calendar
    // midpoint and report the level and slope discontinuities at the
    // cut — the first-line causal read-out for "did the launch bend
    // the curve". Both segment fits are CASE-filtered Gram sums in
    // ONE aggregate over the daily rollup; exact integer sums feed
    // the closed forms.
    "ev_intervention_its" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false) // bounds + the segment sums
        val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
        val t = daily.crossJoin(broadcast(bounds))
          .withColumn("t", (col("day") - col("mn")).cast("double"))
          .withColumn("t0", expr("CAST((mx - mn + 1) div 2 AS DOUBLE)"))
          .withColumn("post", (col("t") >= col("t0")).cast("long"))
        def seg(p: Int, c: String) = sum(when(col("post") === p,
          expr(c)).otherwise(0.0))
        val g = t.agg(max("t0").as("t0"),
          sum(when(col("post") === 0, 1L).otherwise(0L)).cast("double").as("n1"),
          seg(0, "t").as("sx1"), seg(0, "y").as("sy1"),
          seg(0, "t*t").as("sxx1"), seg(0, "t*y").as("sxy1"),
          sum(when(col("post") === 1, 1L).otherwise(0L)).cast("double").as("n2"),
          seg(1, "t").as("sx2"), seg(1, "y").as("sy2"),
          seg(1, "t*t").as("sxx2"), seg(1, "t*y").as("sxy2"))
        def fit(n: String, sx: String, sy: String, sxx: String, sxy: String) = {
          val dx = col(n) * col(sxx) - col(sx) * col(sx)
          val b = (col(n) * col(sxy) - col(sx) * col(sy)) / dx
          (dx, round(b, 6), round((col(sy) - b * col(sx)) / col(n), 6))
        }
        val (dx1, b1, a1) = fit("n1", "sx1", "sy1", "sxx1", "sxy1")
        val (dx2, b2, a2) = fit("n2", "sx2", "sy2", "sxx2", "sxy2")
        g.withColumn("ok", col("n1") >= 2 && col("n2") >= 2 &&
            dx1 > 0 && dx2 > 0)
          .select(col("n1").cast("long").as("n_pre"),
            col("n2").cast("long").as("n_post"),
            when(col("ok"), b1).as("slope_pre"),
            when(col("ok"), b2).as("slope_post"),
            when(col("ok"), round(b2 - b1, 6)).as("slope_change"),
            when(col("ok"), round((a2 + b2 * col("t0")) - (a1 + b1 * col("t0")), 4))
              .as("level_change"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
             |t AS (SELECT CAST(day - mn AS DOUBLE) AS t,
             |             CAST((mx - mn + 1) // 2 AS DOUBLE) AS t0, y,
             |             CASE WHEN day - mn >= (mx - mn + 1) // 2
             |                  THEN 1 ELSE 0 END AS post
             |      FROM daily, b),
             |g AS (SELECT max(t0) AS t0,
             |        CAST(sum(CASE WHEN post = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             |        sum(CASE WHEN post = 0 THEN t ELSE 0 END) AS sx1,
             |        sum(CASE WHEN post = 0 THEN y ELSE 0 END) AS sy1,
             |        sum(CASE WHEN post = 0 THEN t*t ELSE 0 END) AS sxx1,
             |        sum(CASE WHEN post = 0 THEN t*y ELSE 0 END) AS sxy1,
             |        CAST(sum(CASE WHEN post = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
             |        sum(CASE WHEN post = 1 THEN t ELSE 0 END) AS sx2,
             |        sum(CASE WHEN post = 1 THEN y ELSE 0 END) AS sy2,
             |        sum(CASE WHEN post = 1 THEN t*t ELSE 0 END) AS sxx2,
             |        sum(CASE WHEN post = 1 THEN t*y ELSE 0 END) AS sxy2
             |      FROM t),
             |f AS (SELECT *,
             |        n1*sxx1 - sx1*sx1 AS dx1, n2*sxx2 - sx2*sx2 AS dx2,
             |        (n1 >= 2 AND n2 >= 2 AND n1*sxx1 - sx1*sx1 > 0
             |         AND n2*sxx2 - sx2*sx2 > 0) AS ok
             |      FROM g),
             |c AS (SELECT *,
             |        round((n1*sxy1 - sx1*sy1) / dx1, 6) AS b1,
             |        round((n2*sxy2 - sx2*sy2) / dx2, 6) AS b2,
             |        round((sy1 - (n1*sxy1 - sx1*sy1) / dx1 * sx1) / n1, 6) AS a1,
             |        round((sy2 - (n2*sxy2 - sx2*sy2) / dx2 * sx2) / n2, 6) AS a2
             |      FROM f)
             |SELECT CAST(n1 AS BIGINT) AS n_pre, CAST(n2 AS BIGINT) AS n_post,
             |       CASE WHEN ok THEN b1 END AS slope_pre,
             |       CASE WHEN ok THEN b2 END AS slope_post,
             |       CASE WHEN ok THEN round(b2 - b1, 6) END AS slope_change,
             |       CASE WHEN ok THEN round((a2 + b2*t0) - (a1 + b1*t0), 4)
             |       END AS level_change
             |FROM c""".stripMargin))
  )

  val eventsRB: Seq[(String, Q)] = Seq(
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
             |FROM sm ORDER BY covariate""".stripMargin)),

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

    // self-normalized IPW (Hájek) estimate of the treatment effect on
    // conversion, propensity stratified by activity band — the
    // covariate-adjusted companion to ev_ab_test (here arms are
    // hash-random so IPW ≈ the raw diff; the machinery is what a
    // biased-assignment log needs). Per-user rollup → per-band
    // propensities as ONE broadcast frame → conditional sums.
    "ev_ipw" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(count(lit(1)).as("n_ev"),
               max(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .as("y"))
          .withColumn("band", least(expr("n_ev div 5"), lit(9L)))
          .localCheckpoint(eager = false) // propensities + the sums
        val prop = u.groupBy("band")
          .agg(round(sum(when(col("arm") === 1, 1.0).otherwise(0.0))
            / count(lit(1)), 6).as("e"))
        val j = u.join(broadcast(prop), "band")
          .filter(col("e") > 0 && col("e") < 1)
        j.agg(count(lit(1)).as("n_users"),
            round(sum(when(col("arm") === 1, col("y") / col("e"))
                .otherwise(0.0))
              / sum(when(col("arm") === 1, lit(1.0) / col("e"))
                .otherwise(0.0)), 6).as("mu_t"),
            round(sum(when(col("arm") === 0, col("y") / (lit(1.0) - col("e")))
                .otherwise(0.0))
              / sum(when(col("arm") === 0, lit(1.0) / (lit(1.0) - col("e")))
                .otherwise(0.0)), 6).as("mu_c"))
          .select(col("n_users"), col("mu_t"), col("mu_c"),
            round(col("mu_t") - col("mu_c"), 6).as("ipw_ate"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(count(*) AS BIGINT) AS n_ev,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
             |  FROM events GROUP BY 1, 2),
             |ub AS (SELECT *, least(n_ev // 5, 9) AS band FROM u),
             |prop AS (SELECT band,
             |           round(sum(CASE WHEN arm = 1 THEN 1.0 ELSE 0.0 END)
             |                 / count(*), 6) AS e
             |         FROM ub GROUP BY band),
             |j AS (SELECT * FROM ub JOIN prop USING (band)
             |      WHERE e > 0 AND e < 1),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |         round(sum(CASE WHEN arm = 1 THEN y / e ELSE 0.0 END)
             |           / sum(CASE WHEN arm = 1 THEN 1.0 / e ELSE 0.0 END), 6) AS mu_t,
             |         round(sum(CASE WHEN arm = 0 THEN y / (1.0 - e) ELSE 0.0 END)
             |           / sum(CASE WHEN arm = 0 THEN 1.0 / (1.0 - e) ELSE 0.0 END), 6) AS mu_c
             |       FROM j)
             |SELECT n_users, mu_t, mu_c, round(mu_t - mu_c, 6) AS ipw_ate
             |FROM ag""".stripMargin)),

    // bounce rate by session entry type: share of sessions that end
    // after ONE event, keyed by what the session STARTED with — the
    // landing-page health metric. Reuses the ev_sessionize gap
    // machinery (per-user windows only); per-session rollup keeps
    // first-event type via the min (ts, event_id, type) struct — no
    // extra window pass.
    "ev_bounce_rate" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("session_id",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               min(struct(col("ts"), col("event_id"), col("event_type")))
                 .as("first_ev"))
        sess.groupBy(col("first_ev.event_type").as("entry_type"))
          .agg(count(lit(1)).as("n_sessions"),
               sum(when(col("n_events") === 1, 1L).otherwise(0L))
                 .as("n_bounced"))
          .select(col("entry_type"), col("n_sessions"), col("n_bounced"),
            round(col("n_bounced") / col("n_sessions").cast("double"), 4)
              .as("bounce_rate"))
          .orderBy("entry_type")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g),
             |se AS (
             |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
             |  FROM s GROUP BY user_id, session_id),
             |fs AS (
             |  -- first event per session via a window, NOT min(struct):
             |  -- DuckDB's nested-type min is exempt from memory_limit and
             |  -- OOMs at sf3 (130 GB RSS on 3M grouped rows); windows spill
             |  SELECT user_id, session_id, event_type AS entry_type
             |  FROM s QUALIFY row_number() OVER (PARTITION BY user_id, session_id
             |                                    ORDER BY ts, event_id) = 1),
             |fe AS (SELECT entry_type, n_events
             |       FROM fs JOIN se USING (user_id, session_id))
             |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounced,
             |       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS bounce_rate
             |FROM fe GROUP BY entry_type ORDER BY entry_type""".stripMargin)),

    // quantile treatment effects: per-arm quartiles of per-user spend
    // — where in the distribution the treatment moves money, which
    // the mean (ev_ab_test) hides. One per-user rollup; quartiles by
    // the stat_percentiles type-7 parity.
    "ev_qte" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(sum("value").as("spend"))
        val g = u.groupBy("arm")
          .agg(expr("percentile(spend, array(0.25D, 0.5D, 0.75D))").as("ps"))
        val t = g.filter(col("arm") === 1)
          .select(explode(expr(
            "arrays_zip(array(0.25D, 0.5D, 0.75D), ps)")).as("e"))
          .select(col("e.0").as("q"), round(col("e.ps"), 4).as("v_t"))
        val c = g.filter(col("arm") === 0)
          .select(explode(expr(
            "arrays_zip(array(0.25D, 0.5D, 0.75D), ps)")).as("e"))
          .select(col("e.0").as("q"), round(col("e.ps"), 4).as("v_c"))
        t.join(c, "q")
          .select(col("q"), col("v_t"), col("v_c"),
            round(col("v_t") - col("v_c"), 4).as("qte"))
          .orderBy("q")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         sum(value) AS spend
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
             |  GROUP BY 1, 2),
             |g AS (SELECT
             |        round(quantile_cont(spend, 0.25) FILTER (arm = 1), 4) AS t25,
             |        round(quantile_cont(spend, 0.50) FILTER (arm = 1), 4) AS t50,
             |        round(quantile_cont(spend, 0.75) FILTER (arm = 1), 4) AS t75,
             |        round(quantile_cont(spend, 0.25) FILTER (arm = 0), 4) AS c25,
             |        round(quantile_cont(spend, 0.50) FILTER (arm = 0), 4) AS c50,
             |        round(quantile_cont(spend, 0.75) FILTER (arm = 0), 4) AS c75
             |      FROM u)
             |SELECT CAST(0.25 AS DOUBLE) AS q, t25 AS v_t, c25 AS v_c, round(t25 - c25, 4) AS qte FROM g
             |UNION ALL
             |SELECT CAST(0.5 AS DOUBLE), t50, c50, round(t50 - c50, 4) FROM g
             |UNION ALL
             |SELECT CAST(0.75 AS DOUBLE), t75, c75, round(t75 - c75, 4) FROM g
             |ORDER BY q""".stripMargin)),

    // event-study leads/lags around the ITS cut day: per relative day
    // r ∈ [−5, 5], treated-minus-control conversion gap normalized to
    // the r = −1 gap — flat pre-trend is the diff-in-diff validity
    // check made visible. One conditional daily rollup; everything
    // after runs on the ≤11-row frame with the baseline broadcast.
    "ev_event_study" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ev = Tables.events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .localCheckpoint(eager = false) // bounds + the rollup
        val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
          .withColumn("cut", col("mn") + expr("CAST((mx - mn + 1) div 2 AS BIGINT)"))
        val daily = ev.crossJoin(broadcast(bounds))
          .withColumn("rel", col("day") - col("cut"))
          .filter(col("rel").between(-5, 5))
          .groupBy("rel")
          .agg(
            round(sum(when(col("arm") === 1 && col("event_type") === "purchase",
              1.0).otherwise(0.0)) /
              nullif(sum(when(col("arm") === 1, 1.0).otherwise(0.0)), lit(0.0)),
              6).as("rate_t"),
            round(sum(when(col("arm") === 0 && col("event_type") === "purchase",
              1.0).otherwise(0.0)) /
              nullif(sum(when(col("arm") === 0, 1.0).otherwise(0.0)), lit(0.0)),
              6).as("rate_c"))
          .withColumn("gap", round(col("rate_t") - col("rate_c"), 6))
          .localCheckpoint(eager = false) // baseline + the report
        val base = daily.filter(col("rel") === -1)
          .select(col("gap").as("gap_base"))
        daily.crossJoin(broadcast(base))
          .select(col("rel"), col("rate_t"), col("rate_c"),
            round(col("gap") - col("gap_base"), 6).as("effect"))
          .orderBy("rel")
      },
      Some("""WITH ev AS (
             |  SELECT ts // 86400000000000 AS day, user_id, event_type,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |c AS (SELECT mn + (mx - mn + 1) // 2 AS cut FROM b),
             |daily AS (
             |  SELECT day - cut AS rel,
             |         round(sum(CASE WHEN arm = 1 AND event_type = 'purchase'
             |                        THEN 1.0 ELSE 0.0 END)
             |               / nullif(sum(CASE WHEN arm = 1 THEN 1.0 ELSE 0.0 END), 0.0), 6) AS rate_t,
             |         round(sum(CASE WHEN arm = 0 AND event_type = 'purchase'
             |                        THEN 1.0 ELSE 0.0 END)
             |               / nullif(sum(CASE WHEN arm = 0 THEN 1.0 ELSE 0.0 END), 0.0), 6) AS rate_c
             |  FROM ev, c WHERE day - cut BETWEEN -5 AND 5
             |  GROUP BY 1),
             |g AS (SELECT *, round(rate_t - rate_c, 6) AS gap FROM daily),
             |base AS (SELECT gap AS gap_base FROM g WHERE rel = -1)
             |SELECT rel, rate_t, rate_c,
             |       round(gap - gap_base, 6) AS effect
             |FROM g, base ORDER BY rel""".stripMargin)),

    // Day-of-week × hour activity profile per event type: the peak
    // cell, its traffic share, and the entropy of the 168-cell
    // distribution (how concentrated is the weekly rhythm?) — the
    // capacity-planning readout behind ts_seasonal's per-hour μ/σ
    // baseline. Epoch-day arithmetic (no timezone semantics), exact
    // integer counts, one agg + a ≤|types|-row window.
    "ev_dow_hour" -> Q(
      (s, d) => {
        val cells = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("(ts div 86400000000000) % 7").as("dow"),
            expr("(ts div 3600000000000) % 24").as("hour"))
          .agg(count(lit(1)).as("n"))
        val tot = cells.groupBy("event_type")
          .agg(sum("n").as("tot"),
            round(log(sum("n").cast("double"))
              - sum(col("n") * log(col("n").cast("double"))) / sum("n"), 4)
              .as("h_cells"))
        cells.join(broadcast(tot), "event_type")
          .withColumn("rk", row_number().over(Window
            .partitionBy("event_type")
            .orderBy(col("n").desc, col("dow"), col("hour"))))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("dow").as("peak_dow"),
            col("hour").as("peak_hour"),
            round(col("n") / col("tot").cast("double"), 4)
              .as("peak_share"), col("h_cells"))
          .orderBy("event_type")
      },
      Some("""WITH cells AS (
             |  SELECT event_type, (ts // 86400000000000) % 7 AS dow,
             |         (ts // 3600000000000) % 24 AS hour,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2, 3),
             |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
             |               round(ln(CAST(sum(n) AS DOUBLE))
             |                     - sum(n * ln(CAST(n AS DOUBLE))) / sum(n), 4)
             |                 AS h_cells
             |        FROM cells GROUP BY 1),
             |rk AS (SELECT c.*, t.tot, t.h_cells,
             |              row_number() OVER (PARTITION BY c.event_type
             |                ORDER BY c.n DESC, c.dow, c.hour) AS rk
             |       FROM cells c JOIN tot t USING (event_type))
             |SELECT event_type, dow AS peak_dow, hour AS peak_hour,
             |       round(n / CAST(tot AS DOUBLE), 4) AS peak_share,
             |       h_cells
             |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // Lorenz curve of user activity in deciles — the FULL inequality
    // profile beside ev_pareto's top-decile share and stat_gini's
    // scalar: users bucketed by broadcast percentile cutoffs (no
    // global sort of users), per-decile event share + cumulative.
    // The ≤10-row cumulative window is WindowGuard-allowlisted.
    "ev_lorenz_deciles" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false) // cutoffs + bucketing
        val cuts = u.agg(expr(
          "percentile(cnt, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
          .as("qs"))
        val dec = u.crossJoin(broadcast(cuts))
          .withColumn("decile", lit(1) + expr(
            "aggregate(qs, 0, (acc, q) -> acc + CASE WHEN cnt > q THEN 1 ELSE 0 END)"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_users"), sum("cnt").as("n_events"))
        val wCum = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        dec.withColumn("tot", sum("n_events").over(wTot))
          .withColumn("cum", sum("n_events").over(wCum))
          .select(col("decile"), col("n_users"), col("n_events"),
            round(col("n_events") / col("tot").cast("double"), 4).as("share"),
            round(col("cum") / col("tot").cast("double"), 4).as("cum_share"))
          .orderBy("decile")
      },
      Some("""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
             |           FROM events GROUP BY 1),
             |c AS (SELECT quantile_cont(cnt,
             |        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
             |      FROM u),
             |dec AS (SELECT 1 + len(list_filter(qs, q -> cnt > q)) AS decile,
             |               cnt
             |        FROM u CROSS JOIN c),
             |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             |             CAST(sum(cnt) AS BIGINT) AS n_events
             |      FROM dec GROUP BY 1),
             |w AS (SELECT *,
             |             CAST(sum(n_events) OVER () AS BIGINT) AS tot,
             |             CAST(sum(n_events) OVER (ORDER BY decile ROWS BETWEEN
             |               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |      FROM g)
             |SELECT CAST(decile AS INT) AS decile, n_users, n_events,
             |       round(n_events / CAST(tot AS DOUBLE), 4) AS share,
             |       round(cum / CAST(tot AS DOUBLE), 4) AS cum_share
             |FROM w ORDER BY decile""".stripMargin)),

    // Audience overlap between event types: distinct-user Jaccard
    // for every type pair — which behaviors share an audience and
    // which segment it (the user-set companion to ev_transitions'
    // FLOW view). One distinct projection, a user equi-join bounded
    // by ≤|types| fan-out per user, exact integers.
    "ev_type_overlap" -> Q(
      (s, d) => {
        // "engaged" = strictly above the type's median per-user count
        // (plain any-event membership is degenerate here: every user
        // touches every type, all Jaccards = 1)
        val c = Tables.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        val m = c.groupBy("event_type")
          .agg(expr("percentile(cnt, 0.5D)").as("mc"))
        val ut = c.join(broadcast(m), "event_type")
          .filter(col("cnt") > col("mc"))
          .select(col("user_id"), col("event_type"))
          .localCheckpoint(eager = false) // both sides + totals
        val tot = ut.groupBy("event_type").agg(count(lit(1)).as("nu"))
        val inter = ut.toDF("user_id", "ta")
          .join(ut.toDF("user_id", "tb"), "user_id")
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_both"))
        inter
          .join(broadcast(tot.toDF("ta", "na")), "ta")
          .join(broadcast(tot.toDF("tb", "nb")), "tb")
          .select(col("ta").as("type_a"), col("tb").as("type_b"),
            col("n_both"),
            round(col("n_both")
              / (col("na") + col("nb") - col("n_both")).cast("double"), 4)
              .as("jaccard"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH c AS (SELECT user_id, event_type,
             |                  CAST(count(*) AS BIGINT) AS cnt
             |           FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, quantile_cont(cnt, 0.5) AS mc
             |      FROM c GROUP BY 1),
             |ut AS (SELECT user_id, c.event_type
             |       FROM c JOIN m ON c.event_type = m.event_type
             |       WHERE cnt > mc),
             |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu
             |        FROM ut GROUP BY 1),
             |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             |             CAST(count(*) AS BIGINT) AS n_both
             |      FROM ut a JOIN ut b ON a.user_id = b.user_id
             |                         AND a.event_type < b.event_type
             |      GROUP BY 1, 2)
             |SELECT type_a, type_b, n_both,
             |       round(n_both / CAST(ta.nu + tb.nu - n_both AS DOUBLE), 4)
             |         AS jaccard
             |FROM i JOIN tot ta ON i.type_a = ta.event_type
             |       JOIN tot tb ON i.type_b = tb.event_type
             |ORDER BY type_a, type_b""".stripMargin)),

    // Gap-constrained episode mining: for every ordered event-type
    // pair, how many users do A then B within ONE HOUR — the
    // time-window sequence view that ev_assoc_rules (same basket) and
    // ev_markov2 (immediate adjacency) both miss. The Spark pair join
    // probes only (same hour-bucket, next bucket) via a 2-way explode,
    // so the join fan-out is bounded by per-user-per-hour activity —
    // never the full per-user history squared. Confidence + lift off
    // exact distinct-user counts.
    "ev_episode_mining" -> Q(
      (s, d) => {
        // episode (a then b within 1h) existence per user via ONE
        // range-frame window pass — NOT a self-join: the r16 form
        // paired events through hour-bucketed (user, bucket) keys,
        // which is quadratic in the hot user\'s rate (the round-17
        // skewed flush measured ~2B pair-candidates for a 29%-hot
        // user at sf3; the matching DuckDB pair-join oracle ground
        // for >30 min). The frame [ts−1h, ts−1] is EXACTLY the
        // original predicate (strict tsb > tsa included — same-ts
        // rows fall outside the −1 bound), and one conditional max
        // per type turns "any qualifying a before this b" into a
        // null test. Linear in events; the hot-user partition is one
        // sliding-frame sort, not a pair blow-up.
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
          .localCheckpoint(eager = false) // supports + the window side
        val nu = ev.agg(countDistinct("user_id").as("nu"))
        val supp = ev.groupBy("event_type")
          .agg(countDistinct("user_id").as("su"))
        val types = Seq("click", "error", "purchase", "signup", "view")
        val w = Window.partitionBy("user_id").orderBy("ts")
          .rangeBetween(-3600000000000L, -1L)
        val flagged = ev.select(
          Seq(col("user_id"), col("event_type").as("tb")) ++ types.map(t =>
            max(when(col("event_type") === t, col("ts"))).over(w)
              .isNotNull.as(s"m_$t")): _*)
        val pairs = flagged.select(col("user_id"), col("tb"),
            explode(array(types.map(t =>
              struct(lit(t).as("ta"), col(s"m_$t").as("m"))): _*)).as("x"))
          .filter(col("x.m"))
          .groupBy(col("x.ta").as("ta"), col("tb"))
          .agg(countDistinct("user_id").as("n_users"))
        pairs
          .join(broadcast(supp.toDF("ta", "sa")), "ta")
          .join(broadcast(supp.toDF("tb", "sb")), "tb")
          .crossJoin(broadcast(nu))
          .select(col("ta").as("type_a"), col("tb").as("type_b"),
            col("n_users"),
            round(col("n_users") / col("sa").cast("double"), 4)
              .as("confidence"),
            round(col("n_users") * col("nu")
              / (col("sa") * col("sb")).cast("double"), 4).as("lift"))
          .orderBy("type_a", "type_b")
      },
      // oracle mirrors the range-frame window form (the r16 pair-join
      // oracle was itself skew-quadratic — same escape class as the
      // attribution-windows one)
      Some("""WITH ev AS (SELECT user_id, event_type, ts FROM events),
             |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
             |       FROM ev),
             |supp AS (SELECT event_type,
             |                CAST(count(DISTINCT user_id) AS BIGINT) AS su
             |         FROM ev GROUP BY 1),
             |f AS (SELECT user_id, event_type AS tb,
             |        max(CASE WHEN event_type = 'click' THEN ts END) OVER w AS m_click,
             |        max(CASE WHEN event_type = 'error' THEN ts END) OVER w AS m_error,
             |        max(CASE WHEN event_type = 'purchase' THEN ts END) OVER w AS m_purchase,
             |        max(CASE WHEN event_type = 'signup' THEN ts END) OVER w AS m_signup,
             |        max(CASE WHEN event_type = 'view' THEN ts END) OVER w AS m_view
             |      FROM ev
             |      WINDOW w AS (PARTITION BY user_id ORDER BY ts
             |        RANGE BETWEEN 3600000000000 PRECEDING AND 1 PRECEDING)),
             |p AS (SELECT user_id, tb, u.ta
             |      FROM f, LATERAL (SELECT
             |        unnest(['click','error','purchase','signup','view']) AS ta,
             |        unnest([m_click, m_error, m_purchase, m_signup, m_view]) AS m) u
             |      WHERE u.m IS NOT NULL),
             |pairs AS (SELECT ta, tb,
             |                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |          FROM p GROUP BY 1, 2)
             |SELECT ta AS type_a, tb AS type_b, n_users,
             |       round(n_users / CAST(sa.su AS DOUBLE), 4) AS confidence,
             |       round(n_users * nu / CAST(sa.su * sb.su AS DOUBLE), 4)
             |         AS lift
             |FROM pairs JOIN supp sa ON pairs.ta = sa.event_type
             |           JOIN supp sb ON pairs.tb = sb.event_type, nu
             |ORDER BY type_a, type_b""".stripMargin))
  )

  val eventsRC: Seq[(String, Q)] = Seq(
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

    // Feature-adoption curve: cumulative distinct users per event
    // type by day (each user counts at their FIRST day with the
    // type — users collapse in the per-(user,type) agg first, so the
    // running sum sees |types|·|days| rows, never events). The
    // product-growth curve next to ev_dau_wau's activity view.
    "ev_adoption_curve" -> Q(
      (s, d) => {
        val firstDay = Tables.events(s, d)
          .groupBy("user_id", "event_type")
          .agg(min(expr("ts DIV 86400000000000")).as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("new_users"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        firstDay
          .withColumn("cum_users", sum("new_users").over(w))
          .orderBy("event_type", "day")
      },
      Some("""WITH f AS (
             |  SELECT user_id, event_type,
             |         min(ts // 86400000000000) AS day
             |  FROM events GROUP BY 1, 2),
             |nd AS (SELECT event_type, day,
             |              CAST(count(*) AS BIGINT) AS new_users
             |       FROM f GROUP BY 1, 2)
             |SELECT event_type, day, new_users,
             |       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |         AS cum_users
             |FROM nd ORDER BY event_type, day""".stripMargin)),

    // Dobrushin total-variation diameter of the event-type transition
    // matrix at t = 1 and t = 2: δ(t) = max over row pairs of
    // ½·Σ_j |P^t(i,j) − P^t(i',j)| — δ near 1 means the next state
    // still remembers the current one, δ(t) → 0 is the mixing-speed
    // certificate behind ev_stationary's fixed point. All on the
    // bounded ≤|types|² cell table (7dp-pinned probabilities and
    // squared matrix), dense-gridded so absent transitions are real
    // zeros.
    "ev_mixing_tv" -> Q(
      (s, d) => {
        val cells0 = transitionCells(s, d)
          .filter(col("to_type").isNotNull && col("from_type").isNotNull)
        val tot = cells0.groupBy("from_type").agg(sum("n").as("tot"))
        // probabilities live in integer 1e-7 units end-to-end: the
        // matrix square and every TV row-sum are then EXACT integer
        // arithmetic — a double Σ p·p would round 7dp differently
        // under DuckDB's arbitrary aggregation order
        val p1 = cells0.join(broadcast(tot), "from_type")
          .select(col("from_type").as("i"), col("to_type").as("j"),
            round(col("n") / col("tot") * 1e7, 0).cast("long").as("pu"))
          .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
          .toMap
        val types = p1.keys.map(_._1).toSeq.distinct.sorted
        val p2 = (for (i <- types; j <- types) yield {
          val v = types.map(k => p1.getOrElse((i, k), 0L)
            * p1.getOrElse((k, j), 0L)).sum
          ((i, j), math.floor(v / 1e7 + 0.5).toLong)
        }).toMap
        def diam(m: Map[(String, String), Long]) = (for {
          a <- types; b <- types if a < b
        } yield types.map(j =>
            math.abs(m.getOrElse((a, j), 0L) - m.getOrElse((b, j), 0L))).sum)
          .max
        def tv(u: Long) = BigDecimal(u / 2e7)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        import s.implicits._
        Seq((1L, tv(diam(p1))), (2L, tv(diam(p2))))
          .toDF("t", "tv_diameter").orderBy("t")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS i,
             |         lead(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS j
             |  FROM events),
             |cnt AS (SELECT i, j, count(*) AS n FROM tr
             |        WHERE i IS NOT NULL AND j IS NOT NULL GROUP BY i, j),
             |tot AS (SELECT i, sum(n) AS tot FROM cnt GROUP BY i),
             |types AS (SELECT DISTINCT i AS t FROM cnt),
             |grid AS (SELECT a.t AS i, b.t AS j FROM types a, types b),
             |p1 AS (SELECT g.i, g.j,
             |              coalesce(CAST(round(cnt.n * 1.0 / tot.tot * 1e7)
             |                AS BIGINT), 0) AS pu
             |       FROM grid g
             |       LEFT JOIN cnt ON cnt.i = g.i AND cnt.j = g.j
             |       LEFT JOIN tot ON tot.i = g.i),
             |p2 AS (SELECT a.i, b.j,
             |              CAST(floor(sum(a.pu * b.pu) / 1e7 + 0.5) AS BIGINT) AS pu
             |       FROM p1 a JOIN p1 b ON a.j = b.i GROUP BY a.i, b.j),
             |d1 AS (SELECT sum(abs(a.pu - b.pu)) AS s
             |       FROM p1 a JOIN p1 b ON a.j = b.j AND a.i < b.i
             |       GROUP BY a.i, b.i),
             |d2 AS (SELECT sum(abs(a.pu - b.pu)) AS s
             |       FROM p2 a JOIN p2 b ON a.j = b.j AND a.i < b.i
             |       GROUP BY a.i, b.i)
             |SELECT CAST(1 AS BIGINT) AS t,
             |       round(max(s) / 2e7, 6) AS tv_diameter FROM d1
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), round(max(s) / 2e7, 6) FROM d2
             |ORDER BY t""".stripMargin)),

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

    // Attribution-window sensitivity: last-touch click credit per
    // campaign at 1h / 6h / 24h lookbacks. ONE as-of join, no pair
    // materialization: last-touch only ever needs the LATEST click
    // before each purchase — and any EARLIER click has a strictly
    // larger delta, so if the latest click misses a window, every
    // click does. The narrower windows are therefore delta-filters
    // over the SAME as-of candidate. (The r16 form materialized every
    // (click, purchase) pair within 24h via a bucketed range join;
    // the round-17 skewed flush measured that quadratic at 1032 s on
    // a zipfian sf3 corpus — a 29%-hot user is ~0.5M clicks × ~90k
    // purchases — while this form is one shuffle + one ordered window
    // pass, linear in the hot user's rows.) If credit shares swing
    // with the window, the attribution model — not the campaign — is
    // driving the numbers.
    "ev_attribution_windows" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts DIV 1000").as("ats"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
        // one click row per (user, cts): at equal cts the r16 struct
        // max picked max cid (event_id is unique, campaign never
        // compared) — same reduction here, BEFORE the as-of so the
        // window's last() has a deterministic winner
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ats").as("cts"),
            struct(col("event_id").as("cid"),
              coalesce(pmod(col("k"), lit(10)), lit(-1L)).as("campaign"))
              .as("cc"))
          .groupBy("user_id", "cts").agg(max("cc").as("cc"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            (col("ats") - 1).as("en"), col("ats").as("pts"))
        val asof = graft.ops.Joins.asofJoin(
            purch, clicks, Seq("user_id"), "en", "cts")
          .withColumn("delta", col("pts") - col("asof.cts"))
        def credit(windowUs: Long) =
          when(col("asof").isNotNull && col("delta") <= windowUs,
            col("asof.cc.campaign"))
        val byPid = asof.select(
          credit(3600000000L).as("w1"),
          credit(21600000000L).as("w6"),
          credit(86400000000L).as("w24"))
          .localCheckpoint(eager = false) // read 3×: one per window
        Seq((1L, "w1"), (6L, "w6"), (24L, "w24")).map { case (h, c) =>
          byPid.filter(col(c).isNotNull)
            .groupBy(col(c).as("campaign"))
            .agg(count(lit(1)).as("n_credits"))
            .select(lit(h).as("window_h"), col("campaign"), col("n_credits"))
        }.reduce(_ unionAll _).orderBy("window_h", "campaign")
      },
      // oracle via DuckDB\'s native ASOF JOIN — the r16 pair-join
      // oracle was ITSELF quadratic and died spilling >60 GB on the
      // skewed sf3 corpus (same escape class as the sf10 ledger\'s
      // "quadratic-window oracles"); clicks pre-reduce to one row per
      // (user, cts) with arg_max(campaign, cid), the r16 struct-max
      // tie-break
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type, ts // 1000 AS ats,
             |         json_extract_string(props, '$.k')::BIGINT AS k
             |  FROM events),
             |c AS (SELECT user_id, ats AS cts,
             |             arg_max(coalesce(((k % 10) + 10) % 10, -1), event_id)
             |               AS campaign
             |      FROM ev WHERE event_type = 'click' GROUP BY user_id, ats),
             |p AS (SELECT user_id, event_id AS pid, ats AS pts, ats - 1 AS en
             |      FROM ev WHERE event_type = 'purchase'),
             |a AS (SELECT p.pid, p.pts, c.cts, c.campaign
             |      FROM p ASOF JOIN c
             |        ON p.user_id = c.user_id AND p.en >= c.cts),
             |w AS (SELECT CAST(unnest([1, 6, 24]) AS BIGINT) AS window_h)
             |SELECT w.window_h, a.campaign, CAST(count(*) AS BIGINT) AS n_credits
             |FROM a CROSS JOIN w
             |WHERE a.pts - a.cts <= w.window_h * 3600000000
             |GROUP BY w.window_h, a.campaign
             |ORDER BY window_h, campaign""".stripMargin)),

    // Conversion rate by touch depth: users bucketed by click count
    // (3-wide bands, 15+ capped — SF-invariant under constant per-user
    // density), share who purchased — the "how many touches
    // before conversion" curve behind every frequency-cap and
    // retargeting-budget debate. One per-user rollup, exact integers.
    "ev_touch_conversion" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicks"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("purchased"))
        u.withColumn("touch_bucket", least(expr("clicks div 3"), lit(5L)))
          .groupBy("touch_bucket")
          .agg(count(lit(1)).as("n_users"),
            sum("purchased").as("n_converted"))
          .withColumn("conv_rate",
            round(col("n_converted") / col("n_users").cast("double"), 4))
          .orderBy("touch_bucket")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
             |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchased
             |  FROM events GROUP BY user_id)
             |SELECT least(clicks // 3, 5) AS touch_bucket,
             |       CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(purchased) AS BIGINT) AS n_converted,
             |       round(sum(purchased) / CAST(count(*) AS DOUBLE), 4) AS conv_rate
             |FROM u GROUP BY 1 ORDER BY touch_bucket""".stripMargin)),

    // Session-level conversion: share of sessions (ev_sessionize's
    // 30-min gap rule) containing a purchase, by session length (1/2/3/4+ events) —
    // the SESSION-grain funnel complement to ev_touch_conversion's
    // user grain (long sessions that still don't convert are the UX
    // bug; one-event sessions that do are the returning-buyer signal).
    // Two per-user windows + one rollup, exact integers.
    "ev_session_conversion" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
                 col("ts") - col("prev") > lit(1800000000000L), 1)
              .otherwise(0))
          .withColumn("sid",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("n_ev"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("converted"))
        sess.withColumn("len_band", least(col("n_ev"), lit(4L)))
          .groupBy("len_band")
          .agg(count(lit(1)).as("n_sessions"),
            sum("converted").as("n_converted"))
          .withColumn("conv_rate",
            round(col("n_converted") / col("n_sessions").cast("double"), 4))
          .orderBy("len_band")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > 1800000000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, event_type,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM g),
             |sess AS (
             |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_ev,
             |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |              AS BIGINT) AS converted
             |  FROM s GROUP BY user_id, sid)
             |SELECT least(n_ev, 4) AS len_band,
             |       CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(converted) AS BIGINT) AS n_converted,
             |       round(sum(converted) / CAST(count(*) AS DOUBLE), 4) AS conv_rate
             |FROM sess GROUP BY 1 ORDER BY len_band""".stripMargin)),

    // Daily ARPU: purchase revenue per distinct active user by day —
    // the one line every revenue dashboard opens with, assembled from
    // two independent rollups of one scan shape (DAU from the
    // per-(user, day) distinct, revenue under the exact 4dp-DECIMAL
    // moneySum discipline so the series is order-invariant).
    "ev_arpu_dau" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val dau = ev.select(col("user_id"),
            expr("ts DIV 86400000000000").as("day")).distinct()
          .groupBy("day").agg(count(lit(1)).as("dau"))
        val rev = ev.filter(col("event_type") === "purchase" &&
            col("value").isNotNull && !isnan(col("value")))
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(moneySum(col("value")).as("revenue"))
        dau.join(rev, Seq("day"), "left")
          .na.fill(0.0, Seq("revenue"))
          .withColumn("arpu", round(col("revenue") / col("dau"), 4))
          .orderBy("day")
      },
      Some("""WITH dau AS (
             |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM (
             |    SELECT DISTINCT user_id, ts // 86400000000000 AS day
             |    FROM events)
             |  GROUP BY day),
             |rev AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(round(sum(CAST(round(value, 4) AS DECIMAL(20,4))), 2)
             |              AS DOUBLE) AS revenue
             |  FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL
             |    AND NOT isnan(value)
             |  GROUP BY 1)
             |SELECT dau.day, dau.dau, coalesce(rev.revenue, 0.0) AS revenue,
             |       round(coalesce(rev.revenue, 0.0) / dau.dau, 4) AS arpu
             |FROM dau LEFT JOIN rev USING (day) ORDER BY day""".stripMargin)),

    // Weekend effect: weekday-vs-weekend per-day activity and value
    // with the Welch z on daily totals — the staffing/campaign-timing
    // question asked of every usage series. Day-of-week from epoch-day
    // arithmetic ((day + 4) % 7 ≥ 5 — day 0 is a Thursday), exact
    // integer daily counts into the two-sample machinery.
    "ev_weekend_effect" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("wk", (pmod(col("day") + 4, lit(7)) >= 5).cast("int"))
        daily.groupBy("wk")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("s1"),
            sum((col("x") * col("x")).cast(dec)).as("s2"))
          .select(col("wk"), col("n"),
            round(col("s1").cast("double") / col("n"), 4).as("mean_daily"),
            ((col("n") * col("s2") - col("s1") * col("s1")).cast("double")
              / (col("n").cast("double") * (col("n") - 1))).as("v"))
          .agg(
            sum(when(col("wk") === 0, col("n"))).as("n_weekday"),
            sum(when(col("wk") === 1, col("n"))).as("n_weekend"),
            sum(when(col("wk") === 0, col("mean_daily"))).as("mean_weekday"),
            sum(when(col("wk") === 1, col("mean_daily"))).as("mean_weekend"),
            sum(when(col("wk") === 0, col("v"))).as("v0"),
            sum(when(col("wk") === 1, col("v"))).as("v1"))
          .select(col("n_weekday"), col("n_weekend"),
            col("mean_weekday"), col("mean_weekend"),
            round((col("mean_weekend") - col("mean_weekday"))
              / col("mean_weekday"), 4).as("lift"),
            when(col("n_weekday") > 1 && col("n_weekend") > 1 &&
                 col("v0") / col("n_weekday") + col("v1") / col("n_weekend") > 0,
              round((col("mean_weekend") - col("mean_weekday"))
                / sqrt(col("v0") / col("n_weekday")
                  + col("v1") / col("n_weekend")), 4)).as("welch_z"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |g AS (
             |  SELECT CASE WHEN ((day + 4) % 7 + 7) % 7 >= 5 THEN 1 ELSE 0 END AS wk,
             |         CAST(count(*) AS BIGINT) AS n, sum(x) AS s1, sum(x * x) AS s2
             |  FROM daily GROUP BY 1),
             |m AS (
             |  SELECT wk, n,
             |         round(CAST(s1 AS DOUBLE) / n, 4) AS mean_daily,
             |         CAST(n * s2 - s1 * s1 AS DOUBLE)
             |           / (CAST(n AS DOUBLE) * (n - 1)) AS v
             |  FROM g),
             |p AS (
             |  SELECT sum(CASE WHEN wk = 0 THEN n END) AS n_weekday,
             |         sum(CASE WHEN wk = 1 THEN n END) AS n_weekend,
             |         sum(CASE WHEN wk = 0 THEN mean_daily END) AS mean_weekday,
             |         sum(CASE WHEN wk = 1 THEN mean_daily END) AS mean_weekend,
             |         sum(CASE WHEN wk = 0 THEN v END) AS v0,
             |         sum(CASE WHEN wk = 1 THEN v END) AS v1
             |  FROM m)
             |SELECT CAST(n_weekday AS BIGINT) AS n_weekday,
             |       CAST(n_weekend AS BIGINT) AS n_weekend,
             |       mean_weekday, mean_weekend,
             |       round((mean_weekend - mean_weekday) / mean_weekday, 4) AS lift,
             |       CASE WHEN n_weekday > 1 AND n_weekend > 1
             |                 AND v0 / n_weekday + v1 / n_weekend > 0
             |            THEN round((mean_weekend - mean_weekday)
             |                 / sqrt(v0 / n_weekday + v1 / n_weekend), 4) END
             |         AS welch_z
             |FROM p""".stripMargin))
  )

  val eventsRD: Seq[(String, Q)] = Seq(
    // (dow × hour) calendar heatmap of event traffic: counts and
    // purchase share per cell — the staffing/anomaly dashboard grid
    // (ev_weekend_effect's test decides IF weekends differ; this is
    // the WHERE). One hash aggregate on integer epoch arithmetic,
    // ≤168 output rows at any scale. dow 0 = Sunday.
    "ev_calendar_profile" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(
          pmod(expr("ts DIV 86400000000000") + 4, lit(7)).as("dow"),
          pmod(expr("ts DIV 3600000000000"), lit(24)).as("hour"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
        .select(col("dow"), col("hour"), col("n_events"), col("n_purchases"),
          round(col("n_purchases").cast("double") / col("n_events"), 6)
            .as("purchase_share"))
        .orderBy("dow", "hour"),
      Some("""SELECT (ts // 86400000000000 + 4) % 7 AS dow,
             |       (ts // 3600000000000) % 24 AS hour,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_purchases,
             |       round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
             |             / count(*), 6) AS purchase_share
             |FROM events GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin)),

    // behavioral diversity per activity quartile: per-user event-type
    // Shannon entropy (exact H = ln k − Σ c·ln c / k off the
    // (user, type) count table, the text_entropy identity), averaged
    // inside activity-quartile bands (broadcast exact-percentile
    // cutoffs, the ev_rfm idiom — distribution-relative, so the bands
    // stay informative at any traffic shape) — "do heavy users do
    // MORE KINDS of things or one thing more often", the
    // engagement-quality split a bare event count hides.
    "ev_user_entropy" -> Q(
      (s, d) => {
        val ut = Tables.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        val u = ut.groupBy("user_id")
          .agg(sum("c").as("k"),
            sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
          .select(col("user_id"), col("k"),
            round(log(col("k").cast("double"))
              - col("clnc") / col("k").cast("double"), 6).as("h"))
          .localCheckpoint(eager = false) // cutoff pass + banding pass
        val cuts = u.agg(
          round(expr("percentile(k, 0.25D)"), 6).as("c1"),
          round(expr("percentile(k, 0.5D)"), 6).as("c2"),
          round(expr("percentile(k, 0.75D)"), 6).as("c3"))
        u.crossJoin(broadcast(cuts))
          .withColumn("band",
            when(col("k") <= col("c1"), 1L).when(col("k") <= col("c2"), 2L)
              .when(col("k") <= col("c3"), 3L).otherwise(4L))
          .groupBy("band")
          .agg(count(lit(1)).as("n_users"),
            round(avg("h"), 4).as("avg_entropy"),
            round(avg(col("k").cast("double")), 4).as("avg_events"))
          .orderBy("band")
      },
      Some("""WITH ut AS (
             |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS k,
             |             round(ln(CAST(sum(c) AS DOUBLE))
             |               - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
             |                 / sum(c), 6) AS h
             |      FROM ut GROUP BY user_id),
             |cuts AS (SELECT round(quantile_cont(k, 0.25), 6) AS c1,
             |                round(quantile_cont(k, 0.5), 6) AS c2,
             |                round(quantile_cont(k, 0.75), 6) AS c3
             |         FROM u),
             |b AS (SELECT u.*, CASE WHEN k <= c1 THEN 1 WHEN k <= c2 THEN 2
             |                       WHEN k <= c3 THEN 3 ELSE 4 END AS band
             |      FROM u, cuts)
             |SELECT CAST(band AS BIGINT) AS band,
             |       CAST(count(*) AS BIGINT) AS n_users,
             |       round(avg(h), 4) AS avg_entropy,
             |       round(avg(CAST(k AS DOUBLE)), 4) AS avg_events
             |FROM b GROUP BY band ORDER BY band""".stripMargin)),

    // first-touch attribution: every purchase credited to the
    // campaign of the user's EARLIEST click at or before it — the
    // acquisition-credit mirror of ev_attribution's last-touch
    // (conversion credit); marketers diff the two tables to see
    // where journeys start vs where they close. Same O(1)-per-row
    // running window (first(...ignoreNulls) over the incremental
    // frame), same tiny groupBy.
    "ev_first_touch" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
                  col("value"),
                  get_json_object(col("props"), "$.k").cast("long").as("k"))
          .withColumn("fck",
            first(when(col("event_type") === "click", col("k")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "purchase")
          .select(coalesce(pmod(col("fck"), lit(10)), lit(-1L)).as("campaign"),
                  col("value"))
          .groupBy("campaign")
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("revenue"))
          .orderBy("campaign")
      },
      Some("""WITH a AS (
             |  SELECT event_type, value,
             |         first_value(CASE WHEN event_type = 'click'
             |                    THEN json_extract_string(props, '$.k')::BIGINT END
             |                    IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fck
             |  FROM events)
             |SELECT coalesce(((fck % 10) + 10) % 10, -1) AS campaign,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS revenue
             |FROM a WHERE event_type = 'purchase'
             |GROUP BY campaign ORDER BY campaign""".stripMargin))
  )

  val eventsR: Seq[(String, Q)] = eventsRA ++ eventsRB ++ eventsRC ++ eventsRD
}
