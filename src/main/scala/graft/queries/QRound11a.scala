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
private[graft] object QRound11a {


  val round11Q: Seq[(String, Q)] = Seq(
    // order-invariant dataset fingerprint per source: bit_xor of a
    // per-row content hash + exact counts — the reproducibility
    // manifest entry a training run pins ("same data?" answers in one
    // scan, invariant to partitioning/file order/executor count,
    // unlike any first-N or concatenation scheme). ONE hash aggregate.
    "pipe_dataset_hash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val h = md5Long(concat_ws("#", col("doc_id").cast("string"),
          coalesce(col("lang"), lit("")), coalesce(col("text"), lit(""))))
        Tables.documents(s, d)
          .select(col("source"), h.as("h"), col("n_chars"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               expr("bit_xor(h)").as("fingerprint"),
               sum("n_chars").as("n_chars"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(bit_xor(('0x' || substr(md5(concat_ws('#',
             |         CAST(doc_id AS VARCHAR), coalesce(lang, ''),
             |         coalesce(text, ''))), 1, 15))::BIGINT) AS BIGINT)
             |         AS fingerprint,
             |       CAST(sum(n_chars) AS BIGINT) AS n_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // unbiased Simpson diversity 1 − Σc(c−1)/(n(n−1)) of the token
    // distribution per language — the concentration complement to
    // text_entropy/text_ttr, EXACT in integers (no float sums to
    // order-pin). Two hash aggregates.
    "text_simpson" -> Q(
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("lang"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
        tok.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
          .groupBy("lang")
          .agg(sum("c").as("n"), sum(col("c") * (col("c") - 1)).as("rep"))
          .filter(col("n") > 1)
          .select(col("lang"), col("n").as("n_tok"),
            round(lit(1.0) - col("rep") / (col("n") * (col("n") - 1))
              .cast("double"), 6).as("simpson"))
          .orderBy("lang")
      },
      Some("""WITH tc AS (
             |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT lang,
             |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY lang, tok),
             |ag AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
             |              CAST(sum(c * (c - 1)) AS BIGINT) AS rep
             |       FROM tc GROUP BY lang)
             |SELECT lang, n AS n_tok,
             |       round(1.0 - rep / CAST(n * (n - 1) AS DOUBLE), 6) AS simpson
             |FROM ag WHERE n > 1 ORDER BY lang""".stripMargin)),

    // per-source KL(source ‖ corpus) over 64 hashed unigram buckets
    // with add-one smoothing — "how far is this source's language
    // from the mix" in nats, the divergence twin of samp_importance's
    // LLR weights (same bucket basis). Per-source work is a 64-row
    // broadcast join; the corpus side aggregates once.
    "samp_kl" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val tok = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .withColumn("b", md5Long(col("tok")) % 64)
        // NOT checkpointed: the exploded token table is corpus-sized —
        // recomputing the map-side explode for the corpus and
        // per-source passes is far cheaper at 100 TB than
        // materializing it (the samp_importance precedent)
        val corpus0 = tok.groupBy("b").agg(count(lit(1)).as("cc"))
        // smooth over the OCCUPIED bucket support (nb ≤ 64, and a
        // small-vocab corpus occupies far fewer): add-one over a
        // fixed 64 would leave both distributions sub-normalized on
        // the dense grid and Gibbs' KL ≥ 0 silently breaks
        val corpus = corpus0.crossJoin(broadcast(
          corpus0.agg(sum("cc").as("tc"), count(lit(1)).as("nb"))))
        val bySrc = tok.groupBy("source", "b").agg(count(lit(1)).as("cs"))
        val tot = bySrc.groupBy("source").agg(sum("cs").as("ts"))
        // DENSE source × occupied-bucket grid (≤ |sources|·64 rows):
        // smoothing assigns mass to a source's EMPTY buckets too —
        // dropping those terms also breaks KL ≥ 0
        tot.crossJoin(broadcast(corpus))
          .join(bySrc, Seq("source", "b"), "left").na.fill(0L, Seq("cs"))
          .select(col("source"), col("ts"),
            (((col("cs") + 1.0) / (col("ts") + col("nb"))) *
             (log((col("cs") + 1.0) / (col("ts") + col("nb")))
              - log((col("cc") + 1.0) / (col("tc") + col("nb"))))).as("term"))
          .groupBy("source")
          .agg(max("ts").as("n_tok"), round(sum("term"), 6).as("kl"))
          .orderBy("source")
      },
      Some("""WITH tb AS (
             |  SELECT source,
             |         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
             |  FROM (SELECT source,
             |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)),
             |corpus AS (SELECT b, CAST(count(*) AS BIGINT) AS cc FROM tb GROUP BY b),
             |ctot AS (SELECT CAST(sum(cc) AS BIGINT) AS tc,
             |                CAST(count(*) AS BIGINT) AS nb FROM corpus),
             |bysrc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS cs
             |          FROM tb GROUP BY source, b),
             |stot AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ts
             |         FROM bysrc GROUP BY source),
             |dense AS (SELECT source, ts, b, cc, tc, nb FROM stot, corpus, ctot),
             |j AS (SELECT dense.*, coalesce(cs, 0) AS cs
             |      FROM dense LEFT JOIN bysrc USING (source, b))
             |SELECT source, CAST(max(ts) AS BIGINT) AS n_tok,
             |       round(sum(((cs + 1.0) / (ts + nb)) *
             |         (ln((cs + 1.0) / (ts + nb))
             |          - ln((cc + 1.0) / (tc + nb)))), 6) AS kl
             |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    // deterministic Poisson bootstrap (the distributed bootstrap:
    // Chamandy et al. / the standard Spark resampling trick): each
    // row joins replicate b with weight ~ Poisson(1) drawn by
    // inverse-CDF on a hash of (event_id, b) — no per-replicate
    // shuffle, ×32 map-side fan-out, one hash aggregate to 32
    // replicate means, CI = type-7 percentiles of the bounded
    // 32-row frame. Replicate means rounded to 6 BEFORE the
    // quantile so engines interpolate identical values.
    "stat_bootstrap" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .filter(col("event_type") === "purchase")
        val u = (pmod(md5Long(concat(lit("bs:"),
            col("event_id").cast("string"), lit(":"), col("b").cast("string"))),
            lit(1000000)).cast("double") + 0.5) / 1000000.0
        val w = when(u < 0.367879, 0).when(u < 0.735759, 1)
          .when(u < 0.919699, 2).when(u < 0.981012, 3)
          .when(u < 0.996340, 4).when(u < 0.999406, 5).otherwise(6)
        val reps = ev
          .withColumn("b", explode(sequence(lit(0L), lit(31L))))
          .withColumn("w", w.cast("double"))
          .groupBy("b")
          .agg(sum(col("w") * col("value")).as("sv"), sum("w").as("sw"))
          .filter(col("sw") > 0)
          .select(round(col("sv") / col("sw"), 6).as("mb"))
        val obs = ev.agg(count(lit(1)).as("n_rows"),
          round(avg("value"), 6).as("mean_value"))
        obs.crossJoin(broadcast(reps.agg(
            expr("percentile(mb, array(0.025D, 0.975D))").as("ps"))))
          .select(col("n_rows"), col("mean_value"),
            round(element_at(col("ps"), 1), 4).as("ci_lo"),
            round(element_at(col("ps"), 2), 4).as("ci_hi"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, value FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value)
             |    AND event_type = 'purchase'),
             |reps AS (
             |  SELECT b,
             |    CASE WHEN u < 0.367879 THEN 0 WHEN u < 0.735759 THEN 1
             |         WHEN u < 0.919699 THEN 2 WHEN u < 0.981012 THEN 3
             |         WHEN u < 0.996340 THEN 4 WHEN u < 0.999406 THEN 5
             |         ELSE 6 END AS w, value
             |  FROM (SELECT event_id, value, CAST(b AS BIGINT) AS b,
             |          ((('0x' || substr(md5('bs:' || CAST(event_id AS VARCHAR)
             |            || ':' || CAST(b AS VARCHAR)), 1, 15))::BIGINT % 1000000)
             |           + 0.5) / 1000000.0 AS u
             |        FROM ev, (SELECT unnest(generate_series(0, 31)) AS b))),
             |mb AS (SELECT round(sum(w * value) / sum(w), 6) AS mb
             |       FROM reps GROUP BY b HAVING sum(w) > 0),
             |ci AS (SELECT quantile_cont(mb, 0.025) AS lo,
             |              quantile_cont(mb, 0.975) AS hi FROM mb),
             |obs AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |               round(avg(value), 6) AS mean_value FROM ev)
             |SELECT n_rows, mean_value, round(lo, 4) AS ci_lo,
             |       round(hi, 4) AS ci_hi
             |FROM obs, ci""".stripMargin)),

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
             |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
             |         min({'ts': ts, 'eid': event_id, 'et': event_type}) AS first_ev
             |  FROM s GROUP BY user_id, session_id),
             |fe AS (SELECT (first_ev).et AS entry_type, n_events FROM se)
             |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounced,
             |       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS bounce_rate
             |FROM fe GROUP BY entry_type ORDER BY entry_type""".stripMargin)))

  val round11bQ: Seq[(String, Q)] = Seq(
    // C4-style intra-document dedup audit: per doc, sentence units
    // (normalized) vs distinct units — the "repeated boilerplate
    // inside one page" counter that precedes cross-doc dedup in every
    // web-corpus pipeline. Pure map-side array math, exact integers.
    "text_para_dedup" -> Q(
      (s, d) => {
        val units = transform(split(col("text"), "\\. "),
          x => trim(lower(x)))
        docsUnder(s, d, 200)
          .select(col("doc_id"), size(units).cast("long").as("n_units"),
            (size(units) - size(array_distinct(units))).cast("long")
              .as("n_dup_units"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |       CAST(len(us) AS BIGINT) AS n_units,
             |       CAST(len(us) - len(list_distinct(us)) AS BIGINT) AS n_dup_units
             |FROM (SELECT doc_id,
             |        list_transform(regexp_split_to_array(text, '\. '),
             |          x -> trim(lower(x))) AS us
             |      FROM documents WHERE doc_id < 200)
             |ORDER BY doc_id""".stripMargin)),

    // cross-document boilerplate phrase mining: the token 8-grams
    // shared by the most documents (df ≥ 3) — the REPORT twin of
    // dedup_span_ngrams (which rewrites docs; this surfaces WHAT the
    // boilerplate is, for a cleaning rule). One shingle explode + one
    // hash aggregate; top-15 by document frequency, full-gram
    // tiebreak so the limit cut is engine-deterministic.
    "text_boilerplate" -> Q(
      (s, d) => graft.text.TextPrimitives
        .tokenShingles(Tables.documents(s, d), "doc_id", "text", 8)
        .groupBy("sh")
        .agg(countDistinct("doc_id").as("df"))
        .filter(col("df") >= 3)
        .orderBy(col("df").desc, col("sh"))
        .limit(15)
        .select(substring(col("sh"), 1, 40).as("gram_prefix"), col("df")),
      Some(s"""SELECT substr(sh, 1, 40) AS gram_prefix, df FROM (
              |  SELECT sh, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              |  FROM (
              |${graft.text.TextPrimitives.tokenShinglesSql("documents", "doc_id", "text", 8)})
              |  GROUP BY sh HAVING count(DISTINCT doc_id) >= 3
              |  ORDER BY df DESC, sh LIMIT 15)""".stripMargin)),

    // what dedup buys: token counts before vs after canonical-doc
    // selection on the SHARED cluster-label table (one CC pass,
    // reused by dedup_clusters/keep_best/cluster_sizes — this row is
    // ~free) — the headline number a dedup stage reports upward.
    "pipe_dedup_savings" -> Q(
      (s, d) => {
        import graft.dedup.Dedup
        val labels = Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
        val toks = docsUnder(s, d, 200).select(col("doc_id"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
            .as("nt"))
        labels.join(toks, "doc_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("doc_id") === col("cluster"), 1L).otherwise(0L))
              .as("n_kept"),
            sum("nt").as("tok_raw"),
            sum(when(col("doc_id") === col("cluster"), col("nt"))
              .otherwise(0L)).as("tok_kept"))
          .select(col("n_docs"), col("n_kept"), col("tok_raw"),
            col("tok_kept"),
            round(lit(1.0) - col("tok_kept") / col("tok_raw").cast("double"), 4)
              .as("savings_pct"))
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
              |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
              |tk AS (SELECT doc_id,
              |         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS nt
              |       FROM documents WHERE doc_id < 200)
              |SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(CASE WHEN doc_id = cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |       CAST(sum(nt) AS BIGINT) AS tok_raw,
              |       CAST(sum(CASE WHEN doc_id = cluster THEN nt ELSE 0 END) AS BIGINT) AS tok_kept,
              |       round(1.0 - sum(CASE WHEN doc_id = cluster THEN nt ELSE 0 END)
              |             / CAST(sum(nt) AS DOUBLE), 4) AS savings_pct
              |FROM cc JOIN tk USING (doc_id)""".stripMargin)),

    // generalized-ESD-style anomaly peeling on daily event counts:
    // 3 unrolled rounds of (μ, σ over the REMAINING days → flag the
    // max |x−μ|/σ day → peel it) — the multi-outlier detector that
    // survives masking, which one-shot 3σ (ev_outliers) does not.
    // Every round is an aggregate + broadcast over the
    // calendar-bounded daily frame; μ/σ rounded to 6 so both engines
    // peel the identical trajectory.
    "stat_esd" -> Q(
      (s, d) => {
        var daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false)
        val tops = (1 to 3).map { i =>
          val st = daily.agg(round(avg("c"), 6).as("mu"),
            round(stddev_pop(col("c")), 6).as("sd"))
          val top = daily.crossJoin(broadcast(st))
            .select(col("day"), col("c"),
              when(col("sd") === 0, lit(null).cast("double"))
                .otherwise(round(abs(col("c") - col("mu")) / col("sd"), 4))
                .as("r_stat"))
            .orderBy(col("r_stat").desc_nulls_last, col("day"))
            .limit(1)
            .select(lit(i.toLong).as("peel_round"), col("day"),
              col("c").cast("long").as("n_events"), col("r_stat"))
            .localCheckpoint(eager = false)
          daily = daily.join(top.select("day"), Seq("day"), "left_anti")
            .localCheckpoint(eager = false)
          top
        }
        tops.reduce(_.union(_))
          .withColumn("flagged", col("r_stat") > 3.0)
          .orderBy("peel_round")
      },
      Some {
        def rnd(i: Int, src: String) =
          s"""s$i AS (SELECT round(avg(c), 6) AS mu,
             |           round(stddev_pop(c), 6) AS sd FROM $src),
             |t$i AS (SELECT CAST($i AS BIGINT) AS peel_round, day, c,
             |          CASE WHEN sd = 0 THEN NULL
             |               ELSE round(abs(c - mu) / sd, 4) END AS r_stat
             |        FROM $src, s$i
             |        ORDER BY r_stat DESC NULLS LAST, day LIMIT 1),
             |d$i AS MATERIALIZED (SELECT $src.* FROM $src
             |        WHERE day NOT IN (SELECT day FROM t$i))""".stripMargin
        s"""WITH d0 AS MATERIALIZED (
           |  SELECT ts // 86400000000000 AS day,
           |         CAST(count(*) AS DOUBLE) AS c
           |  FROM events GROUP BY 1),
           |${rnd(1, "d0")},
           |${rnd(2, "d1")},
           |${rnd(3, "d2")}
           |SELECT peel_round, CAST(day AS BIGINT) AS day,
           |       CAST(c AS BIGINT) AS n_events, r_stat,
           |       r_stat > 3.0 AS flagged
           |FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2
           |      UNION ALL SELECT * FROM t3)
           |ORDER BY peel_round""".stripMargin
      }))

  val round11cQ: Seq[(String, Q)] = Seq(
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

    // int4 scalar quantization with nibble packing: 15-level per-dim
    // codes, two codes per byte — 8× scan-I/O cut vs floats (the step
    // past vec_scalar_quant's int8 when recall tolerates it). Params
    // are the SAME one broadcast row; packing is exact integer
    // arithmetic, so the oracle pins code bytes bit-for-bit.
    "vec_int4_quant" -> Q(
      (s, d) => {
        val enc = Tables.embeddings(s, d)
          .crossJoin(broadcast(graft.ann.Quant.params(Tables.embeddings(s, d))))
          .withColumn("c4", transform(col("embedding"), (x, i) => {
            val p = element_at(col("pp"), i + lit(1))
            val mn = p.getField("mn"); val mx = p.getField("mx")
            when(mx === mn, lit(0L))
              .otherwise(round((x.cast("double") - mn) / (mx - mn) * 15.0, 0)
                .cast("long"))
          }))
          .withColumn("packed", transform(
            expr("sequence(0, size(c4) div 2 - 1)"),
            k => element_at(col("c4"), (k * 2 + 1).cast("int")) * 16
              + element_at(col("c4"), (k * 2 + 2).cast("int"))))
        enc.select(col("vec_id"),
            size(col("packed")).cast("long").as("n_bytes"),
            aggregate(col("packed"), lit(0L), (a, c) => a + c).as("byte_sum"),
            array_min(col("packed")).as("byte_min"),
            array_max(col("packed")).as("byte_max"))
          .orderBy("vec_id")
      },
      Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |                     unnest(embedding) AS x
             |              FROM embeddings),
             |p AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
             |      FROM dims GROUP BY i),
             |codes AS (SELECT vec_id, i,
             |                 CASE WHEN mx = mn THEN 0
             |                      ELSE CAST(round((x::DOUBLE - mn) / (mx - mn) * 15.0) AS BIGINT)
             |                 END AS c
             |          FROM dims JOIN p USING (i)),
             |cl AS (SELECT vec_id, list(c ORDER BY i) AS cs FROM codes GROUP BY vec_id),
             |pk AS (SELECT vec_id,
             |              list_transform(generate_series(0, len(cs) // 2 - 1),
             |                k -> cs[2 * k + 1] * 16 + cs[2 * k + 2]) AS packed
             |       FROM cl)
             |SELECT vec_id, CAST(len(packed) AS BIGINT) AS n_bytes,
             |       CAST(list_sum(packed) AS BIGINT) AS byte_sum,
             |       CAST(list_min(packed) AS BIGINT) AS byte_min,
             |       CAST(list_max(packed) AS BIGINT) AS byte_max
             |FROM pk ORDER BY vec_id""".stripMargin)),

    // mergeable running statistics: per-batch (n, mean, centered M2)
    // partials combined by Chan's parallel formula — the discipline
    // every incremental 100 TB statistics pipeline runs on (merge
    // yesterday's partials with today's, never rescan). Both engines
    // compute the SAME partials (means rounded 6, stat_moments
    // two-pass centering) and the same merge arithmetic, so the
    // result is order-pinned.
    "stat_merge_partials" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("batch", pmod(col("event_id"), lit(2)))
          .localCheckpoint(eager = false) // means + centered pass
        val mus = ev.groupBy("batch")
          .agg(round(sum("value") / count(lit(1)), 6).as("mu"))
        val parts = ev.join(broadcast(mus), "batch")
          .groupBy("batch")
          .agg(count(lit(1)).cast("double").as("n"), max("mu").as("mu"),
               sum(pow(col("value") - col("mu"), 2)).as("m2"))
        val w = parts.select(
          sum(when(col("batch") === 0, col("n"))).as("na"),
          sum(when(col("batch") === 0, col("mu"))).as("ma"),
          sum(when(col("batch") === 0, col("m2"))).as("m2a"),
          sum(when(col("batch") === 1, col("n"))).as("nb"),
          sum(when(col("batch") === 1, col("mu"))).as("mb"),
          sum(when(col("batch") === 1, col("m2"))).as("m2b"))
        val nn = col("na") + col("nb")
        val delta = col("mb") - col("ma")
        w.select(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          round(col("ma") + delta * col("nb") / nn, 6).as("mean_merged"),
          round((col("m2a") + col("m2b")
            + delta * delta * col("na") * col("nb") / nn) / nn, 6)
            .as("var_merged"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id % 2 AS batch, value FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value)),
             |mus AS (SELECT batch, round(sum(value) / count(*), 6) AS mu
             |        FROM ev GROUP BY batch),
             |parts AS (SELECT batch, CAST(count(*) AS DOUBLE) AS n,
             |                 max(mu) AS mu,
             |                 sum(pow(value - mu, 2)) AS m2
             |          FROM ev JOIN mus USING (batch) GROUP BY batch),
             |w AS (SELECT
             |        sum(CASE WHEN batch = 0 THEN n END) AS na,
             |        sum(CASE WHEN batch = 0 THEN mu END) AS ma,
             |        sum(CASE WHEN batch = 0 THEN m2 END) AS m2a,
             |        sum(CASE WHEN batch = 1 THEN n END) AS nb,
             |        sum(CASE WHEN batch = 1 THEN mu END) AS mb,
             |        sum(CASE WHEN batch = 1 THEN m2 END) AS m2b
             |      FROM parts)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |       round(ma + (mb - ma) * nb / (na + nb), 6) AS mean_merged,
             |       round((m2a + m2b + (mb - ma) * (mb - ma) * na * nb
             |              / (na + nb)) / (na + nb), 6) AS var_merged
             |FROM w""".stripMargin)),

    // modularity of the CC-COMMUNITY partition on the LSH near-dup
    // graph (the companion to graph_modularity, which scores the
    // SOURCE partition on the jaccard graph): every LSH edge is
    // intra-community by construction, so Q = 1 − Σ_c (d_c/2m)² —
    // how far the dup clustering is from one hairball (Q→0 = one
    // giant component, the signal that the banding is too loose).
    // Degrees from the bounded pair table, labels from the SHARED
    // cluster table (the CC pass stays amortized).
    "graph_cc_modularity" -> Q(
      (s, d) => {
        import graft.dedup.Dedup
        val pairs = Dedup.minhashLshPairs(
          Dedup.minhashSignaturesMapSide(docsUnder(s, d, 200), 5, 8), 8, 2)
          .localCheckpoint(eager = false) // m + degrees
        val labels = Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
        val deg = pairs.select(col("da").as("doc_id"))
          .union(pairs.select(col("db").as("doc_id")))
          .groupBy("doc_id").agg(count(lit(1)).as("deg"))
        val m = pairs.agg(count(lit(1)).cast("double").as("m"))
        deg.join(labels, "doc_id")
          .groupBy("cluster").agg(sum("deg").cast("double").as("dc"))
          .crossJoin(broadcast(m))
          .agg(max(col("m")).cast("long").as("n_edges"),
               count(lit(1)).as("n_communities"),
               round(lit(1.0) - sum(pow(col("dc") / (lit(2.0) * col("m")), 2)), 6)
                 .as("modularity"))
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
              |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
              |deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS deg
              |        FROM (SELECT da AS doc_id FROM pairs
              |              UNION ALL SELECT db FROM pairs)
              |        GROUP BY doc_id),
              |m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM pairs),
              |dc AS (SELECT cluster, CAST(sum(deg) AS DOUBLE) AS dc
              |       FROM deg JOIN cc USING (doc_id) GROUP BY cluster)
              |SELECT CAST(max(m) AS BIGINT) AS n_edges,
              |       CAST(count(*) AS BIGINT) AS n_communities,
              |       round(1.0 - sum(pow(dc / (2.0 * m), 2)), 6) AS modularity
              |FROM dc, m""".stripMargin)))

  val round11dQ: Seq[(String, Q)] = Seq(
    // negative-binomial fit of per-user event counts by method of
    // moments (r = μ²/(σ²−μ), p = μ/σ²) — the "is activity
    // overdispersed Poisson?" model card next to stat_overdispersion's
    // yes/no. Variance via the two-pass centered-sum altitude
    // (broadcast rounded means) so the 4dp report can't flake.
    "stat_nb_fit" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // mean pass + centered pass
        val mus = u.groupBy("event_type")
          .agg(round(sum("c") / count(lit(1)), 6).as("mu"))
        val st = u.join(broadcast(mus), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"), max("mu").as("mu"),
               sum(pow(col("c") - col("mu"), 2)).as("m2"))
          .withColumn("v", col("m2") / col("n_users"))
        st.select(col("event_type"), col("n_users"),
            round(col("mu"), 4).as("mean_c"),
            round(col("v"), 4).as("var_c"),
            when(col("v") > col("mu"),
              round(col("mu") * col("mu") / (col("v") - col("mu")), 4))
              .as("nb_r"),
            when(col("v") > col("mu"), round(col("mu") / col("v"), 4))
              .as("nb_p"))
          .orderBy("event_type")
      },
      Some("""WITH u AS (
             |  SELECT event_type, user_id, CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |mus AS (SELECT event_type, round(sum(c) / count(*), 6) AS mu
             |        FROM u GROUP BY event_type),
             |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
             |              max(mu) AS mu, sum(pow(c - mu, 2)) AS m2
             |       FROM u JOIN mus USING (event_type) GROUP BY event_type)
             |SELECT event_type, n_users,
             |       round(mu, 4) AS mean_c,
             |       round(m2 / n_users, 4) AS var_c,
             |       CASE WHEN m2 / n_users > mu
             |            THEN round(mu * mu / (m2 / n_users - mu), 4) END AS nb_r,
             |       CASE WHEN m2 / n_users > mu
             |            THEN round(mu / (m2 / n_users), 4) END AS nb_p
             |FROM st ORDER BY event_type""".stripMargin)),

    // documents data contract: the quality gate a landing zone runs
    // before promotion — ONE conditional aggregate (plus the Expand
    // distinct for id uniqueness) over the scan, no joins. The
    // events-side twin is pipe_contract_events.
    "pipe_contract_docs" -> Q(
      (s, d) => Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("null_or_empty_text"),
        sum(when(col("n_chars") =!= length(col("text")), 1L)
          .otherwise(0L)).as("bad_n_chars"),
        sum(when(!col("lang").isin("en", "de", "fr", "es", "zh"), 1L)
          .otherwise(0L)).as("unknown_lang"),
        (count(lit(1)) - countDistinct(col("doc_id"))).as("dup_ids"),
        sum(when(col("n_chars") < 0 || col("n_chars") > 1000000, 1L)
          .otherwise(0L)).as("out_of_range_len")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS null_or_empty_text,
             |       CAST(sum(CASE WHEN n_chars <> length(text)
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_n_chars,
             |       CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS unknown_lang,
             |       CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS dup_ids,
             |       CAST(sum(CASE WHEN n_chars < 0 OR n_chars > 1000000
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range_len
             |FROM documents""".stripMargin)),

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
             |ORDER BY source, len_bin""".stripMargin)))

  val round11eQ: Seq[(String, Q)] = Seq(
    // 2×2 factorial experiment: two INDEPENDENT hash assignments per
    // user, conversion per cell, interaction = difference of the A
    // effects across B with a pooled binomial z — the "do features
    // interact?" readout a platform running concurrent experiments
    // needs next to the single-factor ev_ab_test. One per-user
    // rollup → 4 cells of arithmetic.
    "stat_factorial" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("fa",
            md5Long(concat(lit("fa:"), col("user_id").cast("string"))) % 2)
          .withColumn("fb",
            md5Long(concat(lit("fb:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "fa", "fb")
          .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 13, 1.0).otherwise(0.0).as("y"))
        def cell(a: Int, b: Int, c: Column) =
          sum(when(col("fa") === a && col("fb") === b, c).otherwise(0.0))
        val g = u.agg(
          cell(0, 0, lit(1.0)).as("n00"), cell(0, 0, col("y")).as("c00"),
          cell(0, 1, lit(1.0)).as("n01"), cell(0, 1, col("y")).as("c01"),
          cell(1, 0, lit(1.0)).as("n10"), cell(1, 0, col("y")).as("c10"),
          cell(1, 1, lit(1.0)).as("n11"), cell(1, 1, col("y")).as("c11"))
        def p(n: String, c: String) = col(c) / col(n)
        val inter = (p("n11", "c11") - p("n10", "c10")) -
          (p("n01", "c01") - p("n00", "c00"))
        val se = sqrt(
          p("n00", "c00") * (lit(1.0) - p("n00", "c00")) / col("n00") +
          p("n01", "c01") * (lit(1.0) - p("n01", "c01")) / col("n01") +
          p("n10", "c10") * (lit(1.0) - p("n10", "c10")) / col("n10") +
          p("n11", "c11") * (lit(1.0) - p("n11", "c11")) / col("n11"))
        g.select(
          (col("n00") + col("n01") + col("n10") + col("n11")).cast("long")
            .as("n_users"),
          round(p("n00", "c00"), 4).as("rate_00"),
          round(p("n01", "c01"), 4).as("rate_01"),
          round(p("n10", "c10"), 4).as("rate_10"),
          round(p("n11", "c11"), 4).as("rate_11"),
          round(inter, 6).as("interaction"),
          when(se > 0, round(inter / se, 4)).as("z"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('fa:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS fa,
             |         ('0x' || substr(md5('fb:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS fb,
             |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 13
             |              THEN 1.0 ELSE 0.0 END AS y
             |  FROM events GROUP BY 1, 2, 3),
             |g AS (SELECT
             |  sum(CASE WHEN fa = 0 AND fb = 0 THEN 1.0 ELSE 0.0 END) AS n00,
             |  sum(CASE WHEN fa = 0 AND fb = 0 THEN y ELSE 0.0 END) AS c00,
             |  sum(CASE WHEN fa = 0 AND fb = 1 THEN 1.0 ELSE 0.0 END) AS n01,
             |  sum(CASE WHEN fa = 0 AND fb = 1 THEN y ELSE 0.0 END) AS c01,
             |  sum(CASE WHEN fa = 1 AND fb = 0 THEN 1.0 ELSE 0.0 END) AS n10,
             |  sum(CASE WHEN fa = 1 AND fb = 0 THEN y ELSE 0.0 END) AS c10,
             |  sum(CASE WHEN fa = 1 AND fb = 1 THEN 1.0 ELSE 0.0 END) AS n11,
             |  sum(CASE WHEN fa = 1 AND fb = 1 THEN y ELSE 0.0 END) AS c11
             |  FROM u),
             |e AS (SELECT *,
             |        (c11/n11 - c10/n10) - (c01/n01 - c00/n00) AS inter,
             |        sqrt((c00/n00) * (1.0 - c00/n00) / n00
             |           + (c01/n01) * (1.0 - c01/n01) / n01
             |           + (c10/n10) * (1.0 - c10/n10) / n10
             |           + (c11/n11) * (1.0 - c11/n11) / n11) AS se
             |      FROM g)
             |SELECT CAST(n00 + n01 + n10 + n11 AS BIGINT) AS n_users,
             |       round(c00/n00, 4) AS rate_00, round(c01/n01, 4) AS rate_01,
             |       round(c10/n10, 4) AS rate_10, round(c11/n11, 4) AS rate_11,
             |       round(inter, 6) AS interaction,
             |       CASE WHEN se > 0 THEN round(inter / se, 4) END AS z
             |FROM e""".stripMargin)),

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
             |FROM g, base ORDER BY rel""".stripMargin)))

  val round11fQ: Seq[(String, Q)] = Seq(
    // hapax-legomena profile per language: share of vocabulary seen
    // exactly once (+ dis legomena) — the lexical-richness tail that
    // TTR and Heaps' K summarize away, and the practical "is this
    // corpus big enough for its vocabulary" gauge. Two hash
    // aggregates, exact integers.
    "text_hapax" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("dis"))
        .select(col("lang"), col("vocab"), col("hapax"), col("dis"),
          round(col("hapax") / col("vocab").cast("double"), 4)
            .as("hapax_share"))
        .orderBy("lang"),
      Some("""WITH tc AS (
             |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT lang,
             |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY lang, tok)
             |SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
             |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
             |       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
             |       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS hapax_share
             |FROM tc GROUP BY lang ORDER BY lang""".stripMargin)),

    // Chao1 richness estimator per language: D + F1²/(2·F2) (or the
    // bias-corrected F1(F1−1)/2 form when F2 = 0) — how many MORE
    // types the corpus would surface with unbounded sampling; pairs
    // with text_heaps_fit's growth-curve view off the same counts.
    "samp_chao1" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("double").as("dv"),
          sum(when(col("c") === 1, 1.0).otherwise(0.0)).as("f1"),
          sum(when(col("c") === 2, 1.0).otherwise(0.0)).as("f2"))
        .select(col("lang"), col("dv").cast("long").as("vocab"),
          col("f1").cast("long").as("f1"), col("f2").cast("long").as("f2"),
          round(when(col("f2") > 0,
              col("dv") + col("f1") * col("f1") / (lit(2.0) * col("f2")))
            .otherwise(col("dv")
              + col("f1") * (col("f1") - 1) / 2.0), 2).as("chao1"))
        .orderBy("lang"),
      Some("""WITH tc AS (
             |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT lang,
             |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY lang, tok),
             |f AS (SELECT lang, CAST(count(*) AS DOUBLE) AS dv,
             |             sum(CASE WHEN c = 1 THEN 1.0 ELSE 0.0 END) AS f1,
             |             sum(CASE WHEN c = 2 THEN 1.0 ELSE 0.0 END) AS f2
             |      FROM tc GROUP BY lang)
             |SELECT lang, CAST(dv AS BIGINT) AS vocab,
             |       CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
             |       round(CASE WHEN f2 > 0 THEN dv + f1 * f1 / (2.0 * f2)
             |                  ELSE dv + f1 * (f1 - 1) / 2.0 END, 2) AS chao1
             |FROM f ORDER BY lang""".stripMargin)),

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

    // OLS influence diagnostics on the daily trend: leverage
    // h_i = 1/n + (x−x̄)²/Sxx and Cook's D per day (simple-regression
    // closed forms — no matrix inverse), flagging D > 4/n — which
    // days OWN the fitted trend, the honesty check behind
    // ev_intervention_its-style fits. Two passes over the bounded
    // daily frame with broadcast moments, all rounding pinned.
    "stat_influence" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false) // moments + the per-day pass
        val st = daily.agg(count(lit(1)).cast("double").as("n"),
          round(avg("day"), 6).as("xb"), round(avg("y"), 6).as("yb"),
          sum(col("day") * col("day")).as("sxx0"),
          sum(col("day") * col("y")).as("sxy0"),
          sum(col("day").cast("double")).as("sx"), sum("y").as("sy"))
        val wi = daily.crossJoin(broadcast(st))
          // nullif guards: a 1-2-day or constant-day frame has no
          // regression to diagnose (degenerate fixtures) — every
          // downstream column nulls out and the flag filter drops it
          .withColumn("sxx", nullif(
            col("sxx0") - col("sx") * col("sx") / col("n"), lit(0.0)))
          .withColumn("b",
            (col("sxy0") - col("sx") * col("sy") / col("n")) / col("sxx"))
          .withColumn("a", col("yb") - col("b") * col("xb"))
          .withColumn("e", col("y") - (col("a") + col("b") * col("day")))
          .localCheckpoint(eager = false) // mse + the report
        val mse = wi.agg(round(sum(col("e") * col("e"))
          / nullif(max("n") - 2, lit(0.0)), 6).as("mse"))
        wi.crossJoin(broadcast(mse))
          .withColumn("h", lit(1.0) / col("n")
            + (col("day") - col("xb")) * (col("day") - col("xb")) / col("sxx"))
          .withColumn("cook", round(col("e") * col("e") * col("h")
            / nullif(lit(2.0) * col("mse") * (lit(1.0) - col("h"))
               * (lit(1.0) - col("h")), lit(0.0)), 4))
          .filter(col("cook") > lit(4.0) / col("n"))
          .select(col("day"), col("y").cast("long").as("n_events"),
            round(col("h"), 4).as("leverage"), col("cook"))
          .orderBy(col("cook").desc, col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |              round(avg(day), 6) AS xb, round(avg(y), 6) AS yb,
             |              sum(CAST(day AS DOUBLE) * day) AS sxx0,
             |              sum(day * y) AS sxy0,
             |              sum(CAST(day AS DOUBLE)) AS sx, sum(y) AS sy
             |       FROM daily),
             |w AS (SELECT day, y, n, xb,
             |             nullif(sxx0 - sx * sx / n, 0.0) AS sxx,
             |             (sxy0 - sx * sy / n) / nullif(sxx0 - sx * sx / n, 0.0) AS b,
             |             yb - (sxy0 - sx * sy / n)
             |               / nullif(sxx0 - sx * sx / n, 0.0) * xb AS a
             |      FROM daily, st),
             |e AS (SELECT *, y - (a + b * day) AS e FROM w),
             |m AS (SELECT round(sum(e * e) / nullif(max(n) - 2, 0.0), 6) AS mse FROM e),
             |c AS (SELECT day, y, n,
             |             1.0 / n + (day - xb) * (day - xb) / sxx AS h,
             |             e, mse
             |      FROM e, m)
             |SELECT day, CAST(y AS BIGINT) AS n_events,
             |       round(h, 4) AS leverage,
             |       round(e * e * h / nullif(2.0 * mse * (1.0 - h) * (1.0 - h), 0.0), 4) AS cook
             |FROM c
             |WHERE round(e * e * h / nullif(2.0 * mse * (1.0 - h) * (1.0 - h), 0.0), 4)
             |      > 4.0 / n
             |ORDER BY cook DESC, day""".stripMargin)))
}
