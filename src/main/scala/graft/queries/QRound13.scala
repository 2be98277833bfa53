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
private[graft] object QRound13 {


  // ---------------------------------------------------------------

  val round13Q: Seq[(String, Q)] = Seq(
    // point retrieve by id list (the vector-DB `retrieve` API — the
    // get-by-key read beside scroll/search): partition-pruned scan +
    // id IN-filter, stored vectors along (vecQ6 oracle convention;
    // raw array pinned in VectorStoreSpec). 444 % 8 = 4 keeps every
    // id inside user 4's tenancy.
    "vs_retrieve_ids" -> Q(
      (s, d) => VectorStore.retrieve(
          VectorStore.pointsPartitioned(s, d), 4, Seq(4L, 12L, 20L, 444L))
        .withColumn("vec_q6", graft.functions.VectorFunctions.vecQ6(col("embedding")))
        .drop("embedding"),
      Some(s"""$pointsSql
              |SELECT vector_id, doc_id, chunk_id, title,
              |       ${VectorStore.vecQ6Sql("embedding")} AS vec_q6
              |FROM points WHERE user_id = 4 AND vector_id IN (4, 12, 20, 444)
              |ORDER BY vector_id""".stripMargin)),

    // batched search (the vector-DB `search_batch` API): 3 query
    // vectors against one user's collection in ONE job — one
    // partition-pruned scan, map-side scoring against the broadcast
    // batch, per-query top-k from the bounded TopK aggregate (k
    // rows/partition/query shuffled — never |queries| separate jobs
    // and never a global sort).
    "vs_search_batch" -> Q(
      (s, d) => VectorStore.searchBatch(
        VectorStore.pointsPartitioned(s, d), 2,
        Tables.embeddings(s, d).filter(col("vec_id").isin(5L, 21L, 42L))
          .select(col("vec_id").as("qid"), col("embedding").as("q")), 5),
      Some(s"""$pointsSql,
              |qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
              |       FROM embeddings WHERE vec_id IN (5, 21, 42)),
              |sc AS (SELECT qs.qid, p.vector_id,
              |              ${sqlScore("p.embedding", "qs.qv")} AS score
              |       FROM points p, qs WHERE p.user_id = 2),
              |rk AS (SELECT *, row_number() OVER (
              |         PARTITION BY qid ORDER BY score DESC, vector_id) AS rnk
              |       FROM sc)
              |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vector_id, score
              |FROM rk WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // facet counts over a payload field (the vector-DB `facet` API):
    // distinct titles in the user's collection with point counts —
    // ONE partition-pruned hash aggregate, ties broken by value.
    "vs_facet_counts" -> Q(
      (s, d) => VectorStore.facetCounts(
        VectorStore.pointsPartitioned(s, d), 3, "title", 10),
      Some(s"""$pointsSql
              |SELECT title, CAST(count(*) AS BIGINT) AS n_points
              |FROM points WHERE user_id = 3
              |GROUP BY title ORDER BY n_points DESC, title LIMIT 10""".stripMargin)),

    // radius-search profile (the range-query semantics beside top-k):
    // how many corpus vectors fall inside cosine ≥ τ balls around a
    // query, for a τ sweep — the capacity-planning readout before
    // choosing a score_threshold (reference search exposes one). ONE
    // scan, conditional sums; self excluded.
    "ann_epsilon_ball" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val q = Tables.embeddings(s, d).filter(col("vec_id") === 42)
          .select(col("embedding").as("q"))
        Tables.embeddings(s, d).filter(col("vec_id") =!= 42)
          .crossJoin(broadcast(q))
          .select(score(col("embedding"), col("q")).as("sc"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("sc") >= 0.3, 1L).otherwise(0L)).as("n_03"),
            sum(when(col("sc") >= 0.5, 1L).otherwise(0L)).as("n_05"),
            sum(when(col("sc") >= 0.7, 1L).otherwise(0L)).as("n_07"),
            round(max("sc"), 6).as("max_sc"),
            round(avg("sc"), 6).as("avg_sc"))
      },
      Some(s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42),
              |sc AS (SELECT ${sqlScore("e.embedding", "q.qv")} AS sc
              |       FROM embeddings e, q WHERE e.vec_id <> 42)
              |SELECT CAST(count(*) AS BIGINT) AS n,
              |       CAST(sum(CASE WHEN sc >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_03,
              |       CAST(sum(CASE WHEN sc >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_05,
              |       CAST(sum(CASE WHEN sc >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_07,
              |       round(max(sc), 6) AS max_sc, round(avg(sc), 6) AS avg_sc
              |FROM sc""".stripMargin)),

    // hapax-legomena profile per source: vocabulary size, fraction of
    // once-only types, and once-only token mass — the classic "is
    // this source noisy OCR / boilerplate or natural text" signal
    // (natural corpora run ~40-60% hapax types). Two hash aggregates
    // off the (source, tok) count table.
    "text_hapax_ratio" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        Tables.documents(s, d)
          .select(col("source"), explode(TextPrimitives.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(count(lit(1)).as("vocab"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
            sum("c").as("n_tok"))
          .select(col("source"), col("vocab"), col("hapax"),
            round(col("hapax").cast("double") / col("vocab"), 4).as("hapax_type_ratio"),
            round(col("hapax").cast("double") / col("n_tok"), 4).as("hapax_token_ratio"))
          .orderBy("source")
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT source, unnest(
             |          regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2)
             |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
             |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
             |       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |             / count(*), 4) AS hapax_type_ratio,
             |       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |             / sum(c), 4) AS hapax_token_ratio
             |FROM tc GROUP BY source ORDER BY source""".stripMargin)),

    // Simpson diversity of the vocabulary per source: 1 − Σc(c−1) /
    // N(N−1) — the repeat-collision complement to text_yule_k (K is
    // the same Σc² invariant scaled; Simpson is the probability two
    // sampled tokens DIFFER). Exact integer numerators off the same
    // two hash aggregates.
    "text_simpson_div" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        val dec = "decimal(38,0)"
        Tables.documents(s, d)
          .select(col("source"), explode(TextPrimitives.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(sum(col("c")).as("n_tok"),
            sum((col("c") * (col("c") - 1)).cast(dec)).as("coll"))
          .select(col("source"), col("n_tok"),
            round(lit(1.0) - col("coll").cast("double")
              / (col("n_tok").cast("double") * (col("n_tok") - 1).cast("double")), 6)
              .as("simpson_d"))
          .orderBy("source")
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT source, unnest(
             |          regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2)
             |SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
             |       round(1.0 - CAST(sum(c * (c - 1)) AS DOUBLE)
             |             / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) - 1 AS DOUBLE)), 6)
             |         AS simpson_d
             |FROM tc GROUP BY source ORDER BY source""".stripMargin)),

    // sentence-shape profile per source: sentences/doc and
    // tokens/sentence — the readability-adjacent structure stats a
    // data card reports beside length (fragmentary OCR shows as
    // 1-token "sentences", run-on boilerplate as 100-token ones).
    // Pure map + one hash aggregate.
    "text_sentence_stats" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        Tables.documents(s, d)
          .select(col("source"),
            size(filter(split(col("text"), "[.!?]"),
              x => trim(x) =!= "")).cast("long").as("n_sent"),
            size(TextPrimitives.tokens(col("text"))).cast("long").as("n_tok"))
          .groupBy("source")
          .agg(count(lit(1)).as("docs"), sum("n_sent").as("sents"),
               sum("n_tok").as("toks"))
          .select(col("source"), col("docs"), col("sents"),
            round(col("sents").cast("double") / col("docs"), 4).as("sent_per_doc"),
            when(col("sents") === 0, lit(null).cast("double"))
              .otherwise(round(col("toks").cast("double") / col("sents"), 4))
              .as("tok_per_sent"))
          .orderBy("source")
      },
      Some("""WITH f AS (
             |  SELECT source,
             |         CAST(len(list_filter(regexp_split_to_array(text, '[.!?]'),
             |                              s -> trim(s) <> '')) AS BIGINT) AS n_sent,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS docs,
             |       CAST(sum(n_sent) AS BIGINT) AS sents,
             |       round(CAST(sum(n_sent) AS DOUBLE) / count(*), 4) AS sent_per_doc,
             |       CASE WHEN sum(n_sent) = 0 THEN NULL
             |            ELSE round(CAST(sum(n_tok) AS DOUBLE) / sum(n_sent), 4) END
             |         AS tok_per_sent
             |FROM f GROUP BY source ORDER BY source""".stripMargin)),

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

    // negative-binomial fit of per-user event counts (method of
    // moments: r = m²/(s²−m), p = m/s²) — the overdispersed count
    // model behind user-activity simulation and CUPED-style variance
    // planning (a Poisson fit under-disperses user traffic badly;
    // stat_overdispersion MEASURES the gap, this FITS the model).
    // Exact integer power sums; NULL when s² ≤ m (NB undefined).
    "stat_negbin_fit" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("k"))
          .agg(count(lit(1)).as("n"),
            sum(col("k").cast(dec)).as("s1"),
            sum((col("k") * col("k")).cast(dec)).as("s2"))
          .select(col("n"),
            (col("s1").cast("double") / col("n")).as("m"),
            ((col("n") * col("s2") - col("s1") * col("s1")).cast("double")
              / (col("n").cast("double") * (col("n") - 1).cast("double"))).as("v"))
          .select(col("n").as("n_users"), round(col("m"), 4).as("mean"),
            round(col("v"), 4).as("var"),
            when(col("v") <= col("m"), lit(null).cast("double"))
              .otherwise(round(col("m") * col("m") / (col("v") - col("m")), 4))
              .as("nb_r"),
            when(col("v") <= col("m"), lit(null).cast("double"))
              .otherwise(round(col("m") / col("v"), 6)).as("nb_p"))
      },
      Some("""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k
             |           FROM events GROUP BY user_id),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(k) AS s1,
             |             sum(k * k) AS s2 FROM u),
             |t AS (SELECT n, CAST(s1 AS DOUBLE) / n AS m,
             |             CAST(n * s2 - s1 * s1 AS DOUBLE)
             |               / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS v
             |      FROM g)
             |SELECT n AS n_users, round(m, 4) AS mean, round(v, 4) AS var,
             |       CASE WHEN v <= m THEN NULL
             |            ELSE round(m * m / (v - m), 4) END AS nb_r,
             |       CASE WHEN v <= m THEN NULL ELSE round(m / v, 6) END AS nb_p
             |FROM t""".stripMargin)),

    // Cook's-distance influence audit of the corpus length model
    // (n_tok ~ n_chars OLS): the 10 documents whose removal moves the
    // fit most — closed-form D_i = e_i²·h_i / (2·s²·(1−h_i)²) off ONE
    // exact-integer moment row broadcast back, map-side per-row
    // algebra, bounded TakeOrdered. The "which rows should a human
    // eyeball" companion to stat_ols_fit.
    "stat_cooks_top" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        val dec = "decimal(38,0)"
        val f = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").as("x"),
            size(TextPrimitives.tokens(col("text"))).cast("long").as("y"))
          .localCheckpoint(eager = false) // moments + per-row pass
        val mo = f.agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
            sum((col("x") * col("x")).cast(dec)).as("sxx"),
            sum((col("x") * col("y")).cast(dec)).as("sxy"),
            sum((col("y") * col("y")).cast(dec)).as("syy"))
          .select(col("n").cast("double").as("n"),
            col("sx").cast("double").as("sx"), col("sy").cast("double").as("sy"),
            col("sxx").cast("double").as("sxx"), col("sxy").cast("double").as("sxy"),
            col("syy").cast("double").as("syy"))
          .select(col("n"), col("sx"), col("sy"), col("sxx"),
            ((col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx"))).as("b"),
            (col("sxx") - col("sx") * col("sx") / col("n")).as("sxx_c"),
            col("sxy"), col("syy"))
          .select(col("n"), col("sx"), col("b"), col("sxx_c"),
            ((col("sy") - col("b") * col("sx")) / col("n")).as("a"),
            (((col("syy") - col("sy") * col("sy") / col("n"))
              - col("b") * (col("sxy") - col("sx") * col("sy") / col("n")))
              / (col("n") - 2)).as("s2"))
        f.crossJoin(broadcast(mo))
          .select(col("doc_id"), col("x"), col("y"),
            (col("y") - col("a") - col("b") * col("x")).as("e"),
            (lit(1.0) / col("n")
              + (col("x") - col("sx") / col("n")) * (col("x") - col("sx") / col("n"))
                / col("sxx_c")).as("h"),
            col("s2"))
          .select(col("doc_id"), col("x"), col("y"),
            round(col("e"), 4).as("resid"),
            round(col("e") * col("e") * col("h")
              / (lit(2.0) * col("s2") * (lit(1.0) - col("h")) * (lit(1.0) - col("h"))), 6)
              .as("cooks_d"))
          .orderBy(col("cooks_d").desc, col("doc_id")).limit(10)
      },
      Some("""WITH f AS (
             |  SELECT doc_id, n_chars AS x,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS y
             |  FROM documents),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS ni, sum(x) AS sxi, sum(y) AS syi,
             |             sum(x * x) AS sxxi, sum(x * y) AS sxyi, sum(y * y) AS syyi
             |      FROM f),
             |mo AS (SELECT CAST(ni AS DOUBLE) AS n, CAST(sxi AS DOUBLE) AS sx,
             |              CAST(syi AS DOUBLE) AS sy, CAST(sxxi AS DOUBLE) AS sxx,
             |              CAST(sxyi AS DOUBLE) AS sxy, CAST(syyi AS DOUBLE) AS syy
             |       FROM g),
             |mo2 AS (SELECT n, sx, sy, sxx, sxy, syy,
             |               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             |               sxx - sx * sx / n AS sxx_c
             |        FROM mo),
             |mo3 AS (SELECT n, sx, b, sxx_c,
             |               (sy - b * sx) / n AS a,
             |               ((syy - sy * sy / n) - b * (sxy - sx * sy / n)) / (n - 2) AS s2
             |        FROM mo2),
             |p AS (SELECT doc_id, x, y,
             |             y - a - b * x AS e,
             |             1.0 / n + (x - sx / n) * (x - sx / n) / sxx_c AS h,
             |             s2
             |      FROM f, mo3)
             |SELECT doc_id, x, y, round(e, 4) AS resid,
             |       round(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6) AS cooks_d
             |FROM p ORDER BY cooks_d DESC, doc_id LIMIT 10""".stripMargin)),

    // exact point count with a payload filter (the vector-DB `count`
    // API): matching points per collection for a title predicate —
    // one pruned scan with the predicate pushed below any other work,
    // |users| output rows.
    "vs_count_filtered" -> Q(
      (s, d) => VectorStore.pointsPartitioned(s, d)
        .filter(col("title").startsWith("t1"))
        .groupBy("user_id").agg(count(lit(1)).as("n_points"))
        .orderBy("user_id"),
      Some(s"""$pointsSql
              |SELECT user_id, CAST(count(*) AS BIGINT) AS n_points
              |FROM points WHERE title LIKE 't1%'
              |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // code-switching profile per source: rank each doc's 4 lexicon
    // hit counts (the text_langid lexica), mix = second/(first+second)
    // — flags documents blending two languages, which single-label
    // language-ID silently mislabels and which split training corpora
    // by lang WRONGLY. Sorted-array ranking is tie-robust; pure map +
    // one hash aggregate.
    "text_code_switch" -> Q(
      (s, d) => {
        import graft.text.{TextAnalytics, TextPrimitives}
        val toks = TextPrimitives.tokens(col("text"))
        val hitArr = array_sort(array(TextAnalytics.Lexica.map { case (_, w) =>
          size(filter(toks, t => t.isin(w: _*))).cast("long") }: _*))
        val f = Tables.documents(s, d)
          .select(col("source"),
            element_at(hitArr, -1).as("s1"), element_at(hitArr, -2).as("s2"))
          .withColumn("mix",
            when(col("s1") + col("s2") === 0, lit(null).cast("double"))
              .otherwise(col("s2").cast("double") / (col("s1") + col("s2"))))
        f.groupBy("source")
          .agg(count(lit(1)).as("docs"),
            sum(when(col("mix") >= 0.3 && col("s2") >= 2, 1L).otherwise(0L))
              .as("n_mixed"),
            round(avg("mix"), 4).as("avg_mix"))
          .orderBy("source")
      },
      Some {
        import graft.text.TextAnalytics
        val cnts = TextAnalytics.Lexica.map { case (_, w) =>
          s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
            s"t -> t IN (${w.map(x => s"'$x'").mkString(",")})))"
        }
        s"""WITH h AS (
           |  SELECT source,
           |         list_sort([${cnts.mkString(", ")}]) AS hits
           |  FROM documents),
           |f AS (SELECT source,
           |             CAST(hits[4] AS BIGINT) AS s1, CAST(hits[3] AS BIGINT) AS s2,
           |             CASE WHEN hits[4] + hits[3] = 0 THEN NULL
           |                  ELSE CAST(hits[3] AS DOUBLE) / (hits[4] + hits[3]) END AS mix
           |      FROM h)
           |SELECT source, CAST(count(*) AS BIGINT) AS docs,
           |       CAST(sum(CASE WHEN mix >= 0.3 AND s2 >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_mixed,
           |       round(avg(mix), 4) AS avg_mix
           |FROM f GROUP BY source ORDER BY source""".stripMargin
      }),

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

    // new-vs-returning revenue decomposition per month: each order
    // credited to 'new' iff its month is the customer's first — the
    // growth-accounting split for ORDERS (ev_growth_accounting covers
    // events). Per-customer first month is one hash aggregate joined
    // back on the scaling key; exact DECIMAL money sums.
    "q_new_vs_returning" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val o = Tables.orders(s, d).select(col("o_custkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"),
            // integer cents: money sums must be order-invariant
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .localCheckpoint(eager = false) // first-month pass + credit pass
        val first = o.groupBy("o_custkey").agg(min("m").as("m0"))
        o.join(first, "o_custkey")
          .groupBy("m")
          .agg(
            sum(when(col("m") === col("m0"), col("cents"))
              .otherwise(0L).cast(dec)).as("nc"),
            sum(when(col("m") =!= col("m0"), col("cents"))
              .otherwise(0L).cast(dec)).as("rc"),
            countDistinct(when(col("m") === col("m0"), col("o_custkey")))
              .as("new_cust"),
            countDistinct(when(col("m") =!= col("m0"), col("o_custkey")))
              .as("ret_cust"))
          .select(col("m"),
            round(col("nc").cast("double") / 100, 2).as("new_rev"),
            round(col("rc").cast("double") / 100, 2).as("ret_rev"),
            col("new_cust"), col("ret_cust"),
            round(col("nc").cast("double")
              / (col("nc") + col("rc")).cast("double"), 4).as("new_share"))
          .orderBy("m")
      },
      Some("""WITH o AS (SELECT o_custkey,
             |                  year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |           FROM orders),
             |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey)
             |SELECT m,
             |       round(CAST(sum(CASE WHEN m = m0 THEN cents ELSE 0 END) AS DOUBLE) / 100, 2) AS new_rev,
             |       round(CAST(sum(CASE WHEN m <> m0 THEN cents ELSE 0 END) AS DOUBLE) / 100, 2) AS ret_rev,
             |       CAST(count(DISTINCT CASE WHEN m = m0 THEN o_custkey END) AS BIGINT) AS new_cust,
             |       CAST(count(DISTINCT CASE WHEN m <> m0 THEN o_custkey END) AS BIGINT) AS ret_cust,
             |       round(CAST(sum(CASE WHEN m = m0 THEN cents ELSE 0 END) AS DOUBLE)
             |             / CAST(sum(cents) AS DOUBLE), 4) AS new_share
             |FROM o JOIN f USING (o_custkey)
             |GROUP BY m ORDER BY m""".stripMargin)),

    // LSH index-maintenance cost estimator: an upsert batch arrives —
    // how many bucket PARTITIONS of the write-time-partitioned index
    // get rewritten, and what is the write amplification
    // (rows_rewritten / batch rows under dynamic partition overwrite)?
    // The capacity answer that decides micro-batch sizing vs
    // compaction cadence for a served ANN index. Buckets are the
    // map-side bucketCol projection; every aggregate here is ≤2^6
    // rows.
    "ann_upsert_buckets" -> Q(
      (s, d) => {
        val all = graft.ann.Ann.withBucket(Tables.embeddings(s, d), 6, 64)
          .select(col("vec_id"), col("bucket"))
          .localCheckpoint(eager = false) // batch + per-bucket counts
        val batch = all.filter(col("vec_id") % 40 === 0)
        val touched = batch.select("bucket").distinct()
        val bc = all.groupBy("bucket").agg(count(lit(1)).as("cb"))
        val tot = bc.agg(count(lit(1)).as("n_buckets_total"))
        val t = bc.join(broadcast(touched), "bucket")
          .agg(count(lit(1)).as("n_buckets_touched"),
               sum("cb").as("rows_rewritten"))
        batch.agg(count(lit(1)).as("n_batch"))
          .crossJoin(broadcast(t)).crossJoin(broadcast(tot))
          .select(col("n_batch"), col("n_buckets_touched"),
            col("n_buckets_total"), col("rows_rewritten"),
            round(col("n_buckets_touched").cast("double")
              / col("n_buckets_total"), 4).as("touched_frac"),
            round(col("rows_rewritten").cast("double") / col("n_batch"), 4)
              .as("write_amp"))
      },
      Some("""WITH planes AS (
             |  SELECT p, list_transform(generate_series(0, 63), dd ->
             |    (('0x' || substr(md5(concat_ws('_', 'pl', p, dd)), 1, 15))::BIGINT % 2001 - 1000) / 1000.0) AS w
             |  FROM generate_series(0, 5) t(p)),
             |b AS (
             |  SELECT vec_id,
             |         CAST(sum(CASE WHEN list_inner_product(embedding::DOUBLE[], w) > 0
             |                       THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM embeddings, planes GROUP BY vec_id),
             |batch AS (SELECT * FROM b WHERE vec_id % 40 = 0),
             |touched AS (SELECT DISTINCT bucket FROM batch),
             |bc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY bucket),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets_total FROM bc),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets_touched,
             |             CAST(sum(cb) AS BIGINT) AS rows_rewritten
             |      FROM bc JOIN touched USING (bucket)),
             |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_batch FROM batch)
             |SELECT n_batch, n_buckets_touched, n_buckets_total, rows_rewritten,
             |       round(CAST(n_buckets_touched AS DOUBLE) / n_buckets_total, 4) AS touched_frac,
             |       round(CAST(rows_rewritten AS DOUBLE) / n_batch, 4) AS write_amp
             |FROM nb, t, tot""".stripMargin)),

    // order-to-ship lag SLA per month: mean and EXACT p95 of
    // (l_shipdate − o_orderdate) days — the fulfillment dashboard's
    // core line. The p95 is an order statistic walked over the
    // (month, lag) HISTOGRAM (lag is day-bounded — values, never
    // rows, the stat_mwu discipline), so the window input stays
    // ≤|lag domain| rows per month at any fact scale.
    "q_ship_lag" -> Q(
      (s, d) => {
        val j = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select(
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag"))
        val h = j.groupBy("m", "lag").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false) // totals + cumsum walk
        val t = h.groupBy("m")
          .agg(sum("cnt").as("n"), sum(col("lag") * col("cnt")).as("sl"))
        val wc = Window.partitionBy("m").orderBy("lag")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        h.withColumn("cum", sum("cnt").over(wc))
          .join(broadcast(t), "m")
          .filter(col("cum") >= ceil(col("n") * 0.95).cast("long"))
          .groupBy("m")
          .agg(max("n").as("n"),
            round(max(col("sl").cast("double") / col("n")), 4).as("avg_lag_days"),
            min("lag").as("p95_lag_days"))
          .orderBy("m")
      },
      Some("""WITH j AS (
             |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |         date_diff('day', CAST(o_orderdate AS DATE),
             |                   CAST(l_shipdate AS DATE)) AS lag
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |h AS (SELECT m, lag, CAST(count(*) AS BIGINT) AS cnt
             |      FROM j GROUP BY 1, 2),
             |t AS (SELECT m, CAST(sum(cnt) AS BIGINT) AS n,
             |             CAST(sum(lag * cnt) AS BIGINT) AS sl
             |      FROM h GROUP BY m),
             |c AS (SELECT h.*, sum(cnt) OVER (PARTITION BY m ORDER BY lag
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM h)
             |SELECT m, max(n) AS n,
             |       round(max(CAST(sl AS DOUBLE) / n), 4) AS avg_lag_days,
             |       CAST(min(lag) AS BIGINT) AS p95_lag_days
             |FROM c JOIN t USING (m)
             |WHERE cum >= ceil(n * 0.95)
             |GROUP BY m ORDER BY m""".stripMargin)),

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
             |GROUP BY campaign ORDER BY campaign""".stripMargin)),

    // basket-size distribution: lines-per-order histogram with order
    // share — the ops-planning shape behind picking batch sizes and
    // the q_basket_pairs quadratic bound (pair work grows with the
    // square of THIS tail). Two hash aggregates; output bounded by
    // max basket size.
    "q_basket_size_dist" -> Q(
      (s, d) => {
        val sizes = Tables.lineitem(s, d)
          .groupBy("l_orderkey").agg(count(lit(1)).as("k"))
          .groupBy("k").agg(count(lit(1)).as("n_orders"))
          .localCheckpoint(eager = false) // share denominator + rows
        val tot = sizes.agg(sum("n_orders").as("t"))
        sizes.crossJoin(broadcast(tot))
          .select(col("k").as("lines_per_order"), col("n_orders"),
            round(col("n_orders").cast("double") / col("t"), 6).as("share"))
          .orderBy("lines_per_order")
      },
      Some("""WITH s AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
             |           FROM lineitem GROUP BY l_orderkey),
             |h AS (SELECT k, CAST(count(*) AS BIGINT) AS n_orders FROM s GROUP BY k),
             |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS t FROM h)
             |SELECT k AS lines_per_order, n_orders,
             |       round(CAST(n_orders AS DOUBLE) / t, 6) AS share
             |FROM h, t ORDER BY lines_per_order""".stripMargin)),

    // embedding-norm audit per label: min/avg/max L2 norm and the
    // count outside ‖v‖ ∈ [0.99, 1.01] — cosine search silently
    // tolerates un-normalized vectors but dot-product serving paths
    // and PQ codebooks do NOT; this is the ingest gate that catches a
    // mis-configured embedder before an index build bakes it in. One
    // map-side norm + one hash aggregate.
    "vec_norm_audit" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.l2Norm
        Tables.embeddings(s, d)
          .select(col("label"), l2Norm(col("embedding")).as("nrm"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            round(min("nrm"), 6).as("min_norm"),
            round(avg("nrm"), 6).as("avg_norm"),
            round(max("nrm"), 6).as("max_norm"),
            sum(when(abs(col("nrm") - 1.0) > 0.01, 1L).otherwise(0L))
              .as("n_unnormalized"))
          .orderBy("label")
      },
      Some("""SELECT label, CAST(count(*) AS BIGINT) AS n,
             |       round(min(nrm), 6) AS min_norm,
             |       round(avg(nrm), 6) AS avg_norm,
             |       round(max(nrm), 6) AS max_norm,
             |       CAST(sum(CASE WHEN abs(nrm - 1.0) > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_unnormalized
             |FROM (SELECT label,
             |        sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
             |      FROM embeddings)
             |GROUP BY label ORDER BY label""".stripMargin)),

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
             |FROM daily, o GROUP BY moy, om ORDER BY moy""".stripMargin)),

    // join-key skew profiler: frequency-distribution stats of the
    // fact table's join keys (max/median/p99 key multiplicity, top-1
    // key share) — the numbers that decide salting vs AQE skew-join
    // BEFORE a 100-TB shuffle hits one reducer. The percentile walks
    // the key-frequency table (|distinct keys| rows, never facts);
    // one pass per audited key.
    "q_skew_profile" -> Q(
      (s, d) => {
        def profile(keyCol: String): org.apache.spark.sql.DataFrame = {
          val freq = Tables.lineitem(s, d)
            .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
          freq.agg(count(lit(1)).as("n_keys"),
              sum("c").as("n_rows"), max("c").as("max_cnt"),
              round(expr("percentile(c, 0.5D)"), 4).as("p50_cnt"),
              round(expr("percentile(c, 0.99D)"), 4).as("p99_cnt"))
            .select(lit(keyCol).as("join_key"), col("n_keys"), col("n_rows"),
              col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
              round(col("max_cnt").cast("double") / col("n_rows"), 6)
                .as("top1_share"),
              round(col("max_cnt") / col("p50_cnt"), 4).as("skew_ratio"))
        }
        profile("l_orderkey").union(profile("l_partkey"))
          .union(profile("l_suppkey")).orderBy("join_key")
      },
      Some {
        def p(k: String) =
          s"""SELECT '$k' AS join_key, CAST(count(*) AS BIGINT) AS n_keys,
             |       CAST(sum(c) AS BIGINT) AS n_rows,
             |       CAST(max(c) AS BIGINT) AS max_cnt,
             |       round(quantile_cont(c, 0.5), 4) AS p50_cnt,
             |       round(quantile_cont(c, 0.99), 4) AS p99_cnt,
             |       round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top1_share,
             |       round(max(c) / round(quantile_cont(c, 0.5), 4), 4) AS skew_ratio
             |FROM (SELECT $k, CAST(count(*) AS BIGINT) AS c
             |      FROM lineitem GROUP BY $k)""".stripMargin
        Seq("l_orderkey", "l_partkey", "l_suppkey").map(p)
          .mkString("", "\nUNION ALL\n", "\nORDER BY join_key")
      }),

    // dedup-method overlap audit on the bounded subset: every doc
    // classified by (exact-dup?, near-dup?) — the 2×2 that says
    // whether MinHash-style near-dup is actually catching anything
    // beyond byte-identical copies (if only_near ≈ 0, the cheap exact
    // pass suffices for this corpus). Reuses the shared edge build.
    "pipe_dedup_overlap" -> Q(
      (s, d) => {
        val docs = docsUnder(s, d, 120)
        val exactDup = docs.groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("c"), collect_list("doc_id").as("ids"))
          .filter(col("c") > 1)
          .select(explode(col("ids")).as("doc_id"), lit(1L).as("is_exact"))
        val e0 = graft.dedup.Dedup.ngramJaccard(docs, 5, 0.25)
          .select(col("da"), col("db"))
        val nearDup = e0.select(explode(array(col("da"), col("db"))).as("doc_id"))
          .distinct().withColumn("is_near", lit(1L))
        docs.select("doc_id")
          .join(exactDup, Seq("doc_id"), "left")
          .join(nearDup, Seq("doc_id"), "left")
          .groupBy(coalesce(col("is_exact"), lit(0L)).as("is_exact"),
                   coalesce(col("is_near"), lit(0L)).as("is_near"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("is_exact", "is_near")
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |ex AS (SELECT doc_id, 1 AS is_exact FROM documents
              |       WHERE doc_id < 120 AND md5(text) IN (
              |         SELECT md5(text) FROM documents WHERE doc_id < 120
              |         GROUP BY 1 HAVING count(*) > 1)),
              |nr AS (SELECT DISTINCT v AS doc_id, 1 AS is_near FROM (
              |         SELECT da AS v FROM e0 UNION ALL SELECT db AS v FROM e0)),
              |cls AS (SELECT d.doc_id,
              |               coalesce(ex.is_exact, 0) AS is_exact,
              |               coalesce(nr.is_near, 0) AS is_near
              |        FROM (SELECT doc_id FROM documents WHERE doc_id < 120) d
              |        LEFT JOIN ex USING (doc_id) LEFT JOIN nr USING (doc_id))
              |SELECT CAST(is_exact AS BIGINT) AS is_exact,
              |       CAST(is_near AS BIGINT) AS is_near,
              |       CAST(count(*) AS BIGINT) AS n_docs
              |FROM cls GROUP BY 1, 2 ORDER BY is_exact, is_near""".stripMargin)))
}
