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
private[graft] object QRound12b {


  val round12cQ: Seq[(String, Q)] = Seq(
    // recall@10 of int8-quantized candidate generation vs exact search
    // (queries stay full-precision, corpus is the encode→decode
    // round-trip): vec_quant_fidelity reports cosine DISTORTION, this
    // reports what serving actually loses — the acceptance gate is
    // "recall ≥ X", not "fidelity ≥ Y", because rank inversions, not
    // absolute error, are what drop results. Exact 6dp-pinned scores
    // on both paths with vec_id tie-breaks.
    "vec_quant_recall" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
        val deq = graft.ann.Quant.decode(graft.ann.Quant.encode(emb))
          .select(col("vec_id"), col("dequant"))
        val qs = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val wq = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
        val exact = emb.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), score(col("embedding"), col("qv")).as("sc"))
          .withColumn("rk", row_number().over(wq)).filter(col("rk") <= 10)
          .select(col("qid"), col("vec_id"))
        val quant = deq.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), score(col("dequant"), col("qv")).as("sc"))
          .withColumn("rk", row_number().over(wq)).filter(col("rk") <= 10)
          .select(col("qid"), col("vec_id").as("pv"))
        exact.join(quant,
            exact("qid") === quant("qid") && col("vec_id") === col("pv"), "left")
          .groupBy(exact("qid").as("qid"))
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("pv").isNotNull, 1L).otherwise(0L)).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_true").cast("double"), 4))
          .orderBy("qid")
      },
      Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |                     unnest(embedding) AS x
             |              FROM embeddings),
             |p AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
             |      FROM dims GROUP BY i),
             |rec AS (SELECT vec_id,
             |          list(CASE WHEN mx = mn THEN mn
             |               ELSE mn + round((x::DOUBLE - mn) / (mx - mn) * 255.0)
             |                    * (mx - mn) / 255.0 END ORDER BY i) AS r
             |        FROM dims JOIN p USING (i) GROUP BY vec_id),
             |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
             |      FROM embeddings WHERE vec_id < 5),
             |ex AS (
             |  SELECT qid, vec_id FROM (
             |    SELECT q.qid, e.vec_id,
             |           row_number() OVER (PARTITION BY q.qid ORDER BY
             |             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) + 0.0 DESC,
             |             e.vec_id) AS rk
             |    FROM embeddings e, q WHERE e.vec_id <> q.qid)
             |  WHERE rk <= 10),
             |qt AS (
             |  SELECT qid, vec_id FROM (
             |    SELECT q.qid, rec.vec_id,
             |           row_number() OVER (PARTITION BY q.qid ORDER BY
             |             round(list_cosine_similarity(rec.r, q.qv), 6) + 0.0 DESC,
             |             rec.vec_id) AS rk
             |    FROM rec, q WHERE rec.vec_id <> q.qid)
             |  WHERE rk <= 10)
             |SELECT e.qid, CAST(count(*) AS BIGINT) AS n_true,
             |       CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_hit,
             |       round(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS recall
             |FROM ex e LEFT JOIN qt t ON t.qid = e.qid AND t.vec_id = e.vec_id
             |GROUP BY e.qid ORDER BY e.qid""".stripMargin)),

    // payload-filtered search (the reference's Qdrant Filter on
    // payload fields): predicate pushed below scoring so only matching
    // points are scored — PRE-filtering, the semantics qdrant's
    // filtered search has (and the correctness baseline
    // ann_filtered_recall audits the post-filter shortcut against).
    // Here: user 2's collection narrowed to Title prefix 't1'.
    "vs_search_payload" -> Q(
      (s, d) => VectorStore.searchWhere(
        VectorStore.pointsPartitioned(s, d), userId = 2,
        qdf = VectorStore.queryVecOf(s, d, 42), limit = 5,
        predicate = col("title").startsWith("t1")),
      Some(s"""$pointsSql,
              |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42)
              |SELECT vector_id, doc_id, chunk_id, title,
              |       round(list_cosine_similarity(p.embedding::DOUBLE[], q.qv), 6) + 0.0 AS score
              |FROM points p, q
              |WHERE p.user_id = 2 AND title LIKE 't1%'
              |ORDER BY score DESC, vector_id LIMIT 5""".stripMargin)),

    // 1:1 matched-pairs treatment estimate (coarsened exact matching
    // on activity quartiles): within each band, treated and control
    // users pair by deterministic rank, and the per-band ATT is the
    // mean spend difference over pairs — the matching-based causal
    // companion to ev_ipw's weighting (matching shows WHERE support
    // is thin: bands with few pairs). Spend in exact 4dp decimal
    // (moneySum discipline); band cutoffs one tiny percentile
    // aggregate (type-7 parity), broadcast back.
    "samp_matched_pairs" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_ev"),
            sum(round(col("value"), 4).cast("decimal(20,4)")).as("spend"))
          .withColumn("arm",
            md5Long(concat(lit("mp:"), col("user_id").cast("string"))) % 2)
          .localCheckpoint(eager = false) // cutoffs + banding
        val cuts = u.agg(
          round(expr("percentile(n_ev, 0.25D)"), 6).as("c1"),
          round(expr("percentile(n_ev, 0.5D)"), 6).as("c2"),
          round(expr("percentile(n_ev, 0.75D)"), 6).as("c3"))
        // rank within (band, arm) via the bounded two-level scan — a
        // plain per-band row_number would put a quarter of ALL users
        // through one window task at scale; boundedRowNumber's result
        // is identical, so the oracle keeps the plain window form
        val banded = u.crossJoin(broadcast(cuts))
          .withColumn("band",
            when(col("n_ev") <= col("c1"), 0L)
              .when(col("n_ev") <= col("c2"), 1L)
              .when(col("n_ev") <= col("c3"), 2L).otherwise(3L))
        val b = graft.ops.Packing.boundedRowNumber(
          banded, Seq("band", "arm"), "user_id", 1L << 20, "rn")
        val t = b.filter(col("arm") === 1)
          .select(col("band"), col("rn"), col("spend").as("st"))
        val c = b.filter(col("arm") === 0)
          .select(col("band"), col("rn"), col("spend").as("sc"))
        t.join(c, Seq("band", "rn"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_pairs"),
            round(sum(col("st") - col("sc")).cast("double")
              / count(lit(1)), 4).as("att"))
          .orderBy("band")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('mp:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(count(*) AS BIGINT) AS n_ev,
             |         sum(CAST(round(value, 4) AS DECIMAL(20,4))) AS spend
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
             |  GROUP BY 1, 2),
             |cuts AS (SELECT round(quantile_cont(n_ev, 0.25), 6) AS c1,
             |                round(quantile_cont(n_ev, 0.5), 6) AS c2,
             |                round(quantile_cont(n_ev, 0.75), 6) AS c3
             |         FROM u),
             |b AS (SELECT *,
             |        CASE WHEN n_ev <= c1 THEN 0 WHEN n_ev <= c2 THEN 1
             |             WHEN n_ev <= c3 THEN 2 ELSE 3 END AS band
             |      FROM u, cuts),
             |r AS (SELECT *, row_number() OVER (PARTITION BY band, arm
             |               ORDER BY user_id) AS rn
             |      FROM b),
             |p AS (SELECT t.band, t.spend AS st, c.spend AS sc
             |      FROM (SELECT * FROM r WHERE arm = 1) t
             |      JOIN (SELECT * FROM r WHERE arm = 0) c USING (band, rn))
             |SELECT CAST(band AS BIGINT) AS band,
             |       CAST(count(*) AS BIGINT) AS n_pairs,
             |       round(CAST(sum(st - sc) AS DOUBLE) / count(*), 4) AS att
             |FROM p GROUP BY band ORDER BY band""".stripMargin)))

  val round12dQ: Seq[(String, Q)] = Seq(
    // search_query(with_vectors = True) — the reference flag that
    // returns stored vectors with the scored results (re-rank /
    // recommend chaining without a second scroll). The API returns
    // the untouched stored float array (VectorStoreSpec pins it
    // bit-equal to the stored embedding); the ORACLE-compared output
    // projects it as vecQ6 integer micro-codes because the verify
    // harness cannot hash/sort a raw array column (r12's one red row:
    // pandas factorize rejects ndarrays).
    "vs_search_vectors" -> Q(
      (s, d) => VectorStore.searchWithVectors(
          VectorStore.pointsPartitioned(s, d), userId = 2,
          qdf = VectorStore.queryVecOf(s, d, 42), limit = 5)
        .withColumn("vec_q6", graft.functions.VectorFunctions.vecQ6(col("embedding")))
        .drop("embedding"),
      Some(s"""$pointsSql,
              |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42)
              |SELECT vector_id, doc_id, chunk_id, title,
              |       round(list_cosine_similarity(p.embedding::DOUBLE[], q.qv), 6) + 0.0 AS score,
              |       ${VectorStore.vecQ6Sql("p.embedding")} AS vec_q6
              |FROM points p, q WHERE p.user_id = 2
              |ORDER BY score DESC, vector_id LIMIT 5""".stripMargin)),

    // scroll(with_vectors = True) — the reference flag on every
    // scroll_* method (document_ingestor.py:414/:429): page the
    // collection out WITH stored vectors (re-embedding / export).
    // Same vecQ6 oracle convention as vs_search_vectors; the raw
    // array API is spec-pinned in VectorStoreSpec.
    "vs_scroll_vectors" -> Q(
      (s, d) => VectorStore.scrollWithVectors(
          VectorStore.pointsPartitioned(s, d), userId = 3, limit = 12)
        .withColumn("vec_q6", graft.functions.VectorFunctions.vecQ6(col("embedding")))
        .drop("embedding"),
      Some(s"""$pointsSql
              |SELECT vector_id, doc_id, chunk_id, title,
              |       ${VectorStore.vecQ6Sql("embedding")} AS vec_q6
              |FROM points WHERE user_id = 3
              |ORDER BY vector_id LIMIT 12""".stripMargin)),

    // Split-conformal prediction interval for order value: calibrate
    // |y − ŷ| on an md5 half, take the ceil(0.9(n+1))-th order
    // statistic as the radius (EXACT, via the distinct-cents
    // histogram cumsum — values, never rows), and report empirical
    // coverage on the held-out half — the distribution-free ML-serving
    // interval with a finite-sample guarantee, as one pass + tiny
    // grid arithmetic. Everything is integer cents until the final
    // division.
    "stat_conformal" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val o = Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("c"),
            (md5Long(concat(lit("cf:"), col("o_orderkey").cast("string"))) % 2)
              .as("h"))
          .localCheckpoint(eager = false) // calib stats + test coverage
        val yhat = o.filter(col("h") === 0)
          .agg(count(lit(1)).as("n_calib"), sum(col("c").cast(dec)).as("sc"))
          .select(col("n_calib"),
            round(col("sc").cast("double") / col("n_calib"), 0).cast("long")
              .as("yc")) // ŷ in whole cents — keeps residuals integral
        val res = o.filter(col("h") === 0).crossJoin(broadcast(yhat))
          .select(abs(col("c") - col("yc")).as("r"), col("n_calib"), col("yc"))
        val hist = res.groupBy("r", "n_calib", "yc")
          .agg(count(lit(1)).as("cnt"))
        val wc = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
        val qhat = hist
          .withColumn("cum", sum("cnt").over(wc))
          .filter(col("cum") >=
            ceil((col("n_calib") + 1) * 0.9).cast("long"))
          .orderBy("r").limit(1)
          .select(col("n_calib"), col("yc"), col("r").as("qc"))
        o.filter(col("h") === 1).crossJoin(broadcast(qhat))
          .agg(first("n_calib").as("n_calib"), count(lit(1)).as("n_test"),
            round(first("yc") / 100.0, 2).as("yhat"),
            round(first("qc") / 100.0, 2).as("qhat"),
            round(sum(when(abs(col("c") - col("yc")) <= col("qc"), 1L)
              .otherwise(0L)).cast("double") / count(lit(1)), 4).as("coverage"))
      },
      Some("""WITH o AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             |         ('0x' || substr(md5('cf:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 2 AS h
             |  FROM orders),
             |yh AS (SELECT CAST(count(*) AS BIGINT) AS n_calib,
             |              CAST(round(CAST(sum(c) AS DOUBLE) / count(*)) AS BIGINT) AS yc
             |       FROM o WHERE h = 0),
             |hist AS (SELECT abs(c - yc) AS r, n_calib, yc,
             |                CAST(count(*) AS BIGINT) AS cnt
             |         FROM o, yh WHERE h = 0 GROUP BY 1, 2, 3),
             |qh AS (SELECT n_calib, yc, r AS qc FROM (
             |         SELECT *, sum(cnt) OVER (ORDER BY r
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |         FROM hist)
             |       WHERE cum >= CAST(ceil((n_calib + 1) * 0.9) AS BIGINT)
             |       ORDER BY r LIMIT 1)
             |SELECT qh.n_calib, CAST(count(*) AS BIGINT) AS n_test,
             |       round(qh.yc / 100.0, 2) AS yhat,
             |       round(qh.qc / 100.0, 2) AS qhat,
             |       round(CAST(sum(CASE WHEN abs(c - yc) <= qc THEN 1 ELSE 0 END)
             |             AS DOUBLE) / count(*), 4) AS coverage
             |FROM o, qh WHERE h = 1
             |GROUP BY qh.n_calib, qh.yc, qh.qc""".stripMargin)),

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
             |ORDER BY t""".stripMargin)))

  val round12eQ: Seq[(String, Q)] = Seq(
    // Permutation SIGNIFICANCE test for emb_drift's split-half shift:
    // the observed statistic T = Σ_dims (mean_A − mean_B)² is ranked
    // against 8 md5-relabeled null splits — "is the drift bigger than
    // random relabeling produces", the missing p-value behind the
    // drift monitor. ONE pass computes all 18 conditional per-dim
    // means (6dp-pinned); each squared-shift term is pinned to
    // 1e-12 units, so every T is an exact integer sum and the ≥
    // comparisons rank identically on both engines.
    "emb_drift_test" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val P = 8
        val base = Tables.embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
          .withColumn("g0", (col("vec_id") % 2).cast("int"))
        val armed = (0 until P).foldLeft(base) { (df, p) =>
          df.withColumn(s"a$p",
            (md5Long(concat(lit(s"dp$p:"), col("vec_id").cast("string"))) % 2)
              .cast("int"))
        }
        def m(flag: Column, v: Int) =
          round(avg(when(flag === v, col("x").cast("double"))), 6)
        val aggs = Seq(m(col("g0"), 1).as("m1r"), m(col("g0"), 0).as("m0r")) ++
          (0 until P).flatMap(p => Seq(
            m(col(s"a$p"), 1).as(s"m1_$p"), m(col(s"a$p"), 0).as(s"m0_$p")))
        val perDim = armed.groupBy("i").agg(aggs.head, aggs.tail: _*)
        def tUnits(a: Column, b: Column) =
          sum(round((a - b) * (a - b) * 1e12, 0).cast(dec))
        val sums = perDim.agg(
          (Seq(tUnits(col("m1r"), col("m0r")).as("sr")) ++
            (0 until P).map(p =>
              tUnits(col(s"m1_$p"), col(s"m0_$p")).as(s"s$p"))).head,
          (Seq(tUnits(col("m1r"), col("m0r")).as("sr")) ++
            (0 until P).map(p =>
              tUnits(col(s"m1_$p"), col(s"m0_$p")).as(s"s$p"))).tail: _*)
        val nGe = (0 until P).map(p =>
          when(col(s"s$p") >= col("sr"), 1).otherwise(0))
          .reduce(_ + _)
        sums.select(
          round(col("sr").cast("double") / 1e12, 6).as("t_obs"),
          lit(P.toLong).as("n_perms"),
          round((nGe + 1).cast("double") / (P + 1), 4).as("p_value"))
      },
      Some {
        val P = 8
        val armCols = (0 until P).map(p =>
          s"('0x' || substr(md5('dp$p:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS a$p")
          .mkString(",\n             ")
        val meanCols = (Seq(
          "round(avg(CASE WHEN g0 = 1 THEN x END), 6) AS m1r",
          "round(avg(CASE WHEN g0 = 0 THEN x END), 6) AS m0r") ++
          (0 until P).flatMap(p => Seq(
            s"round(avg(CASE WHEN a$p = 1 THEN x END), 6) AS m1_$p",
            s"round(avg(CASE WHEN a$p = 0 THEN x END), 6) AS m0_$p")))
          .mkString(",\n             ")
        val sumCols = (Seq(
          "sum(CAST(round((m1r - m0r) * (m1r - m0r) * 1e12) AS BIGINT)) AS sr") ++
          (0 until P).map(p =>
            s"sum(CAST(round((m1_$p - m0_$p) * (m1_$p - m0_$p) * 1e12) AS BIGINT)) AS s$p"))
          .mkString(",\n             ")
        val ge = (0 until P).map(p =>
          s"(CASE WHEN s$p >= sr THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH u AS (
           |  SELECT vec_id, CAST(vec_id % 2 AS INTEGER) AS g0,
           |             $armCols,
           |         generate_subscripts(embedding, 1) AS i,
           |         CAST(unnest(embedding) AS DOUBLE) AS x
           |  FROM embeddings),
           |pd AS (
           |  SELECT i,
           |             $meanCols
           |  FROM u GROUP BY i),
           |t AS (
           |  SELECT $sumCols
           |  FROM pd)
           |SELECT round(CAST(sr AS DOUBLE) / 1e12, 6) AS t_obs,
           |       CAST($P AS BIGINT) AS n_perms,
           |       round(CAST(($ge + 1) AS DOUBLE) / ${P + 1}, 4) AS p_value
           |FROM t""".stripMargin
      }),

    // Deterministic augmentation plan: resize-to-256 then a
    // reproducible 224² crop offset and flip flag per image, all
    // md5-derived — the data-aug PLUMBING a training pipeline must be
    // able to replay exactly across epochs and re-runs (decode itself
    // stays stubbed per the multimodal scope rule). Pure map over the
    // binary-metadata frame.
    "mm_augment_plan" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d))
          .filter(col("doc_id") < 50)
          .withColumn("scale",
            least(lit(1.0), lit(256.0) / greatest(col("width"), col("height"))))
          .select(col("doc_id"),
            greatest(lit(1L), floor(col("width") * col("scale")).cast("long")).as("w"),
            greatest(lit(1L), floor(col("height") * col("scale")).cast("long")).as("h"))
          .select(col("doc_id"), col("w"), col("h"),
            pmod(md5Long(concat(lit("cx:"), col("doc_id").cast("string"))),
              greatest(lit(1L), col("w") - 223)).as("crop_x"),
            pmod(md5Long(concat(lit("cy:"), col("doc_id").cast("string"))),
              greatest(lit(1L), col("h") - 223)).as("crop_y"),
            (md5Long(concat(lit("fl:"), col("doc_id").cast("string"))) % 2)
              .as("flip"))
          .orderBy("doc_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, hm % 1024 + 1 AS width, (hm // 1024) % 1024 + 1 AS height
             |  FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |        FROM documents WHERE doc_id < 50)),
             |r AS (
             |  SELECT doc_id,
             |         greatest(1, CAST(floor(width * least(1.0, 256.0 / greatest(width, height))) AS BIGINT)) AS w,
             |         greatest(1, CAST(floor(height * least(1.0, 256.0 / greatest(width, height))) AS BIGINT)) AS h
             |  FROM m)
             |SELECT doc_id, w, h,
             |       ('0x' || substr(md5('cx:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |         % greatest(1, w - 223) AS crop_x,
             |       ('0x' || substr(md5('cy:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |         % greatest(1, h - 223) AS crop_y,
             |       ('0x' || substr(md5('fl:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |         % 2 AS flip
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Padding-waste report: what length-sorted batching saves over
    // arrival-order batching at batch size 8 — tokens padded to each
    // batch's max, the number that decides whether pipe_bucket_batches
    // is worth its shuffle. Global ranks come from the distributed
    // range-sort + zipWithIndex (Ranking.withGlobalRank — never a
    // single-partition window); the oracle states the same ranks as
    // plain row_number.
    "pipe_padding_waste" -> Q(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
              .as("nt"))
          .localCheckpoint(eager = false) // ranked twice, two strategies
        def waste(strategy: String, ranked: DataFrame) =
          ranked.withColumn("b", expr("(r - 1) DIV 8"))
            .groupBy("b")
            .agg(count(lit(1)).as("c"), sum("nt").as("st"), max("nt").as("mx"))
            .agg(count(lit(1)).as("n_batches"),
              sum("st").as("tok_total"),
              sum(col("mx") * col("c")).as("tok_padded"))
            .select(lit(strategy).as("strategy"), col("n_batches"),
              col("tok_total"), col("tok_padded"),
              round(lit(1.0) - col("tok_total")
                / col("tok_padded").cast("double"), 4).as("waste_pct"))
        val byArrival = graft.ops.Ranking.withGlobalRank(
          toks, "r", col("doc_id"))
        val byLength = graft.ops.Ranking.withGlobalRank(
          toks, "r", col("nt"), col("doc_id"))
        waste("1_arrival", byArrival).unionAll(waste("2_sorted", byLength))
          .orderBy("strategy")
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id,
              |         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
              |              AS BIGINT) AS nt
              |  FROM documents),
              |ra AS (SELECT nt, row_number() OVER (ORDER BY doc_id) AS r FROM toks),
              |rl AS (SELECT nt, row_number() OVER (ORDER BY nt, doc_id) AS r FROM toks),
              |ba AS (SELECT (r - 1) // 8 AS b, CAST(count(*) AS BIGINT) AS c,
              |              CAST(sum(nt) AS BIGINT) AS st,
              |              CAST(max(nt) AS BIGINT) AS mx
              |       FROM ra GROUP BY 1),
              |bl AS (SELECT (r - 1) // 8 AS b, CAST(count(*) AS BIGINT) AS c,
              |              CAST(sum(nt) AS BIGINT) AS st,
              |              CAST(max(nt) AS BIGINT) AS mx
              |       FROM rl GROUP BY 1),
              |wa AS (SELECT '1_arrival' AS strategy,
              |              CAST(count(*) AS BIGINT) AS n_batches,
              |              CAST(sum(st) AS BIGINT) AS tok_total,
              |              CAST(sum(mx * c) AS BIGINT) AS tok_padded
              |       FROM ba),
              |wl AS (SELECT '2_sorted', CAST(count(*) AS BIGINT),
              |              CAST(sum(st) AS BIGINT), CAST(sum(mx * c) AS BIGINT)
              |       FROM bl),
              |u AS (SELECT * FROM wa UNION ALL SELECT * FROM wl)
              |SELECT strategy, n_batches, tok_total, tok_padded,
              |       round(1.0 - tok_total / CAST(tok_padded AS DOUBLE), 4)
              |         AS waste_pct
              |FROM u ORDER BY strategy""".stripMargin)),

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
             |FROM test""".stripMargin)))

  val round12fQ: Seq[(String, Q)] = Seq(
    // Three rounds of actual BPE training (Sennrich et al. 2016) on
    // the count-weighted vocabulary: adjacent-symbol pair counts →
    // merge the winner → recount — the real tokenizer-learning loop,
    // where text_bpe_pairs only reports round-0 counts. The trainer
    // runs on the TakeOrdered top-2000 word types (the Heaps'-bounded
    // vocab altitude: types, never tokens), driver-side like
    // graph_pagerank; the merge itself is the delimiter-safe
    // double-replace (two leftmost-nonoverlap passes — pass 1 misses
    // every second occurrence of an adjacent run because matches
    // share a delimiter; the survivors are never adjacent, so pass 2
    // is exact), identical string semantics on both engines.
    "text_bpe_merges" -> Q(
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("wc"))
          .orderBy(col("wc").desc, col("w")).limit(2000)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        var seqs = vocab.map { case (w, c) =>
          (" " + w.toCharArray.mkString(" ") + " ", c) }
        val merges = Seq.newBuilder[(Long, String, Long)]
        for (round <- 1 to 3) {
          val counts = scala.collection.mutable.Map.empty[String, Long]
          seqs.foreach { case (sq, c) =>
            val syms = sq.trim.split(" ")
            var i = 0
            while (i < syms.length - 1) {
              val p = syms(i) + " " + syms(i + 1)
              counts.update(p, counts.getOrElse(p, 0L) + c)
              i += 1
            }
          }
          if (counts.nonEmpty) {
            val (best, n) = counts.toSeq.sortBy { case (p, cnt) => (-cnt, p) }.head
            merges += ((round.toLong, best.replace(" ", "+"), n))
            val from = " " + best + " "
            val to = " " + best.replace(" ", "") + " "
            seqs = seqs.map { case (sq, c) =>
              (sq.replace(from, to).replace(from, to), c) }
          }
        }
        import s.implicits._
        merges.result().toDF("round", "merge", "pair_count")
          .orderBy("round")
      },
      Some {
        def roundCte(k: Int) =
          s"""p$k AS (
             |  SELECT arr[i] || ' ' || arr[i + 1] AS p, CAST(sum(wc) AS BIGINT) AS n
             |  FROM (SELECT string_split(trim(sq), ' ') AS arr, wc FROM w${k - 1}),
             |       LATERAL (SELECT unnest(range(1, len(arr))) AS i)
             |  GROUP BY 1),
             |m$k AS (SELECT p, n FROM p$k ORDER BY n DESC, p LIMIT 1),
             |w$k AS (
             |  SELECT replace(replace(sq, ' ' || m$k.p || ' ',
             |             ' ' || replace(m$k.p, ' ', '') || ' '),
             |           ' ' || m$k.p || ' ',
             |           ' ' || replace(m$k.p, ' ', '') || ' ') AS sq, wc
             |  FROM w${k - 1}, m$k)""".stripMargin
        s"""WITH vocab AS (
           |  SELECT t AS w, CAST(count(*) AS BIGINT) AS wc FROM (
           |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
           |    FROM documents)
           |  GROUP BY t ORDER BY wc DESC, w LIMIT 2000),
           |w0 AS (SELECT ' ' || array_to_string(regexp_split_to_array(w, ''), ' ')
           |              || ' ' AS sq, wc
           |       FROM vocab),
           |${roundCte(1)},
           |${roundCte(2)},
           |${roundCte(3)}
           |SELECT CAST(1 AS BIGINT) AS round, replace(p, ' ', '+') AS merge,
           |       n AS pair_count FROM m1
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), replace(p, ' ', '+'), n FROM m2
           |UNION ALL
           |SELECT CAST(3 AS BIGINT), replace(p, ' ', '+'), n FROM m3
           |ORDER BY round""".stripMargin
      }),

    // Distributed-dataloader balance audit: deterministic epoch-1
    // shuffle assigns every doc to one of 16 workers by md5, and the
    // report is each worker's doc/token load plus its deviation from
    // the mean — the straggler check a multi-GPU training job runs
    // before trusting a sharding function. Pure map + one agg; exact
    // integer token sums.
    "pipe_loader_balance" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val w = Tables.documents(s, d)
          .select(
            (md5Long(concat(lit("ep1:"), col("doc_id").cast("string"))) % 16)
              .as("worker"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
              .as("nt"))
          .groupBy("worker")
          .agg(count(lit(1)).as("n_docs"), sum(col("nt").cast(dec)).as("tok"))
          .localCheckpoint(eager = false) // totals + per-worker rows
        val tot = w.agg(sum(col("tok")).as("tt"), count(lit(1)).as("nw"))
        w.crossJoin(broadcast(tot))
          .select(col("worker"), col("n_docs"),
            col("tok").cast("long").as("tokens"),
            round(col("tok").cast("double")
              / (col("tt").cast("double") / col("nw")) - 1.0, 4).as("dev_pct"))
          .orderBy("worker")
      },
      Some("""WITH t AS (
             |  SELECT ('0x' || substr(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS worker,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
             |              AS BIGINT) AS nt
             |  FROM documents),
             |w AS (SELECT worker, CAST(count(*) AS BIGINT) AS n_docs,
             |             sum(nt) AS tok
             |      FROM t GROUP BY worker),
             |tt AS (SELECT sum(tok) AS tt, CAST(count(*) AS BIGINT) AS nw FROM w)
             |SELECT worker, n_docs, CAST(tok AS BIGINT) AS tokens,
             |       round(CAST(tok AS DOUBLE)
             |             / (CAST(tt AS DOUBLE) / nw) - 1.0, 4) AS dev_pct
             |FROM w, tt ORDER BY worker""".stripMargin)),

    // Count-preserving dedup audit: keep one canonical doc per
    // near-dup cluster but WEIGHT it by cluster size (the LM-training
    // alternative to hard dropping), and report how well the weighted
    // token mass reproduces the raw corpus — the relative error is
    // exactly the within-cluster length spread, i.e. what the "weight
    // instead of drop" shortcut silently assumes away. Runs on the
    // shared cluster-label table; exact integer sums.
    "pipe_dedup_weights" -> Q(
      (s, d) => {
        import graft.dedup.Dedup
        val docs = docsUnder(s, d, 200)
        val labels = Dedup.clusterLabelsShared(docs, d, 5, 8, 2)
        val toks = docs.select(col("doc_id"),
          size(graft.text.TextPrimitives.tokens(col("text"))).cast("long")
            .as("nt"))
        val sz = labels.groupBy("cluster").agg(count(lit(1)).as("w"))
        labels.join(toks, "doc_id").join(sz, "cluster")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("doc_id") === col("cluster"), 1L).otherwise(0L))
              .as("n_kept"),
            sum(col("nt")).as("tok_raw"),
            sum(when(col("doc_id") === col("cluster"), col("nt") * col("w"))
              .otherwise(0L)).as("tok_weighted"))
          .withColumn("rel_err",
            round(abs(col("tok_weighted") - col("tok_raw"))
              / col("tok_raw").cast("double"), 4))
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
              |tk AS (SELECT doc_id,
              |         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS nt
              |       FROM documents WHERE doc_id < 200),
              |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS w FROM cc GROUP BY cluster),
              |j AS (SELECT cc.doc_id, cc.cluster, tk.nt, sz.w
              |      FROM cc JOIN tk USING (doc_id) JOIN sz USING (cluster))
              |SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(CASE WHEN doc_id = cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |       CAST(sum(nt) AS BIGINT) AS tok_raw,
              |       CAST(sum(CASE WHEN doc_id = cluster THEN nt * w ELSE 0 END) AS BIGINT) AS tok_weighted,
              |       round(abs(sum(CASE WHEN doc_id = cluster THEN nt * w ELSE 0 END)
              |                 - sum(nt)) / CAST(sum(nt) AS DOUBLE), 4) AS rel_err
              |FROM j""".stripMargin)))
}
