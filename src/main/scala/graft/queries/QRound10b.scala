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
private[graft] object QRound10b {


  // ---------------------------------------------------------------
  // Round-10 third wave: normality / effect-size / paired tests for
  // the experimentation family, the classic lexical repeat-rate
  // statistic, and ranked-retrieval MAP/MRR evaluation
  // ---------------------------------------------------------------

  val round10cQ: Seq[(String, Q)] = Seq(
    // Jarque–Bera normality test per event_type: JB = n/6·(S² + K²/4)
    // from the SAME two-pass centered power sums as stat_moments
    // (broadcast per-type mean rounded to 6, so both engines center
    // identically), p = exp(−JB/2) — the χ²₂ survival function in
    // closed form, no special functions needed. S and K are rounded
    // to 6 BEFORE entering JB so the engines feed the statistic the
    // identical argument. Zero-variance / tiny groups NULL out.
    "stat_jarque_bera" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
        val mus = ev.groupBy("event_type")
          .agg(round(sum("value") / count(lit(1)), 6).as("mu"))
        val vr = col("m2s") / col("n")
        val sk = round((col("m3s") / col("n")) / pow(vr, 1.5), 6)
        val ku = round((col("m4s") / col("n")) / pow(vr, 2) - lit(3), 6)
        ev.join(broadcast(mus), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"),
               sum(pow(col("value") - col("mu"), 2)).as("m2s"),
               sum(pow(col("value") - col("mu"), 3)).as("m3s"),
               sum(pow(col("value") - col("mu"), 4)).as("m4s"))
          .withColumn("jb",
            when(vr <= 0 || col("n") < 4, lit(null).cast("double"))
              .otherwise(round(col("n") / 6 * (sk * sk + ku * ku / 4), 4)))
          .select(col("event_type"), col("n").cast("long").as("n_rows"),
                  when(vr <= 0, lit(null).cast("double")).otherwise(sk).as("skew"),
                  when(vr <= 0, lit(null).cast("double")).otherwise(ku).as("kurt"),
                  col("jb"),
                  when(col("jb").isNull, lit(null).cast("double"))
                    .otherwise(round(exp(-col("jb") / 2), 6)).as("p_normal"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, value FROM events
             |            WHERE value IS NOT NULL AND NOT isnan(value)),
             |mus AS (SELECT event_type, round(sum(value) / count(*), 6) AS mu
             |        FROM ev GROUP BY 1),
             |cm AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             |              sum(pow(value - mu, 2)) AS m2s,
             |              sum(pow(value - mu, 3)) AS m3s,
             |              sum(pow(value - mu, 4)) AS m4s
             |       FROM ev JOIN mus USING (event_type) GROUP BY 1),
             |sk AS (SELECT event_type, n, m2s / n AS vr,
             |              round((m3s / n) / pow(m2s / n, 1.5), 6) AS s,
             |              round((m4s / n) / pow(m2s / n, 2) - 3, 6) AS k
             |       FROM cm WHERE m2s / n > 0),
             |jbt AS (SELECT event_type, n, vr, s, k,
             |               CASE WHEN n < 4 THEN NULL
             |                    ELSE round(n / 6 * (s * s + k * k / 4), 4) END AS jb
             |        FROM sk),
             |z AS (SELECT cm.event_type, cm.n, jbt.s, jbt.k, jbt.jb
             |      FROM cm LEFT JOIN jbt USING (event_type))
             |SELECT event_type, CAST(n AS BIGINT) AS n_rows, s AS skew, k AS kurt,
             |       jb, CASE WHEN jb IS NULL THEN NULL
             |                ELSE round(exp(-jb / 2), 6) END AS p_normal
             |FROM z ORDER BY event_type""".stripMargin)),

    // Cohen's d + Hedges' g effect size of the en-vs-de doc-length
    // difference — the "how big in SD units" companion to
    // stat_welch_t (parametric) and stat_cliffs_delta (ordinal).
    // Pooled-SD d with the small-sample g correction 1 − 3/(4N−9);
    // conventional magnitude labels off the ROUNDED d so a boundary
    // ulp can't differ between engines. One grouped pass, two 1-row
    // frames crossed.
    "stat_cohens_d" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .groupBy("lang")
          .agg(count(lit(1)).cast("double").as("n"),
               avg(col("n_chars").cast("double")).as("m"),
               var_samp(col("n_chars").cast("double")).as("v"))
          .localCheckpoint(eager = false) // read twice (both langs)
        val a = g.filter(col("lang") === "en")
          .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
        val b = g.filter(col("lang") === "de")
          .select(col("n").as("n2"), col("m").as("m2"), col("v").as("v2"))
        val sp2 = ((col("n1") - 1) * col("v1") + (col("n2") - 1) * col("v2")) /
          (col("n1") + col("n2") - 2)
        val dC = round((col("m1") - col("m2")) / sqrt(sp2), 6)
        val bad = col("n1") < 2 || col("n2") < 2 || sp2 <= 0
        a.crossJoin(b).select(
          col("n1").cast("long").as("n_en"), col("n2").cast("long").as("n_de"),
          round(col("m1") - col("m2"), 4).as("mean_diff"),
          when(bad, lit(null).cast("double")).otherwise(dC).as("cohens_d"),
          when(bad, lit(null).cast("double"))
            .otherwise(round(dC * (lit(1.0) - lit(3.0) /
              (lit(4.0) * (col("n1") + col("n2")) - 9)), 6)).as("hedges_g"),
          when(bad, lit(null).cast("string")).otherwise(
            when(abs(dC) < 0.2, "negligible")
              .when(abs(dC) < 0.5, "small")
              .when(abs(dC) < 0.8, "medium")
              .otherwise("large")).as("magnitude"))
      },
      Some("""WITH g AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |                  avg(CAST(n_chars AS DOUBLE)) AS m,
             |                  var_samp(CAST(n_chars AS DOUBLE)) AS v
             |           FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
             |a AS (SELECT n AS n1, m AS m1, v AS v1 FROM g WHERE lang = 'en'),
             |b AS (SELECT n AS n2, m AS m2, v AS v2 FROM g WHERE lang = 'de'),
             |c AS (SELECT n1, n2, m1 - m2 AS md,
             |             ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2) AS sp2
             |      FROM a, b),
             |e AS (SELECT n1, n2, md, sp2,
             |             CASE WHEN n1 < 2 OR n2 < 2 OR sp2 <= 0 THEN NULL
             |                  ELSE round(md / sqrt(sp2), 6) END AS dd
             |      FROM c)
             |SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n2 AS BIGINT) AS n_de,
             |       round(md, 4) AS mean_diff, dd AS cohens_d,
             |       CASE WHEN dd IS NULL THEN NULL
             |            ELSE round(dd * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9)), 6)
             |       END AS hedges_g,
             |       CASE WHEN dd IS NULL THEN NULL
             |            WHEN abs(dd) < 0.2 THEN 'negligible'
             |            WHEN abs(dd) < 0.5 THEN 'small'
             |            WHEN abs(dd) < 0.8 THEN 'medium'
             |            ELSE 'large' END AS magnitude
             |FROM e""".stripMargin)),

    // McNemar's paired test on pre→post purchase conversion: did the
    // SAME users' purchase behavior change across the midpoint split
    // (ev_cuped's calendar halves)? Only the discordant pairs b
    // (pre-only) and c (post-only) carry signal; continuity-corrected
    // χ² = (|b−c|−1)²/(b+c), p from the χ²₁ survival function
    // erfc(√(χ²/2)) via the A&S 7.1.26 polynomial (stat_fdr's exact
    // closed form; χ² rounded to 6 before feeding it). ONE fact
    // rollup → per-user pair → 4 counts; everything after is 1-row
    // arithmetic.
    "stat_mcnemar" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
          .localCheckpoint(eager = false) // bounds + the per-user pair rollup
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val up = ud.crossJoin(broadcast(bounds))
          // integer floor-division: Spark's `/` on longs returns
          // double, which would ceil the comparison when mn+mx+1 is
          // odd while DuckDB's `//` floors it
          .withColumn("post",
            (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg((sum(when(col("post") === 0, col("p")).otherwise(0L)) >= 7)
            .cast("long").as("x"),
               (sum(when(col("post") === 1, col("p")).otherwise(0L)) >= 7)
            .cast("long").as("y"))
        val xx = sqrt(col("chi2") / 2)
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        up.agg(count(lit(1)).as("n_users"),
               sum(when(col("x") === 1 && col("y") === 1, 1L).otherwise(0L)).as("n_both"),
               sum(when(col("x") === 1 && col("y") === 0, 1L).otherwise(0L)).as("b"),
               sum(when(col("x") === 0 && col("y") === 1, 1L).otherwise(0L)).as("c"))
          .withColumn("chi2",
            when(col("b") + col("c") === 0, lit(null).cast("double"))
              .otherwise(round(pow(abs(col("b") - col("c")) - lit(1.0), 2) /
                (col("b") + col("c")), 6)))
          .select(col("n_users"), col("n_both"), col("b").as("n_pre_only"),
                  col("c").as("n_post_only"), col("chi2"),
                  when(col("chi2").isNull, lit(null).cast("double")).otherwise(
                    round(t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
                      + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
                      + t1 * lit(1.061405429)))))
                      * exp(-xx * xx), 6)).as("p_value"))
      },
      Some("""WITH ud AS (
             |  SELECT user_id, ts // 86400000000000 AS day,
             |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
             |  FROM events GROUP BY 1, 2),
             |bb AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
             |up AS (SELECT user_id,
             |         CAST(sum(CASE WHEN day < (mn + mx + 1) // 2 THEN p ELSE 0 END) >= 7 AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN day >= (mn + mx + 1) // 2 THEN p ELSE 0 END) >= 7 AS BIGINT) AS y
             |       FROM ud, bb GROUP BY user_id),
             |ct AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |              CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
             |              CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |              CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
             |       FROM up),
             |ch AS (SELECT *, CASE WHEN b + c = 0 THEN NULL
             |                      ELSE round(pow(abs(b - c) - 1.0, 2) / (b + c), 6)
             |                 END AS chi2
             |       FROM ct),
             |t AS (SELECT *, sqrt(chi2 / 2) AS xx,
             |             1.0 / (1.0 + 0.3275911 * sqrt(chi2 / 2)) AS t1
             |      FROM ch)
             |SELECT n_users, n_both, b AS n_pre_only, c AS n_post_only, chi2,
             |       CASE WHEN chi2 IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736 + t1 * (1.421413741
             |           + t1 * (-1.453152027 + t1 * 1.061405429))))
             |         * exp(-xx * xx), 6) END AS p_value
             |FROM t""".stripMargin)),

    // Yule's characteristic K per source — the classic vocabulary
    // repeat-rate constant K = 10⁴·(Σc² − N)/N² (Yule 1944), scale-
    // invariant unlike raw TTR, so sources of different sizes compare
    // directly. Same two hash aggregates as text_diversity (the
    // (source,tok) count table), different invariant.
    "text_yule_k" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        Tables.documents(s, d)
          .select(col("source"), explode(TextPrimitives.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).cast("double").as("c"))
          .groupBy("source")
          .agg(sum("c").as("n_tok"), count(lit(1)).as("v_types"),
               sum(col("c") * col("c")).as("s2"))
          .select(col("source"), col("n_tok").cast("long").as("n_tok"),
                  col("v_types"),
                  round(lit(10000.0) * (col("s2") - col("n_tok")) /
                        (col("n_tok") * col("n_tok")), 4).as("yule_k"))
          .orderBy("source")
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, CAST(count(*) AS DOUBLE) AS c
             |  FROM (SELECT source, unnest(
             |          regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2)
             |SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
             |       CAST(count(*) AS BIGINT) AS v_types,
             |       round(10000.0 * (sum(c * c) - sum(c)) / (sum(c) * sum(c)), 4)
             |         AS yule_k
             |FROM tc GROUP BY source ORDER BY source""".stripMargin)),

    // MAP@10 + MRR of embedding search (relevance = same-lang, the
    // text_ndcg protocol) — the order-sensitive precision companion
    // to NDCG's graded gain: AP averages precision at each relevant
    // hit, RR scores only the first. Same bounded 5-query broadcast
    // scoring pass; the per-query running-precision sum is a ≤10-row
    // window inside the top-10 slice.
    "text_map_mrr" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val docs = Tables.documents(s, d)
        val raw = graft.embed.HashEmbedder.embedDocsRaw(docs, "doc_id", "text", 64)
          .join(docs.select("doc_id", "lang"), "doc_id")
        val qs = raw.filter(col("doc_id") <= 5)
          .select(col("doc_id").as("qid"), col("embedding").as("qv"),
                  col("lang").as("qlang"))
        val scored = raw.crossJoin(broadcast(qs))
          .filter(col("doc_id") =!= col("qid"))
          .select(col("qid"), col("qlang"), col("doc_id"), col("lang"),
            score(col("embedding"), col("qv")).as("sc"))
        // top-10 per query via the bounded TopK partial aggregate (the
        // text_ndcg shape: ≤10 rows/partition/query shuffled, never a
        // corpus-wide row_number sort on |queries| reducers); the
        // running-precision sum then walks the ≤10-element ARRAY with
        // one aggregate HOF — no window at all. relevance rides the
        // id's low bit (eid = doc_id·2 + rel keeps the doc_id
        // tie-break under the (sc desc, eid asc) comparator).
        val tk = graft.ops.TopK.topk(10)
        val top = scored
          .select(col("qid"), col("sc"),
            (col("doc_id") * 2 +
              when(col("lang") === col("qlang"), 1L).otherwise(0L)).as("eid"))
          .groupBy("qid").agg(tk(col("sc"), col("eid")).as("top"))
          .select(col("qid"), expr(
            """aggregate(
              |  transform(top, (x, i) -> struct(CAST(x.id % 2 AS DOUBLE) AS rel,
              |                                  CAST(i + 1 AS DOUBLE) AS rnk)),
              |  named_struct('cum', 0D, 'apn', 0D,
              |               'rr', CAST(NULL AS DOUBLE), 'nrel', CAST(0 AS BIGINT)),
              |  (s, x) -> named_struct(
              |    'cum', s.cum + x.rel,
              |    'apn', s.apn + IF(x.rel = 1.0D, (s.cum + 1.0D) / x.rnk, 0D),
              |    'rr', coalesce(s.rr, IF(x.rel = 1.0D, 1.0D / x.rnk,
              |                            CAST(NULL AS DOUBLE))),
              |    'nrel', s.nrel + CAST(x.rel AS BIGINT))) AS st""".stripMargin))
          .select(col("qid"), col("st.apn").as("ap_num"),
            col("st.rr").as("rr_raw"), col("st.nrel").as("n_rel_top10"))
        val rel = scored.groupBy("qid")
          .agg(sum(when(col("lang") === col("qlang"), 1L).otherwise(0L)).as("n_rel"))
        top.join(rel, "qid")
          .select(col("qid"), col("n_rel_top10"),
            when(col("n_rel") === 0, lit(null).cast("double"))
              .otherwise(round(col("ap_num") / least(lit(10L), col("n_rel")), 4))
              .as("ap10"),
            coalesce(round(col("rr_raw"), 4), lit(0.0)).as("rr"))
          .orderBy("qid")
      },
      Some {
        val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
        s"""WITH sums AS (
           |${graft.embed.HashEmbedder.rawSumsSql(64)}),
           |lg AS (SELECT doc_id, lang FROM documents),
           |qs AS (SELECT sums.doc_id AS qid, lang AS qlang, sums.*
           |       FROM sums JOIN lg USING (doc_id) WHERE doc_id <= 5),
           |sc AS (SELECT ss.qid, ss.qlang, ss.doc_id, lg.lang,
           |              round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
           |                         ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS sc
           |       FROM (SELECT s.doc_id, q.qid, q.qlang, ($dot) AS dot,
           |                    ($na) AS na, ($nb) AS nb
           |             FROM sums s JOIN qs q ON s.doc_id <> q.qid) ss
           |       JOIN lg ON ss.doc_id = lg.doc_id),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sc DESC, doc_id) AS rnk
           |       FROM sc),
           |top AS (SELECT qid, rnk,
           |          CASE WHEN lang = qlang THEN 1 ELSE 0 END AS rel,
           |          sum(CASE WHEN lang = qlang THEN 1 ELSE 0 END) OVER (
           |            PARTITION BY qid ORDER BY rnk
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rel
           |        FROM rk WHERE rnk <= 10),
           |ag AS (SELECT qid,
           |         sum(CASE WHEN rel = 1 THEN CAST(cum_rel AS DOUBLE) / rnk
           |                  ELSE 0.0 END) AS ap_num,
           |         max(CASE WHEN rel = 1 THEN 1.0 / rnk END) AS rr_raw,
           |         CAST(sum(rel) AS BIGINT) AS n_rel_top10
           |       FROM top GROUP BY qid),
           |rel AS (SELECT qid, CAST(sum(CASE WHEN lang = qlang THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
           |        FROM sc GROUP BY qid)
           |SELECT ag.qid, n_rel_top10,
           |       CASE WHEN n_rel = 0 THEN NULL
           |            ELSE round(ap_num / least(10, n_rel), 4) END AS ap10,
           |       coalesce(round(rr_raw, 4), 0.0) AS rr
           |FROM ag JOIN rel USING (qid) ORDER BY ag.qid""".stripMargin
      }),

    // rich-club coefficient φ(k) of the near-dup graph: among nodes
    // of degree > k, the realized fraction of possible edges — "do
    // the hub documents all duplicate each other?" (mega-cluster
    // early warning, complements graph_assort/graph_degree_dist).
    // Degree table is a broadcast |V|-row join-back onto the shared
    // bounded edge build; k sweep is a 3-row literal cross.
    "graph_rich_club" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false) // degrees + edge filter
        val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
          .groupBy("v").agg(count(lit(1)).as("dg"))
          .localCheckpoint(eager = false) // N_k pass + both join-backs
        val ks = s.createDataFrame(Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)))
          .toDF("k")
        val nk = deg.crossJoin(broadcast(ks)).filter(col("dg") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_k"))
        val ek = e0
          .join(broadcast(deg.select(col("v").as("da"), col("dg").as("dga"))), "da")
          .join(broadcast(deg.select(col("v").as("db"), col("dg").as("dgb"))), "db")
          .crossJoin(broadcast(ks))
          .filter(col("dga") > col("k") && col("dgb") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("e_k"))
        nk.join(ek, Seq("k"), "left")
          .select(col("k"), col("n_k"), coalesce(col("e_k"), lit(0L)).as("e_k"),
            when(col("n_k") >= 2,
              round(lit(2.0) * coalesce(col("e_k"), lit(0L)) /
                (col("n_k") * (col("n_k") - 1)), 4))
              .otherwise(lit(null).cast("double")).as("phi"))
          .orderBy("k")
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
              |        FROM (SELECT da AS v FROM e0 UNION ALL SELECT db AS v FROM e0)
              |        GROUP BY v),
              |ks AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
              |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k
              |       FROM deg, ks WHERE dg > k GROUP BY k),
              |ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_k
              |       FROM e0 JOIN deg a ON a.v = da JOIN deg b ON b.v = db, ks
              |       WHERE a.dg > k AND b.dg > k GROUP BY k)
              |SELECT k, n_k, coalesce(e_k, 0) AS e_k,
              |       CASE WHEN n_k >= 2
              |            THEN round(2.0 * coalesce(e_k, 0) / (n_k * (n_k - 1)), 4)
              |       END AS phi
              |FROM nk LEFT JOIN ek USING (k) ORDER BY k""".stripMargin)),

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

    // ε-local-DP frequency estimation via randomized response (Warner
    // 1965): each user's true "ever purchased" bit is reported
    // truthfully with p = 0.75 (ε = ln 3) and flipped otherwise —
    // deterministic inverse-CDF draw from the md5 hash (the
    // priv_dp_mean idiom), debiased as π̂ = (λ̂ − (1−p))/(2p−1).
    // The local-DP counterpart of the central-DP priv_dp_* releases;
    // ONE per-user rollup, then 1-row arithmetic.
    "priv_rand_response" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val r = Tables.events(s, d)
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("t"))
          .withColumn("u",
            (md5Long(concat(lit("rr:"), col("user_id").cast("string"))) % 1000000)
              .cast("double") / 1000000.0)
          .withColumn("r", when(col("u") < 0.75, col("t")).otherwise(lit(1L) - col("t")))
        r.agg(count(lit(1)).as("n_users"), sum("t").as("n_true_yes"),
              sum("r").as("n_reported_yes"))
          .select(col("n_users"), col("n_true_yes"), col("n_reported_yes"),
            when(col("n_users") > 0,
              round(col("n_true_yes").cast("double") / col("n_users"), 6))
              .otherwise(lit(null).cast("double")).as("pi_true"),
            when(col("n_users") > 0,
              round((col("n_reported_yes").cast("double") / col("n_users")
                - 0.25) / 0.5, 6))
              .otherwise(lit(null).cast("double")).as("pi_hat"))
          .withColumn("abs_err", round(abs(col("pi_hat") - col("pi_true")), 6))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t
             |  FROM events GROUP BY 1),
             |r AS (SELECT t,
             |        CASE WHEN (('0x' || substr(md5('rr:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             |                   % 1000000) / 1000000.0 < 0.75
             |             THEN t ELSE 1 - t END AS r
             |      FROM u),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |              CAST(sum(t) AS BIGINT) AS n_true_yes,
             |              CAST(sum(r) AS BIGINT) AS n_reported_yes
             |       FROM r),
             |pi AS (SELECT *,
             |         CASE WHEN n_users > 0
             |              THEN round(CAST(n_true_yes AS DOUBLE) / n_users, 6) END AS pi_true,
             |         CASE WHEN n_users > 0
             |              THEN round((CAST(n_reported_yes AS DOUBLE) / n_users - 0.25) / 0.5, 6)
             |         END AS pi_hat
             |       FROM ag)
             |SELECT n_users, n_true_yes, n_reported_yes, pi_true, pi_hat,
             |       round(abs(pi_hat - pi_true), 6) AS abs_err
             |FROM pi""".stripMargin)),

    // perceptual-hash (aHash) image near-dup: 64 deterministic
    // md5-stub "pixels" per image (decode stubbed, the mm_binary_meta
    // convention — the Spark plumbing of grid → mean-threshold bits →
    // pairwise Hamming is real), nearest neighbor per image by
    // Hamming distance over the bounded doc_id<120 image subset.
    // At corpus scale the pair join becomes dedup_simhash's banded
    // equi-join on hash bands; the exact quadratic form here is the
    // oracle-able ground truth for that path.
    "mm_image_ahash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val px = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 0 && col("doc_id") < 120 &&
                  col("text").isNotNull)
          .select(col("doc_id"), col("text"),
                  explode(sequence(lit(0L), lit(63L))).as("k"))
          .select(col("doc_id"), col("k"),
            (md5Long(concat(col("text"), lit(":px"), col("k").cast("string")))
              % 256).as("px"))
          .localCheckpoint(eager = false) // mean join + pair join
        val mu = px.groupBy("doc_id").agg(avg(col("px").cast("double")).as("mu"))
        val bits = px.join(mu, "doc_id")
          .select(col("doc_id"), col("k"),
                  (col("px") > col("mu")).cast("long").as("bit"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val ham = bits.select(col("doc_id").as("da"), col("k"), col("bit").as("ba"))
          .join(bits.select(col("doc_id").as("db"), col("k"), col("bit").as("bb")),
                Seq("k"))
          .filter(col("da") =!= col("db"))
          .groupBy("da", "db")
          .agg(sum(abs(col("ba") - col("bb"))).as("hamming"))
        val wnn = Window.partitionBy("da").orderBy(col("hamming"), col("db"))
        ham.withColumn("rk", row_number().over(wnn)).filter(col("rk") === 1)
          .select(col("da").as("doc_id"), col("db").as("nn_doc"),
                  col("hamming").as("nn_hamming"))
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (SELECT doc_id, text FROM documents
             |              WHERE doc_id % 3 = 0 AND doc_id < 120 AND text IS NOT NULL),
             |px AS (SELECT doc_id, CAST(k AS BIGINT) AS k,
             |              ('0x' || substr(md5(text || ':px' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
             |                % 256 AS px
             |       FROM imgs, LATERAL (SELECT unnest(generate_series(0, 63)) AS k)),
             |mu AS (SELECT doc_id, avg(CAST(px AS DOUBLE)) AS mu FROM px GROUP BY 1),
             |bits AS (SELECT doc_id, k, CAST(px > mu AS BIGINT) AS bit
             |         FROM px JOIN mu USING (doc_id)),
             |ham AS (SELECT a.doc_id AS da, b.doc_id AS db,
             |               CAST(sum(abs(a.bit - b.bit)) AS BIGINT) AS hamming
             |        FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id <> b.doc_id
             |        GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY da
             |                   ORDER BY hamming, db) AS rk
             |       FROM ham)
             |SELECT da AS doc_id, db AS nn_doc, hamming AS nn_hamming
             |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin)),

    // participation ratio PR = tr(C)²/tr(C²) of the embedding
    // covariance — the eigen-free effective-dimension estimate
    // (PR = d for isotropic, → 1 for rank-collapsed), the spectral
    // companion to emb_anisotropy/emb_twonn_id that needs NO
    // eigendecomposition: both traces come from the 64×64 cross-
    // moment cells, a 4096-cell map-side-combinable aggregate (the
    // ev_countmin posture). Cells rounded to 7 before squaring so
    // partial-agg sum order can't reach the report. At reference
    // dim 1024 the fan-out (1M cells) moves to the whitening/power-
    // iteration mapPartitions accumulator instead.
    "emb_participation_ratio" -> Q(
      (s, d) => {
        // one-pass cross-moment aggregate + driver math on the
        // bounded d² cells (CovMoments doc) — no N·d² row fan-out
        import graft.embed.CovMoments._
        import s.implicits._
        val m = moments(Tables.embeddings(s, d))
        val cv = covCells(m)
        var trc = 0.0; var trc2 = 0.0
        for (a <- 0 until m.dim; b <- 0 until m.dim) {
          if (a == b) trc += cv(a)(b)
          trc2 += cv(a)(b) * cv(a)(b)
        }
        Seq((m.n, m.dim.toLong, r(trc, 6),
             if (trc2 > 0) Some(r(trc * trc / trc2, 4)) else None))
          .toDF("n_vecs", "dim", "tr_c", "pr_dim")
      },
      Some("""WITH px AS (SELECT vec_id,
             |              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS a,
             |              CAST(unnest(embedding) AS DOUBLE) AS xa
             |            FROM embeddings WHERE embedding IS NOT NULL),
             |cells AS (SELECT p.a, q.a AS b, CAST(count(*) AS DOUBLE) AS n,
             |                 round(sum(p.xa * q.xa) / count(*) -
             |                       (sum(p.xa) / count(*)) * (sum(q.xa) / count(*)), 7) AS cv
             |          FROM px p JOIN px q ON p.vec_id = q.vec_id
             |          GROUP BY 1, 2),
             |ag AS (SELECT max(n) AS nv, max(a) AS mxa,
             |              sum(CASE WHEN a = b THEN cv ELSE 0.0 END) AS trc,
             |              sum(cv * cv) AS trc2
             |       FROM cells)
             |SELECT CAST(nv AS BIGINT) AS n_vecs, mxa + 1 AS dim,
             |       round(trc, 6) AS tr_c,
             |       CASE WHEN trc2 > 0 THEN round(trc * trc / trc2, 4) END AS pr_dim
             |FROM ag""".stripMargin)),

    // group-sequential A/B monitoring with O'Brien–Fleming bounds:
    // the cumulative Welch z at 4 equally-spaced calendar looks vs
    // the OBF boundary 2.0243·√(K/k) — the "peek early without
    // inflating α" machinery every experimentation platform needs
    // next to the fixed-horizon ev_ab_test. One fact pass fanned ×4
    // by the broadcast look table; cut days use integer division on
    // both engines.
    "stat_group_seq" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("day", expr("ts div 86400000000000"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .localCheckpoint(eager = false) // bounds + the look rollup
        val looks = ev.agg(min("day").as("mn"), max("day").as("mx"))
          .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L), lit(4L))))
          .select(col("k"),
            (col("mn") - 1 + expr("((mx - mn + 1) * k) div 4")).as("cut"))
        val g = ev.crossJoin(broadcast(looks))
          .filter(col("day") <= col("cut"))
          .groupBy("k")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
               avg(when(col("arm") === 1, col("value"))).as("m_t"),
               avg(when(col("arm") === 0, col("value"))).as("m_c"),
               var_samp(when(col("arm") === 1, col("value"))).as("v_t"),
               var_samp(when(col("arm") === 0, col("value"))).as("v_c"))
        val se2 = col("v_t") / col("n_t") + col("v_c") / col("n_c")
        g.select(col("k"), col("n_t"), col("n_c"),
            when(col("n_t") < 2 || col("n_c") < 2 || se2 <= 0.0,
                 lit(null).cast("double"))
              .otherwise(round((col("m_t") - col("m_c")) / sqrt(se2), 4)).as("z"),
            round(lit(2.0243) * sqrt(lit(4.0) / col("k")), 4).as("z_boundary"))
          .withColumn("reject",
            when(col("z").isNull, lit(null).cast("boolean"))
              .otherwise(abs(col("z")) > col("z_boundary")))
          .orderBy("k")
      },
      Some("""WITH ev AS (
             |  SELECT ts // 86400000000000 AS day, value,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |looks AS (SELECT CAST(k AS BIGINT) AS k,
             |                 mn - 1 + ((mx - mn + 1) * k) // 4 AS cut
             |          FROM b, (SELECT unnest([1, 2, 3, 4]) AS k)),
             |g AS (SELECT k,
             |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |        avg(CASE WHEN arm = 1 THEN value END) AS m_t,
             |        avg(CASE WHEN arm = 0 THEN value END) AS m_c,
             |        var_samp(CASE WHEN arm = 1 THEN value END) AS v_t,
             |        var_samp(CASE WHEN arm = 0 THEN value END) AS v_c
             |      FROM ev, looks WHERE day <= cut GROUP BY k),
             |z AS (SELECT k, n_t, n_c,
             |        CASE WHEN n_t < 2 OR n_c < 2 OR v_t / n_t + v_c / n_c <= 0.0
             |             THEN NULL
             |             ELSE round((m_t - m_c) / sqrt(v_t / n_t + v_c / n_c), 4)
             |        END AS z,
             |        round(2.0243 * sqrt(4.0 / k), 4) AS z_boundary
             |      FROM g)
             |SELECT k, n_t, n_c, z, z_boundary,
             |       CASE WHEN z IS NULL THEN NULL
             |            ELSE abs(z) > z_boundary END AS reject
             |FROM z ORDER BY k""".stripMargin)),

    // eigenvector centrality of the near-dup graph: 6 unrolled
    // power-iteration rounds (neighbor-sum + L1 renormalization,
    // per-round round-to-7 pinning the trajectory — the ev_stationary
    // idiom on the dup graph), top-10 hub documents. Unlike degree,
    // this scores being connected to OTHER hubs — the doc family a
    // curator should read first. Corpus-scale work = the one shared
    // shingle-join edge build; each round is O(E) shuffle.
    "graph_eigencentrality" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false)
        val nbr = e0.select(col("da").as("v"), col("db").as("n"))
          .union(e0.select(col("db").as("v"), col("da").as("n")))
          .localCheckpoint(eager = false) // read once per round
        val nodes = nbr.select(col("v")).distinct()
        val nn = nodes.agg(count(lit(1)).cast("double").as("nn"))
        var x = nodes.crossJoin(broadcast(nn))
          .select(col("v"), round(lit(1.0) / col("nn"), 7).as("c"))
          .localCheckpoint(eager = false)
        for (_ <- 1 to 6) {
          val raw = nbr.join(x.select(col("v").as("n"), col("c")), "n")
            .groupBy("v").agg(sum("c").as("raw"))
          val tot = raw.agg(sum("raw").as("t"))
          x = raw.crossJoin(broadcast(tot))
            .select(col("v"), round(col("raw") / col("t"), 7).as("c"))
            .localCheckpoint(eager = false) // next round + final sort
        }
        x.orderBy(col("c").desc, col("v")).limit(10)
          .select(col("v").as("doc_id"), col("c").as("centrality"))
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |nbr AS (SELECT da AS v, db AS n FROM e0
              |        UNION ALL SELECT db AS v, da AS n FROM e0),
              |nodes AS (SELECT DISTINCT v FROM nbr),
              |x0 AS (SELECT v, round(1.0 / (SELECT CAST(count(*) AS DOUBLE)
              |                              FROM nodes), 7) AS c
              |       FROM nodes),
              |${eigenIterSql(6)}
              |SELECT v AS doc_id, c AS centrality
              |FROM x6 ORDER BY c DESC, v LIMIT 10""".stripMargin)),

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

    // linear CKA between the full 64-d embedding and its 16-d
    // Matryoshka prefix: ‖C_xy‖²F / (‖C_xx‖F·‖C_yy‖F), where every
    // block is a sub-matrix of the ONE 64×64 covariance cell table
    // (emb_participation_ratio's aggregate) because Y is a prefix of
    // X — so the whole representation-similarity score is arithmetic
    // over 4096 map-side-combinable cells. The "does the truncated
    // index preserve structure" check behind vec_matryoshka.
    "emb_cka" -> Q(
      (s, d) => {
        // one-pass cross-moment aggregate + driver math on the
        // bounded d² cells (CovMoments doc) — no N·d² row fan-out
        import graft.embed.CovMoments._
        import s.implicits._
        val m = moments(Tables.embeddings(s, d))
        val cv = covCells(m)
        var fxx = 0.0; var fyy = 0.0; var fxy = 0.0
        for (a <- 0 until m.dim; b <- 0 until m.dim) {
          val c2 = cv(a)(b) * cv(a)(b)
          fxx += c2
          fyy += (if (a < 16 && b < 16) c2 else 0.0)
          fxy += (if (b < 16) c2 else 0.0)
        }
        Seq((m.n, 16L,
             if (fxx > 0 && fyy > 0)
               Some(r(fxy / (math.sqrt(fxx) * math.sqrt(fyy)), 4))
             else None))
          .toDF("n_vecs", "dim_prefix", "cka")
      },
      Some("""WITH px AS (SELECT vec_id,
             |              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS a,
             |              CAST(unnest(embedding) AS DOUBLE) AS xa
             |            FROM embeddings WHERE embedding IS NOT NULL),
             |cells AS (SELECT p.a, q.a AS b, CAST(count(*) AS DOUBLE) AS n,
             |                 round(sum(p.xa * q.xa) / count(*) -
             |                       (sum(p.xa) / count(*)) * (sum(q.xa) / count(*)), 7) AS cv
             |          FROM px p JOIN px q ON p.vec_id = q.vec_id
             |          GROUP BY 1, 2),
             |ag AS (SELECT max(n) AS nv,
             |              sum(cv * cv) AS fxx,
             |              sum(CASE WHEN a < 16 AND b < 16 THEN cv * cv ELSE 0.0 END) AS fyy,
             |              sum(CASE WHEN b < 16 THEN cv * cv ELSE 0.0 END) AS fxy
             |       FROM cells)
             |SELECT CAST(nv AS BIGINT) AS n_vecs, CAST(16 AS BIGINT) AS dim_prefix,
             |       CASE WHEN fxx > 0 AND fyy > 0
             |            THEN round(fxy / (sqrt(fxx) * sqrt(fyy)), 4) END AS cka
             |FROM ag""".stripMargin)),

    // ARI + Coleman–Liau readability per doc — the character-based
    // indices next to the syllable-based Flesch (text_readability):
    // no syllable heuristic, so they transfer across languages
    // better. Same map-side regex-count shape; words=0 guarded NULL.
    "text_ari" -> Q(
      (s, d) => {
        val words = size(graft.text.TextPrimitives.tokens(col("text"))).cast("double")
        val sents = greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"),
          lit(0))), lit(1)).cast("double")
        val chars = length(regexp_replace(col("text"), "\\s", "")).cast("double")
        // + 1e-9 before the round: the raw indices land EXACTLY on
        // 4-decimal ties (0.5·words/sents is .5-granular), where
        // Spark's string-decimal HALF_UP and DuckDB's numeric round
        // disagree about the same double; the identical nudge on both
        // engines moves every tie off the boundary
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), chars.cast("long").as("n_chars_ns"),
                  words.cast("long").as("n_words"), sents.cast("long").as("n_sent"),
                  when(words > 0, round(lit(4.71) * (chars / words)
                    + lit(0.5) * (words / sents) - lit(21.43) + lit(1e-9), 4))
                    .otherwise(lit(null).cast("double")).as("ari"),
                  when(words > 0, round(lit(0.0588) * (chars / words * 100)
                    - lit(0.296) * (sents / words * 100) - lit(15.8) + lit(1e-9), 4))
                    .otherwise(lit(null).cast("double")).as("coleman_liau"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(chars AS BIGINT) AS n_chars_ns,
             |       CAST(words AS BIGINT) AS n_words, CAST(sents AS BIGINT) AS n_sent,
             |       CASE WHEN words > 0
             |            THEN round(4.71 * (chars / words) + 0.5 * (words / sents)
             |                       - 21.43 + 1e-9, 4) END AS ari,
             |       CASE WHEN words > 0
             |            THEN round(0.0588 * (chars / words * 100)
             |                       - 0.296 * (sents / words * 100) - 15.8 + 1e-9, 4)
             |       END AS coleman_liau
             |FROM (
             |  SELECT doc_id,
             |         CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS chars,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS words,
             |         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS sents
             |  FROM documents WHERE doc_id < 100)
             |ORDER BY doc_id""".stripMargin)),

    // voice-activity segments over the audio window fan-out
    // (mm_audio_windows' grid): per-window energy is the decode stub
    // (deterministic md5 — the real part is the segmentation
    // plumbing), speech windows merged into maximal runs by
    // gaps-and-islands (win_idx − row_number), segment extents
    // clipped to n_samples. Per-audio fan-out ≤ 25 windows; the
    // merge window is per-doc, never corpus-wide.
    "mm_audio_vad" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val wins = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 1) // kind = audio
          .select(col("doc_id"), md5Long(col("text")).as("hm"))
          .selectExpr("doc_id",
            "element_at(array(8000L, 16000L, 44100L), CAST(hm % 3 AS INT) + 1) AS sr",
            "hm % 2000000 + 1 AS n_samples")
          .selectExpr("doc_id", "n_samples", "sr * 10 AS win",
            "(n_samples + sr * 10 - 1) DIV (sr * 10) AS n_win")
          .select(col("doc_id"), col("n_samples"), col("win"),
            explode(sequence(lit(0L), col("n_win") - 1)).as("win_idx"))
          .withColumn("energy",
            md5Long(concat(col("doc_id").cast("string"), lit(":vad:"),
              col("win_idx").cast("string"))) % 100)
          .filter(col("energy") >= 40)
        val wseg = Window.partitionBy("doc_id").orderBy("win_idx")
        wins.withColumn("seg", col("win_idx") - row_number().over(wseg))
          .groupBy("doc_id", "seg")
          .agg(min("win_idx").as("start_win"), max("win_idx").as("end_win"),
               count(lit(1)).as("n_windows"),
               (min("win_idx") * max("win")).as("start_sample"),
               least((max("win_idx") + 1) * max("win"), max("n_samples"))
                 .as("end_sample"))
          .select(col("doc_id"), col("start_win"), col("end_win"),
                  col("n_windows"), col("start_sample"), col("end_sample"))
          .orderBy("doc_id", "start_win")
      },
      Some("""WITH wins AS (
             |  SELECT doc_id, n_samples, win,
             |         CAST(unnest(generate_series(0, n_win - 1)) AS BIGINT) AS win_idx
             |  FROM (
             |    SELECT doc_id, n_samples, sr * 10 AS win,
             |           (n_samples + sr * 10 - 1) // (sr * 10) AS n_win
             |    FROM (
             |      SELECT doc_id, CAST(([8000, 16000, 44100])[CAST(hm % 3 AS INTEGER) + 1] AS BIGINT) AS sr,
             |             hm % 2000000 + 1 AS n_samples
             |      FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |            FROM documents WHERE doc_id % 3 = 1)))),
             |sp AS (SELECT doc_id, n_samples, win, win_idx
             |       FROM (SELECT *,
             |               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':vad:' ||
             |                 CAST(win_idx AS VARCHAR)), 1, 15))::BIGINT % 100 AS energy
             |             FROM wins)
             |       WHERE energy >= 40),
             |seg AS (SELECT *, win_idx - row_number() OVER (PARTITION BY doc_id
             |                    ORDER BY win_idx) AS seg
             |        FROM sp)
             |SELECT doc_id, min(win_idx) AS start_win, max(win_idx) AS end_win,
             |       CAST(count(*) AS BIGINT) AS n_windows,
             |       min(win_idx) * max(win) AS start_sample,
             |       least((max(win_idx) + 1) * max(win), max(n_samples)) AS end_sample
             |FROM seg GROUP BY doc_id, seg
             |ORDER BY doc_id, start_win""".stripMargin)),

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

    // content-defined chunking (the FastCDC/rsync family): cut the
    // text wherever the rolling 8-gram hash ≡ 0 (mod 32) — boundaries
    // move WITH the content, so an insertion early in a doc doesn't
    // shift every later chunk the way fixed-width chunking does —
    // then count duplicate chunks corpus-wide by content hash. The
    // storage/transfer-dedup primitive next to the retrieval-oriented
    // text_chunking; everything is map-side per doc except the final
    // distinct-count (grams fan out ≤ len rows/doc, the per-doc
    // boundary window is doc-bounded).
    "dedup_cdc_chunks" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && length(col("text")) >= 8)
          .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        val cuts = docs
          .select(col("doc_id"), col("text"), col("len"),
            explode(sequence(lit(1), col("len") - 7)).as("i"))
          .filter(md5Long(expr("substring(text, i, 8)")) % 32 === 0)
          .select(col("doc_id"), col("text"), col("len"), col("i"))
          .union(docs.select(col("doc_id"), col("text"), col("len"),
            lit(1).as("i")))
          .distinct()
        val wch = Window.partitionBy("doc_id").orderBy("i")
        cuts
          .withColumn("nxt", coalesce(lead("i", 1).over(wch), col("len") + 1))
          .withColumn("clen", col("nxt") - col("i"))
          .withColumn("chunk", expr("substring(text, i, clen)"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
               count(lit(1)).as("n_chunks"),
               countDistinct(md5(col("chunk").cast("binary"))).as("n_unique"),
               round(lit(1.0) - countDistinct(md5(col("chunk").cast("binary")))
                 / count(lit(1)), 4).as("dedup_ratio"),
               round(avg("clen"), 4).as("mean_len"))
      },
      Some("""WITH docs AS (SELECT doc_id, text, length(text) AS len
             |              FROM documents
             |              WHERE text IS NOT NULL AND length(text) >= 8),
             |pos AS (SELECT doc_id, text, len, CAST(i AS INTEGER) AS i
             |        FROM docs, LATERAL (SELECT unnest(generate_series(1, len - 7)) AS i)),
             |cuts AS (SELECT doc_id, text, len, i FROM pos
             |         WHERE ('0x' || substr(md5(substr(text, i, 8)), 1, 15))::BIGINT % 32 = 0
             |         UNION
             |         SELECT doc_id, text, len, 1 FROM docs),
             |ch AS (SELECT doc_id,
             |              substr(text, i,
             |                CAST(coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i),
             |                              len + 1) - i AS INTEGER)) AS chunk,
             |              coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i),
             |                       len + 1) - i AS clen
             |       FROM cuts)
             |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |       CAST(count(*) AS BIGINT) AS n_chunks,
             |       CAST(count(DISTINCT md5(chunk)) AS BIGINT) AS n_unique,
             |       round(1.0 - count(DISTINCT md5(chunk)) * 1.0 / count(*), 4)
             |         AS dedup_ratio,
             |       round(avg(clen), 4) AS mean_len
             |FROM ch""".stripMargin)),

    // two-sample Anderson–Darling (tie-corrected midrank form,
    // Scholz–Stephens 1987) on en-vs-rest token counts — weighs the
    // TAILS where KS is blind, off the same distinct-value histogram
    // as samp_ks_test (cumulative sums over VALUES, never rows).
    // Degenerate terms (denominator ≤ 0, e.g. the whole mass at one
    // value) contribute 0 on both engines.
    "stat_ad_test" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(size(graft.text.TextPrimitives.tokens(col("text")))
                    .cast("long").as("x"),
                  when(col("lang") === "en", 1L).otherwise(0L).as("en"))
          .groupBy("x")
          .agg(sum("en").as("le"), sum(lit(1L) - col("en")).as("lr"))
        val w = Window.orderBy("x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = g.agg(sum("le").as("ne"), sum("lr").as("nr"))
        val cum = g
          .withColumn("fe", sum("le").over(w))
          .withColumn("fr", sum("lr").over(w))
          .crossJoin(broadcast(tot))
          .withColumn("nn", (col("ne") + col("nr")).cast("double"))
          .withColumn("l", (col("le") + col("lr")).cast("double"))
          .withColumn("bj", col("fe") + col("fr") - col("l") / 2)
          .withColumn("mej", col("fe") - col("le").cast("double") / 2)
          .withColumn("mrj", col("fr") - col("lr").cast("double") / 2)
          .withColumn("den",
            col("bj") * (col("nn") - col("bj")) - col("nn") * col("l") / 4)
        def inner(m: Column, n: Column) =
          when(col("den") > 0,
            (col("l") / col("nn")) * pow(col("nn") * m - n * col("bj"), 2)
              / col("den")).otherwise(lit(0.0))
        cum.agg(max("ne").as("ne"), max("nr").as("nr"), max("nn").as("nn"),
            sum(inner(col("mej"), col("ne").cast("double"))).as("se"),
            sum(inner(col("mrj"), col("nr").cast("double"))).as("sr"))
          .select(col("ne").as("n_en"), col("nr").as("n_rest"),
            when(col("ne") > 0 && col("nr") > 0,
              round((col("nn") - 1) / col("nn") *
                (col("se") / col("ne") + col("sr") / col("nr")), 4))
              .otherwise(lit(null).cast("double")).as("a2"))
      },
      Some("""WITH g AS (
             |  SELECT x, CAST(sum(en) AS BIGINT) AS le,
             |         CAST(sum(1 - en) AS BIGINT) AS lr
             |  FROM (SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
             |               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
             |        FROM documents)
             |  GROUP BY x),
             |t AS (SELECT CAST(sum(le) AS BIGINT) AS ne,
             |             CAST(sum(lr) AS BIGINT) AS nr FROM g),
             |c AS (SELECT x, le, lr,
             |             sum(le) OVER wc AS fe, sum(lr) OVER wc AS fr
             |      FROM g WINDOW wc AS (ORDER BY x ROWS BETWEEN UNBOUNDED
             |        PRECEDING AND CURRENT ROW)),
             |m AS (SELECT ne, nr, CAST(ne + nr AS DOUBLE) AS nn,
             |             CAST(le + lr AS DOUBLE) AS l,
             |             fe + fr - CAST(le + lr AS DOUBLE) / 2 AS bj,
             |             fe - CAST(le AS DOUBLE) / 2 AS mej,
             |             fr - CAST(lr AS DOUBLE) / 2 AS mrj
             |      FROM c, t),
             |d AS (SELECT *, bj * (nn - bj) - nn * l / 4 AS den FROM m),
             |ag AS (SELECT max(ne) AS ne, max(nr) AS nr, max(nn) AS nn,
             |         sum(CASE WHEN den > 0 THEN (l / nn) *
             |               pow(nn * mej - ne * bj, 2) / den ELSE 0.0 END) AS se,
             |         sum(CASE WHEN den > 0 THEN (l / nn) *
             |               pow(nn * mrj - nr * bj, 2) / den ELSE 0.0 END) AS sr
             |       FROM d)
             |SELECT ne AS n_en, nr AS n_rest,
             |       CASE WHEN ne > 0 AND nr > 0
             |            THEN round((nn - 1) / nn * (se / ne + sr / nr), 4)
             |       END AS a2
             |FROM ag""".stripMargin)),

    // near-dup threshold sensitivity curve: pair counts at Jaccard
    // cutoffs {0.1,0.2,0.3,0.5,0.7} from ONE pairwise-Jaccard pass on
    // the bounded subset — the tuning table a curator reads before
    // committing a dedup threshold (how fast does the pair set
    // explode as the bar drops?). Zero-count thresholds stay as rows.
    "dedup_threshold_curve" -> Q(
      (s, d) => {
        val pj = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.1)
          .localCheckpoint(eager = false) // one count pass per threshold
        val th = s.createDataFrame(Seq(0.1, 0.2, 0.3, 0.5, 0.7).map(Tuple1(_)))
          .toDF("thr")
        val counts = pj.crossJoin(broadcast(th))
          .filter(col("jaccard") >= col("thr"))
          .groupBy("thr").agg(count(lit(1)).as("n_pairs"))
        th.join(counts, Seq("thr"), "left")
          .select(col("thr"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
          .orderBy("thr")
      },
      Some(s"""WITH s AS (
              |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
              |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
              |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
              |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
              |      GROUP BY da, db),
              |pj AS (SELECT round(ni * 1.0 / (ca.cnt + cb.cnt - ni), 4) AS j
              |       FROM i JOIN c ca ON ca.doc_id = da
              |       JOIN c cb ON cb.doc_id = db
              |       WHERE ni * 1.0 / (ca.cnt + cb.cnt - ni) >= 0.1),
              |th AS (SELECT CAST(unnest([0.1, 0.2, 0.3, 0.5, 0.7]) AS DOUBLE) AS thr),
              |counts AS (SELECT thr, CAST(count(*) AS BIGINT) AS n_pairs
              |           FROM th JOIN pj ON j >= thr GROUP BY thr)
              |SELECT thr, coalesce(n_pairs, 0) AS n_pairs
              |FROM th LEFT JOIN counts USING (thr) ORDER BY thr""".stripMargin)),

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

    // k-NN majority-vote label consistency at k ∈ {1,3,5} — does
    // more context help or hurt? (1-NN = emb_knn_accuracy's metric;
    // diverging k=5 accuracy means noisy near-neighborhoods.) ONE
    // broadcast scoring pass bounds rk ≤ 5; votes are per-(query,k)
    // windows over ≤ 5 rows; ties break to the smallest label on
    // both engines.
    "emb_knn_vote" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val corpus = Tables.embeddings(s, d)
          .select(col("vec_id").as("vb"), col("embedding").as("eb"),
                  col("label").as("lb"))
        val queries = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id").as("va"), col("embedding").as("ea"),
                  col("label").as("la"))
        val wq = Window.partitionBy("va").orderBy(col("sc").desc, col("vb"))
        val top = corpus.crossJoin(broadcast(queries))
          .filter(col("va") =!= col("vb"))
          .select(col("va"), col("la"), col("vb"), col("lb"),
            score(col("eb"), col("ea")).as("sc"))
          .withColumn("rk", row_number().over(wq))
          .filter(col("rk") <= 5)
          .localCheckpoint(eager = false) // one vote pass per k
        val ks = s.createDataFrame(Seq(Tuple1(1L), Tuple1(3L), Tuple1(5L)))
          .toDF("k")
        val votes = top.crossJoin(broadcast(ks)).filter(col("rk") <= col("k"))
          .groupBy("va", "la", "k", "lb").agg(count(lit(1)).as("c"))
        val wv = Window.partitionBy("va", "k").orderBy(col("c").desc, col("lb"))
        votes.withColumn("r2", row_number().over(wv)).filter(col("r2") === 1)
          .groupBy("k")
          .agg(count(lit(1)).as("n_queries"),
               sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_correct"))
          .withColumn("acc", round(col("n_correct") / col("n_queries"), 4))
          .orderBy("k")
      },
      Some("""WITH q AS (SELECT vec_id AS va, embedding AS ea, label AS la
             |           FROM embeddings WHERE vec_id < 300),
             |p AS (SELECT va, la, b.vec_id AS vb, b.label AS lb,
             |             round(list_cosine_similarity(b.embedding::DOUBLE[], ea::DOUBLE[]), 6) + 0.0 AS sc
             |      FROM q, embeddings b WHERE va <> b.vec_id),
             |top AS (SELECT * FROM (
             |          SELECT *, row_number() OVER (PARTITION BY va
             |                      ORDER BY sc DESC, vb) AS rk
             |          FROM p) WHERE rk <= 5),
             |ks AS (SELECT CAST(unnest([1, 3, 5]) AS BIGINT) AS k),
             |votes AS (SELECT va, la, k, lb, CAST(count(*) AS BIGINT) AS c
             |          FROM top, ks WHERE rk <= k GROUP BY 1, 2, 3, 4),
             |w AS (SELECT *, row_number() OVER (PARTITION BY va, k
             |                  ORDER BY c DESC, lb) AS r2
             |      FROM votes)
             |SELECT k, CAST(count(*) AS BIGINT) AS n_queries,
             |       CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
             |       round(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS acc
             |FROM w WHERE r2 = 1 GROUP BY k ORDER BY k""".stripMargin)),

    // IVF recall-vs-nprobe tuning curve: for 3 queries × nprobe ∈
    // {1,2,4}, recall@10 of the probed cells' candidates against the
    // brute-force truth, plus the candidate count actually scanned —
    // the table that tells an operator WHERE to set nprobe (the
    // recall/scan-cost tradeoff ann_ivf_probe fixes at 2). Centroids
    // are ann_ivf_probe's deterministic first-4 convention; at scale
    // the candidates come from the partition-pruned cell index, the
    // shape here is the oracle-able truth for it.
    "ann_ivf_recall_curve" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d).filter(col("embedding").isNotNull)
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val wAssign = Window.partitionBy("vec_id").orderBy(col("cs").desc, col("cid"))
        val scored = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cid"),
            score(col("embedding"), col("cv")).as("cs"))
          .withColumn("rn", row_number().over(wAssign))
          .localCheckpoint(eager = false) // assignment + probe lists
        val assigned = scored.filter(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cid"))
        val qids = Seq(7L, 42L, 99L)
        val qs = emb.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val wq = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
        val truth = emb.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), score(col("embedding"), col("qv")).as("sc"))
          .withColumn("rk", row_number().over(wq)).filter(col("rk") <= 10)
          .select(col("qid"), col("vec_id"))
          .localCheckpoint(eager = false) // joined once per (q, nprobe)
        val nps = s.createDataFrame(Seq(Tuple1(1L), Tuple1(2L), Tuple1(4L)))
          .toDF("nprobe")
        val probes = scored.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id").as("qid"), col("cid"), col("rn"))
          .crossJoin(broadcast(nps)).filter(col("rn") <= col("nprobe"))
          .select(col("qid"), col("cid"), col("nprobe"))
        val cand = assigned.join(broadcast(probes), Seq("cid"))
          .filter(col("vec_id") =!= col("qid"))
          .join(broadcast(qs), "qid")
          .select(col("qid"), col("nprobe"), col("vec_id"),
            score(col("embedding"), col("qv")).as("sc"))
          .localCheckpoint(eager = false) // top-10 pass + count pass
        val wc = Window.partitionBy("qid", "nprobe").orderBy(col("sc").desc, col("vec_id"))
        val hits = cand.withColumn("rk", row_number().over(wc))
          .filter(col("rk") <= 10)
          .join(truth, Seq("qid", "vec_id"), "left_semi")
          .groupBy("qid", "nprobe").agg(count(lit(1)).as("n_hits"))
        cand.groupBy("qid", "nprobe").agg(count(lit(1)).as("n_cand"))
          .join(hits, Seq("qid", "nprobe"), "left")
          .select(col("qid"), col("nprobe"), col("n_cand"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            round(coalesce(col("n_hits"), lit(0L)) / lit(10.0), 4).as("recall_at_10"))
          .orderBy("qid", "nprobe")
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings
             |           WHERE embedding IS NOT NULL),
             |cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             |          FROM e WHERE vec_id < 4),
             |scored AS (SELECT e.vec_id, e.embedding, c.cid,
             |             row_number() OVER (PARTITION BY e.vec_id
             |               ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
             |           FROM e, cents c),
             |assigned AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
             |qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
             |       FROM e WHERE vec_id IN (7, 42, 99)),
             |truth AS (SELECT qid, vec_id FROM (
             |    SELECT q.qid, e.vec_id,
             |           row_number() OVER (PARTITION BY q.qid
             |             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) + 0.0 DESC, e.vec_id) AS rk
             |    FROM e, qs q WHERE e.vec_id <> q.qid)
             |  WHERE rk <= 10),
             |nps AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe),
             |probes AS (SELECT s.vec_id AS qid, s.cid, np.nprobe
             |           FROM scored s, nps np
             |           WHERE s.vec_id IN (7, 42, 99) AND s.rn <= np.nprobe),
             |cand AS (SELECT p.qid, p.nprobe, a.vec_id,
             |                round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv), 6) + 0.0 AS sc
             |         FROM assigned a JOIN probes p USING (cid)
             |         JOIN qs q ON q.qid = p.qid
             |         WHERE a.vec_id <> p.qid),
             |top AS (SELECT qid, nprobe, vec_id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid, nprobe
             |                ORDER BY sc DESC, vec_id) AS rk
             |    FROM cand) WHERE rk <= 10),
             |hits AS (SELECT t.qid, t.nprobe, CAST(count(*) AS BIGINT) AS n_hits
             |         FROM top t JOIN truth USING (qid, vec_id) GROUP BY 1, 2),
             |nc AS (SELECT qid, nprobe, CAST(count(*) AS BIGINT) AS n_cand
             |       FROM cand GROUP BY 1, 2)
             |SELECT qid, nprobe, n_cand, coalesce(n_hits, 0) AS n_hits,
             |       round(coalesce(n_hits, 0) / 10.0, 4) AS recall_at_10
             |FROM nc LEFT JOIN hits USING (qid, nprobe)
             |ORDER BY qid, nprobe""".stripMargin)),

    // smoothed target encoding per event_type (the m-estimate,
    // m = 20): the categorical-feature encoder a tabular model
    // pipeline ships — raw rate vs the prior-shrunk rate that
    // doesn't let rare categories memorize the target. ONE grouped
    // pass + a broadcast 1-row prior.
    "feat_target_encode" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("y", when(col("value") > 50.0, 1.0).otherwise(0.0))
        val prior = ev.agg(round(avg("y"), 6).as("prior"))
        ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("y").as("s"))
          .crossJoin(broadcast(prior))
          .select(col("event_type"), col("n"),
            round(col("s") / col("n"), 6).as("raw_rate"),
            round((col("s") + lit(20.0) * col("prior")) / (col("n") + lit(20.0)), 6)
              .as("te_smooth"),
            col("prior"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type,
             |                   CASE WHEN value > 50.0 THEN 1.0 ELSE 0.0 END AS y
             |            FROM events),
             |pr AS (SELECT round(avg(y), 6) AS prior FROM ev),
             |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum(y) AS s
             |      FROM ev GROUP BY 1)
             |SELECT event_type, n, round(s / n, 6) AS raw_rate,
             |       round((s + 20.0 * prior) / (n + 20.0), 6) AS te_smooth, prior
             |FROM g, pr ORDER BY event_type""".stripMargin)),

    // hashing-trick collision audit: distinct vocabulary hashed into
    // 1024 feature buckets (md5 mod), reporting load factor, max
    // bucket, and the collision rate — the "is 2^k buckets enough"
    // check in front of hashed bag-of-words features. Two hash aggs
    // over the distinct vocab; nothing touches raw doc rows twice.
    "feat_hash_buckets" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.documents(s, d)
          .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .distinct()
          .withColumn("bucket", pmod(md5Long(col("tok")), lit(1024)))
          .groupBy("bucket").agg(count(lit(1)).as("n_toks"))
        g.agg(count(lit(1)).as("n_buckets_used"),
              sum("n_toks").as("n_tokens"),
              max("n_toks").as("max_bucket"),
              sum(when(col("n_toks") > 1, col("n_toks") - 1).otherwise(0L))
                .as("n_collided"))
          .select(col("n_tokens"), col("n_buckets_used"), col("max_bucket"),
            col("n_collided"),
            round(col("n_collided") / col("n_tokens").cast("double"), 6)
              .as("collision_rate"))
      },
      Some("""WITH v AS (SELECT DISTINCT unnest(
             |             regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |           FROM documents),
             |g AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
             |             CAST(count(*) AS BIGINT) AS n_toks
             |      FROM v GROUP BY 1)
             |SELECT CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             |       CAST(count(*) AS BIGINT) AS n_buckets_used,
             |       CAST(max(n_toks) AS BIGINT) AS max_bucket,
             |       CAST(sum(CASE WHEN n_toks > 1 THEN n_toks - 1 ELSE 0 END) AS BIGINT) AS n_collided,
             |       round(sum(CASE WHEN n_toks > 1 THEN n_toks - 1 ELSE 0 END)
             |             / CAST(sum(n_toks) AS DOUBLE), 6) AS collision_rate
             |FROM g""".stripMargin)),

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

    // time-based train/test split with leakage audit: events before
    // the calendar midpoint train, after test — and the number the
    // split REALLY hinges on: what share of test users was seen in
    // training (temporal splits leak identity even when rows don't
    // overlap). One fact pass + two per-side distinct-user sets.
    "samp_time_split" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
          .localCheckpoint(eager = false) // bounds + both sides
        val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
        val tagged = ev.crossJoin(broadcast(bounds))
          .withColumn("test", (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
        val users = tagged.select(col("user_id"), col("test")).distinct()
          .groupBy("user_id")
          .agg(max(when(col("test") === 0, 1L).otherwise(0L)).as("in_train"),
               max(when(col("test") === 1, 1L).otherwise(0L)).as("in_test"))
        val rows = tagged.agg(
          sum(lit(1L) - col("test")).as("n_train_rows"),
          sum(col("test")).as("n_test_rows"))
        val u = users.agg(
          sum("in_train").as("n_train_users"),
          sum("in_test").as("n_test_users"),
          sum(col("in_train") * col("in_test")).as("n_seen_users"))
        rows.crossJoin(u)
          .select(col("n_train_rows"), col("n_test_rows"),
            col("n_train_users"), col("n_test_users"), col("n_seen_users"),
            when(col("n_test_users") > 0,
              round(col("n_seen_users") / col("n_test_users").cast("double"), 4))
              .otherwise(lit(null).cast("double")).as("leakage_rate"))
      },
      Some("""WITH ev AS (SELECT user_id, ts // 86400000000000 AS day FROM events),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |tg AS (SELECT user_id,
             |              CASE WHEN day >= (mn + mx + 1) // 2 THEN 1 ELSE 0 END AS test
             |       FROM ev, b),
             |rows_ AS (SELECT CAST(sum(1 - test) AS BIGINT) AS n_train_rows,
             |                 CAST(sum(test) AS BIGINT) AS n_test_rows
             |          FROM tg),
             |us AS (SELECT user_id,
             |              max(CASE WHEN test = 0 THEN 1 ELSE 0 END) AS in_train,
             |              max(CASE WHEN test = 1 THEN 1 ELSE 0 END) AS in_test
             |       FROM (SELECT DISTINCT user_id, test FROM tg) GROUP BY 1),
             |u AS (SELECT CAST(sum(in_train) AS BIGINT) AS n_train_users,
             |             CAST(sum(in_test) AS BIGINT) AS n_test_users,
             |             CAST(sum(in_train * in_test) AS BIGINT) AS n_seen_users
             |      FROM us)
             |SELECT n_train_rows, n_test_rows, n_train_users, n_test_users,
             |       n_seen_users,
             |       CASE WHEN n_test_users > 0
             |            THEN round(n_seen_users / CAST(n_test_users AS DOUBLE), 4)
             |       END AS leakage_rate
             |FROM rows_, u""".stripMargin)))
}
