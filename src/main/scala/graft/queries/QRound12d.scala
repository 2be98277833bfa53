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
private[graft] object QRound12d {


  val round12jQ: Seq[(String, Q)] = Seq(
    // Quality drift along crawl order: mean quality score per doc_id
    // decile — the "is the crawl tail getting worse" monitor that
    // pairs with text_ngram_novelty's content-freshness curve (fresh
    // but junky is a real failure mode the two catch together).
    // Quality is 4dp, so per-doc scores convert to exact integer
    // 1e-4 units and every decile mean is exact-sum arithmetic.
    "text_quality_drift" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val q = graft.text.TextAnalytics.qualityScores(Tables.documents(s, d))
          .select(col("doc_id"),
            round(col("quality") * 1e4, 0).cast("long").as("qu"))
          .localCheckpoint(eager = false) // max + bucket rollup
        val mx = q.agg(max("doc_id").as("mx"))
        q.crossJoin(broadcast(mx))
          .withColumn("bucket", expr("(doc_id * 10) div (mx + 1)"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("qu").cast(dec)).cast("double")
              / count(lit(1)) / 1e4, 4).as("mean_quality"))
          .orderBy("bucket")
      },
      Some {
        val stopList = graft.text.TextAnalytics.Stopwords
          .map(w => s"'$w'").mkString(",")
        s"""WITH q0 AS (
           |  SELECT doc_id,
           |         CAST(round(round((least(n_tok, 100) / 100.0) *
           |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
           |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4)
           |             * 1e4) AS BIGINT) AS qu
           |  FROM (
           |    SELECT doc_id, length(text) AS n_chars,
           |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
           |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
           |               t -> t IN ($stopList))) AS stop_cnt,
           |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
           |    FROM documents)),
           |mx AS (SELECT max(doc_id) AS mx FROM q0)
           |SELECT (doc_id * 10) // (mx + 1) AS bucket,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       round(CAST(sum(qu) AS DOUBLE) / count(*) / 1e4, 4) AS mean_quality
           |FROM q0, mx GROUP BY 1 ORDER BY bucket""".stripMargin
      }),

    // Bloom-filter sizing table for the incremental-dedup screen
    // (dedup_bloom_incremental's m is currently a constant): for the
    // corpus' ACTUAL distinct-content-hash count, the k = b·ln2
    // optimum and FPR = (1 − e^(−k/b))^k at 8/12/16/20 bits per key,
    // with the memory bill — the ops table that picks the next
    // rebuild's m. One distinct-count; the rest is 4-row arithmetic.
    "dedup_bloom_sizing" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val n = Tables.documents(s, d)
          .select(md5Long(col("text")).as("h")).distinct()
          .agg(count(lit(1)).as("n_keys"))
        n.withColumn("bits", explode(array(lit(8L), lit(12L), lit(16L), lit(20L))))
          .withColumn("k_hashes",
            round(col("bits") * 0.6931471805599453, 0).cast("long"))
          .withColumn("fpr", round(
            pow(lit(1.0) - exp(-col("k_hashes").cast("double") / col("bits")),
              col("k_hashes").cast("double")), 6))
          .withColumn("memory_mb",
            round(col("n_keys") * col("bits") / 8.0 / 1e6, 2))
          .select(col("bits").as("bits_per_key"), col("k_hashes"),
            col("fpr"), col("memory_mb"), col("n_keys"))
          .orderBy("bits_per_key")
      },
      Some("""WITH n AS (
             |  SELECT CAST(count(DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT)
             |              AS BIGINT) AS n_keys
             |  FROM documents),
             |b AS (SELECT CAST(unnest([8, 12, 16, 20]) AS BIGINT) AS bits),
             |r AS (
             |  SELECT bits, CAST(round(bits * 0.6931471805599453) AS BIGINT) AS k_hashes,
             |         n_keys
             |  FROM n, b)
             |SELECT bits AS bits_per_key, k_hashes,
             |       round(pow(1.0 - exp(-CAST(k_hashes AS DOUBLE) / bits),
             |             CAST(k_hashes AS DOUBLE)), 6) AS fpr,
             |       round(n_keys * bits / 8.0 / 1e6, 2) AS memory_mb,
             |       n_keys
             |FROM r ORDER BY bits_per_key""".stripMargin)),

    // Attribution-window sensitivity: last-touch click credit per
    // campaign at 1h / 6h / 24h lookbacks from ONE 24h bucketed range
    // join (the narrower windows are conditional struct-maxes over
    // the same pairs — no second join, no second shuffle). If credit
    // shares swing with the window, the attribution model — not the
    // campaign — is driving the numbers.
    "ev_attribution_windows" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts DIV 1000").as("ats"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ats").as("cts"),
            col("event_id").as("cid"),
            coalesce(pmod(col("k"), lit(10)), lit(-1L)).as("campaign"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            (col("ats") - lit(86400000000L)).as("st"),
            (col("ats") - 1).as("en"), col("ats").as("pts"))
        val pairs = graft.ops.Joins.rangeJoinBucketed(
            clicks, purch, Seq("user_id"), "cts", "st", "en", 86400000000L)
          .withColumn("delta", col("pts") - col("cts"))
        def credit(windowUs: Long) =
          max(when(col("delta") <= windowUs,
            struct(col("cts"), col("cid"), col("campaign"))))
        val byPid = pairs.groupBy("pid")
          .agg(credit(3600000000L).as("w1"),
            credit(21600000000L).as("w6"),
            credit(86400000000L).as("w24"))
        Seq((1L, "w1"), (6L, "w6"), (24L, "w24")).map { case (h, c) =>
          byPid.filter(col(c).isNotNull)
            .groupBy(col(c).getField("campaign").as("campaign"))
            .agg(count(lit(1)).as("n_credits"))
            .select(lit(h).as("window_h"), col("campaign"), col("n_credits"))
        }.reduce(_ unionAll _).orderBy("window_h", "campaign")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type, ts // 1000 AS ats,
             |         json_extract_string(props, '$.k')::BIGINT AS k
             |  FROM events),
             |c AS (SELECT user_id, ats AS cts, event_id AS cid,
             |             coalesce(((k % 10) + 10) % 10, -1) AS campaign
             |      FROM ev WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id AS pid, ats AS pts
             |      FROM ev WHERE event_type = 'purchase'),
             |pr AS (SELECT pid, cts, cid, campaign, pts - cts AS delta
             |       FROM c JOIN p ON c.user_id = p.user_id
             |        AND cts BETWEEN pts - 86400000000 AND pts - 1),
             |w AS (SELECT CAST(unnest([1, 6, 24]) AS BIGINT) AS window_h),
             |rk AS (
             |  SELECT w.window_h, pr.pid, pr.campaign,
             |         row_number() OVER (PARTITION BY w.window_h, pr.pid
             |           ORDER BY pr.cts DESC, pr.cid DESC) AS rn
             |  FROM pr CROSS JOIN w
             |  WHERE pr.delta <= w.window_h * 3600000000)
             |SELECT window_h, campaign, CAST(count(*) AS BIGINT) AS n_credits
             |FROM rk WHERE rn = 1
             |GROUP BY window_h, campaign
             |ORDER BY window_h, campaign""".stripMargin)))

  val round12kQ: Seq[(String, Q)] = Seq(
    // Poisson-bootstrap CI of the ARM DIFFERENCE in mean purchase
    // value — stat_bootstrap intervals one mean; experiments ship on
    // the difference, whose bootstrap must resample both arms
    // TOGETHER (same ×32 map-side replicate fan-out, conditional
    // per-arm sums inside each replicate). significant = the interval
    // excludes 0.
    "samp_bootstrap_diff" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .filter(col("event_type") === "purchase")
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
        val u = (pmod(md5Long(concat(lit("bd:"),
            col("event_id").cast("string"), lit(":"), col("b").cast("string"))),
            lit(1000000)).cast("double") + 0.5) / 1000000.0
        val w = when(u < 0.367879, 0).when(u < 0.735759, 1)
          .when(u < 0.919699, 2).when(u < 0.981012, 3)
          .when(u < 0.996340, 4).when(u < 0.999406, 5).otherwise(6)
        val reps = ev
          .withColumn("b", explode(sequence(lit(0L), lit(31L))))
          .withColumn("w", w.cast("double"))
          .groupBy("b")
          .agg(
            sum(when(col("arm") === 1, col("w") * col("value"))
              .otherwise(0.0)).as("svt"),
            sum(when(col("arm") === 1, col("w")).otherwise(0.0)).as("swt"),
            sum(when(col("arm") === 0, col("w") * col("value"))
              .otherwise(0.0)).as("svc"),
            sum(when(col("arm") === 0, col("w")).otherwise(0.0)).as("swc"))
          .filter(col("swt") > 0 && col("swc") > 0)
          .select(round(col("svt") / col("swt")
            - col("svc") / col("swc"), 6).as("db"))
        val obs = ev.agg(
          round(avg(when(col("arm") === 1, col("value"))), 6).as("mt"),
          round(avg(when(col("arm") === 0, col("value"))), 6).as("mc"))
          .select(round(col("mt") - col("mc"), 6).as("obs_diff"))
        obs.crossJoin(broadcast(reps.agg(
            expr("percentile(db, array(0.025D, 0.975D))").as("ps"))))
          .select(col("obs_diff"),
            round(element_at(col("ps"), 1), 4).as("ci_lo"),
            round(element_at(col("ps"), 2), 4).as("ci_hi"))
          .withColumn("significant",
            (col("ci_lo") > 0.0 || col("ci_hi") < 0.0).cast("long"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, value,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value)
             |    AND event_type = 'purchase'),
             |reps AS (
             |  SELECT b, arm, value,
             |    CASE WHEN u < 0.367879 THEN 0 WHEN u < 0.735759 THEN 1
             |         WHEN u < 0.919699 THEN 2 WHEN u < 0.981012 THEN 3
             |         WHEN u < 0.996340 THEN 4 WHEN u < 0.999406 THEN 5
             |         ELSE 6 END AS w
             |  FROM (SELECT event_id, value, arm, CAST(b AS BIGINT) AS b,
             |          ((('0x' || substr(md5('bd:' || CAST(event_id AS VARCHAR)
             |            || ':' || CAST(b AS VARCHAR)), 1, 15))::BIGINT % 1000000)
             |           + 0.5) / 1000000.0 AS u
             |        FROM ev, unnest(generate_series(0, 31)) AS t(b))),
             |db AS (
             |  SELECT round(sum(CASE WHEN arm = 1 THEN w * value ELSE 0 END)
             |           / sum(CASE WHEN arm = 1 THEN w ELSE 0 END)
             |         - sum(CASE WHEN arm = 0 THEN w * value ELSE 0 END)
             |           / sum(CASE WHEN arm = 0 THEN w ELSE 0 END), 6) AS db
             |  FROM reps GROUP BY b
             |  HAVING sum(CASE WHEN arm = 1 THEN w ELSE 0 END) > 0
             |     AND sum(CASE WHEN arm = 0 THEN w ELSE 0 END) > 0),
             |o AS (SELECT round(round(avg(CASE WHEN arm = 1 THEN value END), 6)
             |             - round(avg(CASE WHEN arm = 0 THEN value END), 6), 6)
             |        AS obs_diff
             |      FROM ev),
             |ci AS (SELECT round(quantile_cont(db, 0.025), 4) AS ci_lo,
             |              round(quantile_cont(db, 0.975), 4) AS ci_hi
             |       FROM db)
             |SELECT obs_diff, ci_lo, ci_hi,
             |       CAST(ci_lo > 0.0 OR ci_hi < 0.0 AS BIGINT) AS significant
             |FROM o, ci""".stripMargin)),

    // IVF scan-fraction curve: corpus share scanned at nprobe 1..4
    // under the serving assignment — the COST axis
    // ann_ivf_recall_curve's recall axis trades against; together
    // they are the efficiency frontier that picks nprobe. Cell sizes
    // and probe ranks are ≤|cells| rows each; the curve is a
    // conditional join-aggregate, no window over anything unbounded.
    "ann_scan_fraction" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val wv = Window.partitionBy("vec_id")
          .orderBy(col("sc").desc, col("cid"))
        val sizes = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("cid"),
            score(col("embedding"), col("cv")).as("sc"))
          .withColumn("rn", row_number().over(wv)).filter(col("rn") === 1)
          .groupBy("cid").agg(count(lit(1)).as("sz"))
        val q = emb.filter(col("vec_id") === 42)
          .select(col("embedding").as("qv"))
        val probes = cents.crossJoin(broadcast(q))
          .select(col("cid"), score(col("cv"), col("qv")).as("sc"))
          .withColumn("prnk", row_number().over(
            Window.orderBy(col("sc").desc, col("cid"))))
        val tot = sizes.agg(sum("sz").as("nn"))
        probes.join(sizes, "cid")
          .withColumn("np", explode(array((1 to 4).map(i => lit(i.toLong)): _*)))
          .groupBy("np")
          .agg(sum(when(col("prnk") <= col("np"), col("sz")).otherwise(0L))
            .as("n_scanned"))
          .crossJoin(broadcast(tot))
          .select(col("np").as("nprobe"), col("n_scanned"),
            round(col("n_scanned") / col("nn").cast("double"), 4)
              .as("scan_share"))
          .orderBy("nprobe")
      },
      Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             |               FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT e.vec_id, c.cid,
             |         row_number() OVER (PARTITION BY e.vec_id
             |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
             |  FROM embeddings e, cents c),
             |sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz
             |          FROM scored WHERE rn = 1 GROUP BY cid),
             |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42),
             |probes AS (
             |  SELECT cid,
             |         row_number() OVER (ORDER BY
             |           round(list_cosine_similarity(c.cv, q.qv), 6) + 0.0 DESC,
             |           cid) AS prnk
             |  FROM cents c, q),
             |tot AS (SELECT sum(sz) AS nn FROM sizes),
             |np AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS np)
             |SELECT np.np AS nprobe,
             |       CAST(sum(CASE WHEN p.prnk <= np.np THEN s.sz ELSE 0 END)
             |            AS BIGINT) AS n_scanned,
             |       round(sum(CASE WHEN p.prnk <= np.np THEN s.sz ELSE 0 END)
             |             / CAST(any_value(tot.nn) AS DOUBLE), 4) AS scan_share
             |FROM probes p JOIN sizes s USING (cid), np, tot
             |GROUP BY np.np ORDER BY nprobe""".stripMargin)),

    // recall@10 of the int4 (15-level) round-trip vs exact search —
    // the other end of vec_quant_recall's int8 gate: together with
    // vec_code_entropy's bits-actually-used audit, the evidence for
    // the 8→4-bit storage decision. Same 6dp-pinned scores and
    // vec_id tie-breaks.
    "vec_int4_recall" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
        val deq = emb
          .crossJoin(broadcast(graft.ann.Quant.params(emb)))
          .withColumn("dq", transform(col("embedding"), (x, i) => {
            val p = element_at(col("pp"), i + lit(1))
            val mn = p.getField("mn"); val mx = p.getField("mx")
            when(mx === mn, mn)
              .otherwise(mn + round((x.cast("double") - mn) / (mx - mn) * 15.0, 0)
                * (mx - mn) / 15.0)
          }))
          .select(col("vec_id"), col("dq"))
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
          .select(col("qid"), col("vec_id"), score(col("dq"), col("qv")).as("sc"))
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
             |               ELSE mn + round((x::DOUBLE - mn) / (mx - mn) * 15.0)
             |                    * (mx - mn) / 15.0 END ORDER BY i) AS r
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

    // Precision/recall/F1 of the quality→is-English classifier at the
    // median-quality operating point — the confusion-matrix readout
    // that operationalizes stat_roc_auc (ranking) and stat_youden
    // (threshold choice): what you actually get if you ship the cut.
    // Exact integer cells; the cut is one 6dp-pinned type-7 median.
    "stat_prf1" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val t = graft.text.TextAnalytics.qualityScores(docs).drop("n_tok")
          .join(docs.select("doc_id", "lang"), "doc_id")
          .select(col("quality"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          .localCheckpoint(eager = false) // cut + the confusion pass
        val cut = t.agg(round(expr("percentile(quality, 0.5D)"), 6).as("cut"))
        t.crossJoin(broadcast(cut))
          .withColumn("pred", (col("quality") >= col("cut")).cast("long"))
          .agg(first("cut").as("threshold"),
            sum(when(col("g") === 1 && col("pred") === 1, 1L).otherwise(0L))
              .as("tp"),
            sum(when(col("g") === 0 && col("pred") === 1, 1L).otherwise(0L))
              .as("fp"),
            sum(when(col("g") === 1 && col("pred") === 0, 1L).otherwise(0L))
              .as("fn"),
            sum(when(col("g") === 0 && col("pred") === 0, 1L).otherwise(0L))
              .as("tn"))
          .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
            round(col("tp") / (col("tp") + col("fp")).cast("double"), 4)
              .as("precision"),
            round(col("tp") / (col("tp") + col("fn")).cast("double"), 4)
              .as("recall"))
          .withColumn("f1", round(lit(2.0) * col("precision") * col("recall")
            / (col("precision") + col("recall")), 4))
      },
      Some {
        val stopList = graft.text.TextAnalytics.Stopwords
          .map(w => s"'$w'").mkString(",")
        s"""WITH q0 AS (
           |  SELECT round((least(n_tok, 100) / 100.0) *
           |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
           |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality,
           |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
           |  FROM (
           |    SELECT lang, length(text) AS n_chars,
           |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
           |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
           |               t -> t IN ($stopList))) AS stop_cnt,
           |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
           |    FROM documents)),
           |c AS (SELECT round(quantile_cont(quality, 0.5), 6) AS cut FROM q0),
           |m AS (
           |  SELECT any_value(cut) AS threshold,
           |         CAST(sum(CASE WHEN g = 1 AND quality >= cut THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |         CAST(sum(CASE WHEN g = 0 AND quality >= cut THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |         CAST(sum(CASE WHEN g = 1 AND quality < cut THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |         CAST(sum(CASE WHEN g = 0 AND quality < cut THEN 1 ELSE 0 END) AS BIGINT) AS tn
           |  FROM q0, c),
           |pr AS (
           |  SELECT threshold, tp, fp, fn, tn,
           |         round(tp / CAST(tp + fp AS DOUBLE), 4) AS precision,
           |         round(tp / CAST(tp + fn AS DOUBLE), 4) AS recall
           |  FROM m)
           |SELECT threshold, tp, fp, fn, tn, precision, recall,
           |       round(2.0 * precision * recall / (precision + recall), 4) AS f1
           |FROM pr""".stripMargin
      }),

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

    // Top-5 most-correlated embedding dimension pairs off the
    // Gramian's 7dp-pinned covariance cells (ONE aggregate pass, the
    // emb_top_eigen kernel; pair scan is d²/2 driver-side) —
    // correlated dimensions are redundant bits that PCA/Matryoshka
    // truncation would reclaim; the pairwise view behind
    // emb_participation_ratio's one-number summary.
    "emb_dim_corr" -> Q(
      (s, d) => {
        import graft.embed.CovMoments._
        import s.implicits._
        val cv = covCells(moments(Tables.embeddings(s, d)))
        val dim = cv.length
        val pairs = for {
          a <- 0 until dim; b <- (a + 1) until dim
          if cv(a)(a) > 0 && cv(b)(b) > 0
        } yield (a.toLong, b.toLong,
          r(cv(a)(b) / math.sqrt(cv(a)(a) * cv(b)(b)), 4))
        pairs.sortBy { case (a, b, c) => (-math.abs(c), a, b) }.take(5)
          .toDF("dim_a", "dim_b", "corr")
      },
      Some("""WITH px AS (SELECT vec_id,
             |              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS a,
             |              CAST(unnest(embedding) AS DOUBLE) AS xa
             |            FROM embeddings WHERE embedding IS NOT NULL),
             |cells AS MATERIALIZED (
             |  SELECT p.a, q.a AS b,
             |         round(sum(p.xa * q.xa) / count(*) -
             |               (sum(p.xa) / count(*)) * (sum(q.xa) / count(*)), 7) AS cv
             |  FROM px p JOIN px q ON p.vec_id = q.vec_id
             |  GROUP BY 1, 2),
             |vr AS (SELECT a, cv AS v FROM cells WHERE a = b),
             |co AS (
             |  SELECT c.a AS dim_a, c.b AS dim_b,
             |         round(c.cv / sqrt(va.v * vb.v), 4) AS corr
             |  FROM cells c JOIN vr va ON va.a = c.a JOIN vr vb ON vb.a = c.b
             |  WHERE c.a < c.b AND va.v > 0 AND vb.v > 0)
             |SELECT dim_a, dim_b, corr FROM co
             |ORDER BY abs(corr) DESC, dim_a, dim_b LIMIT 5""".stripMargin)),

    // Percentile-clipped int8 quantization vs plain min/max: clipping
    // each dimension's range at p01/p99 before coding spends the 256
    // levels on the mass instead of two outliers — the standard
    // production trick, measured here as round-trip cosine fidelity
    // side by side (clip wins whenever tails are heavy). Cutoffs are
    // one 6dp-pinned type-7 percentile pass per dim, broadcast as a
    // sorted struct array (the Quant.params idiom); codes are exact
    // integers and both reconstructions share the same pinned params.
    "vec_clipped_quant" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
        val cuts = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy("i")
          .agg(round(expr("percentile(CAST(x AS DOUBLE), 0.01D)"), 6).as("lo"),
            round(expr("percentile(CAST(x AS DOUBLE), 0.99D)"), 6).as("hi"),
            round(min(col("x").cast("double")), 6).as("mn"),
            round(max(col("x").cast("double")), 6).as("mx"))
          .agg(transform(
            sort_array(collect_list(struct(col("i"), col("lo"), col("hi"),
              col("mn"), col("mx")))),
            e => struct(e.getField("lo").as("lo"), e.getField("hi").as("hi"),
              e.getField("mn").as("mn"), e.getField("mx").as("mx"))).as("pp"))
        def roundTrip(loF: String, hiF: String) =
          transform(col("embedding"), (x, i) => {
            val p = element_at(col("pp"), i + lit(1))
            val lo = p.getField(loF); val hi = p.getField(hiF)
            val clipped = least(greatest(x.cast("double"), lo), hi)
            when(hi === lo, lo)
              .otherwise(lo + round((clipped - lo) / (hi - lo) * 255.0, 0)
                * (hi - lo) / 255.0)
          })
        emb.crossJoin(broadcast(cuts))
          .select(
            score(col("embedding"), roundTrip("lo", "hi")).as("fc"),
            score(col("embedding"), roundTrip("mn", "mx")).as("fp"))
          .agg(count(lit(1)).as("n_vectors"),
            round(avg("fc"), 4).as("avg_fid_clipped"),
            round(min("fc"), 4).as("min_fid_clipped"),
            round(avg("fp"), 4).as("avg_fid_plain"),
            round(min("fp"), 4).as("min_fid_plain"))
      },
      Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |                     CAST(unnest(embedding) AS DOUBLE) AS x
             |              FROM embeddings),
             |p AS (SELECT i, round(quantile_cont(x, 0.01), 6) AS lo,
             |             round(quantile_cont(x, 0.99), 6) AS hi,
             |             round(min(x), 6) AS mn, round(max(x), 6) AS mx
             |      FROM dims GROUP BY i),
             |rt AS (
             |  SELECT vec_id,
             |         list(CASE WHEN hi = lo THEN lo
             |              ELSE lo + round((least(greatest(x, lo), hi) - lo)
             |                   / (hi - lo) * 255.0) * (hi - lo) / 255.0
             |              END ORDER BY i) AS rc,
             |         list(CASE WHEN mx = mn THEN mn
             |              ELSE mn + round((least(greatest(x, mn), mx) - mn)
             |                   / (mx - mn) * 255.0) * (mx - mn) / 255.0
             |              END ORDER BY i) AS rp
             |  FROM dims JOIN p USING (i) GROUP BY vec_id),
             |f AS (
             |  SELECT round(list_cosine_similarity(e.embedding::DOUBLE[], rt.rc), 6) + 0.0 AS fc,
             |         round(list_cosine_similarity(e.embedding::DOUBLE[], rt.rp), 6) + 0.0 AS fp
             |  FROM embeddings e JOIN rt USING (vec_id))
             |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
             |       round(avg(fc), 4) AS avg_fid_clipped,
             |       round(min(fc), 4) AS min_fid_clipped,
             |       round(avg(fp), 4) AS avg_fid_plain,
             |       round(min(fp), 4) AS min_fid_plain
             |FROM f""".stripMargin)),

    // Missingness profile of the value column by event type: null and
    // NaN rates per type plus each type's share of all missing values
    // — MCAR-vs-systematic is the first question before imputing
    // (ts_locf) or filtering; a type owning most of the missingness
    // means the pipeline, not the users, drops it. One conditional
    // pass, exact integers.
    "stat_missingness" -> Q(
      (s, d) => {
        val g = Tables.events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
            sum(when(col("value").isNotNull && isnan(col("value")), 1L)
              .otherwise(0L)).as("n_nan"))
          .localCheckpoint(eager = false) // totals + per-type rows
        val tot = g.agg(sum(col("n_null") + col("n_nan")).as("tm"))
        g.crossJoin(broadcast(tot))
          .select(col("event_type"), col("n"),
            round((col("n_null") + col("n_nan")) / col("n").cast("double"), 4)
              .as("missing_rate"),
            when(col("tm") > 0,
              round((col("n_null") + col("n_nan")) / col("tm").cast("double"), 4))
              .as("share_of_missing"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |         CAST(sum(CASE WHEN value IS NOT NULL AND isnan(value)
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_nan
             |  FROM events GROUP BY event_type),
             |t AS (SELECT sum(n_null + n_nan) AS tm FROM g)
             |SELECT event_type, n,
             |       round((n_null + n_nan) / CAST(n AS DOUBLE), 4) AS missing_rate,
             |       CASE WHEN tm > 0 THEN
             |         round((n_null + n_nan) / CAST(tm AS DOUBLE), 4) END
             |         AS share_of_missing
             |FROM g, t ORDER BY event_type""".stripMargin)),

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

    // Curation shortlist: the 10 vectors farthest from their own
    // label's centroid (6dp-pinned per-dim means, squared-L2 via the
    // codegen'd fold) — mislabeled or corrupted embeddings surface
    // here first; the per-ITEM actionable view behind
    // emb_label_cohesion's per-label average. Centroids broadcast;
    // the top-10 is a TakeOrdered, never a global sort.
    "emb_outliers" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.sqDist
        val emb = Tables.embeddings(s, d)
        val cent = emb.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy("label", "i")
          .agg(round(avg(col("x").cast("double")), 6).as("m"))
          .groupBy("label")
          .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
            e => e.getField("m")).as("cent"))
        emb.join(broadcast(cent), "label")
          .select(col("vec_id"), col("label"),
            round(sqDist(col("embedding"), col("cent")), 6).as("dist"))
          .orderBy(col("dist").desc, col("vec_id")).limit(10)
      },
      Some("""WITH dims AS (SELECT vec_id, label,
             |                     generate_subscripts(embedding, 1) AS i,
             |                     CAST(unnest(embedding) AS DOUBLE) AS x
             |              FROM embeddings),
             |cent AS (SELECT label, i, round(avg(x), 6) AS m
             |         FROM dims GROUP BY label, i),
             |dist AS (
             |  SELECT d.vec_id, d.label,
             |         round(sum((d.x - c.m) * (d.x - c.m)), 6) AS dist
             |  FROM dims d JOIN cent c ON c.label = d.label AND c.i = d.i
             |  GROUP BY d.vec_id, d.label)
             |SELECT vec_id, label, dist FROM dist
             |ORDER BY dist DESC, vec_id LIMIT 10""".stripMargin)),

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

    // Stub-luma image entropy (16×16 grid, 16 gray levels): the
    // flat/blank-image complexity filter an image-curation pass runs
    // before spending decode + encoder FLOPs — low-entropy grids are
    // solid colors and gradients. Decode stays stubbed (scope rule);
    // the histogram/entropy plumbing is real: exact level counts into
    // micro-unit-pinned c·ln c terms per image.
    "mm_image_entropy" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val lv = Tables.documents(s, d)
          .filter(col("doc_id") < 60)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), lit(255L))).as("i"))
          .select(col("doc_id"),
            ((md5Long(concat(col("text"), lit(":epx"), col("i").cast("string")))
              % 256) / lit(16)).cast("long").as("lvl"))
          .groupBy("doc_id", "lvl").agg(count(lit(1)).as("c"))
        lv.groupBy("doc_id")
          .agg(count(lit(1)).as("n_levels"),
            sum(round(col("c") * log(col("c").cast("double")) * 1e6, 0)
              .cast(dec)).as("sclc"))
          .select(col("doc_id"), col("n_levels"),
            round((log(lit(256.0))
              - col("sclc").cast("double") / 1e6 / 256.0) / log(lit(2.0)), 4)
              .as("entropy_bits"))
          .orderBy("doc_id")
      },
      Some("""WITH px AS (
             |  SELECT doc_id,
             |         (('0x' || substr(md5(text || ':epx' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
             |          % 256) // 16 AS lvl
             |  FROM documents, unnest(generate_series(0, 255)) AS t(i)
             |  WHERE doc_id < 60),
             |c AS (SELECT doc_id, lvl, CAST(count(*) AS BIGINT) AS c
             |      FROM px GROUP BY doc_id, lvl)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_levels,
             |       round((ln(256.0)
             |              - CAST(sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1e6)
             |                    AS BIGINT)) AS DOUBLE) / 1e6 / 256.0)
             |             / ln(2.0), 4) AS entropy_bits
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Paired t-test of per-user view vs click counts — the
    // WITHIN-subject mean comparison stat_welch_ttest's independent
    // groups can't do (user-level pairing removes the between-user
    // variance that dominates activity data; stat_sign_test is the
    // rank-free cousin). Differences are exact integers, so every
    // moment is an exact sum; statistic-only t like stat_bartlett.
    "stat_paired_t" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "view", 1L).otherwise(0L))
            - sum(when(col("event_type") === "click", 1L).otherwise(0L)))
            .as("dd"))
        u.agg(count(lit(1)).as("n"),
            sum(col("dd").cast(dec)).as("s1"),
            sum((col("dd") * col("dd")).cast(dec)).as("s2"))
          .filter(col("n") > 1)
          .select(col("n").as("n_users"),
            round(col("s1").cast("double") / col("n"), 4).as("mean_diff"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")
              / (col("n").cast("double") * (col("n") - 1))), 6).as("sd_diff"))
          .withColumn("t_stat",
            when(col("sd_diff") > 0, round(col("mean_diff")
              / (col("sd_diff") / sqrt(col("n_users").cast("double"))), 4)))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |           - sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS dd
             |  FROM events GROUP BY user_id),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(dd) AS s1,
             |             sum(dd * dd) AS s2
             |      FROM u),
             |m AS (
             |  SELECT n AS n_users,
             |         round(CAST(s1 AS DOUBLE) / n, 4) AS mean_diff,
             |         round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
             |               / (CAST(n AS DOUBLE) * (n - 1))), 6) AS sd_diff
             |  FROM a WHERE n > 1)
             |SELECT n_users, mean_diff, sd_diff,
             |       CASE WHEN sd_diff > 0 THEN
             |         round(mean_diff / (sd_diff / sqrt(CAST(n_users AS DOUBLE))), 4)
             |       END AS t_stat
             |FROM m""".stripMargin)),

    // Classification-margin profile: distance to own-label centroid
    // vs the NEAREST other centroid, per label — negative margins are
    // the confusable items emb_silhouette averages away; the margin
    // histogram is what picks a nearest-centroid classifier's
    // abstention threshold. Centroids 6dp-pinned and broadcast twice
    // (own + all-other argmin); one corpus pass.
    "emb_margin" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.sqDist
        val emb = Tables.embeddings(s, d)
        val cent = emb.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy("label", "i")
          .agg(round(avg(col("x").cast("double")), 6).as("m"))
          .groupBy("label")
          .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
            e => e.getField("m")).as("cent"))
          .localCheckpoint(eager = false) // own join + other argmin
        val own = emb.join(broadcast(cent), "label")
          .select(col("vec_id"), col("label"),
            round(sqDist(col("embedding"), col("cent")), 6).as("d_own"))
        val others = emb.crossJoin(
            broadcast(cent.select(col("label").as("ol"), col("cent"))))
          .filter(col("label") =!= col("ol"))
          .select(col("vec_id"),
            round(sqDist(col("embedding"), col("cent")), 6).as("d"))
          .groupBy("vec_id").agg(min("d").as("d_other"))
        own.join(others, "vec_id")
          .withColumn("margin", round(col("d_other") - col("d_own"), 6))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("margin") < 0, 1L).otherwise(0L)).as("n_negative"),
            round(avg("margin"), 4).as("mean_margin"))
          .withColumn("neg_share",
            round(col("n_negative") / col("n_vecs").cast("double"), 4))
          .orderBy("label")
      },
      Some("""WITH dims AS (SELECT vec_id, label,
             |                     generate_subscripts(embedding, 1) AS i,
             |                     CAST(unnest(embedding) AS DOUBLE) AS x
             |              FROM embeddings),
             |cent AS (SELECT label, i, round(avg(x), 6) AS m
             |         FROM dims GROUP BY label, i),
             |dist AS (
             |  SELECT d.vec_id, d.label, c.label AS cl,
             |         round(sum((d.x - c.m) * (d.x - c.m)), 6) AS dd
             |  FROM dims d JOIN cent c ON c.i = d.i
             |  GROUP BY d.vec_id, d.label, c.label),
             |own AS (SELECT vec_id, label, dd AS d_own FROM dist WHERE label = cl),
             |oth AS (SELECT vec_id, min(dd) AS d_other
             |        FROM dist WHERE label <> cl GROUP BY vec_id),
             |m AS (
             |  SELECT o.label, round(t.d_other - o.d_own, 6) AS margin
             |  FROM own o JOIN oth t USING (vec_id))
             |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             |       CAST(sum(CASE WHEN margin < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_negative,
             |       round(avg(margin), 4) AS mean_margin,
             |       round(sum(CASE WHEN margin < 0 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS neg_share
             |FROM m GROUP BY label ORDER BY label""".stripMargin)),

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
             |FROM p""".stripMargin)))
}
