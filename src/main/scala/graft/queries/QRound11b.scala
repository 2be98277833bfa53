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
private[graft] object QRound11b {


  val round11gQ: Seq[(String, Q)] = Seq(
    // Friedman rank test across the three engagement event types,
    // blocked by user — the nonparametric repeated-measures ANOVA
    // (does a user's per-type spend RANK consistently?). The
    // per-(user,type) statistic is an exact integer (cents sum), so
    // midranks, rank sums, and Q are fully order-invariant — no
    // float rounding anywhere before the final report. Windows are
    // user-partitioned (≤3 rows per block); df = k−1 = 2, so the
    // chi-square survival is the closed form exp(−Q/2).
    "stat_friedman" -> Q(
      (s, d) => {
        val k = 3
        val pt = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view", "purchase"))
          .groupBy("user_id", "event_type")
          .agg(sum(round(coalesce(col("value"), lit(0.0)) * 100, 0)
            .cast("long")).as("v"))
        val complete = pt
          .withColumn("nt", count(lit(1)).over(Window.partitionBy("user_id")))
          .filter(col("nt") === k)
        val ranked = complete.withColumn("rk",
          rank().over(Window.partitionBy("user_id").orderBy("v"))
            + (count(lit(1)).over(Window.partitionBy("user_id", "v")) - 1)
              / 2.0)
        ranked.groupBy("event_type")
          .agg(sum("rk").as("rj"), count(lit(1)).cast("double").as("n"))
          .agg(max("n").as("nb"), sum(col("rj") * col("rj")).as("s2"))
          .withColumn("q", round(lit(12.0) / (col("nb") * k * (k + 1))
            * col("s2") - lit(3.0) * col("nb") * (k + 1), 4))
          .select(col("nb").cast("long").as("n_blocks"),
            col("q").as("q_stat"),
            round(exp(-col("q") / 2), 6).as("p_value"))
      },
      Some("""WITH pt AS (
             |  SELECT user_id, event_type,
             |         CAST(sum(CAST(round(coalesce(value, 0.0) * 100, 0)
             |           AS BIGINT)) AS BIGINT) AS v
             |  FROM events WHERE event_type IN ('click', 'view', 'purchase')
             |  GROUP BY 1, 2),
             |cb AS (SELECT *, count(*) OVER (PARTITION BY user_id) AS nt
             |       FROM pt),
             |rk AS (SELECT event_type,
             |              rank() OVER (PARTITION BY user_id ORDER BY v)
             |              + (count(*) OVER (PARTITION BY user_id, v) - 1)
             |                / 2.0 AS rk
             |       FROM cb WHERE nt = 3),
             |rj AS (SELECT event_type, sum(rk) AS rj,
             |              CAST(count(*) AS DOUBLE) AS n
             |       FROM rk GROUP BY 1),
             |ag AS (SELECT max(n) AS nb, sum(rj * rj) AS s2 FROM rj),
             |q AS (SELECT nb,
             |             round(12.0 / (nb * 3 * 4) * s2 - 3.0 * nb * 4, 4) AS q
             |      FROM ag)
             |SELECT CAST(nb AS BIGINT) AS n_blocks, q AS q_stat,
             |       round(exp(-q / 2), 6) AS p_value
             |FROM q""".stripMargin)),

    // Bartlett's variance-homogeneity test of doc length across
    // languages — the parametric chi-square companion to
    // stat_levene's robust F on the same frame. All inputs are exact
    // integer sums (n, Σx, Σx² of n_chars), so the group variances
    // are bit-identical across engines and merge orders; the one
    // libm ln() per group is absorbed by the final 4dp round.
    // Statistic only (df = k−1 is data-dependent; no hardcoded df).
    "stat_bartlett" -> Q(
      (s, d) => Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("n_chars").cast("long")).cast("double").as("sx"),
          sum(col("n_chars").cast("long") * col("n_chars").cast("long"))
            .cast("double").as("sxx"))
        .filter(col("n") > 1)
        .withColumn("s2",
          (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
        .agg(count(lit(1)).cast("double").as("k"), sum("n").as("nn"),
          sum((col("n") - 1) * log(col("s2"))).as("sl"),
          sum(lit(1.0) / (col("n") - 1)).as("si"),
          sum((col("n") - 1) * col("s2")).as("sp0"))
        .select(col("k").cast("long").as("k_groups"),
          col("nn").cast("long").as("n_total"),
          round(col("sp0") / (col("nn") - col("k")), 4).as("pooled_var"),
          round(((col("nn") - col("k"))
              * log(col("sp0") / (col("nn") - col("k"))) - col("sl"))
            / (lit(1.0) + (col("si") - lit(1.0) / (col("nn") - col("k")))
              / (lit(3.0) * (col("k") - 1))), 4).as("t_stat")),
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |         CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) AS sx,
             |         CAST(sum(CAST(n_chars AS BIGINT)
             |           * CAST(n_chars AS BIGINT)) AS DOUBLE) AS sxx
             |  FROM documents GROUP BY 1),
             |v AS (SELECT lang, n, (sxx - sx * sx / n) / (n - 1) AS s2
             |      FROM g WHERE n > 1),
             |a AS (SELECT CAST(count(*) AS DOUBLE) AS k, sum(n) AS nn,
             |             sum((n - 1) * ln(s2)) AS sl,
             |             sum(1.0 / (n - 1)) AS si,
             |             sum((n - 1) * s2) AS sp0
             |      FROM v)
             |SELECT CAST(k AS BIGINT) AS k_groups,
             |       CAST(nn AS BIGINT) AS n_total,
             |       round(sp0 / (nn - k), 4) AS pooled_var,
             |       round(((nn - k) * ln(sp0 / (nn - k)) - sl)
             |             / (1.0 + (si - 1.0 / (nn - k))
             |               / (3.0 * (k - 1))), 4) AS t_stat
             |FROM a""".stripMargin)),

    // Hodges–Lehmann shift estimator between en and de doc lengths —
    // the robust location-difference companion to stat_mwu's TEST on
    // the same frame: the (lower weighted) median of all pairwise
    // en−de differences, computed from the two value HISTOGRAMS so
    // the cross is |values|², never rows² (the stat_gini bound). All
    // arithmetic is exact integers — fully deterministic. The global
    // cumsum window runs over the bounded distinct-diff grid
    // (WindowGuard-allowlisted).
    "stat_hodges_lehmann" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def hist(lang: String) = docs.filter(col("lang") === lang)
          .groupBy(col("n_chars").cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
        val df0 = hist("en").toDF("va", "ca")
          .crossJoin(hist("de").toDF("vb", "cb"))
          .groupBy((col("va") - col("vb")).as("diff"))
          .agg(sum(col("ca") * col("cb")).as("w"))
        val wc = Window.orderBy("diff")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.orderBy("diff")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df0.withColumn("cum", sum("w").over(wc))
          .withColumn("tot", sum("w").over(wt))
          .agg(max("tot").as("n_pairs"), count(lit(1)).as("n_diffs"),
            min(when(col("cum") * 2 >= col("tot"), col("diff")))
              .as("hl_shift"))
      },
      Some("""WITH ha AS (SELECT CAST(n_chars AS BIGINT) AS v,
             |                   CAST(count(*) AS BIGINT) AS c
             |            FROM documents WHERE lang = 'en' GROUP BY 1),
             |hb AS (SELECT CAST(n_chars AS BIGINT) AS v,
             |              CAST(count(*) AS BIGINT) AS c
             |       FROM documents WHERE lang = 'de' GROUP BY 1),
             |df AS (SELECT a.v - b.v AS diff,
             |              CAST(sum(a.c * b.c) AS BIGINT) AS w
             |       FROM ha a, hb b GROUP BY 1),
             |cw AS (SELECT diff, w,
             |              CAST(sum(w) OVER (ORDER BY diff
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |                AS BIGINT) AS cum,
             |              CAST(sum(w) OVER () AS BIGINT) AS tot
             |       FROM df)
             |SELECT CAST(max(tot) AS BIGINT) AS n_pairs,
             |       CAST(count(*) AS BIGINT) AS n_diffs,
             |       CAST(min(CASE WHEN 2 * cum >= tot THEN diff END)
             |         AS BIGINT) AS hl_shift
             |FROM cw""".stripMargin)),

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
          .localCheckpoint(eager = false) // μ/σ pass + PAA pass
        val st = hc.groupBy("event_type").agg(round(avg("c"), 6).as("mu"))
        val st2 = hc.join(broadcast(st), "event_type")
          .groupBy("event_type")
          .agg(round(sqrt(avg((col("c") - col("mu")) * (col("c") - col("mu")))),
            6).as("sd"), max("mu").as("mu"))
        val sym = hc
          .groupBy(col("event_type"), expr("hr div 24").as("day"),
            expr("(hr % 24) div 4").as("slot"))
          .agg(avg("c").as("pc"))
          .join(broadcast(st2), "event_type")
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

    // Per-token successor entropy for the 20 highest-flow tokens —
    // the branching-factor view of the corpus LM surface (how
    // predictable is the next token after "the"?), complementing
    // text_entropy's doc-level unigram H and text_lm_score's bigram
    // probabilities: H(next|w1) = ln n₁ − Σ c·ln c / n₁ off the
    // bigram counts, exact integers into one libm ln (round-4).
    "text_successor_entropy" -> Q(
      (s, d) => {
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        Tables.documents(s, d)
          .select(explode(zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
          .groupBy("w1")
          .agg(sum("c").as("total"), count(lit(1)).as("n_next"),
            round(log(sum("c").cast("double"))
              - sum(col("c") * log(col("c").cast("double"))) / sum("c"), 4)
              .as("h_next"))
          .orderBy(col("total").desc, col("w1"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
             |  FROM documents),
             |pairs AS (
             |  SELECT t[i] AS w1, t[i + 1] AS w2
             |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
             |        FROM toks WHERE len(t) >= 2)),
             |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
             |       FROM pairs GROUP BY 1, 2)
             |SELECT w1, CAST(sum(c) AS BIGINT) AS total,
             |       CAST(count(*) AS BIGINT) AS n_next,
             |       round(ln(CAST(sum(c) AS DOUBLE))
             |             - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 4)
             |         AS h_next
             |FROM bc GROUP BY 1
             |ORDER BY total DESC, w1 LIMIT 20""".stripMargin)),

    // dHash perceptual near-dup (difference hash): 8×9 stub-decoded
    // luminance grid per image, 64 bits = horizontal-neighbor
    // gradients (px[r,c] < px[r,c+1]) — the gradient-structure
    // complement to mm_image_ahash's global-mean bits, robust to
    // uniform brightness shifts by construction. Same banded
    // pair-join + per-image nearest-neighbor report; the decode is
    // the deterministic md5 stub (no codec runtime in the sandbox),
    // the plumbing — grid fan-out, bit compare, hamming NN — real.
    "mm_image_dhash" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        def px(i: Column) =
          md5Long(concat(col("text"), lit(":dpx"), i.cast("string"))) % 256
        val bits = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 1 && col("doc_id") < 120 &&
                  col("text").isNotNull)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), lit(63L))).as("k"))
          .withColumn("i1", expr("k div 8") * 9 + col("k") % 8)
          .select(col("doc_id"), col("k"),
            (px(col("i1")) < px(col("i1") + 1)).cast("long").as("bit"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val ham = bits.select(col("doc_id").as("da"), col("k"),
            col("bit").as("ba"))
          .join(bits.select(col("doc_id").as("db"), col("k"),
            col("bit").as("bb")), Seq("k"))
          .filter(col("da") =!= col("db"))
          .groupBy("da", "db")
          .agg(sum(abs(col("ba") - col("bb"))).as("hamming"))
        ham.withColumn("rk", row_number().over(
            Window.partitionBy("da").orderBy(col("hamming"), col("db"))))
          .filter(col("rk") === 1)
          .select(col("da").as("doc_id"), col("db").as("nn_doc"),
                  col("hamming").as("nn_hamming"))
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (SELECT doc_id, text FROM documents
             |              WHERE doc_id % 3 = 1 AND doc_id < 120
             |                AND text IS NOT NULL),
             |ks AS (SELECT doc_id, text, CAST(k AS BIGINT) AS k,
             |              (k // 8) * 9 + (k % 8) AS i1
             |       FROM imgs, LATERAL (SELECT unnest(generate_series(0, 63)) AS k)),
             |bits AS (SELECT doc_id, k,
             |           CAST((('0x' || substr(md5(text || ':dpx' || CAST(i1 AS VARCHAR)), 1, 15))::BIGINT % 256)
             |              < (('0x' || substr(md5(text || ':dpx' || CAST(i1 + 1 AS VARCHAR)), 1, 15))::BIGINT % 256)
             |             AS BIGINT) AS bit
             |         FROM ks),
             |ham AS (SELECT a.doc_id AS da, b.doc_id AS db,
             |               CAST(sum(abs(a.bit - b.bit)) AS BIGINT) AS hamming
             |        FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id <> b.doc_id
             |        GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY da
             |                   ORDER BY hamming, db) AS rk
             |       FROM ham)
             |SELECT da AS doc_id, db AS nn_doc, hamming AS nn_hamming
             |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin)))

  val round11hQ: Seq[(String, Q)] = Seq(
    // Tukey HSD post-hoc pairwise comparison of doc length across
    // languages — the parametric studentized-range companion to
    // stat_dunn_test's rank-based post-hoc, off the same exact
    // integer power sums as stat_bartlett (group means and the
    // pooled MSE are bit-identical across engines and merge orders).
    // Statistic per pair; the k(k−1)/2 pair join runs on the
    // ≤|langs|-row aggregate, never on rows.
    "stat_tukey_hsd" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(col("n_chars").cast("long")).cast("double").as("sx"),
            sum(col("n_chars").cast("long") * col("n_chars").cast("long"))
              .cast("double").as("sxx"))
          .filter(col("n") > 1)
          .withColumn("m", col("sx") / col("n"))
          .withColumn("ssw", col("sxx") - col("sx") * col("sx") / col("n"))
          .localCheckpoint(eager = false) // MSE agg + the pair join
        val mse = g.agg((sum("ssw") / (sum("n") - count(lit(1))))
          .as("mse"))
        g.select(col("lang").as("lang_a"), col("n").as("na"),
            col("m").as("ma"))
          .crossJoin(g.select(col("lang").as("lang_b"), col("n").as("nb"),
            col("m").as("mb")))
          .filter(col("lang_a") < col("lang_b"))
          .crossJoin(broadcast(mse))
          .select(col("lang_a"), col("lang_b"),
            round(col("ma") - col("mb"), 4).as("mean_diff"),
            round(abs(col("ma") - col("mb"))
              / sqrt(col("mse") / 2 * (lit(1.0) / col("na")
                + lit(1.0) / col("nb"))), 4).as("q_stat"))
          .orderBy("lang_a", "lang_b")
      },
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |         CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) AS sx,
             |         CAST(sum(CAST(n_chars AS BIGINT)
             |           * CAST(n_chars AS BIGINT)) AS DOUBLE) AS sxx
             |  FROM documents GROUP BY 1),
             |w AS (SELECT lang, n, sx / n AS m,
             |             sxx - sx * sx / n AS ssw
             |      FROM g WHERE n > 1),
             |ms AS (SELECT sum(ssw) / (sum(n) - count(*)) AS mse FROM w)
             |SELECT a.lang AS lang_a, b.lang AS lang_b,
             |       round(a.m - b.m, 4) AS mean_diff,
             |       round(abs(a.m - b.m)
             |             / sqrt(mse / 2 * (1.0 / a.n + 1.0 / b.n)), 4)
             |         AS q_stat
             |FROM w a, w b, ms
             |WHERE a.lang < b.lang
             |ORDER BY lang_a, lang_b""".stripMargin)),

    // Two-sample Cramér–von Mises statistic en vs de doc length —
    // completes the ECDF-distance trio beside samp_ks_test (sup) and
    // stat_ad_test (tail-weighted): T = nm/(n+m)² · Σ c·(F1−F2)² over
    // the merged value grid. ECDFs are exact-integer cumsums over the
    // DISTINCT value histogram (the stat_mwu bound, WindowGuard-
    // allowlisted); one final round absorbs division ulp.
    "stat_cvm" -> Q(
      (s, d) => {
        val h = Tables.documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .groupBy(col("n_chars").cast("long").as("v"))
          .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c1"),
            sum(when(col("lang") === "de", 1L).otherwise(0L)).as("c2"))
        val wc = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        h.withColumn("f1", sum("c1").over(wc))
          .withColumn("f2", sum("c2").over(wc))
          .withColumn("n", sum("c1").over(wt))
          .withColumn("m", sum("c2").over(wt))
          .withColumn("dd", col("f1") / col("n").cast("double")
            - col("f2") / col("m").cast("double"))
          .agg(max("n").as("n"), max("m").as("m"),
            sum((col("c1") + col("c2")).cast("double")
              * col("dd") * col("dd")).as("s"))
          .select(col("n").as("n_en"), col("m").as("n_de"),
            round((col("n") * col("m")).cast("double")
              / ((col("n") + col("m")) * (col("n") + col("m")))
              * col("s"), 6).as("cvm_t"))
      },
      Some("""WITH h AS (
             |  SELECT CAST(n_chars AS BIGINT) AS v,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS c1,
             |         CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS c2
             |  FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
             |e AS (SELECT c1, c2,
             |             CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN
             |               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
             |             CAST(sum(c2) OVER (ORDER BY v ROWS BETWEEN
             |               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2,
             |             CAST(sum(c1) OVER () AS BIGINT) AS n,
             |             CAST(sum(c2) OVER () AS BIGINT) AS m
             |      FROM h),
             |dd AS (SELECT c1, c2, n, m,
             |              f1 / CAST(n AS DOUBLE) - f2 / CAST(m AS DOUBLE) AS dd
             |       FROM e)
             |SELECT CAST(max(n) AS BIGINT) AS n_en,
             |       CAST(max(m) AS BIGINT) AS n_de,
             |       round(CAST(max(n) * max(m) AS DOUBLE)
             |             / ((max(n) + max(m)) * (max(n) + max(m)))
             |             * sum((c1 + c2) * dd * dd), 6) AS cvm_t
             |FROM dd""".stripMargin)),

    // Weighted reciprocity of the event-type transition graph —
    // min(w_ij, w_ji)/Σw_ij over the off-diagonal edges (Squartini
    // et al. 2013's weighted form): do flows come back, or is the
    // journey one-way? Runs on the ≤|types|² shared transition-cell
    // table — zero additional fact scans.
    "graph_reciprocity" -> Q(
      (s, d) => {
        val e = transitionCells(s, d).filter(col("to_type").isNotNull)
          .filter(col("from_type") =!= col("to_type"))
          .select(col("from_type").as("a"), col("to_type").as("b"),
            col("n"))
          .localCheckpoint(eager = false) // both sides of the reverse join
        e.join(e.select(col("a").as("b"), col("b").as("a"),
            col("n").as("nr")), Seq("a", "b"), "left")
          .agg(count(lit(1)).as("n_edges"),
            sum("n").cast("long").as("w_total"),
            sum(least(col("n"), coalesce(col("nr"), lit(0L))))
              .cast("long").as("w_recip"),
            sum(when(col("nr").isNotNull, 1L).otherwise(0L))
              .as("e_recip"))
          .select(col("n_edges"), col("w_total"),
            round(col("w_recip") / col("w_total").cast("double"), 4)
              .as("w_reciprocity"),
            round(col("e_recip") / col("n_edges").cast("double"), 4)
              .as("e_reciprocity"))
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS a,
             |         lead(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS b
             |  FROM events),
             |e AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
             |      FROM tr WHERE b IS NOT NULL AND a <> b GROUP BY 1, 2),
             |j AS (SELECT e.a, e.b, e.n, r.n AS nr
             |      FROM e LEFT JOIN e r ON e.a = r.b AND e.b = r.a)
             |SELECT CAST(count(*) AS BIGINT) AS n_edges,
             |       CAST(sum(n) AS BIGINT) AS w_total,
             |       round(sum(least(n, coalesce(nr, 0)))
             |             / CAST(sum(n) AS DOUBLE), 4) AS w_reciprocity,
             |       round(sum(CASE WHEN nr IS NOT NULL THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS e_reciprocity
             |FROM j""".stripMargin)),

    // Weight-of-evidence encoding of source predicting the English
    // label — the interpretable cousin of feat_target_encode:
    // WOE_s = ln(((pos_s+.5)/pos)/((neg_s+.5)/neg)) with the
    // information-value contribution per source; the standard
    // credit-scoring screen for "which categories carry signal"
    // (here: which sources skew English — the routing signal a
    // lang-targeted training mix keys on). Exact integer counts into
    // one ln per source (round-4); smoothing keeps empty cells finite.
    "feat_woe" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d).groupBy("source")
          .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"),
            sum(when(col("lang") === "en", 0L).otherwise(1L)).as("neg"))
        val tot = g.agg(sum("pos").as("pt"), sum("neg").as("nt"))
        g.crossJoin(broadcast(tot))
          .withColumn("pd", (col("pos") + 0.5) / (col("pt") + 0.5))
          .withColumn("pn", (col("neg") + 0.5) / (col("nt") + 0.5))
          .select(col("source"), col("pos").as("n_en"),
            col("neg").as("n_other"),
            round(log(col("pd") / col("pn")), 4).as("woe"),
            round((col("pd") - col("pn")) * log(col("pd") / col("pn")), 6)
              .as("iv_term"))
          .orderBy("source")
      },
      Some("""WITH g AS (
             |  SELECT source,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS pos,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
             |           AS BIGINT) AS neg
             |  FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(pos) AS BIGINT) AS pt,
             |             CAST(sum(neg) AS BIGINT) AS nt FROM g)
             |SELECT source, pos AS n_en, neg AS n_other,
             |       round(ln(((pos + 0.5) / (pt + 0.5))
             |                / ((neg + 0.5) / (nt + 0.5))), 4) AS woe,
             |       round(((pos + 0.5) / (pt + 0.5) - (neg + 0.5) / (nt + 0.5))
             |             * ln(((pos + 0.5) / (pt + 0.5))
             |                  / ((neg + 0.5) / (nt + 0.5))), 6) AS iv_term
             |FROM g, t ORDER BY source""".stripMargin)),

    // Incremental-processing shard diff: fingerprint the corpus into
    // 16 stable hash shards (the pipe_shard_manifest keying), diff
    // TODAY's manifest against a simulated YESTERDAY (docs with
    // doc_id % 97 ≠ 0 — the deterministic stand-in for the previous
    // snapshot), and report per-shard changed/unchanged — the ledger
    // that lets a 100 TB daily pipeline re-process ONLY the shards
    // whose content hash moved. Fingerprint = Σ md5Long(text) mod p
    // per shard (exact bounded integers, order-invariant).
    "pipe_incremental_shards" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val p = 1000000007L
        def manifest(df: DataFrame) = df
          .withColumn("shard",
            md5Long(concat(lit("shard:"), col("doc_id").cast("string"))) % 16)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(md5Long(col("text")) % p).as("fp"))
        val now = Tables.documents(s, d)
        val prev = now.filter(col("doc_id") % 97 =!= 0)
        manifest(now).toDF("shard", "n_now", "fp_now")
          .join(manifest(prev).toDF("shard", "n_prev", "fp_prev"),
            Seq("shard"), "full_outer")
          .select(col("shard"),
            coalesce(col("n_now"), lit(0L)).as("n_now"),
            coalesce(col("n_prev"), lit(0L)).as("n_prev"),
            (coalesce(col("fp_now"), lit(-1L)) =!=
              coalesce(col("fp_prev"), lit(-1L))).cast("long").as("changed"))
          .orderBy("shard")
      },
      Some("""WITH nowm AS (
             |  SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |           % 16 AS shard,
             |         CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
             |           % 1000000007) AS BIGINT) AS fp
             |  FROM documents GROUP BY 1),
             |prevm AS (
             |  SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |           % 16 AS shard,
             |         CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
             |           % 1000000007) AS BIGINT) AS fp
             |  FROM documents WHERE doc_id % 97 <> 0 GROUP BY 1)
             |SELECT coalesce(n.shard, p.shard) AS shard,
             |       coalesce(n.n_docs, 0) AS n_now,
             |       coalesce(p.n_docs, 0) AS n_prev,
             |       CAST(coalesce(n.fp, -1) <> coalesce(p.fp, -1) AS BIGINT)
             |         AS changed
             |FROM nowm n FULL OUTER JOIN prevm p ON n.shard = p.shard
             |ORDER BY shard""".stripMargin)),

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
             |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin)))

  val round11iQ: Seq[(String, Q)] = Seq(
    // Baron–Kenny / Sobel mediation analysis on the view → click →
    // purchase chain: does clicking MEDIATE the view→purchase
    // relationship? Path a (click ~ view), paths b and c′
    // (purchase ~ click + view, closed-form 2×2 normal equations),
    // Sobel z = ab/√(a²s_b² + b²s_a²). Per-user counts are exact
    // integers, so every Gram sum is order-invariant; the divisions
    // happen once on the 1-row aggregate. The causal-chain companion
    // to ev_ab_test/ev_cuped (experiment effects) and stat_ols_fit.
    "stat_mediation" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("double").as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .cast("double").as("m"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .cast("double").as("y"))
        u.agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("m").as("sm"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx0"),
            sum(col("x") * col("m")).as("sxm0"),
            sum(col("m") * col("m")).as("smm0"),
            sum(col("x") * col("y")).as("sxy0"),
            sum(col("m") * col("y")).as("smy0"),
            sum(col("y") * col("y")).as("syy0"))
          .withColumn("sxx", nullif(col("sxx0") - col("sx") * col("sx") / col("n"), lit(0.0)))
          .withColumn("sxm", col("sxm0") - col("sx") * col("sm") / col("n"))
          .withColumn("smm", col("smm0") - col("sm") * col("sm") / col("n"))
          .withColumn("sxy", col("sxy0") - col("sx") * col("sy") / col("n"))
          .withColumn("smy", col("smy0") - col("sm") * col("sy") / col("n"))
          .withColumn("syy", col("syy0") - col("sy") * col("sy") / col("n"))
          .withColumn("a", col("sxm") / col("sxx"))
          .withColumn("sa2",
            ((col("smm") - col("sxm") * col("sxm") / col("sxx"))
              / (col("n") - 2)) / col("sxx"))
          .withColumn("det",
            nullif(col("smm") * col("sxx") - col("sxm") * col("sxm"),
              lit(0.0)))
          .withColumn("b", (col("smy") * col("sxx")
            - col("sxy") * col("sxm")) / col("det"))
          .withColumn("cp", (col("sxy") * col("smm")
            - col("smy") * col("sxm")) / col("det"))
          .withColumn("sig2", (col("syy") - col("b") * col("smy")
            - col("cp") * col("sxy")) / (col("n") - 3))
          .withColumn("sb2", col("sig2") * col("sxx") / col("det"))
          .select(col("n").cast("long").as("n_users"),
            round(col("a"), 6).as("a_path"),
            round(col("b"), 6).as("b_path"),
            round(col("sxy") / col("sxx"), 6).as("c_total"),
            round(col("cp"), 6).as("c_direct"),
            round(col("a") * col("b"), 6).as("ab_indirect"),
            round(col("a") * col("b")
              / sqrt(col("a") * col("a") * col("sb2")
                + col("b") * col("b") * col("sa2")), 4).as("sobel_z"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE) AS x,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS m,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS sx, sum(m) AS sm, sum(y) AS sy,
             |             sum(x * x) AS sxx0, sum(x * m) AS sxm0,
             |             sum(m * m) AS smm0, sum(x * y) AS sxy0,
             |             sum(m * y) AS smy0, sum(y * y) AS syy0
             |      FROM u),
             |cg AS (SELECT n,
             |              nullif(sxx0 - sx * sx / n, 0.0) AS sxx,
             |              sxm0 - sx * sm / n AS sxm,
             |              smm0 - sm * sm / n AS smm,
             |              sxy0 - sx * sy / n AS sxy,
             |              smy0 - sm * sy / n AS smy,
             |              syy0 - sy * sy / n AS syy
             |       FROM g),
             |ab AS (SELECT n, sxx, sxy,
             |              sxm / sxx AS a,
             |              ((smm - sxm * sxm / sxx) / (n - 2)) / sxx AS sa2,
             |              nullif(smm * sxx - sxm * sxm, 0.0) AS det,
             |              smy, smm, sxm, syy
             |       FROM cg),
             |bc AS (SELECT n, sxx, sxy, a, sa2, det,
             |              (smy * sxx - sxy * sxm) / det AS b,
             |              (sxy * smm - smy * sxm) / det AS cp,
             |              smy, syy
             |       FROM ab),
             |fin AS (SELECT n, sxx, sxy, a, sa2, det, b, cp,
             |               ((syy - b * smy - cp * sxy) / (n - 3))
             |                 * sxx / det AS sb2
             |        FROM bc)
             |SELECT CAST(n AS BIGINT) AS n_users,
             |       round(a, 6) AS a_path, round(b, 6) AS b_path,
             |       round(sxy / sxx, 6) AS c_total,
             |       round(cp, 6) AS c_direct,
             |       round(a * b, 6) AS ab_indirect,
             |       round(a * b / sqrt(a * a * sb2 + b * b * sa2), 4)
             |         AS sobel_z
             |FROM fin""".stripMargin)),

    // Two-arm log-rank test on time-to-first-purchase, arms split by
    // the deterministic user hash — the survival-curve COMPARISON
    // beside ev_survival's single-arm KM estimator: at each distinct
    // lifetime day, O−E and hypergeometric variance over the risk
    // sets, χ² = (ΣO−ΣE)²/ΣV. Censoring at the corpus horizon; risk
    // sets are suffix sums over the bounded day grid (WindowGuard-
    // allowlisted). Statistic only (df=1).
    "stat_logrank" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ev = Tables.events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("su"))
          .localCheckpoint(eager = false) // reused by pu and life
        val pu = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts").join(su, "user_id")
          .filter(col("ts") >= col("su"))
          .groupBy("user_id").agg(min("ts").as("pu"))
        val end = ev.agg(max("ts").as("te"))
        val hist = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(end))
          .select(col("user_id"),
            expr("(coalesce(pu, te) - su) div 86400000000000").as("day"),
            when(col("pu").isNotNull, 1L).otherwise(0L).as("e"),
            (md5Long(concat(lit("lr:"), col("user_id").cast("string"))) % 2)
              .as("arm"))
          .groupBy("day")
          .agg(sum(when(col("arm") === 0, col("e")).otherwise(0L)).as("d0"),
            sum(when(col("arm") === 0, lit(1L) - col("e")).otherwise(0L))
              .as("c0"),
            sum(when(col("arm") === 1, col("e")).otherwise(0L)).as("d1"),
            sum(when(col("arm") === 1, lit(1L) - col("e")).otherwise(0L))
              .as("c1"))
        val wRisk = Window.orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val t = hist
          .withColumn("n0", sum(col("d0") + col("c0")).over(wRisk))
          .withColumn("n1", sum(col("d1") + col("c1")).over(wRisk))
          .withColumn("dt", col("d0") + col("d1"))
          .withColumn("nt", col("n0") + col("n1"))
          .filter(col("dt") > 0 && col("nt") > 1)
          .withColumn("e0", col("dt") * col("n0") / col("nt").cast("double"))
          .withColumn("v", (col("dt") * col("n0") * col("n1")).cast("double")
            * (col("nt") - col("dt"))
            / (col("nt").cast("double") * col("nt") * (col("nt") - 1)))
        t.agg(sum("d0").cast("long").as("o0"),
            round(sum("e0"), 4).as("e0"),
            round(sum("v"), 4).as("v"),
            round(pow(sum("d0") - sum("e0"), 2) / sum("v"), 4).as("chi2"))
          .select(col("o0"), col("e0"), col("v"), col("chi2"))
      },
      Some("""WITH su AS (SELECT user_id, min(ts) AS su FROM events
             |            WHERE event_type = 'signup' GROUP BY 1),
             |pu AS (SELECT e.user_id, min(e.ts) AS pu
             |       FROM events e JOIN su ON e.user_id = su.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts >= su.su
             |       GROUP BY 1),
             |fin AS (SELECT max(ts) AS te FROM events),
             |life AS (SELECT su.user_id,
             |                (coalesce(pu, te) - su) // 86400000000000 AS day,
             |                CASE WHEN pu IS NOT NULL THEN 1 ELSE 0 END AS e,
             |                ('0x' || substr(md5('lr:' || CAST(su.user_id AS VARCHAR)), 1, 15))::BIGINT
             |                  % 2 AS arm
             |         FROM su LEFT JOIN pu ON su.user_id = pu.user_id
             |         CROSS JOIN fin),
             |hist AS (SELECT day,
             |           CAST(sum(CASE WHEN arm = 0 THEN e ELSE 0 END) AS BIGINT) AS d0,
             |           CAST(sum(CASE WHEN arm = 0 THEN 1 - e ELSE 0 END) AS BIGINT) AS c0,
             |           CAST(sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS BIGINT) AS d1,
             |           CAST(sum(CASE WHEN arm = 1 THEN 1 - e ELSE 0 END) AS BIGINT) AS c1
             |         FROM life GROUP BY 1),
             |rs AS (SELECT *,
             |          CAST(sum(d0 + c0) OVER (ORDER BY day ROWS BETWEEN
             |            CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n0,
             |          CAST(sum(d1 + c1) OVER (ORDER BY day ROWS BETWEEN
             |            CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1
             |       FROM hist),
             |t AS (SELECT d0, d0 + d1 AS dt, n0, n1, n0 + n1 AS nt FROM rs
             |      WHERE d0 + d1 > 0 AND n0 + n1 > 1)
             |SELECT CAST(sum(d0) AS BIGINT) AS o0,
             |       round(sum(dt * n0 / CAST(nt AS DOUBLE)), 4) AS e0,
             |       round(sum(CAST(dt * n0 * n1 AS DOUBLE) * (nt - dt)
             |                 / (CAST(nt AS DOUBLE) * nt * (nt - 1))), 4) AS v,
             |       round(pow(sum(d0) - sum(dt * n0 / CAST(nt AS DOUBLE)), 2)
             |             / sum(CAST(dt * n0 * n1 AS DOUBLE) * (nt - dt)
             |                   / (CAST(nt AS DOUBLE) * nt * (nt - 1))), 4)
             |         AS chi2
             |FROM t""".stripMargin)),

    // Windowed co-occurrence PMI: token pairs within ±3 positions
    // (the word2vec/GloVe context window), canonicalized unordered,
    // PMI off the pair multiset's own marginals — the association
    // view text_pmi's ADJACENT bigrams can't see. Map-side ≤3×
    // fan-out per token (the shingle-explode class), two hash aggs,
    // exact integers into one ln.
    "text_cooc_window" -> Q(
      (s, d) => {
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        // greatest(·,0) guards the slice length: a doc shorter than
        // the offset yields an EMPTY pair array, not an error
        def shifted(k: Int) = zip_with(
          slice(toks, lit(1), greatest(size(toks) - k, lit(0))),
          slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
          (a, b) => struct(least(a, b).as("w1"), greatest(a, b).as("w2")))
        val pairs = Tables.documents(s, d)
          .select(explode(concat(shifted(1), shifted(2), shifted(3))).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("cp"))
          .localCheckpoint(eager = false) // marginals + total + report
        val marg = pairs.select(col("w1").as("w"), col("cp"))
          .union(pairs.select(col("w2").as("w"), col("cp")))
          .groupBy("w").agg(sum("cp").as("cw"))
        val tot = pairs.agg(sum("cp").as("t2"))
        pairs
          .join(marg.select(col("w").as("w1"), col("cw").as("c1")), "w1")
          .join(marg.select(col("w").as("w2"), col("cw").as("c2")), "w2")
          .crossJoin(broadcast(tot))
          .select(col("w1"), col("w2"), col("cp").as("n_pair"),
            round(log((col("cp") * lit(4.0) * col("t2"))
              / (col("c1") * col("c2")).cast("double")), 4).as("pmi"))
          .orderBy(col("n_pair").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
             |  FROM documents),
             |pr AS (
             |  SELECT least(t[i], t[i + k]) AS w1,
             |         greatest(t[i], t[i + k]) AS w2
             |  FROM toks,
             |       LATERAL (SELECT unnest(generate_series(1, len(t))) AS i),
             |       LATERAL (SELECT unnest(generate_series(1, 3)) AS k)
             |  WHERE i + k <= len(t)),
             |pairs AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cp
             |          FROM pr GROUP BY 1, 2),
             |marg AS (SELECT w, CAST(sum(cp) AS BIGINT) AS cw FROM (
             |           SELECT w1 AS w, cp FROM pairs
             |           UNION ALL SELECT w2 AS w, cp FROM pairs)
             |         GROUP BY 1),
             |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS t2 FROM pairs)
             |SELECT w1, w2, cp AS n_pair,
             |       round(ln((cp * 4.0 * t2) / CAST(c1.cw * c2.cw AS DOUBLE)), 4)
             |         AS pmi
             |FROM pairs
             |JOIN marg c1 ON pairs.w1 = c1.w
             |JOIN marg c2 ON pairs.w2 = c2.w
             |CROSS JOIN tot
             |ORDER BY n_pair DESC, w1, w2 LIMIT 20""".stripMargin)),

    // Conductance of the source partition on the near-dup graph —
    // φ(S) = cut(S)/min(vol(S), vol(rest)): how LEAKY is each
    // source's duplicate neighborhood? The cut-based companion to
    // graph_modularity's null-model score on the SAME bounded edge
    // set (cut = d_sum − 2·l_intra, all exact integers).
    "graph_conductance" -> Q(
      (s, d) => {
        val docs = docsUnder(s, d, 120)
        val e0 = graft.dedup.Dedup.ngramJaccard(docs, 5, 0.25)
          .select(col("da"), col("db"))
        val src = docs.select(col("doc_id"), col("source"))
        val lab = e0
          .join(src.select(col("doc_id").as("da"), col("source").as("sa")), "da")
          .join(src.select(col("doc_id").as("db"), col("source").as("sb")), "db")
          .localCheckpoint(eager = false) // deg, intra, and m
        val mTot = lab.agg(count(lit(1)).as("m"))
        val degS = lab.select(col("sa").as("source"))
          .union(lab.select(col("sb").as("source")))
          .groupBy("source").agg(count(lit(1)).as("vol"))
        val intra = lab.filter(col("sa") === col("sb"))
          .groupBy(col("sa").as("source")).agg(count(lit(1)).as("l_intra"))
        degS.join(intra, Seq("source"), "left")
          .na.fill(0L, Seq("l_intra"))
          .crossJoin(broadcast(mTot))
          .select(col("source"), col("vol"),
            (col("vol") - lit(2L) * col("l_intra")).as("cut"),
            round((col("vol") - lit(2L) * col("l_intra"))
              / nullif(least(col("vol"), lit(2L) * col("m") - col("vol"))
                .cast("double"), lit(0.0)), 4).as("phi"))
          .orderBy("source")
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |lab AS (SELECT da, db, sa.source AS sa, sb.source AS sb
              |        FROM e0 JOIN documents sa ON e0.da = sa.doc_id
              |                JOIN documents sb ON e0.db = sb.doc_id),
              |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
              |degs AS (SELECT source, CAST(count(*) AS BIGINT) AS vol FROM (
              |           SELECT sa AS source FROM lab
              |           UNION ALL SELECT sb AS source FROM lab)
              |         GROUP BY source),
              |intra AS (SELECT sa AS source, CAST(count(*) AS BIGINT) AS l_intra
              |          FROM lab WHERE sa = sb GROUP BY sa)
              |SELECT degs.source AS source, vol,
              |       vol - 2 * coalesce(l_intra, 0) AS cut,
              |       round((vol - 2 * coalesce(l_intra, 0))
              |             / nullif(CAST(least(vol, 2 * m - vol) AS DOUBLE), 0.0), 4)
              |         AS phi
              |FROM degs LEFT JOIN intra ON degs.source = intra.source
              |CROSS JOIN m ORDER BY degs.source""".stripMargin)),

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
             |ORDER BY event_type, day""".stripMargin)))
}
