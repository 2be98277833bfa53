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
private[graft] object QText {


  // ---------------------------------------------------------------
  // Text analysis (SURVEY §2 #23–26) + embedder invariant (#13)
  // ---------------------------------------------------------------

  val textQ: Seq[(String, Q)] = {
    import graft.text.TextAnalytics
    val stopList = TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
    Seq(
      "text_token_count" -> Q(
        (s, d) => TextAnalytics.tokenCounts(Tables.documents(s, d)),
        Some("""SELECT doc_id,
               |       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws,
               |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
               |FROM documents ORDER BY doc_id""".stripMargin)),

      "text_quality" -> Q(
        (s, d) => TextAnalytics.qualityScores(Tables.documents(s, d)),
        Some(s"""SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                |  round((least(n_tok, 100) / 100.0) *
                |        (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
                |        (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
                |FROM (
                |  SELECT doc_id, length(text) AS n_chars,
                |         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
                |         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                |             t -> t IN ($stopList))) AS stop_cnt,
                |         len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
                |  FROM documents)
                |ORDER BY doc_id""".stripMargin)),

      // CCNet-style perplexity bucketing (Wenzek et al. 2020), with the
      // cheap quality score standing in for the LM: per-language tercile
      // cutoffs are computed as ONE tiny aggregate (|lang| rows),
      // broadcast back, and every doc binned map-side — no per-language
      // global window, so the shape survives a skewed 100 TB corpus
      "text_ccnet_bins" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val q = TextAnalytics.qualityScores(docs)
            .join(docs.select("doc_id", "lang"), "doc_id")
          val cuts = q.groupBy("lang")
            .agg(expr("percentile(quality, array(0.3333333333333333D, 0.6666666666666666D))").as("cs"))
            .select(col("lang"), round(element_at(col("cs"), 1), 6).as("c1"),
                    round(element_at(col("cs"), 2), 6).as("c2"))
          q.join(broadcast(cuts), "lang")
            .withColumn("bin",
              when(col("quality") <= col("c1"), lit("tail"))
                .when(col("quality") <= col("c2"), lit("middle"))
                .otherwise(lit("head")))
            .groupBy("lang", "bin")
            .agg(count(lit(1)).as("n"), round(avg("quality"), 4).as("avg_q"))
            .orderBy("lang", "bin")
        },
        Some(s"""WITH q AS (
                |  SELECT doc_id, lang,
                |         round((least(n_tok, 100) / 100.0) *
                |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
                |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
                |  FROM (
                |    SELECT doc_id, lang, length(text) AS n_chars,
                |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
                |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                |               t -> t IN ($stopList))) AS stop_cnt,
                |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
                |    FROM documents)),
                |cuts AS (SELECT lang,
                |                round(quantile_cont(quality, 0.3333333333333333), 6) AS c1,
                |                round(quantile_cont(quality, 0.6666666666666666), 6) AS c2
                |         FROM q GROUP BY lang)
                |SELECT lang,
                |       CASE WHEN quality <= c1 THEN 'tail'
                |            WHEN quality <= c2 THEN 'middle' ELSE 'head' END AS bin,
                |       CAST(count(*) AS BIGINT) AS n, round(avg(quality), 4) AS avg_q
                |FROM q JOIN cuts USING (lang)
                |GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin)),

      "text_langid" -> Q(
        (s, d) => TextAnalytics.languageId(Tables.documents(s, d)),
        Some(TextAnalytics.languageIdSql)),

      // language-ID confusion matrix: the heuristic's predictions vs
      // the corpus's ground-truth lang column, with per-true-language
      // recall fractions. The only window runs over the aggregated
      // |langs|×|preds| confusion cells
      "text_langid_eval" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val w = Window.partitionBy("lang")
          TextAnalytics.languageId(docs)
            .join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
            .withColumn("frac", round(col("n") / sum("n").over(w), 4))
            .orderBy("lang", "pred_lang")
        },
        Some {
          def cnt(words: Seq[String]) =
            s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
              s"t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
          val Seq(en, es, de, fr) = TextAnalytics.Lexica.map { case (_, w) => cnt(w) }
          s"""WITH p AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN $en + $es + $de + $fr = 0 THEN 'und'
             |         WHEN $en >= greatest($es, $de, $fr) THEN 'en'
             |         WHEN $es >= greatest($de, $fr) THEN 'es'
             |         WHEN $de >= $fr THEN 'de'
             |         ELSE 'fr' END AS pred_lang
             |  FROM documents),
             |c AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
             |      FROM p GROUP BY lang, pred_lang)
             |SELECT lang, pred_lang, n,
             |       round(n * 1.0 / sum(n) OVER (PARTITION BY lang), 4) AS frac
             |FROM c ORDER BY lang, pred_lang""".stripMargin
        }),

      // C4-style text normalization: casefold, strip punctuation,
      // collapse whitespace — pure map-side projection; the content
      // hash of the normalized form is the exact-dedup key a cleaned
      // corpus would use
      "text_normalize" -> Q(
        (s, d) => {
          val norm = TextAnalytics.normalize(col("text"))
          Tables.documents(s, d)
            .select(col("doc_id"), length(norm).cast("long").as("n_chars_norm"),
                    graft.functions.VectorFunctions.md5Long(norm).as("h_norm"))
            .orderBy("doc_id")
        },
        Some("""SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_chars_norm,
               |       ('0x' || substr(md5(norm), 1, 15))::BIGINT AS h_norm
               |FROM (SELECT doc_id,
               |        trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'),
               |             '\s+', ' ', 'g')) AS norm
               |      FROM documents)
               |ORDER BY doc_id""".stripMargin)),

      // Gopher-style repetition filters: top-unigram/bigram fractions,
      // type-token ratio, duplicated-trigram fraction per doc
      "text_repetition" -> Q(
        (s, d) => TextAnalytics.repetitionStats(Tables.documents(s, d)),
        Some(TextAnalytics.repetitionStatsSql)),

      // benchmark decontamination: train docs sharing any 8-token
      // shingle with the held-out eval slice (doc_id % 20 == 0)
      "text_decontam" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          TextAnalytics.contamination(
            docs.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0), 8)
        },
        Some(s"""WITH tsh AS (
                |${graft.text.TextPrimitives.tokenShinglesSql("documents", "doc_id", "text", 8, "doc_id % 20 <> 0")}),
                |bsh AS (SELECT DISTINCT sh FROM (
                |${graft.text.TextPrimitives.tokenShinglesSql("documents", "doc_id", "text", 8, "doc_id % 20 = 0")}))
                |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                |       CAST(count(b.sh) AS BIGINT) AS n_hit,
                |       round(count(b.sh) / count(*), 4) AS hit_frac,
                |       CAST(count(b.sh) > 0 AS INTEGER) AS contaminated
                |FROM tsh t LEFT JOIN bsh b USING (sh)
                |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

      "text_fingerprint" -> Q(
        (s, d) => TextAnalytics.fingerprints(Tables.documents(s, d)),
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 4)})
                |SELECT doc_id, CAST(min(hm) AS BIGINT) AS fp_min,
                |       CAST(max(hm) AS BIGINT) AS fp_max,
                |       CAST(count(*) AS BIGINT) AS n_shingles
                |FROM (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS hm FROM s)
                |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

      // The reference's flagship flow (search_query: text → vector →
      // cosine top-k), oracle'd end-to-end: DuckDB reproduces the
      // feature-hash embedder AND the cosine, bit-for-bit.
      "text_search_e2e" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val raw = graft.embed.HashEmbedder.embedDocsRaw(
            Tables.documents(s, d), "doc_id", "text", 64)
          val q = raw.filter(col("doc_id") === 3).select(col("embedding").as("qv"))
          raw.crossJoin(broadcast(q))
            .select(col("doc_id"), score(col("embedding"), col("qv")).as("score"))
            .orderBy(col("score").desc, col("doc_id"))
            .limit(10)
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64)}),
             |q AS (SELECT * FROM sums WHERE doc_id = 3)
             |SELECT doc_id,
             |       round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                  ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS score
             |FROM (SELECT s.doc_id, ($dot) AS dot, ($na) AS na, ($nb) AS nb
             |      FROM sums s, q)
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
        }),

      // hybrid retrieval: BM25 top-20 ⊕ embedding-cosine top-20 fused
      // by reciprocal rank (1/(60+r)) — the calibration-free lexical+
      // vector combination; both inputs bounded before fusion
      "text_hybrid_rrf" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val docs = Tables.documents(s, d)
          val lex = graft.text.Bm25.search(docs, Seq("spark", "hash", "merge"), 20)
          val raw = graft.embed.HashEmbedder.embedDocsRaw(docs, "doc_id", "text", 64)
          val qv = raw.filter(col("doc_id") === 3).select(col("embedding").as("qv"))
          val vec = raw.crossJoin(broadcast(qv))
            .select(col("doc_id"), score(col("embedding"), col("qv")).as("score"))
            .orderBy(col("score").desc, col("doc_id")).limit(20)
          graft.text.Hybrid.rrf(lex, vec, "doc_id", "bm25", "score", 60, 10)
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
             |              FROM documents),
             |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
             |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
             |       FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
             |       WHERE tok IN ('spark', 'hash', 'merge') GROUP BY doc_id, tok),
             |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
             |lex AS (SELECT doc_id,
             |               round(sum((ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)) /
             |                         (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
             |        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats
             |        GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
             |sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64)}),
             |q AS (SELECT * FROM sums WHERE doc_id = 3),
             |vec AS (SELECT doc_id,
             |               round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                          ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS score
             |        FROM (SELECT s.doc_id, ($dot) AS dot, ($na) AS na, ($nb) AS nb
             |              FROM sums s, q)
             |        ORDER BY score DESC, doc_id LIMIT 20),
             |lr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM lex),
             |vr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM vec)
             |SELECT coalesce(lr.doc_id, vr.doc_id) AS doc_id,
             |       round(coalesce(1.0 / (60 + lr.r), 0) + coalesce(1.0 / (60 + vr.r), 0), 6) AS rrf
             |FROM lr FULL JOIN vr ON lr.doc_id = vr.doc_id
             |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
        }),

      // the whole training-data prep pipeline as ONE Catalyst plan:
      // exact dedup → quality filter → deterministic split → stats
      // (operators composing is the point — no materialization
      // boundaries between stages)
      "pipe_e2e_prep" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val keep = graft.dedup.Dedup.exact(docs).select(col("keep_id").as("doc_id"))
          val deduped = docs.join(keep, "doc_id")
          val q = graft.text.TextAnalytics.qualityScores(deduped)
            .filter(col("quality") >= 0.3).select("doc_id", "n_tok")
          graft.ops.Sampling.hashSplit(q, "doc_id", 80, 10)
            .groupBy("split")
            .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"),
                 sum("n_tok").as("sum_tok"))
            .orderBy("split")
        },
        Some(s"""WITH keep AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
                |              FROM documents GROUP BY md5(text)),
                |dd AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
                |q AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                |        round((least(n_tok, 100) / 100.0) *
                |              (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
                |              (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
                |      FROM (SELECT doc_id, length(text) AS n_chars,
                |                   len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
                |                   len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                |                       t -> t IN ($stopList))) AS stop_cnt,
                |                   len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
                |            FROM dd)),
                |f AS (SELECT doc_id, n_tok FROM q WHERE quality >= 0.3),
                |sp AS (SELECT doc_id, n_tok,
                |              CASE WHEN b < 80 THEN 'train'
                |                   WHEN b < 90 THEN 'val' ELSE 'test' END AS split
                |       FROM (SELECT doc_id, n_tok,
                |               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
                |             FROM f))
                |SELECT split, CAST(count(*) AS BIGINT) AS n,
                |       CAST(sum(doc_id) AS BIGINT) AS sum_id,
                |       CAST(sum(n_tok) AS BIGINT) AS sum_tok
                |FROM sp GROUP BY split ORDER BY split""".stripMargin)),

      // sequence packing for pretraining batches: concat-then-chunk
      // layout — each doc is assigned the 512-token context window its
      // first token lands in; the global prefix sum is a two-level
      // scan (bounded per-block windows + a blockSize-reduced offset
      // table), never a full-data global window (ops/Packing.scala)
      "pipe_pack_sequences" -> Q(
        (s, d) => {
          val toks = Tables.documents(s, d).select(col("doc_id"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("n_tok"))
          graft.ops.Packing.packSequences(toks, "doc_id", "n_tok", 512L, 100L)
            .groupBy("pack_id")
            .agg(count(lit(1)).as("n_docs"), sum("tok").as("sum_tok"),
                 min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
            .orderBy("pack_id")
        },
        Some("""WITH t AS (
               |  SELECT doc_id,
               |         len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok
               |  FROM documents),
               |o AS (
               |  SELECT doc_id, n_tok,
               |         coalesce(sum(n_tok) OVER (ORDER BY doc_id
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
               |  FROM t)
               |SELECT CAST(off // 512 AS BIGINT) AS pack_id, CAST(count(*) AS BIGINT) AS n_docs,
               |       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
               |       CAST(min(doc_id) AS BIGINT) AS first_doc,
               |       CAST(max(doc_id) AS BIGINT) AS last_doc
               |FROM o GROUP BY pack_id ORDER BY pack_id""".stripMargin)),

      // deterministic hash-based train/val/test split (stable across
      // runs/partitioning — never rand())
      "samp_hash_split" -> Q(
        (s, d) => graft.ops.Sampling.hashSplit(Tables.documents(s, d), "doc_id", 80, 10)
          .groupBy("split")
          .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"))
          .orderBy("split"),
        Some("""SELECT split, CAST(count(*) AS BIGINT) AS n,
               |       CAST(sum(doc_id) AS BIGINT) AS sum_id FROM (
               |  SELECT doc_id,
               |         CASE WHEN b < 80 THEN 'train'
               |              WHEN b < 90 THEN 'val' ELSE 'test' END AS split
               |  FROM (SELECT doc_id,
               |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
               |        FROM documents))
               |GROUP BY split ORDER BY split""".stripMargin)),

      // domain-mix reweighting: per-source keep rates (training-mix
      // shaping), deterministic salted-hash acceptance — map-side
      // filter, no join, rerun-stable
      "samp_domain_mix" -> Q(
        (s, d) => {
          val rateBp = (substring(col("source"), 4, 10).cast("int") % 5 + 1) * 2000
          Tables.documents(s, d)
            .withColumn("kept",
              graft.ops.Sampling.domainWeighted(col("doc_id"), rateBp).cast("int"))
            .groupBy("source")
            .agg(count(lit(1)).as("n_total"), sum("kept").cast("long").as("n_kept"),
                 max(rateBp).cast("long").as("rate_bp"))
            .orderBy("source")
        },
        Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_total,
               |       CAST(sum(kept) AS BIGINT) AS n_kept,
               |       CAST(max(rate_bp) AS BIGINT) AS rate_bp FROM (
               |  SELECT source,
               |         (CAST(substr(source, 4) AS INTEGER) % 5 + 1) * 2000 AS rate_bp,
               |         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
               |              < (CAST(substr(source, 4) AS INTEGER) % 5 + 1) * 2000 AS INTEGER) AS kept
               |  FROM documents)
               |GROUP BY source ORDER BY source""".stripMargin)),

      // global uniform m-sample as a mergeable bottom-k (the
      // deterministic distributed reservoir): m smallest content
      // hashes win; plans as TakeOrderedAndProject (m rows per
      // partition shuffle)
      "samp_bottomk" -> Q(
        (s, d) => graft.ops.Sampling.bottomK(Tables.documents(s, d), "doc_id", 20)
          .select("doc_id", "h", "source"),
        Some("""SELECT doc_id, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
               |       source
               |FROM documents ORDER BY h, doc_id LIMIT 20""".stripMargin)),

      // per-stratum reservoir: k smallest hashes WITHIN each source,
      // via the bounded TopK partial aggregate — map-side k per group,
      // no row_number over a hot group (the oracle's window IS that
      // shape; fine for DuckDB, wrong for 100 TB Spark)
      "samp_group_sample" -> Q(
        (s, d) => graft.ops.Sampling.bottomKPerGroup(
            Tables.documents(s, d), "source", "doc_id", 3)
          .orderBy("source", "h", "doc_id"),
        Some("""WITH h AS (SELECT source, doc_id,
               |  ('0x' || substr(md5('gs:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               |    % 1000000000 AS h
               |  FROM documents),
               |r AS (SELECT source, doc_id, h,
               |      row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
               |      FROM h)
               |SELECT source, doc_id, h FROM r WHERE rn <= 3
               |ORDER BY source, h, doc_id""".stripMargin)),

      // weighted sample without replacement via exponential clocks
      // (A-ES): P(selected) ∝ n_chars, no global weight total needed;
      // clock rounded before selection so both engines pick the same
      // winners
      "samp_weighted" -> Q(
        (s, d) => graft.ops.Sampling.weightedSample(
            Tables.documents(s, d), "doc_id", col("n_chars"), 20)
          .select("doc_id", "clock", "n_chars"),
        Some("""SELECT doc_id,
               |       round(-ln((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               |                  % 1000000 + 1) / 1000000.0) / n_chars, 6) AS clock,
               |       n_chars
               |FROM documents WHERE n_chars > 0
               |ORDER BY clock, doc_id LIMIT 20""".stripMargin)),

      // the full curation pipeline as ONE Catalyst plan: PII scrub →
      // quality filter → temperature (α=0.5) language rebalance →
      // greedy token-budget selection → per-language summary. Every
      // stage is the library operator (Pii.redact, qualityScores,
      // temperatureRebalance, selectByTokenBudget); the oracle chains
      // the same stages as CTEs. No stage materializes — Catalyst
      // fuses scrub+quality into the scan projection.
      "pipe_curate" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val scrubbed = graft.text.Pii.redact(docs)
            .select(col("doc_id"), col("redacted").as("text"))
          val q = graft.text.TextAnalytics.qualityScores(scrubbed)
            .join(docs.select(col("doc_id"), col("lang")), "doc_id")
            .filter(col("quality") >= 0.1)
          // r17: surv feeds the budget scan AND the final lang
          // join-back — checkpoint it so the PII-regex + quality +
          // rebalance subtree runs once instead of twice
          val surv = graft.ops.Sampling.temperatureRebalance(q, "lang", "doc_id")
            .localCheckpoint(eager = false)
          val kept = graft.ops.Packing.selectByTokenBudget(
            surv, "doc_id", "n_tok", "quality", 8000L)
          kept.join(surv.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(count(lit(1)).as("n_kept"), sum("tok").as("sum_tok"))
            .orderBy("lang")
        },
        Some({
          val stopList = graft.text.TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""WITH q AS (
             |  SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
             |         round((least(n_tok, 100) / 100.0) *
             |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
             |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
             |  FROM (
             |    SELECT doc_id, lang, length(text) AS n_chars,
             |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |               t -> t IN ($stopList))) AS stop_cnt,
             |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
             |    FROM documents)),
             |f AS (SELECT * FROM q WHERE quality >= 0.1),
             |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_orig FROM f GROUP BY lang),
             |m AS (SELECT min(n_orig) AS n_min FROM c),
             |r AS (SELECT lang, CAST(floor(round(sqrt(CAST(n_min AS DOUBLE) / n_orig), 6)
             |             * 1000000) AS BIGINT) AS thr FROM c, m),
             |t AS (SELECT f.* FROM f JOIN r USING (lang)
             |      WHERE ('0x' || substr(md5('ts:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |            % 1000000 < thr),
             |o AS (SELECT doc_id, lang, n_tok,
             |             CAST(sum(n_tok) OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS cum
             |      FROM t)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
             |       CAST(sum(n_tok) AS BIGINT) AS sum_tok
             |FROM o WHERE cum - n_tok < 8000
             |GROUP BY lang ORDER BY lang""".stripMargin
        })),

      // deterministic token-dropout augmentation (1-in-10): the
      // hash-of-(doc_id, position) dropout mask is reproducible across
      // runs AND engines — the oracle rebuilds the same augmented text
      "aug_token_dropout" -> Q(
        (s, d) => graft.text.TextAnalytics
          .tokenDropout(Tables.documents(s, d), 10)
          .orderBy("doc_id"),
        // ORACLE SCALE IDIOM (sf10 flush): ARRAY-NATIVE per row — the
        // explode + string_agg(ORDER BY i) form buffers the ordered
        // aggregate un-offloadably in DuckDB 1.0 and blew the 48 GB
        // budget at 500k docs; list_where over a per-position hash
        // mask rebuilds the same augmented text with zero fan-out and
        // streaming memory.
        Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |           FROM documents),
               |k AS (SELECT doc_id, t,
               |        list_where(t, list_transform(range(1, len(t) + 1), i ->
               |          ('0x' || substr(md5('aug:' || CAST(doc_id AS VARCHAR) || ':'
               |             || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 10 <> 0)) AS kept
               |      FROM t)
               |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_orig,
               |       CAST(len(kept) AS BIGINT) AS n_kept,
               |       ('0x' || substr(md5(array_to_string(kept, ' ')), 1, 15))::BIGINT AS h_aug
               |FROM k ORDER BY doc_id""".stripMargin)),

      // temperature (α=0.5) language rebalancing: kept counts ∝
      // sqrt(original counts), smallest language kept fully — sqrt is
      // IEEE-exact cross-engine where pow(x, 1/T) is not, so the
      // integer keep thresholds match bit-for-bit
      "samp_temperature" -> Q(
        (s, d) => graft.ops.Sampling
          .temperatureRebalance(Tables.documents(s, d), "lang", "doc_id")
          .groupBy("lang")
          .agg(max("n_orig").as("n_orig"), max("thr").as("thr"),
               count(lit(1)).as("n_kept"))
          .orderBy("lang"),
        Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_orig
               |           FROM documents GROUP BY lang),
               |m AS (SELECT min(n_orig) AS n_min FROM c),
               |r AS (SELECT lang, n_orig,
               |             CAST(floor(round(sqrt(CAST(n_min AS DOUBLE) / n_orig), 6)
               |                  * 1000000) AS BIGINT) AS thr
               |      FROM c, m)
               |SELECT lang, max(r.n_orig) AS n_orig, max(r.thr) AS thr,
               |       CAST(count(*) AS BIGINT) AS n_kept
               |FROM documents d JOIN r USING (lang)
               |WHERE ('0x' || substr(md5('ts:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               |      % 1000000 < thr
               |GROUP BY lang ORDER BY lang""".stripMargin)),

      // greedy token-budget corpus selection: highest-quality docs
      // admitted first until the token budget fills (the mixing step
      // of a pretraining data build). Ordering is (ROUNDED quality
      // desc, doc_id) so both engines pick the identical prefix; the
      // running total is the score-bucketed two-level scan
      // (ops/Packing.scala), never a full-data global window.
      "samp_token_budget" -> Q(
        (s, d) => graft.ops.Packing.selectByTokenBudget(
            graft.text.TextAnalytics.qualityScores(Tables.documents(s, d)),
            "doc_id", "n_tok", "quality", 10000L)
          .orderBy("cum_tok"),
        Some({
          val stopList = graft.text.TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""WITH q AS (
             |  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             |         round((least(n_tok, 100) / 100.0) *
             |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
             |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
             |  FROM (
             |    SELECT doc_id, length(text) AS n_chars,
             |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |               t -> t IN ($stopList))) AS stop_cnt,
             |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
             |    FROM documents)),
             |o AS (SELECT doc_id, quality, n_tok AS tok,
             |             CAST(sum(n_tok) OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS cum_tok
             |      FROM q)
             |SELECT doc_id, quality, tok, cum_tok FROM o
             |WHERE cum_tok - tok < 10000 ORDER BY cum_tok""".stripMargin
        })),

      // DSIR-style importance weighting (Xie et al. 2023,
      // arXiv:2302.03169): hashed-unigram bucket counts for a target
      // domain (lang='en') vs the full corpus give a 64-row log-
      // likelihood-ratio table; every document scores as the sum of
      // its tokens' LLRs. The ratio table is broadcast, the per-doc
      // score is one map-side join + hash agg, and the final top-k is
      // a TakeOrderedAndProject — nothing here grows with corpus size
      // except the linear token scan
      "samp_importance" -> Q(
        (s, d) => {
          val t = graft.text.TextPrimitives.tokens(col("text"))
          val tok = Tables.documents(s, d)
            .select(col("doc_id"), col("lang"), explode(t).as("tok"))
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
          tok.join(broadcast(probs), "b")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_tok"), round(sum("llr"), 4).as("w"))
            .orderBy(col("w").desc, col("doc_id"))
            .limit(20)
        },
        Some("""WITH tb AS (
               |  SELECT doc_id, lang,
               |         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
               |  FROM (SELECT doc_id, lang,
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
               |          FROM src LEFT JOIN tgt USING (b), tot)
               |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok, round(sum(llr), 4) AS w
               |FROM tb JOIN probs USING (b)
               |GROUP BY doc_id
               |ORDER BY w DESC, doc_id LIMIT 20""".stripMargin)),

      // length-bucketed batch shaping: cut batches of 8 inside token-
      // length bands — reports the padding waste a trainer would eat;
      // windows are bounded by the band width (see Packing.scaladoc)
      "pipe_bucket_batches" -> Q(
        (s, d) => graft.ops.Packing.bucketedBatches(
          Tables.documents(s, d).select(col("doc_id"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("n_tok")),
          "doc_id", "n_tok", 16L, 8, 8),
        Some("""WITH d AS (SELECT doc_id AS id,
               |                  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS tok
               |           FROM documents),
               |r AS (SELECT id, tok, least(tok // 16, 7) AS bucket,
               |             row_number() OVER (PARTITION BY least(tok // 16, 7)
               |                                ORDER BY tok, id) AS rn
               |      FROM d),
               |bb AS (SELECT bucket, (rn - 1) // 8 AS batch_idx,
               |              count(*) AS bn, max(tok) AS mx, sum(tok) AS st
               |       FROM r GROUP BY bucket, batch_idx)
               |SELECT bucket, CAST(count(*) AS BIGINT) AS n_batches,
               |       CAST(sum(bn) AS BIGINT) AS n_docs,
               |       CAST(sum(bn * mx - st) AS BIGINT) AS pad_tokens,
               |       round(sum(bn * mx - st) * 1.0 / sum(bn * mx), 4) AS pad_frac
               |FROM bb GROUP BY bucket ORDER BY bucket""".stripMargin)),

      // fixed-size/overlap chunker — produces the (doc_id, chunk_id)
      // keys the reference's ingest surface expects
      "text_chunking" -> Q(
        (s, d) => graft.text.Chunker.chunkDocs(Tables.documents(s, d), 500, 400)
          .select(col("doc_id"), col("chunk_id"),
                  length(col("chunk")).cast("long").as("chunk_len"),
                  graft.functions.VectorFunctions.md5Long(col("chunk")).as("h"))
          .orderBy("doc_id", "chunk_id"),
        Some("""SELECT doc_id, CAST((st - 1) // 400 AS BIGINT) AS chunk_id,
               |       CAST(length(ck) AS BIGINT) AS chunk_len,
               |       ('0x' || substr(md5(ck), 1, 15))::BIGINT AS h
               |FROM (SELECT doc_id, st, substring(text, st, 500) AS ck
               |      FROM (SELECT doc_id, text,
               |                   unnest(generate_series(1, greatest(length(text), 1), 400)) AS st
               |            FROM documents))
               |ORDER BY doc_id, chunk_id""".stripMargin)),

      // BM25 lexical retrieval (k1=1.2, b=0.75) — keyword-side
      // complement to the vector search
      "text_bm25" -> Q(
        (s, d) => graft.text.Bm25.search(
          Tables.documents(s, d), Seq("spark", "hash", "merge"), 10),
        Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |              FROM documents),
               |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
               |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
               |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
               |       FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
               |       WHERE tok IN ('spark', 'hash', 'merge') GROUP BY doc_id, tok),
               |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
               |SELECT doc_id,
               |       round(sum((ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)) /
               |                 (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
               |FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats
               |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin)),

      // vocabulary building: ranked token frequencies (the tokenizer-
      // training precursor)
      // inverted-index construction for the 20 highest-df terms:
      // per-term posting lists ("doc:tf" in doc order) built from one
      // (term, doc) hash agg + a semi-join against the TakeOrdered
      // term list. Posting materialization is bounded by a term's doc
      // frequency — a web-scale index would segment postings per
      // partition, which is this same plan with a (term, shard) key
      "text_postings" -> Q(
        (s, d) => {
          val t = graft.text.TextPrimitives.tokens(col("text"))
          val tf = Tables.documents(s, d)
            .select(col("doc_id"), explode(t).as("term"))
            .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
            .localCheckpoint(eager = false) // read 2×: top terms + postings
          val top = tf.groupBy("term").agg(count(lit(1)).as("df2"))
            .orderBy(col("df2").desc, col("term")).limit(20)
          // the top-20 semi-join sits BELOW the posting build (sf10
          // flush): per-term aggregates are semi-filter-invariant, and
          // materializing postings for EVERY term means a multi-MB
          // collect_list per stopword at 500k docs — on both engines
          val stats = tf.join(top.select("term"), Seq("term"), "left_semi")
            .groupBy("term")
            .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
                 array_join(transform(array_sort(collect_list(
                     struct(col("doc_id"), col("tf")))),
                   e => concat_ws(":", e.getField("doc_id"), e.getField("tf"))),
                   ",").as("postings"))
          stats
            .select(col("term"), col("df"), col("cf"), col("postings"))
            .orderBy(col("df").desc, col("term"))
        },
        // same bound oracle-side: the ordered string_agg is DuckDB
        // 1.0's un-offloadable aggregate (the aug_token_dropout
        // class), so it must only ever run over the 20 surviving
        // terms' rows, never the full (term, doc) table
        Some("""WITH tf AS (
               |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
               |  FROM (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
               |        FROM documents)
               |  GROUP BY term, doc_id),
               |top AS (SELECT term FROM (
               |  SELECT term, count(*) AS df2 FROM tf GROUP BY term
               |  ORDER BY df2 DESC, term LIMIT 20)),
               |stats AS (
               |  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
               |         string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
               |  FROM tf JOIN top USING (term) GROUP BY term)
               |SELECT term, df, cf, postings FROM stats
               |ORDER BY df DESC, term""".stripMargin)),

      // Zipf's-law fit over the top-100 vocabulary: closed-form least
      // squares of ln(freq) on ln(rank). The regression runs on a
      // TakeOrdered-bounded 100-row frame (same rank-after-limit shape
      // as text_vocab), and the slope/intercept/r2 formulas are written
      // identically on both engines — no built-in regr_* whose
      // numeric path could differ
      "text_zipf_fit" -> Q(
        (s, d) => {
          val w = Window.orderBy(col("freq").desc, col("tok"))
          val xy = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("freq"))
            .orderBy(col("freq").desc, col("tok")).limit(100)
            .withColumn("r", row_number().over(w))
            .select(log(col("r")).as("x"), log(col("freq")).as("y"))
          // degenerate-corpus guards, mirrored in the oracle: a vocab
          // of ≤1 terms makes sxx*n - sx² = 0 (slope undefined), and a
          // constant-frequency vocab makes n*syy - sy² = 0 (r2
          // undefined) — NULL both rather than inherit either engine's
          // divide-by-zero convention. Same double arithmetic both
          // sides, so the predicates flip identically.
          val dx = col("n") * col("sxx") - col("sx") * col("sx")
          val dy = col("n") * col("syy") - col("sy") * col("sy")
          val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / dx
          xy.agg(count(lit(1)).cast("double").as("n"),
                 sum("x").as("sx"), sum("y").as("sy"),
                 sum(col("x") * col("y")).as("sxy"),
                 sum(col("x") * col("x")).as("sxx"),
                 sum(col("y") * col("y")).as("syy"))
            .select(col("n").cast("long").as("n_terms"),
              when(dx === 0, lit(null).cast("double"))
                .otherwise(round(slope, 4)).as("slope"),
              when(dx === 0, lit(null).cast("double"))
                .otherwise(round((col("sy") - slope * col("sx")) / col("n"), 4)).as("intercept"),
              when(dx === 0 || dy === 0, lit(null).cast("double"))
                .otherwise(round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2)
                    / (dx * dy), 4)).as("r2"))
        },
        Some("""WITH vocab AS (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
               |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY tok ORDER BY freq DESC, tok LIMIT 100),
               |xy AS (SELECT ln(row_number() OVER (ORDER BY freq DESC, tok)) AS x,
               |              ln(freq) AS y FROM vocab),
               |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
               |             sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM xy)
               |SELECT CAST(n AS BIGINT) AS n_terms,
               |       CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
               |         round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) END AS slope,
               |       CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
               |         round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 4) END AS intercept,
               |       CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL ELSE
               |         round(pow(n*sxy - sx*sy, 2)
               |               / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) END AS r2
               |FROM s""".stripMargin)),

      // per-language character-class profile (script/encoding drift
      // monitor): four regex strip-counts per doc — pure map — then a
      // |lang|-row aggregate. The scan projects only (lang, text)
      "text_charclass" -> Q(
        (s, d) => {
          val t = col("text")
          val n = greatest(length(t), lit(1)).cast("double")
          Tables.documents(s, d)
            .select(col("lang"),
              (length(regexp_replace(t, "[^A-Za-z]", "")) / n).as("alpha"),
              (length(regexp_replace(t, "[^0-9]", "")) / n).as("digit"),
              (length(regexp_replace(t, "[^ \\t\\n\\r]", "")) / n).as("space"),
              (length(regexp_replace(t, "[^A-Z]", "")) / n).as("upper"))
            .groupBy("lang")
            .agg(count(lit(1)).as("n_docs"),
                 round(avg("alpha"), 4).as("avg_alpha"),
                 round(avg("digit"), 4).as("avg_digit"),
                 round(avg("space"), 4).as("avg_space"),
                 round(avg("upper"), 4).as("avg_upper"))
            .orderBy("lang")
        },
        Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               |       round(avg(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / n), 4) AS avg_alpha,
               |       round(avg(length(regexp_replace(text, '[^0-9]', '', 'g')) / n), 4) AS avg_digit,
               |       round(avg(length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) / n), 4) AS avg_space,
               |       round(avg(length(regexp_replace(text, '[^A-Z]', '', 'g')) / n), 4) AS avg_upper
               |FROM (SELECT lang, text,
               |             CAST(greatest(length(text), 1) AS DOUBLE) AS n
               |      FROM documents)
               |GROUP BY lang ORDER BY lang""".stripMargin)),

      // Flesch reading-ease per doc (readability as a quality signal):
      // sentences = [.!?]+ runs (min 1), syllables = [aeiouy]+ vowel
      // groups — all regex counts, pure map, no shuffle before the
      // bounded output sort
      "text_readability" -> Q(
        (s, d) => {
          val words = size(graft.text.TextPrimitives.tokens(col("text"))).cast("double")
          val sents = greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1)).cast("double")
          val sylls = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("double")
          Tables.documents(s, d).filter(col("doc_id") < 100)
            .select(col("doc_id"), words.cast("long").as("n_words"),
                    sents.cast("long").as("n_sent"), sylls.cast("long").as("n_syll"),
                    round(lit(206.835) - lit(1.015) * (words / sents)
                          - lit(84.6) * (sylls / greatest(words, lit(1.0))), 4).as("flesch"))
            .orderBy("doc_id")
        },
        Some("""SELECT doc_id, CAST(words AS BIGINT) AS n_words,
               |       CAST(sents AS BIGINT) AS n_sent, CAST(sylls AS BIGINT) AS n_syll,
               |       round(206.835 - 1.015 * (words / sents)
               |             - 84.6 * (sylls / greatest(words, 1.0)), 4) AS flesch
               |FROM (
               |  SELECT doc_id,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS words,
               |         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS sents,
               |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS sylls
               |  FROM documents WHERE doc_id < 100)
               |ORDER BY doc_id""".stripMargin)),

      // per-doc token Shannon entropy (repetition/diversity signal the
      // Gopher filters threshold on): H = ln(n) − Σ c·ln(c) / n from
      // ONE (doc, tok) hash agg + one per-doc agg — no windows
      "text_entropy" -> Q(
        (s, d) => {
          val tf = Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          tf.groupBy("doc_id")
            .agg(sum("c").as("n"), count(lit(1)).as("n_types"),
                 sum(col("c") * log(col("c"))).as("clc"))
            .select(col("doc_id"), col("n").as("n_tok"), col("n_types"),
                    round(log(col("n")) - col("clc") / col("n"), 4).as("entropy"))
            .orderBy("doc_id")
        },
        Some("""WITH tf AS (
               |  SELECT doc_id, tok, count(*) AS c
               |  FROM (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents WHERE doc_id < 200)
               |  GROUP BY doc_id, tok)
               |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
               |       CAST(count(*) AS BIGINT) AS n_types,
               |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
               |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

      // per-language type-token ratio (vocabulary richness): one
      // explode + one expand-based distinct agg, |lang| output rows
      "text_ttr" -> Q(
        (s, d) => Tables.documents(s, d)
          .select(col("lang"),
            explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_tok"), countDistinct("tok").as("n_types"))
          .withColumn("ttr", round(col("n_types") / col("n_tok").cast("double"), 4))
          .orderBy("lang"),
        Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_tok,
               |       CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
               |       round(count(DISTINCT tok) / CAST(count(*) AS DOUBLE), 4) AS ttr
               |FROM (SELECT lang,
               |             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |      FROM documents)
               |GROUP BY lang ORDER BY lang""".stripMargin)),

      // Gopher-style rule bundle (Rae et al. 2021 §A1.1, the doc-level
      // KEEP/DROP decision): word count, mean word length, alpha-word
      // fraction, stopword floor — every rule a map-side HOF over the
      // token array, the keep flag their conjunction
      "text_gopher_rules" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val nW = size(toks).cast("double")
          val mwl = length(concat_ws("", toks)) / greatest(nW, lit(1.0))
          val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))) / greatest(nW, lit(1.0))
          val stopCnt = size(filter(toks,
            t => t.isin(graft.text.TextAnalytics.Stopwords: _*)))
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id"), nW.cast("long").as("n_words"),
                    round(mwl, 4).as("mean_wlen"),
                    round(alphaFrac, 4).as("alpha_frac"),
                    stopCnt.cast("long").as("stop_cnt"),
                    (nW >= 5 && mwl >= 3 && mwl <= 10 &&
                     alphaFrac >= 0.8 && stopCnt >= 2).cast("int").as("keep"))
            .orderBy("doc_id")
        },
        Some {
          val stopList = graft.text.TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""SELECT doc_id, CAST(n_w AS BIGINT) AS n_words,
             |       round(mwl, 4) AS mean_wlen, round(af, 4) AS alpha_frac,
             |       CAST(sc AS BIGINT) AS stop_cnt,
             |       CAST(n_w >= 5 AND mwl >= 3 AND mwl <= 10
             |            AND af >= 0.8 AND sc >= 2 AS INTEGER) AS keep
             |FROM (
             |  SELECT doc_id, n_w,
             |         length(array_to_string(toks, '')) / greatest(n_w, 1.0) AS mwl,
             |         len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
             |           / greatest(n_w, 1.0) AS af,
             |         len(list_filter(toks, t -> t IN ($stopList))) AS sc
             |  FROM (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS n_w
             |        FROM (SELECT doc_id,
             |                regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
             |              FROM documents WHERE doc_id < 200)))
             |ORDER BY doc_id""".stripMargin
        }),

      // per-source data card (the summary table a dataset release
      // ships): docs, tokens, char stats, language spread, median
      // length — ONE grouped pass over the corpus, |source| rows out
      "pipe_data_card" -> Q(
        (s, d) => Tables.documents(s, d)
          .select(col("source"), col("lang"), col("n_chars"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("nt"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tok"),
               round(avg("n_chars"), 2).as("avg_chars"),
               countDistinct("lang").as("n_langs"),
               round(expr("percentile(nt, 0.5D)"), 1).as("p50_tok"))
          .orderBy("source"),
        Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               |       CAST(sum(nt) AS BIGINT) AS n_tok,
               |       round(avg(n_chars), 2) AS avg_chars,
               |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               |       round(quantile_cont(nt, 0.5), 1) AS p50_tok
               |FROM (SELECT source, lang, n_chars,
               |             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS nt
               |      FROM documents)
               |GROUP BY source ORDER BY source""".stripMargin)),

      // exact Gini coefficient of per-doc token counts per source
      // (length-concentration audit), computed FROM GROUPED COUNTS:
      // rank sums over a run of c tied values collapse to
      // c·F + c(c+1)/2, so the only window runs over the DISTINCT
      // length values of a source (the bucketedBatches level-3 bound),
      // never the docs — counts stay integral; the rank sums go
      // through double (see below) so huge sources can't wrap a Long
      "stat_gini" -> Q(
        (s, d) => {
          val grp = Tables.documents(s, d)
            .select(col("source"),
              size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"))
            .groupBy("source", "x").agg(count(lit(1)).as("c"))
          val w = Window.partitionBy("source").orderBy("x")
            .rowsBetween(Window.unboundedPreceding, -1)
          // rank sums go through DOUBLE: at a 1e9-doc source the
          // c·F terms pass 1e18 and a Long product would wrap
          // silently (the relative error doubles introduce is ~1e-16,
          // invisible after the 4-decimal round; identical on both
          // engines)
          grp.withColumn("f", coalesce(sum("c").over(w), lit(0L)))
            .withColumn("rs",
              expr("x * (CAST(c AS DOUBLE) * f + (CAST(c AS DOUBLE) * (c + 1)) / 2)"))
            .groupBy("source")
            .agg(sum("c").as("n"), sum(expr("x * c")).as("sx"), sum("rs").as("srx"))
            .select(col("source"), col("n"),
              when(col("sx") === 0, lit(null).cast("double"))
                .otherwise(round(lit(2.0) * col("srx")
                  / (col("n").cast("double") * col("sx"))
                  - (col("n") + lit(1.0)) / col("n"), 4)).as("gini"))
            .orderBy("source")
        },
        Some("""WITH grp AS (
               |  SELECT source, x, CAST(count(*) AS BIGINT) AS c
               |  FROM (SELECT source,
               |          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x
               |        FROM documents)
               |  GROUP BY source, x),
               |cum AS (
               |  SELECT source, x, c,
               |         coalesce(sum(c) OVER (PARTITION BY source ORDER BY x
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
               |  FROM grp),
               |agg AS (
               |  SELECT source, CAST(sum(c) AS BIGINT) AS n, sum(x * c) AS sx,
               |         sum(x * (CAST(c AS DOUBLE) * f + (CAST(c AS DOUBLE) * (c + 1)) / 2)) AS srx
               |  FROM cum GROUP BY source)
               |SELECT source, n,
               |       CASE WHEN sx = 0 THEN NULL ELSE
               |         round(2.0 * srx / (CAST(n AS DOUBLE) * sx) - (n + 1.0) / n, 4) END AS gini
               |FROM agg ORDER BY source""".stripMargin)),

      // deterministic curriculum interleave: round-robin the sources
      // in (rank-within-source, source) order so a training run sees
      // every source early and repeatably. The per-source rank uses
      // Packing.boundedRowNumber (id-block two-level scan — a hot
      // source never funnels one window partition); the source-index
      // rank is the only global window and runs over the ≤|sources|
      // distinct-source table
      "pipe_interleave" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d).select(col("source"), col("doc_id"))
          val ranked = graft.ops.Packing.boundedRowNumber(
            docs, Seq("source"), "doc_id", 1L << 20, "r")
          val srcs = docs.groupBy("source").agg(count(lit(1)).as("_n"))
          val sidx = srcs
            .withColumn("sidx", row_number().over(Window.orderBy("source")))
            .select(col("source"), col("sidx").cast("long").as("sidx"))
          val ns = srcs.agg(count(lit(1)).as("ns"))
          ranked.join(broadcast(sidx), "source").crossJoin(broadcast(ns))
            .select(((col("r") - 1) * col("ns") + col("sidx")).as("pos"),
                    col("source"), col("doc_id"))
            .orderBy("pos").limit(100)
        },
        Some("""WITH r AS (
               |  SELECT source, doc_id,
               |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
               |  FROM documents),
               |s AS (SELECT source,
               |             CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS sidx
               |      FROM (SELECT DISTINCT source FROM documents)),
               |t AS (SELECT CAST(count(*) AS BIGINT) AS ns
               |      FROM (SELECT DISTINCT source FROM documents))
               |SELECT CAST((r - 1) * ns + sidx AS BIGINT) AS pos, source, doc_id
               |FROM r JOIN s USING (source), t
               |ORDER BY pos LIMIT 100""".stripMargin)),

      // word2vec negative-sampling table (Mikolov et al. 2013): the
      // unigram^0.75 distribution as (token, weight, draws-per-1M) —
      // one vocab agg + a 1-row broadcast normalizer + TakeOrdered;
      // the table a skip-gram trainer samples negatives from
      "samp_negative_sampling" -> Q(
        (s, d) => {
          val vocab = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("c"))
          val tot = vocab.agg(sum(pow(col("c"), 0.75)).as("z"))
          vocab.crossJoin(broadcast(tot))
            .select(col("tok"), col("c"),
              round(pow(col("c"), 0.75) / col("z"), 8).as("p"),
              round(pow(col("c"), 0.75) / col("z") * 1000000, 0).cast("long").as("n_per_m"))
            .orderBy(col("c").desc, col("tok")).limit(50)
        },
        Some("""WITH vocab AS (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS c
               |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY tok),
               |tot AS (SELECT sum(pow(c, 0.75)) AS z FROM vocab)
               |SELECT tok, c, round(pow(c, 0.75) / z, 8) AS p,
               |       CAST(round(pow(c, 0.75) / z * 1000000, 0) AS BIGINT) AS n_per_m
               |FROM vocab, tot
               |ORDER BY c DESC, tok LIMIT 50""".stripMargin)),

      // two-sample Kolmogorov–Smirnov drift test between the en and
      // non-en token-length distributions, exact from GROUPED counts:
      // ecdfs as running sums over the distinct length values (the
      // stat_gini bound — values, never rows), D = max gap, the
      // α=0.05 threshold 1.358·sqrt((n+m)/nm). The drift gate a
      // pipeline runs between ingest batches
      "samp_ks_test" -> Q(
        (s, d) => {
          val g = Tables.documents(s, d)
            .select(size(graft.text.TextPrimitives.tokens(col("text")))
                      .cast("long").as("x"),
                    when(col("lang") === "en", 1L).otherwise(0L).as("en"))
            .groupBy("x")
            .agg(sum("en").as("ce"), sum(lit(1L) - col("en")).as("cr"))
          val w = Window.orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val tot = g.agg(sum("ce").as("ne"), sum("cr").as("nr"))
          val dmax = g
            .withColumn("fe", sum("ce").over(w))
            .withColumn("fr", sum("cr").over(w))
            .crossJoin(broadcast(tot))
            .groupBy("ne", "nr")
            .agg(max(abs(col("fe").cast("double") / col("ne")
                         - col("fr").cast("double") / col("nr"))).as("d"))
          dmax.select(col("ne").as("n_en"), col("nr").as("n_rest"),
              round(col("d"), 4).as("d"),
              round(lit(1.358) * sqrt((col("ne") + col("nr"))
                / (col("ne").cast("double") * col("nr"))), 4).as("crit"))
            .withColumn("reject", (col("d") > col("crit")).cast("int"))
        },
        Some("""WITH g AS (
               |  SELECT x, CAST(sum(en) AS BIGINT) AS ce,
               |         CAST(sum(1 - en) AS BIGINT) AS cr
               |  FROM (SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
               |               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
               |        FROM documents)
               |  GROUP BY x),
               |c AS (SELECT x, ce, cr,
               |             sum(ce) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fe,
               |             sum(cr) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fr
               |      FROM g),
               |t AS (SELECT CAST(sum(ce) AS BIGINT) AS ne, CAST(sum(cr) AS BIGINT) AS nr FROM g),
               |dm AS (SELECT ne, nr,
               |              max(abs(CAST(fe AS DOUBLE) / ne - CAST(fr AS DOUBLE) / nr)) AS d
               |       FROM c, t GROUP BY ne, nr)
               |SELECT ne AS n_en, nr AS n_rest, round(d, 4) AS d,
               |       round(1.358 * sqrt((ne + nr) / (CAST(ne AS DOUBLE) * nr)), 4) AS crit,
               |       CAST(round(d, 4) > round(1.358 * sqrt((ne + nr) / (CAST(ne AS DOUBLE) * nr)), 4)
               |            AS INTEGER) AS reject
               |FROM dm""".stripMargin)),

      "text_vocab" -> Q(
        (s, d) => {
          // orderBy+limit plans as TakeOrderedAndProject (bounded
          // per-partition heaps); rank is assigned AFTER the top-50 is
          // bounded, so the only global window runs over ≤50 rows —
          // a web-scale vocab (100M+ distinct tokens) never converges
          // on one task.
          val w = Window.orderBy(col("n").desc, col("tok"))
          Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("n"))
            .orderBy(col("n").desc, col("tok")).limit(50)
            .withColumn("rank", row_number().over(w).cast("long"))
            .orderBy("rank")
        },
        Some("""SELECT tok, n, rank FROM (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS n,
               |         CAST(row_number() OVER (ORDER BY count(*) DESC, tok) AS BIGINT) AS rank
               |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY tok)
               |WHERE rank <= 50 ORDER BY rank""".stripMargin)),

      // collocation mining: PMI of frequent bigrams (corpus statistics
      // for tokenizer/quality work); counts are exact integers, PMI a
      // deterministic function of them
      "text_pmi" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val docs = Tables.documents(s, d)
          val uni = docs.select(explode(toks).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("cnt"))
          val totals = uni.agg(sum("cnt").cast("double").as("t"))
          val bi = docs
            .select(explode(when(size(toks) === 1, array()).otherwise(
              zip_with(slice(toks, lit(1), size(toks) - 1),
                       slice(toks, lit(2), size(toks) - 1),
                       (a, b) => struct(a.as("w1"), b.as("w2"))))).as("bg"))
            .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
            .agg(count(lit(1)).as("nb"))
          val btotal = bi.agg(sum("nb").cast("double").as("bt"))
          bi.filter(col("nb") >= 3)
            .join(broadcast(uni.toDF("w1", "c1")), "w1")
            .join(broadcast(uni.toDF("w2", "c2")), "w2")
            .crossJoin(broadcast(totals)).crossJoin(broadcast(btotal))
            .select(col("w1"), col("w2"), col("nb"),
              round(log((col("nb") / col("bt")) /
                ((col("c1") / col("t")) * (col("c2") / col("t")))), 4).as("pmi"))
            .orderBy(col("pmi").desc, col("w1"), col("w2"))
            .limit(20)
        },
        Some("""WITH toks AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |              FROM documents),
               |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
               |        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
               |totals AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tt FROM uni),
               |bi AS (SELECT t[i] AS w1, t[i+1] AS w2, CAST(count(*) AS BIGINT) AS nb
               |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
               |       GROUP BY w1, w2),
               |btotal AS (SELECT CAST(sum(nb) AS DOUBLE) AS bt FROM bi)
               |SELECT w1, w2, nb,
               |       round(ln((nb / bt) / ((c1 / tt) * (c2 / tt))), 4) AS pmi
               |FROM bi JOIN (SELECT tok AS w1, cnt AS c1 FROM uni) USING (w1)
               |        JOIN (SELECT tok AS w2, cnt AS c2 FROM uni) USING (w2),
               |     totals, btotal
               |WHERE nb >= 3
               |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin)),

      // Dunning log-likelihood-ratio collocations: the significance
      // upgrade over text_pmi (PMI ranks rare-but-exclusive pairs;
      // LLR ranks pairs the corpus gives EVIDENCE for). The 2×2
      // contingency per bigram is built entirely from the bigram
      // table's own marginals (so k11+k12+k21+k22 = N exactly), and
      // LLR = 2·(Σxlx(k) − Σxlx(rows) − Σxlx(cols) + xlx(N)) is one
      // closed-form expression on integer counts — identical
      // arithmetic both engines, no per-row iteration. Marginals are
      // broadcast |vocab|-row tables; the bigram frame is
      // checkpointed so the corpus scan runs once for all four
      // consumers.
      "text_llr" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val bi = Tables.documents(s, d)
            .select(explode(when(size(toks) === 1, array()).otherwise(
              zip_with(slice(toks, lit(1), size(toks) - 1),
                       slice(toks, lit(2), size(toks) - 1),
                       (a, b) => struct(a.as("w1"), b.as("w2"))))).as("bg"))
            .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
            .agg(count(lit(1)).as("k11"))
            .localCheckpoint(eager = false) // marginals ×2 + total + scoring
          val m1 = bi.groupBy("w1").agg(sum("k11").as("c1"))
          val m2 = bi.groupBy("w2").agg(sum("k11").as("c2"))
          val tot = bi.agg(sum("k11").as("n"))
          def xlx(c: Column): Column =
            when(c <= 0.0, lit(0.0)).otherwise(c * log(c))
          bi.filter(col("k11") >= 30)
            .join(broadcast(m1), "w1")
            .join(broadcast(m2), "w2")
            .crossJoin(broadcast(tot))
            .withColumn("llr", round(lit(2.0) * (
              xlx(col("k11").cast("double"))
                + xlx((col("c1") - col("k11")).cast("double"))
                + xlx((col("c2") - col("k11")).cast("double"))
                + xlx((col("n") - col("c1") - col("c2") + col("k11")).cast("double"))
                - xlx(col("c1").cast("double"))
                - xlx((col("n") - col("c1")).cast("double"))
                - xlx(col("c2").cast("double"))
                - xlx((col("n") - col("c2")).cast("double"))
                + xlx(col("n").cast("double"))), 4))
            .select(col("w1"), col("w2"), col("k11").as("n_pair"), col("llr"))
            .orderBy(col("llr").desc, col("w1"), col("w2"))
            .limit(20)
        },
        Some {
          def xlx(e: String) =
            s"(CASE WHEN ($e) <= 0 THEN 0.0 ELSE ($e) * ln($e) END)"
          s"""WITH toks AS (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
             |              FROM documents),
             |bi AS (SELECT t[i] AS w1, t[i+1] AS w2, CAST(count(*) AS BIGINT) AS k11
             |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
             |       GROUP BY w1, w2),
             |m1 AS (SELECT w1, CAST(sum(k11) AS BIGINT) AS c1 FROM bi GROUP BY w1),
             |m2 AS (SELECT w2, CAST(sum(k11) AS BIGINT) AS c2 FROM bi GROUP BY w2),
             |tot AS (SELECT CAST(sum(k11) AS BIGINT) AS n FROM bi)
             |SELECT w1, w2, k11 AS n_pair,
             |       round(2.0 * (${xlx("CAST(k11 AS DOUBLE)")}
             |         + ${xlx("CAST(c1 - k11 AS DOUBLE)")}
             |         + ${xlx("CAST(c2 - k11 AS DOUBLE)")}
             |         + ${xlx("CAST(n - c1 - c2 + k11 AS DOUBLE)")}
             |         - ${xlx("CAST(c1 AS DOUBLE)")}
             |         - ${xlx("CAST(n - c1 AS DOUBLE)")}
             |         - ${xlx("CAST(c2 AS DOUBLE)")}
             |         - ${xlx("CAST(n - c2 AS DOUBLE)")}
             |         + ${xlx("CAST(n AS DOUBLE)")}), 4) AS llr
             |FROM bi JOIN m1 USING (w1) JOIN m2 USING (w2), tot
             |WHERE k11 >= 30
             |ORDER BY llr DESC, w1, w2 LIMIT 20""".stripMargin
        }),

      // RAKE keyword extraction: candidate phrases are maximal
      // stopword-free token runs (break at the shared Stopwords
      // lexicon or empty tokens), word score = degree/frequency over
      // phrase co-occurrence, phrase score = Σ member word scores —
      // the classic unsupervised keyphrase pass a curation pipeline
      // runs to label clusters. Phrase ids come from a PER-DOC
      // running sum over token positions (partitioned window, never
      // global); word scores are a broadcast |vocab|-row table; word
      // scores are pinned to 6 decimals before the phrase sum so
      // both engines add identical addends.
      "text_rake" -> Q(
        (s, d) => {
          val stops = graft.text.TextAnalytics.Stopwords
          val tk = Tables.documents(s, d)
            .select(col("doc_id"),
              posexplode(graft.text.TextPrimitives.tokens(col("text")))
                .as(Seq("pos", "tok")))
          val w = Window.partitionBy("doc_id").orderBy("pos")
          // r17: plen as a full-partition count window on (doc_id,
          // pid) — it rides the SAME doc_id exchange the pid window
          // established (subset partitioning; only a local re-sort),
          // so the per-phrase-length aggregate + the (doc_id, pid)
          // join-back and the checkpoint between them disappear.
          // Integer count — bit-identical.
          val wp = tk
            .withColumn("brk",
              when(col("tok").isin(stops: _*) || col("tok") === "", 1L)
                .otherwise(0L))
            .withColumn("pid", sum("brk").over(w))
            .filter(col("brk") === 0)
            .withColumn("plen",
              count(lit(1)).over(Window.partitionBy("doc_id", "pid")))
            .localCheckpoint(eager = false) // word stats + phrase scoring
          val ws = wp.groupBy("tok")
            .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
            .withColumn("score",
              round(col("deg") / col("freq").cast("double"), 6))
          wp.join(broadcast(ws.select("tok", "score")), "tok")
            .groupBy("doc_id", "pid")
            .agg(
              concat_ws(" ", transform(
                array_sort(collect_list(struct(col("pos"), col("tok")))),
                x => x("tok"))).as("phrase"),
              round(sum("score"), 4).as("rake"))
            .groupBy("phrase")
            .agg(count(lit(1)).as("n_occ"), max("rake").as("rake"))
            .orderBy(col("rake").desc, col("phrase"))
            .limit(20)
        },
        Some {
          val stopsIn = graft.text.TextAnalytics.Stopwords
            .map(s0 => s"'$s0'").mkString(", ")
          s"""WITH tk AS (
             |  SELECT doc_id, i AS pos, t[i] AS tok
             |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t,
             |               unnest(generate_series(1, len(t))) AS i
             |        FROM documents)),
             |br AS (SELECT doc_id, pos, tok,
             |              CASE WHEN tok IN ($stopsIn) OR tok = '' THEN 1 ELSE 0 END AS brk
             |       FROM tk),
             |pp AS (SELECT doc_id, pos, tok, brk,
             |              sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
             |       FROM br),
             |phr AS (SELECT doc_id, pos, tok, pid FROM pp WHERE brk = 0),
             |ph AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen
             |       FROM phr GROUP BY doc_id, pid),
             |wp AS (SELECT phr.doc_id, phr.pid, phr.pos, phr.tok, ph.plen
             |       FROM phr JOIN ph USING (doc_id, pid)),
             |ws AS (SELECT tok, round(sum(plen) / CAST(count(*) AS DOUBLE), 6) AS score
             |       FROM wp GROUP BY tok),
             |ps AS (SELECT wp.doc_id, wp.pid,
             |              string_agg(wp.tok, ' ' ORDER BY wp.pos) AS phrase,
             |              round(sum(ws.score), 4) AS rake
             |       FROM wp JOIN ws USING (tok) GROUP BY wp.doc_id, wp.pid)
             |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ, max(rake) AS rake
             |FROM ps GROUP BY phrase
             |ORDER BY rake DESC, phrase LIMIT 20""".stripMargin
        }),

      // self-BLEU (BLEU-2) over the near-dup candidate pairs: the
      // n-gram-precision view of how much db copies da — catches
      // "same boilerplate, reordered" pairs whose Jaccard is already
      // high but whose BLEU reveals phrase-level copying. Clipped
      // unigram/bigram overlaps are two grouped equi-joins on the
      // pair frame (per-doc count tables, shuffle keyed by doc —
      // never a cross join); brevity penalty + geometric mean are
      // closed-form on the counts. Candidate pairs are checkpointed:
      // the shingle join runs once, both overlap joins read it.
      "text_selfbleu" -> Q(
        (s, d) => {
          val docs = docsUnder(s, d, 120)
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val pairs = dupEdges(s, d)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false) // unigram + bigram overlap joins
          val uni = docs.select(col("doc_id"), explode(toks).as("w"))
            .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          val big = docs
            .select(col("doc_id"),
              explode(when(size(toks) === 1, array()).otherwise(
                zip_with(slice(toks, lit(1), size(toks) - 1),
                         slice(toks, lit(2), size(toks) - 1),
                         (a, b) => concat_ws(" ", a, b)))).as("g"))
            .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          val len1 = uni.groupBy("doc_id").agg(sum("c").as("l1"))
          val len2 = big.groupBy("doc_id").agg(sum("c").as("l2"))
          val o1 = pairs
            .join(uni.toDF("da", "w", "ca"), "da")
            .join(uni.toDF("db", "w", "cb"), Seq("db", "w"))
            .groupBy("da", "db").agg(sum(least(col("ca"), col("cb"))).as("m1"))
          val o2 = pairs
            .join(big.toDF("da", "g", "ca"), "da")
            .join(big.toDF("db", "g", "cb"), Seq("db", "g"))
            .groupBy("da", "db").agg(sum(least(col("ca"), col("cb"))).as("m2"))
          pairs
            .join(o1, Seq("da", "db"), "left").join(o2, Seq("da", "db"), "left")
            .join(broadcast(len1.toDF("da", "la1")), "da")
            .join(broadcast(len1.toDF("db", "lb1")), "db")
            .join(broadcast(len2.toDF("da", "la2")), "da")
            .join(broadcast(len2.toDF("db", "lb2")), "db")
            .withColumn("p1", coalesce(col("m1"), lit(0L)) / col("lb1").cast("double"))
            .withColumn("p2", coalesce(col("m2"), lit(0L)) / col("lb2").cast("double"))
            .withColumn("bp",
              when(col("lb1") >= col("la1"), lit(1.0))
                .otherwise(exp(lit(1.0) - col("la1") / col("lb1").cast("double"))))
            .select(col("da"), col("db"),
              round(col("bp") * sqrt(col("p1") * col("p2")), 4).as("bleu2"))
            .orderBy("da", "db")
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                |         FROM documents WHERE doc_id < 120),
                |uni AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
                |        FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY doc_id, w),
                |big AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
                |        FROM (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
                |              FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                |                    FROM toks))
                |        GROUP BY doc_id, g),
                |len1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS l FROM uni GROUP BY doc_id),
                |len2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS l FROM big GROUP BY doc_id),
                |o1 AS (SELECT e0.da, e0.db, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m1
                |       FROM e0 JOIN uni a ON a.doc_id = e0.da
                |               JOIN uni b ON b.doc_id = e0.db AND b.w = a.w
                |       GROUP BY e0.da, e0.db),
                |o2 AS (SELECT e0.da, e0.db, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m2
                |       FROM e0 JOIN big a ON a.doc_id = e0.da
                |               JOIN big b ON b.doc_id = e0.db AND b.g = a.g
                |       GROUP BY e0.da, e0.db)
                |SELECT e0.da, e0.db,
                |       round(
                |         (CASE WHEN lb1.l >= la1.l THEN 1.0
                |               ELSE exp(1.0 - la1.l / CAST(lb1.l AS DOUBLE)) END)
                |         * sqrt((coalesce(o1.m1, 0) / CAST(lb1.l AS DOUBLE))
                |              * (coalesce(o2.m2, 0) / CAST(lb2.l AS DOUBLE))), 4) AS bleu2
                |FROM e0
                |LEFT JOIN o1 ON o1.da = e0.da AND o1.db = e0.db
                |LEFT JOIN o2 ON o2.da = e0.da AND o2.db = e0.db
                |JOIN len1 la1 ON la1.doc_id = e0.da
                |JOIN len1 lb1 ON lb1.doc_id = e0.db
                |JOIN len2 la2 ON la2.doc_id = e0.da
                |JOIN len2 lb2 ON lb2.doc_id = e0.db
                |ORDER BY e0.da, e0.db""".stripMargin)),

      // PII redaction (emails / phones / IPv4 → placeholder tokens) —
      // the scrub stage before text leaves the ingest boundary. The
      // synthetic corpus carries no PII, so the query seeds
      // deterministic doc_id-derived PII into each doc first; the
      // redaction itself (pattern set, application order, counts) is
      // what's under test, and the oracle rebuilds the same seeded
      // text and applies the same RE2-compatible patterns.
      "text_pii_redact" -> Q(
        (s, d) => {
          val seeded = Tables.documents(s, d).select(col("doc_id"),
            concat(col("text"),
              lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example.com call 555-"),
              lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
              lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
              lit(" host 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), ((col("doc_id") * 3) % 256).cast("string")).as("text"))
          graft.text.Pii.redact(seeded)
            .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
              graft.functions.VectorFunctions.md5Long(col("redacted")).as("h"))
            .orderBy("doc_id")
        },
        Some("""WITH seeded AS (
               |  SELECT doc_id,
               |         text || ' contact user' || CAST(doc_id AS VARCHAR)
               |              || '@mail.example.com call 555-'
               |              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
               |              || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
               |              || ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
               |              || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR) AS text
               |  FROM documents)
               |SELECT doc_id,
               |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               |       CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
               |       CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
               |       ('0x' || substr(md5(
               |         regexp_replace(regexp_replace(regexp_replace(text,
               |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               |           '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
               |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')), 1, 15))::BIGINT AS h
               |FROM seeded ORDER BY doc_id""".stripMargin)),

      // per-doc top-3 terms by tf-idf (keyword extraction; BM25's
      // corpus-side complement)
      "text_tfidf" -> Q(
        (s, d) => graft.text.TextAnalytics.tfidfTopTerms(Tables.documents(s, d), 3),
        Some("""WITH tf AS (
               |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
               |  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY doc_id, tok),
               |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
               |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
               |SELECT doc_id, tok, tf, df, tfidf, rank FROM (
               |  SELECT doc_id, tok, tf, df, round(tf * ln(n / df), 4) AS tfidf,
               |         CAST(row_number() OVER (PARTITION BY doc_id
               |              ORDER BY round(tf * ln(n / df), 4) DESC, tok) AS BIGINT) AS rank
               |  FROM tf JOIN df USING (tok), n)
               |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

      // the reference's ingest+search path end-to-end: chunk →
      // deterministic embed → cosine top-k over (DocId, ChunkId) keys
      "text_chunk_search" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val chunks = graft.text.Chunker.chunkDocs(
              Tables.documents(s, d).filter(col("doc_id") < 200), 500, 400)
            .select((col("doc_id") * 1000 + col("chunk_id")).as("ckey"), col("chunk"))
          val raw = graft.embed.HashEmbedder.embedDocsRaw(chunks, "ckey", "chunk", 64)
          val q = raw.filter(col("ckey") === 3000).select(col("embedding").as("qv"))
          raw.crossJoin(broadcast(q))
            .select(col("ckey"), score(col("embedding"), col("qv")).as("score"))
            .orderBy(col("score").desc, col("ckey"))
            .limit(10)
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH chunks AS (
             |  SELECT doc_id * 1000 + (st - 1) // 400 AS doc_id,
             |         substring(text, st, 500) AS text
             |  FROM (SELECT doc_id, text,
             |               unnest(generate_series(1, length(text), 400)) AS st
             |        FROM documents WHERE doc_id < 200)),
             |sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64, "chunks")}),
             |q AS (SELECT * FROM sums WHERE doc_id = 3000)
             |SELECT ckey,
             |       round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                  ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS score
             |FROM (SELECT s.doc_id AS ckey, ($dot) AS dot, ($na) AS na, ($nb) AS nb
             |      FROM sums s, q)
             |ORDER BY score DESC, ckey LIMIT 10""".stripMargin
        }),

      // corpus bigram LM quality scoring: avg add-one-smoothed
      // log P(w2|w1) per doc — the LM-perplexity-style quality filter
      "text_lm_score" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          val docs = Tables.documents(s, d)
          def bigrams(df: DataFrame) = df
            .select(col("doc_id"), explode(when(size(toks) === 1, array()).otherwise(
              zip_with(slice(toks, lit(1), size(toks) - 1),
                       slice(toks, lit(2), size(toks) - 1),
                       (a, b) => struct(a.as("w1"), b.as("w2"))))).as("bg"))
            .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          val uni = docs.select(explode(toks).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("c1"))
          val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
          val bi = bigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("nb"))
          bigrams(docs.filter(col("doc_id") < 100))
            .join(broadcast(bi), Seq("w1", "w2"))
            .join(broadcast(uni.withColumnRenamed("tok", "w1")), "w1")
            .crossJoin(broadcast(vocab))
            .select(col("doc_id"),
              log((col("nb") + lit(1.0)) / (col("c1") + col("v"))).as("lp"))
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_bigrams"), round(avg("lp"), 4).as("lm_score"))
            .orderBy("doc_id")
        },
        Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |              FROM documents),
               |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1
               |        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
               |vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
               |allbg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
               |          FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
               |                FROM toks)),
               |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS nb
               |       FROM allbg GROUP BY w1, w2)
               |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               |       round(avg(ln((nb + 1.0) / (c1 + v))), 4) AS lm_score
               |FROM (SELECT a.doc_id, ln((nb + 1.0) / (c1 + v)) AS lp, nb, c1, v
               |      FROM allbg a JOIN bi USING (w1, w2)
               |                   JOIN (SELECT tok AS w1, c1 FROM uni) USING (w1),
               |           vocab
               |      WHERE a.doc_id < 100)
               |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

      // corpus statistics: token-bigram frequencies (non-distinct —
      // true occurrence counts, unlike the dedup shingle sets)
      "text_bigram_freq" -> Q(
        (s, d) => {
          val toks = graft.text.TextPrimitives.tokens(col("text"))
          // zip_with of the two shifted views beats the
          // sequence+slice-per-index formulation 5× (one array op per
          // doc, no per-bigram slice allocs); 1-token docs emit the
          // lone token, same as the oracle's slice semantics
          Tables.documents(s, d)
            .select(explode(when(size(toks) === 1, toks).otherwise(
              zip_with(slice(toks, lit(1), size(toks) - 1),
                       slice(toks, lit(2), size(toks) - 1),
                       (a, b) => concat(a, lit(" "), b)))).as("bigram"))
            .groupBy("bigram").agg(count(lit(1)).as("n"))
            .orderBy(col("n").desc, col("bigram"))
            .limit(20)
        },
        Some("""SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM (
               |  SELECT array_to_string(toks[i+1:i+2], ' ') AS bigram FROM (
               |    SELECT toks, unnest(generate_series(0, greatest(len(toks) - 2, 0))) AS i FROM (
               |      SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
               |      FROM documents)))
               |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin)),

      "text_length_stats" -> Q(
        (s, d) => Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
               round(avg(length(col("text"))), 4).as("avg_len"),
               round(stddev(length(col("text"))), 4).as("sd_len"),
               min(length(col("text"))).cast("long").as("min_len"),
               max(length(col("text"))).cast("long").as("max_len"))
          .orderBy("lang"),
        Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
               |       round(avg(length(text)), 4) AS avg_len,
               |       round(stddev_samp(length(text)), 4) AS sd_len,
               |       CAST(min(length(text)) AS BIGINT) AS min_len,
               |       CAST(max(length(text)) AS BIGINT) AS max_len
               |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

      // Theil T inequality index of per-doc token counts per source —
      // the additively-decomposable complement to stat_gini, and
      // cheaper: T = Σ x·ln(x) / Σx − ln(Σx/n) needs ONE grouped agg
      // over (source, length) counts, no window at all. x=0 rows
      // contribute 0 (the x·ln x limit), so empty docs can't NaN it.
      "stat_theil" -> Q(
        (s, d) => {
          val grp = Tables.documents(s, d)
            .select(col("source"),
              size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"))
            .groupBy("source", "x").agg(count(lit(1)).as("c"))
          grp.groupBy("source")
            .agg(sum("c").as("n"), sum(expr("x * c")).as("sx"),
                 sum(expr("CASE WHEN x = 0 THEN 0.0 " +
                   "ELSE c * x * ln(CAST(x AS DOUBLE)) END")).as("sxlx"))
            .select(col("source"), col("n"),
              when(col("sx") === 0, lit(null).cast("double"))
                .otherwise(round(col("sxlx") / col("sx")
                  - log(col("sx").cast("double") / col("n")), 4)).as("theil"))
            .orderBy("source")
        },
        Some("""WITH grp AS (
               |  SELECT source, x, CAST(count(*) AS BIGINT) AS c
               |  FROM (SELECT source,
               |          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x
               |        FROM documents)
               |  GROUP BY source, x)
               |SELECT source, CAST(sum(c) AS BIGINT) AS n,
               |       CASE WHEN sum(x * c) = 0 THEN NULL ELSE
               |         round(sum(CASE WHEN x = 0 THEN 0.0 ELSE c * x * ln(CAST(x AS DOUBLE)) END)
               |                 / sum(x * c)
               |               - ln(CAST(sum(x * c) AS DOUBLE) / sum(c)), 4) END AS theil
               |FROM grp GROUP BY source ORDER BY source""".stripMargin)),

      // per-term burstiness (variance-to-mean ratio of per-doc counts,
      // zeros included) for the top-20 df terms: VMR = (Q − S²/N)/S
      // from S=Σtf, Q=Σtf² — docs NOT containing the term enter
      // through N alone, so no dense fan-out is ever materialized.
      // VMR≈(1−S/N) for scattered terms, ≫1 for topical ones; the
      // feature behind tf-idf-style topicality weighting. Same
      // semi-join-below-agg bound as text_postings.
      "text_burstiness" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val tf = docs
            .select(col("doc_id"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("term"))
            .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
          val nDocs = docs.agg(countDistinct("doc_id").as("nd"))
          val top = tf.groupBy("term").agg(count(lit(1)).as("df2"))
            .orderBy(col("df2").desc, col("term")).limit(20)
          tf.join(top, Seq("term"), "left_semi")
            .groupBy("term")
            .agg(count(lit(1)).as("df"), sum("tf").as("s"),
                 sum(expr("tf * tf")).as("q"))
            .crossJoin(broadcast(nDocs))
            .select(col("term"), col("df"),
              round((col("q") - col("s").cast("double") * col("s") / col("nd"))
                / col("s"), 4).as("vmr"))
            .orderBy(col("df").desc, col("term"))
        },
        Some("""WITH tf AS (
               |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
               |  FROM (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
               |        FROM documents)
               |  GROUP BY term, doc_id),
               |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM documents),
               |top AS (SELECT term FROM tf GROUP BY term
               |        ORDER BY count(*) DESC, term LIMIT 20),
               |a AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS s,
               |             CAST(sum(tf * tf) AS BIGINT) AS q
               |      FROM tf JOIN top USING (term) GROUP BY term)
               |SELECT term, df, round((q - CAST(s AS DOUBLE) * s / nd) / s, 4) AS vmr
               |FROM a, nd ORDER BY df DESC, term""".stripMargin)),

      // source-pair vocabulary Jaccard: which sources speak the same
      // language? Distinct (source, token) first — shuffle ∝ vocab ×
      // sources, never corpus size — then an equi-join on token whose
      // per-token fan-out is bounded by |sources|; output ≤ |sources|²
      // pairs. The corpus-mix audit behind samp_domain_mix.
      "text_source_similarity" -> Q(
        (s, d) => {
          val st = Tables.documents(s, d)
            .select(col("source"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .distinct()
          val cnt = st.groupBy("source").agg(count(lit(1)).as("c"))
          st.toDF("sa", "tok").join(st.toDF("sb", "tok2"),
              col("tok") === col("tok2") && col("sa") < col("sb"))
            .groupBy("sa", "sb").agg(count(lit(1)).as("ni"))
            .join(broadcast(cnt.toDF("sa", "ca")), "sa")
            .join(broadcast(cnt.toDF("sb", "cb")), "sb")
            .select(col("sa"), col("sb"),
              round(col("ni") / (col("ca") + col("cb") - col("ni")), 4).as("jaccard"))
            .orderBy("sa", "sb")
        },
        Some("""WITH st AS (
               |  SELECT DISTINCT source, tok
               |  FROM (SELECT source,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)),
               |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS c FROM st GROUP BY source),
               |i AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS ni
               |      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
               |      GROUP BY sa, sb)
               |SELECT sa, sb, round(ni * 1.0 / (ca.c + cb.c - ni), 4) AS jaccard
               |FROM i JOIN cnt ca ON ca.source = sa JOIN cnt cb ON cb.source = sb
               |ORDER BY sa, sb""".stripMargin)),

      // KMV (bottom-k / theta-sketch) distinct sketches of each
      // source's vocabulary, with pairwise union / intersection /
      // Jaccard ESTIMATES from sketch merges alone. The sketch build
      // is the bounded TopK partial aggregate (k hashes per source per
      // map task — the mergeable form), pairs merge ≤64-element arrays
      // on the driver-free broadcast cross of the |S|-row sketch
      // table, and every estimate is deterministic (content hash, no
      // rand), so the DuckDB oracle reproduces it bit-for-bit: the
      // mergeability-plus-determinism combination that lets 100 TB
      // set-overlap questions run on kilobytes of state.
      "text_kmv_vocab" -> Q(
        (s, d) => {
          val K = 64
          val M = 1125899906842624L // 2^50: hash domain, exact in double
          import graft.functions.VectorFunctions.md5Long
          val st = Tables.documents(s, d)
            .select(col("source"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("term"))
            .select(col("source"),
              (md5Long(concat(lit("kmv:"), col("term"))) % M).as("h"))
            .distinct()
          val sk = st.groupBy("source")
            .agg(graft.ops.TopK.topk(K)(-col("h").cast("double"), col("h")).as("tk"))
            .select(col("source"), expr("transform(tk, x -> x.id)").as("hs"))
            .localCheckpoint(eager = false) // both sides of the pair cross
          sk.select(col("source").as("sa"), col("hs").as("ha"))
            .crossJoin(broadcast(sk.select(col("source").as("sb"), col("hs").as("hb"))))
            .filter(col("sa") < col("sb"))
            .withColumn("u", array_sort(array_union(col("ha"), col("hb"))))
            .withColumn("m", least(size(col("u")), lit(K)))
            .withColumn("v", expr("element_at(u, m)"))
            .withColumn("fst", slice(col("u"), 1, K))
            .withColumn("c", size(array_intersect(
              array_intersect(col("fst"), col("ha")), col("hb"))))
            .withColumn("est",
              when(col("m") >= K, lit((K - 1).toDouble * M) / col("v"))
                .otherwise(col("m").cast("double")))
            // ρ divides by min(K, m): a union sketch smaller than K
            // holds the ENTIRE union, so the estimate degrades
            // gracefully into the exact answer on small sets
            .select(col("sa"), col("sb"),
              round(col("est"), 1).as("union_est"),
              round(col("c") / col("m").cast("double") * col("est"), 1).as("inter_est"),
              round(col("c") / col("m").cast("double"), 4).as("jacc_est"))
            .orderBy("sa", "sb")
        },
        Some("""WITH st AS (SELECT DISTINCT source,
               |              ('0x' || substr(md5('kmv:' || tok), 1, 15))::BIGINT
               |                % 1125899906842624 AS h
               |            FROM (SELECT source,
               |                    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |                  FROM documents)),
               |sk AS (SELECT source, h,
               |              row_number() OVER (PARTITION BY source ORDER BY h) AS rn
               |       FROM st),
               |s64 AS (SELECT source, h FROM sk WHERE rn <= 64),
               |srcs AS (SELECT DISTINCT source FROM st),
               |pairs AS (SELECT a.source AS sa, b.source AS sb
               |          FROM srcs a JOIN srcs b ON a.source < b.source),
               |u AS (SELECT sa, sb, h FROM pairs JOIN s64 ON source = sa
               |      UNION
               |      SELECT sa, sb, h FROM pairs JOIN s64 ON source = sb),
               |ur AS (SELECT sa, sb, h,
               |              row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
               |       FROM u),
               |base AS (SELECT sa, sb, max(CASE WHEN rn <= 64 THEN h END) AS v,
               |                CAST(sum(CASE WHEN rn <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS m
               |         FROM ur GROUP BY sa, sb),
               |bth AS (SELECT ur.sa, ur.sb, CAST(count(*) AS BIGINT) AS c
               |        FROM ur JOIN s64 x ON x.source = ur.sa AND x.h = ur.h
               |                JOIN s64 y ON y.source = ur.sb AND y.h = ur.h
               |        WHERE ur.rn <= 64 GROUP BY ur.sa, ur.sb),
               |est AS (SELECT base.sa, base.sb, coalesce(c, 0) AS c, m,
               |               CASE WHEN m >= 64 THEN 63 * 1125899906842624.0 / v
               |                    ELSE CAST(m AS DOUBLE) END AS est
               |        FROM base LEFT JOIN bth ON bth.sa = base.sa AND bth.sb = base.sb)
               |SELECT sa, sb, round(est, 1) AS union_est,
               |       round(c / CAST(m AS DOUBLE) * est, 1) AS inter_est,
               |       round(c / CAST(m AS DOUBLE), 4) AS jacc_est
               |FROM est ORDER BY sa, sb""".stripMargin)),

      // per-source OLS fit of n_chars on token count — distributed
      // least squares via the Gram-matrix trick: ONE grouped agg
      // collects (n, Σx, Σy, Σx², Σxy, Σy²) and the closed form runs
      // on the |sources|-row frame. x and y are integers, so the
      // sums are EXACT in double (no cross-engine association drift)
      // up to 2^53; every product is taken in double to survive
      // 1e9-row groups (the stat_gini overflow lesson).
      "stat_ols_fit" -> Q(
        (s, d) => {
          val t = Tables.documents(s, d).select(col("source"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("double").as("x"),
            col("n_chars").cast("double").as("y"))
          t.groupBy("source").agg(
              count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
              sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
              sum(expr("y * y")).as("syy"))
            .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
            .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
            .withColumn("cv", col("n") * col("sxy") - col("sx") * col("sy"))
            .select(col("source"), col("n"),
              when(col("dx") === 0, lit(null).cast("double"))
                .otherwise(round(col("cv") / col("dx"), 6)).as("slope"),
              when(col("dx") === 0, lit(null).cast("double"))
                .otherwise(round((col("sy") - col("cv") / col("dx") * col("sx"))
                  / col("n"), 4)).as("intercept"),
              when(col("dx") === 0 || col("dy") === 0, lit(null).cast("double"))
                .otherwise(round(col("cv") * col("cv")
                  / (col("dx") * col("dy")), 6)).as("r2"))
            .orderBy("source")
        },
        Some("""WITH t AS (
               |  SELECT source,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS x,
               |         CAST(n_chars AS DOUBLE) AS y
               |  FROM documents),
               |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
               |             sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
               |             sum(x*y) AS sxy, sum(y*y) AS syy
               |      FROM t GROUP BY source),
               |b AS (SELECT source, n, n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy,
               |             n*sxy - sx*sy AS cv, sx, sy FROM a)
               |SELECT source, n,
               |       CASE WHEN dx = 0 THEN NULL ELSE round(cv / dx, 6) END AS slope,
               |       CASE WHEN dx = 0 THEN NULL
               |            ELSE round((sy - cv / dx * sx) / n, 4) END AS intercept,
               |       CASE WHEN dx = 0 OR dy = 0 THEN NULL
               |            ELSE round(cv * cv / (dx * dy), 6) END AS r2
               |FROM b ORDER BY source""".stripMargin)),

      // Mann-Whitney U (en token counts vs all other languages) via
      // value-histogram midranks: ranks come from the (value → count)
      // frame (≤ distinct token counts, the stat_gini bound), so no
      // global row_number over docs ever runs. Tie-corrected normal
      // z uses Σ(t³−t); n1·n2 goes through double (long wraps at 1e9).
      "stat_mwu" -> Q(
        (s, d) => {
          val t = Tables.documents(s, d).select(
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          val h = t.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
          val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
          h.withColumn("below", coalesce(sum("nx").over(w), lit(0L)))
            .withColumn("midrank",
              col("below").cast("double") + (col("nx") + 1) / 2.0)
            .agg(sum("n1x").as("n1"), sum(col("nx") - col("n1x")).as("n2"),
                 sum(col("n1x") * col("midrank")).as("r1"),
                 sum(col("nx") * col("nx") * col("nx") - col("nx")).as("tie3"),
                 sum("nx").as("nn"))
            .select(col("n1"), col("n2"),
              round(col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2, 1).as("u1"),
              round((col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2
                     - col("n1").cast("double") * col("n2") / 2)
                / sqrt(col("n1").cast("double") * col("n2") / 12
                       * (col("nn") + 1 - col("tie3").cast("double")
                          / (col("nn").cast("double") * (col("nn") - 1)))), 4).as("z"))
        },
        Some("""WITH t AS (
               |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
               |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
               |  FROM documents),
               |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS n1x,
               |             CAST(count(*) AS BIGINT) AS nx FROM t GROUP BY x),
               |r AS (SELECT x, n1x, nx,
               |        CAST(coalesce(sum(nx) OVER (ORDER BY x
               |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               |          + (nx + 1) / 2.0 AS midrank
               |      FROM h),
               |a AS (SELECT CAST(sum(n1x) AS BIGINT) AS n1,
               |             CAST(sum(nx - n1x) AS BIGINT) AS n2,
               |             sum(n1x * midrank) AS r1,
               |             CAST(sum(nx*nx*nx - nx) AS BIGINT) AS tie3,
               |             CAST(sum(nx) AS BIGINT) AS nn FROM r)
               |SELECT n1, n2,
               |       round(r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2, 1) AS u1,
               |       round((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2
               |              - CAST(n1 AS DOUBLE) * n2 / 2)
               |         / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
               |                * (nn + 1 - CAST(tie3 AS DOUBLE)
               |                   / (CAST(nn AS DOUBLE) * (nn - 1)))), 4) AS z
               |FROM a""".stripMargin)),

      // one-way ANOVA F across ALL language groups on document length:
      // the k-group generalization of stat_welch_ttest. Uses the
      // computational sum-of-squares identity (SSB = Σ s²/n − (Σs)²/N)
      // so the whole test is one grouped pass plus one aggregate over
      // the |langs|-row frame — no grand-mean join, no second scan.
      // Cancellation is benign here: SSB ≈ 7e4 out of ~8e7
      // intermediates loses 3 of double's 16 digits, and both engines
      // agree within the round-2 report.
      "stat_anova" -> Q(
        (s, d) => {
          val x = col("n_chars").cast("double")
          Tables.documents(s, d)
            .groupBy("lang")
            .agg(count(lit(1)).cast("double").as("n"),
                 sum(x).as("s"), sum(x * x).as("ss"))
            .agg(count(lit(1)).as("k"), sum("n").as("nn"), sum("s").as("st"),
                 sum("ss").as("sst"),
                 sum(col("s") * col("s") / col("n")).as("sb"))
            .select(col("k").cast("long").as("k_groups"),
                    col("nn").cast("long").as("n_total"),
                    round(col("sb") - col("st") * col("st") / col("nn"), 2)
                      .as("ss_between"),
                    round(col("sst") - col("sb"), 2).as("ss_within"),
                    round(((col("sb") - col("st") * col("st") / col("nn"))
                             / (col("k") - 1))
                          / ((col("sst") - col("sb")) / (col("nn") - col("k"))), 4)
                      .as("f_stat"))
        },
        Some("""WITH g AS (
               |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
               |         sum(CAST(n_chars AS DOUBLE)) AS s,
               |         sum(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS ss
               |  FROM documents GROUP BY lang)
               |SELECT CAST(count(*) AS BIGINT) AS k_groups,
               |       CAST(sum(n) AS BIGINT) AS n_total,
               |       round(sum(s*s/n) - sum(s)*sum(s)/sum(n), 2) AS ss_between,
               |       round(sum(ss) - sum(s*s/n), 2) AS ss_within,
               |       round((sum(s*s/n) - sum(s)*sum(s)/sum(n)) / (count(*) - 1)
               |             / ((sum(ss) - sum(s*s/n)) / (sum(n) - count(*))), 4) AS f_stat
               |FROM g""".stripMargin)),

      // Spearman rank correlation (doc chars vs tokens) the scale-safe
      // way: tied average ranks come from VALUE-level cumulative
      // counts (the stat_gini idiom — the global window runs over
      // |distinct values| rows, bounded by max document length, never
      // over the corpus), then the per-row ranks arrive by joining the
      // two broadcast value→rank maps back and ρ is one corr() pass.
      "stat_spearman" -> Q(
        (s, d) => {
          val base = Tables.documents(s, d)
            .select(col("n_chars").cast("long").as("x"),
              size(graft.text.TextPrimitives.tokens(col("text")))
                .cast("long").as("y"))
            .localCheckpoint(eager = false) // read 3×: two rank maps + rows
          def rankMap(c: String) = {
            val w = Window.orderBy(c).rowsBetween(Window.unboundedPreceding, -1)
            base.groupBy(c).agg(count(lit(1)).as("cnt"))
              .withColumn("f", coalesce(sum("cnt").over(w), lit(0L)))
              .select(col(c),
                (col("f") + (col("cnt") + lit(1)) / lit(2.0)).as(s"rank_$c"))
          }
          base.join(broadcast(rankMap("x")), "x")
            .join(broadcast(rankMap("y")), "y")
            .agg(count(lit(1)).cast("long").as("n"),
                 round(corr(col("rank_x"), col("rank_y")), 4).as("rho"))
        },
        Some("""WITH b AS (
               |  SELECT CAST(n_chars AS BIGINT) AS x,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS y
               |  FROM documents),
               |rx AS (SELECT x, coalesce(sum(cnt) OVER (ORDER BY x
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               |           + (cnt + 1) / 2.0 AS rank_x
               |       FROM (SELECT x, count(*) AS cnt FROM b GROUP BY x)),
               |ry AS (SELECT y, coalesce(sum(cnt) OVER (ORDER BY y
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               |           + (cnt + 1) / 2.0 AS rank_y
               |       FROM (SELECT y, count(*) AS cnt FROM b GROUP BY y))
               |SELECT CAST(count(*) AS BIGINT) AS n,
               |       round(corr(rank_x, rank_y), 4) AS rho
               |FROM b JOIN rx USING (x) JOIN ry USING (y)""".stripMargin)),

      // normalized mutual information between the lang and source
      // labels — "does source predict language?" in one number. All
      // information terms come off the checkpointed |langs|×|sources|
      // contingency cells (joint + both marginals + total), so after
      // the one grouped corpus pass everything is crosses of broadcast
      // single-row frames (the stat_cohens_kappa shape).
      "stat_nmi" -> Q(
        (s, d) => {
          val cells = Tables.documents(s, d).groupBy("lang", "source")
            .agg(count(lit(1)).cast("double").as("n"))
            .localCheckpoint(eager = false) // read 4×: joint, marginals, total
          val tot = cells.agg(sum("n").as("nn"))
          val rm = cells.groupBy("lang").agg(sum("n").as("r"))
          val cm = cells.groupBy("source").agg(sum("n").as("c"))
          val mi = cells.join(broadcast(rm), "lang").join(broadcast(cm), "source")
            .crossJoin(broadcast(tot))
            .agg(sum(col("n") / col("nn")
              * log(col("n") * col("nn") / (col("r") * col("c")))).as("mi"))
          val hl = rm.crossJoin(broadcast(tot))
            .agg(sum(col("r") / col("nn") * log(col("nn") / col("r"))).as("h_lang"))
          val hs = cm.crossJoin(broadcast(tot))
            .agg(sum(col("c") / col("nn") * log(col("nn") / col("c"))).as("h_source"))
          broadcast(mi).crossJoin(broadcast(hl)).crossJoin(broadcast(hs))
            .select(round(col("mi"), 6).as("mi"),
                    round(col("h_lang"), 6).as("h_lang"),
                    round(col("h_source"), 6).as("h_source"),
                    round(col("mi") / sqrt(col("h_lang") * col("h_source")), 4)
                      .as("nmi"))
        },
        Some("""WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
               |           FROM documents GROUP BY lang, source),
               |t AS (SELECT sum(n) AS nn FROM c),
               |r AS (SELECT lang, sum(n) AS r FROM c GROUP BY lang),
               |co AS (SELECT source, sum(n) AS c2 FROM c GROUP BY source),
               |mi AS (SELECT sum(n / nn * ln(n * nn / (r * c2))) AS mi
               |       FROM c JOIN r USING (lang) JOIN co USING (source), t),
               |hl AS (SELECT sum(r / nn * ln(nn / r)) AS h_lang FROM r, t),
               |hs AS (SELECT sum(c2 / nn * ln(nn / c2)) AS h_source FROM co, t)
               |SELECT round(mi, 6) AS mi, round(h_lang, 6) AS h_lang,
               |       round(h_source, 6) AS h_source,
               |       round(mi / sqrt(h_lang * h_source), 4) AS nmi
               |FROM mi, hl, hs""".stripMargin)),

      // Kruskal–Wallis H (rank-based ANOVA) of doc length across
      // languages — the non-parametric twin of stat_anova. Tied
      // average ranks come from the VALUE-level histogram (the
      // stat_spearman idiom: the global window runs over |distinct
      // lengths| rows, never the corpus) and are carried in exact
      // HALF-UNIT longs (rank2 = 2·rank), so the per-group rank sums
      // are integer math — no double summation-order drift. The
      // tie-correction sums t³−t per value (integer-valued doubles:
      // exact until t³ > 2^53). Per-group rank sums come straight off
      // the |langs|×|lengths| cell frame; rows are never re-joined.
      "stat_kruskal" -> Q(
        (s, d) => {
          val cells = Tables.documents(s, d)
            .groupBy(col("lang"), col("n_chars").cast("long").as("x"))
            .agg(count(lit(1)).as("cnt"))
            .localCheckpoint(eager = false) // read 2×: value ranks + group sums
          val wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
          val ranks = cells.groupBy("x").agg(sum("cnt").as("t"))
            .withColumn("f", coalesce(sum("t").over(wx), lit(0L)))
            .select(col("x"), col("t"),
              (col("f") * 2 + col("t") + 1).as("rank2"))
            .localCheckpoint(eager = false) // read 2×: rank join + tie term
          val grp = cells.join(broadcast(ranks), "x")
            .groupBy("lang").agg(sum("cnt").as("n_g"),
              sum(col("cnt") * col("rank2")).as("r2_g"))
          val ties = ranks.agg(
            sum(col("t").cast("double") * col("t") * col("t") - col("t"))
              .as("tie"))
          grp.agg(count(lit(1)).as("k"), sum("n_g").as("nn"),
              sum(col("r2_g").cast("double") * col("r2_g")
                / (col("n_g") * 4.0)).as("sr"))
            .crossJoin(broadcast(ties))
            .select(col("nn").cast("long").as("n"),
              col("k").cast("long").as("k_groups"),
              round(lit(12.0) / (col("nn").cast("double") * (col("nn") + 1))
                * col("sr") - lit(3.0) * (col("nn") + 1), 4).as("h"),
              round(lit(1.0) - col("tie")
                / (col("nn").cast("double") * col("nn") * col("nn")
                  - col("nn")), 6).as("tie_c"))
            .withColumn("h_adj", round(col("h") / col("tie_c"), 4))
        },
        Some("""WITH cells AS (SELECT lang, CAST(n_chars AS BIGINT) AS x,
               |                      count(*) AS cnt
               |               FROM documents GROUP BY lang, x),
               |hx AS (SELECT x, sum(cnt) AS t FROM cells GROUP BY x),
               |rk AS (SELECT x, t,
               |         coalesce(sum(t) OVER (ORDER BY x ROWS BETWEEN
               |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
               |           + t + 1 AS rank2
               |       FROM hx),
               |g AS (SELECT lang, sum(cnt) AS n_g, sum(cnt * rank2) AS r2_g
               |      FROM cells JOIN rk USING (x) GROUP BY lang),
               |tt AS (SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie FROM rk),
               |ag AS (SELECT count(*) AS k, sum(n_g) AS nn,
               |         sum(CAST(r2_g AS DOUBLE) * r2_g / (n_g * 4.0)) AS sr
               |       FROM g)
               |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
               |       round(12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * sr
               |             - 3.0 * (nn + 1), 4) AS h,
               |       round(1.0 - tie / (CAST(nn AS DOUBLE) * nn * nn - nn), 6)
               |         AS tie_c,
               |       round(round(12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * sr
               |                   - 3.0 * (nn + 1), 4)
               |             / round(1.0 - tie / (CAST(nn AS DOUBLE) * nn * nn - nn),
               |                     6), 4) AS h_adj
               |FROM ag, tt""".stripMargin)),

      // Brown–Forsythe (median-based Levene) test: does doc-length
      // VARIANCE differ across languages? z = |x − median_g| via one
      // exact per-group percentile + broadcast join-back, then the
      // stat_anova computational identity on z. Deviations are
      // carried as exact DOUBLED longs (median of integers is always
      // j or j.5, so 2z is integer) — the group sums Σz and Σz² are
      // integer math, immune to summation order.
      "stat_levene" -> Q(
        (s, d) => {
          val base = Tables.documents(s, d)
            .select(col("lang"), col("n_chars").cast("long").as("x"))
            .localCheckpoint(eager = false) // read 2×: medians + deviations
          val med = base.groupBy("lang")
            .agg(expr("percentile(x, 0.5D)").as("med"))
          val g = base.join(broadcast(med), "lang")
            .select(col("lang"),
              abs(col("x") * 2 - (col("med") * 2).cast("long")).as("z2"))
            .groupBy("lang").agg(count(lit(1)).cast("double").as("n"),
              sum("z2").cast("double").as("s2"),
              sum(col("z2") * col("z2")).cast("double").as("ss4"))
          g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
              sum(col("s2") / 2.0).as("st"),
              sum(col("ss4") / 4.0).as("sst"),
              sum(col("s2") * col("s2") / (col("n") * 4.0)).as("sb"))
            .select(col("k").cast("long").as("k_groups"),
              col("nn").cast("long").as("n_total"),
              round(col("sb") - col("st") * col("st") / col("nn"), 2)
                .as("ss_between"),
              round(col("sst") - col("sb"), 2).as("ss_within"),
              round(((col("sb") - col("st") * col("st") / col("nn"))
                       / (col("k") - 1))
                    / ((col("sst") - col("sb")) / (col("nn") - col("k"))), 4)
                .as("f_stat"))
        },
        Some("""WITH b AS (SELECT lang, CAST(n_chars AS BIGINT) AS x
               |           FROM documents),
               |m AS (SELECT lang, quantile_cont(x, 0.5) AS med
               |      FROM b GROUP BY lang),
               |g AS (SELECT b.lang, CAST(count(*) AS DOUBLE) AS n,
               |        CAST(sum(abs(b.x * 2 - CAST(m.med * 2 AS BIGINT)))
               |          AS DOUBLE) AS s2,
               |        CAST(sum(abs(b.x * 2 - CAST(m.med * 2 AS BIGINT))
               |               * abs(b.x * 2 - CAST(m.med * 2 AS BIGINT)))
               |          AS DOUBLE) AS ss4
               |      FROM b JOIN m USING (lang) GROUP BY b.lang)
               |SELECT CAST(count(*) AS BIGINT) AS k_groups,
               |       CAST(sum(n) AS BIGINT) AS n_total,
               |       round(sum(s2*s2/(n*4.0))
               |             - sum(s2/2.0)*sum(s2/2.0)/sum(n), 2) AS ss_between,
               |       round(sum(ss4/4.0) - sum(s2*s2/(n*4.0)), 2) AS ss_within,
               |       round((sum(s2*s2/(n*4.0))
               |              - sum(s2/2.0)*sum(s2/2.0)/sum(n)) / (count(*) - 1)
               |             / ((sum(ss4/4.0) - sum(s2*s2/(n*4.0)))
               |                / (sum(n) - count(*))), 4) AS f_stat
               |FROM g""".stripMargin)),

      // deterministic half-sample bootstrap of the mean tokens/doc:
      // 32 replicates, membership by salted content-stable hash parity
      // (the Sampling idiom — rerun/repartition never moves a doc
      // between replicates). ONE corpus scan computes all 64
      // conditional sums map-side; the replicate means stack into a
      // 32-row frame whose summary (SE + percentile CI) is
      // constant-cost at any corpus size. Replicate means rounded to
      // 6 before the summary so both engines interpolate identical
      // quantile inputs.
      "samp_bootstrap" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val B = 32
          val base = Tables.documents(s, d).select(col("doc_id").as("id"),
            size(graft.text.TextPrimitives.tokens(col("text")))
              .cast("double").as("x"))
          def mem(b: Int) =
            md5Long(concat(lit(s"boot:$b:"), col("id").cast("string"))) % 2 === 0
          val aggs = (0 until B).flatMap(b => Seq(
            sum(when(mem(b), col("x"))).as(s"s$b"),
            sum(when(mem(b), lit(1.0))).as(s"c$b")))
          val stackArgs = (0 until B)
            .map(b => s"$b, round(s$b / c$b, 6)").mkString(", ")
          base.agg(aggs.head, aggs.tail: _*)
            .select(expr(s"stack($B, $stackArgs) AS (rep, m)"))
            .agg(count(lit(1)).as("n_reps"),
                 round(avg("m"), 4).as("boot_mean"),
                 round(stddev_samp(col("m")), 4).as("boot_se"),
                 round(expr("percentile(m, 0.025D)"), 4).as("ci_lo"),
                 round(expr("percentile(m, 0.975D)"), 4).as("ci_hi"))
        },
        Some("""WITH base AS (
               |  SELECT doc_id AS id,
               |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS x
               |  FROM documents),
               |reps AS (
               |  SELECT rb, round(avg(x), 6) AS m
               |  FROM base, range(32) t(rb)
               |  WHERE ('0x' || substr(md5('boot:' || CAST(rb AS VARCHAR) || ':'
               |           || CAST(id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
               |  GROUP BY rb)
               |SELECT CAST(count(*) AS BIGINT) AS n_reps,
               |       round(avg(m), 4) AS boot_mean,
               |       round(stddev_samp(m), 4) AS boot_se,
               |       round(quantile_cont(m, 0.025), 4) AS ci_lo,
               |       round(quantile_cont(m, 0.975), 4) AS ci_hi
               |FROM reps""".stripMargin)),

      // Poisson bootstrap of the mean tokens/doc — the industry-
      // standard AT-SCALE bootstrap: each doc gets an independent
      // Poisson(1) weight per replicate (≈ multinomial resampling as
      // n→∞), so all 16 replicates come out of ONE scan with 32
      // map-side weighted sums — no resample materialization, no
      // shuffle growth, mergeable across partitions. Weights are the
      // inverse-CDF of a salted content-stable hash draw (CDF
      // constants written identically in both engines); replicate
      // means round to 6 before the constant-cost 16-row summary.
      "samp_poisson_bootstrap" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val B = 16
          val base = Tables.documents(s, d).select(col("doc_id").as("id"),
            size(graft.text.TextPrimitives.tokens(col("text")))
              .cast("double").as("x"))
          def w(b: Int) = {
            val u = (md5Long(concat(lit(s"pb:$b:"), col("id").cast("string")))
              % 1000000L + 1L) / lit(1000000.0)
            when(u <= 0.367879441, 0.0).when(u <= 0.735758882, 1.0)
              .when(u <= 0.919698603, 2.0).when(u <= 0.981011843, 3.0)
              .when(u <= 0.996340153, 4.0).when(u <= 0.999405815, 5.0)
              .otherwise(6.0)
          }
          val aggs = (0 until B).flatMap(b => Seq(
            sum(w(b) * col("x")).as(s"s$b"), sum(w(b)).as(s"w$b")))
          val stackArgs = (0 until B)
            .map(b => s"$b, round(s$b / w$b, 6)").mkString(", ")
          base.agg(aggs.head, aggs.tail: _*)
            .select(expr(s"stack($B, $stackArgs) AS (rep, m)"))
            .agg(count(lit(1)).as("n_reps"),
                 round(avg("m"), 4).as("boot_mean"),
                 round(stddev_samp(col("m")), 4).as("boot_se"),
                 round(expr("percentile(m, 0.025D)"), 4).as("ci_lo"),
                 round(expr("percentile(m, 0.975D)"), 4).as("ci_hi"))
        },
        Some("""WITH base AS (
               |  SELECT doc_id AS id,
               |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS x
               |  FROM documents),
               |dr AS (
               |  SELECT rb, x,
               |    (('0x' || substr(md5('pb:' || CAST(rb AS VARCHAR) || ':'
               |        || CAST(id AS VARCHAR)), 1, 15))::BIGINT % 1000000 + 1) / 1000000.0 AS u
               |  FROM base, range(16) t(rb)),
               |wt AS (
               |  SELECT rb, x,
               |    CASE WHEN u <= 0.367879441 THEN 0.0 WHEN u <= 0.735758882 THEN 1.0
               |         WHEN u <= 0.919698603 THEN 2.0 WHEN u <= 0.981011843 THEN 3.0
               |         WHEN u <= 0.996340153 THEN 4.0 WHEN u <= 0.999405815 THEN 5.0
               |         ELSE 6.0 END AS w
               |  FROM dr),
               |reps AS (SELECT rb, round(sum(w * x) / sum(w), 6) AS m
               |         FROM wt GROUP BY rb)
               |SELECT CAST(count(*) AS BIGINT) AS n_reps,
               |       round(avg(m), 4) AS boot_mean,
               |       round(stddev_samp(m), 4) AS boot_se,
               |       round(quantile_cont(m, 0.025), 4) AS ci_lo,
               |       round(quantile_cont(m, 0.975), 4) AS ci_hi
               |FROM reps""".stripMargin)),

      // ε=1 Laplace mechanism on the per-language histogram, with the
      // noise draw made deterministic: inverse-CDF of a salted
      // content-stable hash of the GROUP KEY (a real release would
      // use a sealed seed; the plumbing — per-group draw, two-sided
      // inverse CDF, post-noise rounding — is exactly this). Noise is
      // added AFTER the one grouped pass, so the mechanism costs one
      // projection over |langs| rows; the clamp under the log caps
      // |noise| at ~27b instead of surfacing either engine's ln(0).
      // True counts ride along as the calibration audit (this is the
      // mechanism test harness, not the private release itself).
      "priv_dp_counts" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val u = (md5Long(concat(lit("dp:"), col("lang")))
            % 1000000L + 1L) / lit(1000000.0) - 0.5
          val noise = -signum(col("u")) *
            log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(col("u"))))
          Tables.documents(s, d).groupBy("lang")
            .agg(count(lit(1)).as("n_true"))
            .withColumn("u", round(u, 6))
            .select(col("lang"), col("n_true"),
              round(noise, 4).as("noise"),
              round(col("n_true") + noise, 4).as("n_noisy"))
            .orderBy("lang")
        },
        Some("""WITH g AS (
               |  SELECT lang, CAST(count(*) AS BIGINT) AS n_true,
               |         round((('0x' || substr(md5('dp:' || lang), 1, 15))::BIGINT
               |           % 1000000 + 1) / 1000000.0 - 0.5, 6) AS u
               |  FROM documents GROUP BY lang),
               |n AS (SELECT lang, n_true,
               |             -sign(u) * ln(greatest(1e-12, 1.0 - 2.0 * abs(u))) AS noise
               |      FROM g)
               |SELECT lang, n_true, round(noise, 4) AS noise,
               |       round(n_true + noise, 4) AS n_noisy
               |FROM n ORDER BY lang""".stripMargin)),

      // k-anonymity audit: quasi-identifier = (lang, source, 200-char
      // length bin); the release-safety profile is the equivalence-
      // class SIZE histogram (how many classes of each size, how many
      // rows they carry, which sizes violate k=5). Two map-side-
      // combinable hash aggs — the first shuffles on the QI key (same
      // cardinality as the release table), the second on the ≤|distinct
      // sizes| histogram; no windows, no joins, so the audit runs at
      // any corpus size as two reduce passes
      "priv_k_anonymity" -> Q(
        (s, d) => Tables.documents(s, d)
          .select(col("lang"), col("source"), expr("n_chars DIV 200").as("len_bin"))
          .groupBy("lang", "source", "len_bin")
          .agg(count(lit(1)).as("class_size"))
          .groupBy("class_size")
          .agg(count(lit(1)).as("n_classes"))
          .select(col("class_size"), col("n_classes"),
            (col("class_size") * col("n_classes")).as("n_rows"),
            (col("class_size") < 5).as("violates_k5"))
          .orderBy("class_size"),
        Some("""WITH eq AS (
               |  SELECT lang, source, n_chars // 200 AS len_bin,
               |         CAST(count(*) AS BIGINT) AS class_size
               |  FROM documents GROUP BY lang, source, len_bin)
               |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
               |       CAST(class_size * count(*) AS BIGINT) AS n_rows,
               |       class_size < 5 AS violates_k5
               |FROM eq GROUP BY class_size ORDER BY class_size""".stripMargin)),

      // l-diversity audit: within each (source, length-bin) QI group,
      // how many distinct values of the sensitive attribute (lang)
      // survive — a group an attacker can pin to one lang leaks it
      // even when k-anonymous. Output is the per-group (n, l,
      // violates_l2) table, bounded by |sources|·|bins|; one grouped
      // pass with countDistinct (Expand-based two-level agg, both
      // levels partial)
      "priv_l_diversity" -> Q(
        (s, d) => Tables.documents(s, d)
          .select(col("source"), expr("n_chars DIV 500").as("len_bin"), col("lang"))
          .groupBy("source", "len_bin")
          .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("l"))
          .select(col("source"), col("len_bin"), col("n"), col("l"),
            (col("l") < 2).as("violates_l2"))
          .orderBy("source", "len_bin"),
        Some("""SELECT source, n_chars // 500 AS len_bin,
               |       CAST(count(*) AS BIGINT) AS n,
               |       CAST(count(DISTINCT lang) AS BIGINT) AS l,
               |       count(DISTINCT lang) < 2 AS violates_l2
               |FROM documents GROUP BY source, len_bin
               |ORDER BY source, len_bin""".stripMargin)),

      // Horvitz–Thompson total-token estimate from an unequal-
      // probability sample: long docs (n_chars ≥ 500) are included
      // w.p. 0.5, short ones w.p. 0.1, membership decided by a
      // deterministic per-doc hash (engine-reproducible, no RNG
      // state). Estimator Σ x_i/p_i is unbiased for the true total;
      // the query reports both plus the realized relative error per
      // source. One scan computes sample and truth together (the
      // conditional-agg trick — no second pass over the corpus)
      "samp_horvitz_thompson" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val inSample = (md5Long(concat(lit("ht:"), col("doc_id").cast("string")))
            % 1000L) < when(col("n_chars") >= 500, 500L).otherwise(100L)
          val p = when(col("n_chars") >= 500, 0.5).otherwise(0.1)
          Tables.documents(s, d)
            .select(col("source"), col("n_chars"), col("doc_id"),
              size(graft.text.TextPrimitives.tokens(col("text")))
                .cast("long").as("x"))
            .withColumn("in_s", inSample)
            .withColumn("p", p)
            .groupBy("source")
            .agg(count(lit(1)).as("n_docs"),
              sum(when(col("in_s"), 1L).otherwise(0L)).as("n_sampled"),
              sum(col("x")).as("true_total"),
              round(sum(when(col("in_s"), col("x") / col("p")).otherwise(0.0)), 2)
                .as("ht_estimate"))
            .withColumn("rel_err",
              when(col("true_total") === 0, lit(null).cast("double"))
                .otherwise(round(abs(col("ht_estimate") - col("true_total"))
                  / col("true_total"), 4)))
            .orderBy("source")
        },
        Some("""WITH t AS (
               |  SELECT source, doc_id, n_chars,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
               |         (('0x' || substr(md5('ht:' || doc_id), 1, 15))::BIGINT % 1000)
               |           < (CASE WHEN n_chars >= 500 THEN 500 ELSE 100 END) AS in_s,
               |         CASE WHEN n_chars >= 500 THEN 0.5 ELSE 0.1 END AS p
               |  FROM documents),
               |g AS (
               |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               |         CAST(sum(CASE WHEN in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               |         CAST(sum(x) AS BIGINT) AS true_total,
               |         round(sum(CASE WHEN in_s THEN x / p ELSE 0.0 END), 2) AS ht_estimate
               |  FROM t GROUP BY source)
               |SELECT source, n_docs, n_sampled, true_total, ht_estimate,
               |       CASE WHEN true_total = 0 THEN NULL
               |            ELSE round(abs(ht_estimate - true_total) / true_total, 4)
               |       END AS rel_err
               |FROM g ORDER BY source""".stripMargin)),

      // Heaps'-law fit V(N) = K·N^β: vocabulary growth measured at
      // ~100 equal-width doc_id checkpoints regardless of corpus size
      // (block width = maxId/100, broadcast 1-row max — so the
      // cumulative windows run over ≤101 block rows at ANY scale,
      // never over docs). Vocab increments come from each term's
      // FIRST block (min-agg over the exploded stream — one shuffle
      // keyed by term, the same cardinality as any vocab build);
      // the log-log OLS closed form is one reduce over ≤101 points
      "text_heaps_fit" -> Q(
        (s, d) => {
          val toks = Tables.documents(s, d)
            .select(col("doc_id"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("w"))
          val mx = Tables.documents(s, d).agg(max("doc_id").as("mx"))
          val blocked = toks.crossJoin(broadcast(mx))
            .withColumn("blk", expr("doc_id DIV greatest(1, (mx DIV 100) + 1)"))
          val perBlk = blocked.groupBy("blk").agg(count(lit(1)).as("nt"))
          val firstBlk = blocked.groupBy("w").agg(min("blk").as("fb"))
            .groupBy(col("fb").as("blk")).agg(count(lit(1)).as("nv"))
          val wc = Window.orderBy("blk")
            .rowsBetween(Window.unboundedPreceding, 0)
          val pts = perBlk.join(firstBlk, Seq("blk"), "left")
            .na.fill(0L, Seq("nv"))
            .withColumn("cn", sum("nt").over(wc))
            .withColumn("cv", sum("nv").over(wc))
            .filter(col("cn") > 0 && col("cv") > 0)
            .select(log(col("cn").cast("double")).as("lx"),
                    log(col("cv").cast("double")).as("ly"))
          pts.agg(count(lit(1)).as("n_points"),
              avg("lx").as("ax"), avg("ly").as("ay"),
              covar_pop("lx", "ly").as("cxy"),
              var_pop("lx").as("vx"), var_pop("ly").as("vy"))
            .select(col("n_points"),
              // degenerate-corpus guard, mirrored in the oracle: a
              // corpus collapsing to ONE cumulative checkpoint gives
              // var_pop(lx)=0 and the OLS slope is undefined — NULL
              // it (and k/r2, which reuse it) rather than inherit
              // either engine's divide-by-zero convention. The guard
              // is a 1e-12 THRESHOLD, not equality: a saturated
              // vocabulary (every term seen by the first checkpoint —
              // the sf0.1 corpus does this) makes var_pop(ly)
              // mathematically 0, but one engine's var_pop returns
              // exact 0.0 while the other returns ~1e-28 float
              // residue, so `= 0` guards diverge and the unguarded
              // side emits a noise-ratio r2. Genuine log-variance
              // across ≥2 growing checkpoints is orders above 1e-12.
              when(col("vx") < 1e-12, lit(null).cast("double"))
                .otherwise(round(col("cxy") / col("vx"), 4)).as("beta"),
              when(col("vx") < 1e-12, lit(null).cast("double"))
                .otherwise(round(exp(col("ay") - col("cxy") / col("vx") * col("ax")), 4)).as("k"),
              when(col("vx") < 1e-12 || col("vy") < 1e-12, lit(null).cast("double"))
                .otherwise(round(pow(col("cxy") / sqrt(col("vx") * col("vy")), 2), 4)).as("r2"))
        },
        Some("""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
               |tok AS (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
               |        FROM documents),
               |blk AS (SELECT doc_id // greatest(1, (mx // 100) + 1) AS blk, w
               |        FROM tok, mx),
               |pt AS (SELECT blk, CAST(count(*) AS BIGINT) AS nt FROM blk GROUP BY blk),
               |fb AS (SELECT min_blk AS blk, CAST(count(*) AS BIGINT) AS nv FROM (
               |         SELECT w, min(blk) AS min_blk FROM blk GROUP BY w)
               |       GROUP BY min_blk),
               |cur AS (SELECT pt.blk, sum(nt) OVER (ORDER BY pt.blk) AS cn,
               |               sum(coalesce(nv, 0)) OVER (ORDER BY pt.blk) AS cv
               |        FROM pt LEFT JOIN fb ON pt.blk = fb.blk),
               |pts AS (SELECT ln(cn) AS lx, ln(cv) AS ly FROM cur
               |        WHERE cn > 0 AND cv > 0),
               |s AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
               |             avg(lx) AS ax, avg(ly) AS ay, covar_pop(lx, ly) AS cxy,
               |             var_pop(lx) AS vx, var_pop(ly) AS vy FROM pts)
               |SELECT n_points,
               |       CASE WHEN vx < 1e-12 THEN NULL ELSE round(cxy / vx, 4) END AS beta,
               |       CASE WHEN vx < 1e-12 THEN NULL ELSE round(exp(ay - cxy / vx * ax), 4) END AS k,
               |       CASE WHEN vx < 1e-12 OR vy < 1e-12 THEN NULL ELSE
               |         round(pow(cxy / sqrt(vx * vy), 2), 4) END AS r2
               |FROM s""".stripMargin)),

      // chi-square test of independence for the lang × source
      // contingency table: expected counts from broadcast marginals
      // over the FULL grid (zero observed cells still contribute, so
      // the grid is marginals × marginals — bounded by the label
      // domains — left-joined with observed). One fact scan feeds all
      // three aggregates; everything after is |langs|·|sources| rows
      "stat_chi2_indep" -> Q(
        (s, d) => {
          val doc = Tables.documents(s, d)
          val rt = doc.groupBy("lang").agg(count(lit(1)).as("nl"))
          val ct = doc.groupBy("source").agg(count(lit(1)).as("ns"))
          val obs = doc.groupBy("lang", "source").agg(count(lit(1)).as("o"))
          val tot = doc.agg(count(lit(1)).as("n"))
          rt.crossJoin(broadcast(ct))
            .join(obs, Seq("lang", "source"), "left")
            .na.fill(0L, Seq("o"))
            .crossJoin(broadcast(tot))
            .withColumn("e", col("nl") * col("ns") / col("n").cast("double"))
            .agg(
              round(sum(pow(col("o") - col("e"), 2) / col("e")), 4).as("chi2"),
              ((countDistinct(col("lang")) - 1) *
                (countDistinct(col("source")) - 1)).as("dof"),
              max(col("n")).as("n"))
        },
        Some("""WITH rt AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
               |            FROM documents GROUP BY lang),
               |ct AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
               |       FROM documents GROUP BY source),
               |obs AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
               |        FROM documents GROUP BY lang, source),
               |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
               |grid AS (
               |  SELECT rt.lang, ct.source, rt.nl, ct.ns,
               |         coalesce(o, 0) AS o, n,
               |         rt.nl * ct.ns / CAST(n AS DOUBLE) AS e
               |  FROM rt CROSS JOIN ct
               |  LEFT JOIN obs ON rt.lang = obs.lang AND ct.source = obs.source
               |  CROSS JOIN tot)
               |SELECT round(sum(pow(o - e, 2) / e), 4) AS chi2,
               |       CAST((count(DISTINCT lang) - 1) *
               |            (count(DISTINCT source) - 1) AS BIGINT) AS dof,
               |       CAST(max(n) AS BIGINT) AS n
               |FROM grid""".stripMargin)),

      // Kendall's τ-b between per-nation wealth (avg customer balance)
      // and spend (avg order price): rank correlation robust to
      // non-linearity, with the tie-corrected denominator. The pair
      // scan is a self-join of the |nations|-row AGGREGATED frame
      // (625 pairs at 25 nations — bounded by the dimension domain,
      // never by facts); x/y round to 6dp first so both engines
      // classify concordance identically, making the counts integral
      "stat_kendall" -> Q(
        (s, d) => {
          val cust = Tables.customer(s, d)
            .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
            .groupBy("n_name").agg(round(avg("c_acctbal"), 6).as("x"))
          val ord = Tables.orders(s, d)
            .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
            .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
            .groupBy(col("n_name").as("n2")).agg(round(avg("o_totalprice"), 6).as("y"))
          val f = cust.join(ord, col("n_name") === col("n2"))
            .select(col("n_name"), col("x"), col("y"))
          val a = f.select(col("n_name").as("ka"), col("x").as("xa"), col("y").as("ya"))
          val b = f.select(col("n_name").as("kb"), col("x").as("xb"), col("y").as("yb"))
          val pairs = a.join(b, col("ka") < col("kb"))
            .select(
              (signum(col("xb") - col("xa")) * signum(col("yb") - col("ya"))).as("s"),
              (col("xa") === col("xb")).cast("long").as("tx"),
              (col("ya") === col("yb")).cast("long").as("ty"))
          pairs.agg(
              count(lit(1)).as("n_pairs"),
              sum(when(col("s") > 0, 1L).otherwise(0L)).as("concordant"),
              sum(when(col("s") < 0, 1L).otherwise(0L)).as("discordant"),
              sum("tx").as("txs"), sum("ty").as("tys"))
            .select(col("n_pairs"), col("concordant"), col("discordant"),
              round((col("concordant") - col("discordant")) /
                sqrt((col("n_pairs") - col("txs")).cast("double") *
                     (col("n_pairs") - col("tys"))), 4).as("tau_b"))
        },
        Some("""WITH cx AS (
               |  SELECT n_name, round(avg(c_acctbal), 6) AS x
               |  FROM customer JOIN nation ON c_nationkey = n_nationkey
               |  GROUP BY n_name),
               |oy AS (
               |  SELECT n_name, round(avg(o_totalprice), 6) AS y
               |  FROM orders JOIN customer ON o_custkey = c_custkey
               |              JOIN nation ON c_nationkey = n_nationkey
               |  GROUP BY n_name),
               |f AS (SELECT cx.n_name, x, y FROM cx JOIN oy ON cx.n_name = oy.n_name),
               |p AS (
               |  SELECT sign(b.x - a.x) * sign(b.y - a.y) AS s,
               |         CAST(a.x = b.x AS BIGINT) AS tx,
               |         CAST(a.y = b.y AS BIGINT) AS ty
               |  FROM f a JOIN f b ON a.n_name < b.n_name),
               |g AS (
               |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               |         CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               |         CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
               |         CAST(sum(tx) AS BIGINT) AS txs, CAST(sum(ty) AS BIGINT) AS tys
               |  FROM p)
               |SELECT n_pairs, concordant, discordant,
               |       round((concordant - discordant) /
               |             sqrt(CAST(n_pairs - txs AS DOUBLE) * (n_pairs - tys)), 4) AS tau_b
               |FROM g""".stripMargin)),

      // modularity of the SOURCE partition over the near-dup graph:
      // do duplicates concentrate within a source (Q→1) or cross
      // source boundaries (Q→0)? Q = Σ_s [L_s/m − (D_s/2m)²] with
      // L_s = intra-source edges, D_s = degree mass of s. The edge
      // build is the shared bounded ngramJaccard; everything after is
      // |sources|-row arithmetic with the 1-row edge total broadcast —
      // the contribution table and its Q re-agg both read the same
      // tiny frame. The "is my dedup a per-source or global problem"
      // diagnostic that decides whether dedup can shard by source
      "graph_modularity" -> Q(
        (s, d) => {
          val docs = docsUnder(s, d, 120)
          val e0 = dupEdges(s, d)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false) // read for deg, intra, AND m
          val src = docs.select(col("doc_id"), col("source"))
          val lab = e0
            .join(src.select(col("doc_id").as("da"), col("source").as("sa")), "da")
            .join(src.select(col("doc_id").as("db"), col("source").as("sb")), "db")
            .localCheckpoint(eager = false)
          val mTot = lab.agg(count(lit(1)).as("m"))
          val degS = lab.select(col("sa").as("source"))
            .union(lab.select(col("sb").as("source")))
            .groupBy("source").agg(count(lit(1)).as("d_sum"))
          val intra = lab.filter(col("sa") === col("sb"))
            .groupBy(col("sa").as("source")).agg(count(lit(1)).as("l_intra"))
          val per = degS.join(intra, Seq("source"), "left")
            .na.fill(0L, Seq("l_intra"))
            .crossJoin(broadcast(mTot))
            .withColumn("contribution",
              round(col("l_intra") / col("m").cast("double")
                - pow(col("d_sum") / (lit(2.0) * col("m")), 2), 6))
          per.crossJoin(broadcast(
              per.agg(round(sum("contribution"), 4).as("q_total"))))
            .select(col("source"), col("l_intra"), col("d_sum"),
                    col("contribution"), col("q_total"))
            .orderBy("source")
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |lab AS (SELECT da, db, sa.source AS sa, sb.source AS sb
                |        FROM e0 JOIN documents sa ON e0.da = sa.doc_id
                |                JOIN documents sb ON e0.db = sb.doc_id),
                |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
                |degs AS (SELECT source, CAST(count(*) AS BIGINT) AS d_sum FROM (
                |           SELECT sa AS source FROM lab
                |           UNION ALL SELECT sb AS source FROM lab)
                |         GROUP BY source),
                |intra AS (SELECT sa AS source, CAST(count(*) AS BIGINT) AS l_intra
                |          FROM lab WHERE sa = sb GROUP BY sa),
                |per AS (
                |  SELECT degs.source, coalesce(l_intra, 0) AS l_intra, d_sum,
                |         round(coalesce(l_intra, 0) / CAST(m AS DOUBLE)
                |               - pow(d_sum / (2.0 * m), 2), 6) AS contribution
                |  FROM degs LEFT JOIN intra ON degs.source = intra.source
                |  CROSS JOIN m)
                |SELECT source, l_intra, d_sum, contribution,
                |       (SELECT round(sum(contribution), 4) FROM per) AS q_total
                |FROM per ORDER BY source""".stripMargin)),

      // neighborhood-Jaccard link prediction on the dup graph:
      // |N(u)∩N(v)| / |N(u)∪N(v)| for NON-adjacent pairs — the same
      // wedge join as Adamic-Adar (common neighbors enumerated via
      // the shared-neighbor key, never a node cross product) with
      // both endpoint degrees broadcast in; union size by
      // inclusion-exclusion, so one grouped count per pair suffices
      "graph_jaccard_nbrs" -> Q(
        (s, d) => {
          val e0 = dupEdges(s, d)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false)
          val nb = e0.select(col("da").as("z"), col("db").as("x"))
            .union(e0.select(col("db").as("z"), col("da").as("x")))
            .localCheckpoint(eager = false)
          val deg = nb.groupBy(col("x").as("node")).agg(count(lit(1)).as("dg"))
          nb.select(col("z"), col("x").as("u"))
            .join(nb.select(col("z"), col("x").as("v")), "z")
            .filter(col("u") < col("v"))
            .groupBy("u", "v")
            .agg(count(lit(1)).as("common"))
            .join(broadcast(deg.select(col("node").as("u"), col("dg").as("du"))), "u")
            .join(broadcast(deg.select(col("node").as("v"), col("dg").as("dv"))), "v")
            .join(e0, col("u") === col("da") && col("v") === col("db"), "left_anti")
            .select(col("u"), col("v"), col("common"),
              round(col("common") /
                (col("du") + col("dv") - col("common")).cast("double"), 4).as("jac"))
            .orderBy(col("jac").desc, col("u"), col("v"))
            .limit(20)
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |nb AS (SELECT da AS z, db AS x FROM e0
                |       UNION ALL SELECT db AS z, da AS x FROM e0),
                |deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS dg
                |        FROM nb GROUP BY x),
                |w AS (SELECT a.x AS u, b.x AS v
                |      FROM nb a JOIN nb b ON a.z = b.z AND a.x < b.x),
                |sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS common
                |       FROM w GROUP BY u, v),
                |j AS (
                |  SELECT u, v, common,
                |         round(common / CAST(du.dg + dv.dg - common AS DOUBLE), 4) AS jac
                |  FROM sc JOIN deg du ON sc.u = du.node
                |          JOIN deg dv ON sc.v = dv.node
                |  WHERE NOT EXISTS (SELECT 1 FROM e0
                |                    WHERE e0.da = sc.u AND e0.db = sc.v))
                |SELECT u, v, common, jac FROM j
                |ORDER BY jac DESC, u, v LIMIT 20""".stripMargin)),

      // embedding-space anisotropy (Ethayarajh 2019): the average
      // cosine between DISTINCT vectors, computed WITHOUT a pair join
      // via the exact identity Σᵢⱼ v̂ᵢ·v̂ⱼ = ‖Σv̂‖², so
      // avg_cos = (‖Σv̂‖² − n)/(n(n−1)) — two linear passes (per-vector
      // norm, per-dimension sums) replace the O(n²) pair scan, which
      // is what makes the diagnostic runnable on a 100 TB embedding
      // table. Also reports the centroid norm (the "common direction"
      // magnitude a whitening pass would remove)
      "emb_anisotropy" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.l2Norm
          val f = Tables.embeddings(s, d)
            .filter(col("embedding").isNotNull)
            .select(col("vec_id"), col("embedding"),
              l2Norm(col("embedding")).as("nrm"))
            .filter(col("nrm") > 0)
          val dims = f.select(col("nrm"), posexplode(col("embedding")).as(Seq("i", "x")))
            .groupBy("i")
            .agg(sum(col("x").cast("double")).as("sx"),
                 sum(col("x").cast("double") / col("nrm")).as("su"))
          val nRow = f.agg(count(lit(1)).as("n"),
                           round(avg("nrm"), 6).as("mean_norm"))
          dims.crossJoin(broadcast(nRow))
            .agg(max(col("n")).as("n"), max(col("mean_norm")).as("mean_norm"),
              round(sqrt(sum(pow(col("sx") / col("n"), 2))), 6).as("centroid_norm"),
              round((sum(col("su") * col("su")) - max(col("n")))
                / (max(col("n")) * (max(col("n")) - lit(1.0))), 6)
                .as("avg_pairwise_cos"))
        },
        Some("""WITH f AS (
               |  SELECT vec_id, embedding::DOUBLE[] AS emb,
               |         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
               |  FROM embeddings WHERE embedding IS NOT NULL),
               |g AS (SELECT * FROM f WHERE nrm > 0),
               |d AS (SELECT nrm, generate_subscripts(emb, 1) AS i, unnest(emb) AS x FROM g),
               |s AS (SELECT i, sum(x) AS sx, sum(x / nrm) AS su FROM d GROUP BY i),
               |t AS (SELECT CAST(count(*) AS BIGINT) AS n, round(avg(nrm), 6) AS mean_norm
               |      FROM g)
               |SELECT n, mean_norm,
               |       round(sqrt(sum(pow(sx / n, 2))), 6) AS centroid_norm,
               |       round((sum(su * su) - n) / (n * (n - 1.0)), 6) AS avg_pairwise_cos
               |FROM s CROSS JOIN t
               |GROUP BY n, mean_norm""".stripMargin)),

      // Johnson–Lindenstrauss sign-projection recall: project 64-d
      // embeddings to 16-d with a DETERMINISTIC ±1 matrix (hash of
      // (dim,j) — no RNG state to ship to executors), then measure
      // top-10 recall of projected cosine search against full-dim
      // brute force for one probe. The projection is a pure map over a
      // driver-built literal sign matrix (whole-stage codegen, zero
      // shuffle); projected coordinates round to 6dp so both engines
      // rank identically.
      // The dimension-REDUCTION path of the vec_ quantization family
      // (matryoshka truncates, PQ codes — JL rotates mass into every
      // kept coordinate)
      "ann_jl_recall" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          import org.apache.spark.unsafe.types.UTF8String
          // the ±1 matrix is CONSTANT (hash of (dim,j) only): build its
          // 16×64 entries ONCE on the driver with the same md5 the
          // oracle uses and embed them as a literal, so the projection
          // is a pure whole-stage-codegen map — no explode fan-out, no
          // shuffle. (The exploded formulation pushed 64·16 rows per
          // vector through a hash + groupBy: 34 s at 5M vectors on
          // local[16]; this one is scan-bound at 1.6 s.)
          val sgn: IndexedSeq[IndexedSeq[Double]] = (0 until 16).map { j =>
            (0 until 64).map { i =>
              if (graft.functions.Md5Hash.hash60(
                UTF8String.fromString(s"jl:$i:$j")) % 2 == 0) 1.0 else -1.0
            }
          }
          val sgnLit = array(sgn.map(row => array(row.map(lit): _*)): _*)
          val e = Tables.embeddings(s, d)
          val proj = e.select(col("vec_id"),
            transform(sequence(lit(0), lit(15)), j =>
              round(aggregate(
                zip_with(col("embedding"), element_at(sgnLit, j + lit(1)),
                  (x, sg) => x.cast("double") * sg),
                lit(0.0), (acc, v) => acc + v), 6)).as("p"))
            .localCheckpoint(eager = false) // probe + corpus both read it
          val qF = e.filter(col("vec_id") === 7).select(col("embedding").as("qe"))
          val topFull = e.crossJoin(broadcast(qF)).filter(col("vec_id") =!= 7)
            .select(col("vec_id"), score(col("embedding"), col("qe")).as("sc"))
            .orderBy(col("sc").desc, col("vec_id")).limit(10)
          val qP = proj.filter(col("vec_id") === 7).select(col("p").as("qp"))
          val topProj = proj.crossJoin(broadcast(qP)).filter(col("vec_id") =!= 7)
            .select(col("vec_id"), score(col("p"), col("qp")).as("sp"))
            .orderBy(col("sp").desc, col("vec_id")).limit(10)
          topFull.join(topProj, "vec_id")
            .agg(count(lit(1)).as("n_overlap"))
            .select(lit(10L).as("k"), col("n_overlap"),
              round(col("n_overlap") / 10.0, 2).as("recall"))
        },
        Some("""WITH dims AS (
               |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               |         CAST(unnest(embedding) AS DOUBLE) AS x
               |  FROM embeddings),
               |pj AS (
               |  SELECT vec_id, j,
               |         round(sum(x * CASE WHEN (('0x' || substr(md5('jl:' || i || ':' || j), 1, 15))::BIGINT % 2) = 0
               |                        THEN 1.0 ELSE -1.0 END), 6) AS pj
               |  FROM dims CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)
               |  GROUP BY vec_id, j),
               |pnrm AS (SELECT vec_id, sqrt(sum(pj * pj)) AS nr FROM pj GROUP BY vec_id),
               |q AS (SELECT j, pj AS qj FROM pj WHERE vec_id = 7),
               |qn AS (SELECT nr AS qnr FROM pnrm WHERE vec_id = 7),
               |full_sc AS (
               |  SELECT e.vec_id,
               |         round(list_dot_product(e.embedding::DOUBLE[], qe.embedding::DOUBLE[]) /
               |               (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x))) *
               |                sqrt(list_sum(list_transform(qe.embedding::DOUBLE[], x -> x * x)))), 6) AS sc
               |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 7) qe
               |  WHERE e.vec_id <> 7),
               |top_full AS (SELECT vec_id FROM full_sc ORDER BY sc DESC, vec_id LIMIT 10),
               |proj_sc AS (
               |  SELECT p.vec_id,
               |         round(sum(p.pj * q.qj) / (pnrm.nr * qn.qnr), 6) AS sp
               |  FROM pj p JOIN q ON p.j = q.j
               |  JOIN pnrm ON p.vec_id = pnrm.vec_id
               |  CROSS JOIN qn
               |  WHERE p.vec_id <> 7
               |  GROUP BY p.vec_id, pnrm.nr, qn.qnr),
               |top_proj AS (SELECT vec_id FROM proj_sc ORDER BY sp DESC, vec_id LIMIT 10)
               |SELECT CAST(10 AS BIGINT) AS k,
               |       CAST(count(*) AS BIGINT) AS n_overlap,
               |       round(count(*) / 10.0, 2) AS recall
               |FROM top_full JOIN top_proj USING (vec_id)""".stripMargin)),

      // Neyman allocation of a 100-doc evaluation budget across
      // language strata: n_h ∝ N_h·σ_h (token-count σ) — sample more
      // where strata are big AND noisy, the design that minimizes
      // estimator variance at fixed budget. ONE grouped pass makes
      // the |langs|-row stats frame (checkpointed: the share, base,
      // and remainder columns all read it); integerization is
      // largest-remainder so the allocations sum EXACTLY to budget,
      // with the rank window over |langs| rows. Shares and remainders
      // round to 9 pre-compare so both engines hand out identical
      // top-ups.
      "samp_strat_alloc" -> Q(
        (s, d) => {
          val st = Tables.documents(s, d)
            .select(col("lang"),
              size(graft.text.TextPrimitives.tokens(col("text")))
                .cast("double").as("x"))
            .groupBy("lang")
            .agg(count(lit(1)).as("nh"),
                 round(stddev_samp(col("x")), 6).as("sd"))
          val tot = st.agg(round(sum(col("nh") * col("sd")), 6).as("t"))
          val a = st.crossJoin(broadcast(tot))
            // all-constant strata (t = 0): allocation undefined, NULL not ÷0
            .withColumn("share", when(col("t") === 0, lit(null).cast("double"))
              .otherwise(round(col("nh") * col("sd") / col("t"), 9)))
            .withColumn("base", floor(col("share") * 100).cast("long"))
            .withColumn("rem", round(col("share") * 100 - col("base"), 9))
            .localCheckpoint(eager = false) // read 2×: base total + top-up rank
          val sb = a.agg(sum("base").as("sb"))
          val wR = Window.orderBy(col("rem").desc, col("lang"))
          a.crossJoin(broadcast(sb))
            .withColumn("rk", row_number().over(wR))
            .select(col("lang"), col("nh").as("n_docs"), col("sd"),
              (col("base") + when(col("rk") <= lit(100) - col("sb"), 1L)
                .otherwise(0L)).as("alloc"))
            .orderBy("lang")
        },
        Some("""WITH st AS (
               |  SELECT lang, CAST(count(*) AS BIGINT) AS nh,
               |         round(stddev_samp(
               |           CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE)), 6) AS sd
               |  FROM documents GROUP BY lang),
               |tot AS (SELECT round(sum(nh * sd), 6) AS t FROM st),
               |a AS (SELECT lang, nh, sd,
               |             CASE WHEN t = 0 THEN NULL ELSE round(nh * sd / t, 9) END AS share,
               |             CAST(floor(CASE WHEN t = 0 THEN NULL ELSE round(nh * sd / t, 9) END * 100) AS BIGINT) AS base,
               |             round(CASE WHEN t = 0 THEN NULL ELSE round(nh * sd / t, 9) END * 100
               |               - floor(CASE WHEN t = 0 THEN NULL ELSE round(nh * sd / t, 9) END * 100), 9) AS rem
               |      FROM st, tot),
               |sb AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM a),
               |rk AS (SELECT a.*, row_number() OVER (ORDER BY rem DESC, lang) AS rk
               |       FROM a)
               |SELECT lang, nh AS n_docs, sd,
               |       base + CASE WHEN rk <= 100 - sb THEN 1 ELSE 0 END AS alloc
               |FROM rk, sb ORDER BY lang""".stripMargin)),

      // first-round BPE merge candidates: corpus-weighted adjacent
      // character-pair counts, top 20. The corpus collapses to the
      // DISTINCT-word table first (Heaps'-law bounded — the pair
      // explosion runs over vocabulary entries weighted by word
      // frequency, never over raw tokens), then a codegen'd HOF emits
      // each word's adjacent pairs and TakeOrdered bounds the report.
      "text_bpe_pairs" -> Q(
        (s, d) => {
          val words = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("w"))
            .groupBy("w").agg(count(lit(1)).as("wc"))
          words.filter(length(col("w")) >= 2)
            .select(col("wc"), explode(expr(
              "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
              .as("pair"))
            .groupBy("pair").agg(sum("wc").as("n"))
            .orderBy(col("n").desc, col("pair")).limit(20)
        },
        Some("""WITH w AS (
               |  SELECT t AS w, CAST(count(*) AS BIGINT) AS wc FROM (
               |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
               |    FROM documents)
               |  GROUP BY t),
               |p AS (
               |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i:i+1])) AS pair, wc
               |  FROM w WHERE len(w) >= 2)
               |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
               |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

      // vocabulary coverage curve: what fraction of the corpus token
      // MASS do the top-{10,100,1k,10k} types cover — the number that
      // sizes a tokenizer vocab. The vocab aggregate runs ONCE
      // (checkpointed: total mass + top-k both read it); the top-10k
      // is TakeOrdered-bounded so ranking never globally sorts the
      // Heaps'-bounded-but-large type table, and the four curve
      // points are conditional sums over those ≤10k rows stacked
      // into the report.
      "text_vocab_coverage" -> Q(
        (s, d) => {
          val vocab = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("n"))
            .localCheckpoint(eager = false) // read 2×: total mass + top-k
          val tot = vocab.agg(sum("n").as("t"), count(lit(1)).as("nv"))
          val wTop = Window.orderBy(col("n").desc, col("tok"))
          val top = vocab.orderBy(col("n").desc, col("tok")).limit(10000)
            .withColumn("rank", row_number().over(wTop))
          val ks = Seq(10, 100, 1000, 10000)
          val aggs = ks.flatMap(k => Seq(
            sum(when(col("rank") <= k, col("n")).otherwise(0L)).as(s"m$k"),
            sum(when(col("rank") <= k, 1L).otherwise(0L)).as(s"c$k")))
          val stackArgs = ks
            .map(k => s"$k, c$k, round(CAST(m$k AS DOUBLE) / t, 4)").mkString(", ")
          top.crossJoin(broadcast(tot))
            .groupBy("t", "nv")
            .agg(aggs.head, aggs.tail: _*)
            .select(col("nv").as("n_vocab"),
              expr(s"stack(${ks.size}, $stackArgs) AS (k, in_vocab, coverage)"))
            .select("k", "in_vocab", "n_vocab", "coverage")
            .orderBy("k")
        },
        Some("""WITH vocab AS (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS n
               |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY tok),
               |tot AS (SELECT sum(n) AS t, CAST(count(*) AS BIGINT) AS nv FROM vocab),
               |top AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
               |        FROM vocab ORDER BY n DESC, tok LIMIT 10000)
               |SELECT k, CAST(sum(CASE WHEN rank <= k THEN 1 ELSE 0 END) AS BIGINT) AS in_vocab,
               |       nv AS n_vocab,
               |       round(CAST(sum(CASE WHEN rank <= k THEN n ELSE 0 END) AS DOUBLE) / t, 4) AS coverage
               |FROM top, tot, (VALUES (10), (100), (1000), (10000)) ks(k)
               |GROUP BY k, nv, t ORDER BY k""".stripMargin)),

      // Welch's unequal-variance t-test on document length (en vs de):
      // one grouped pass computes (n, mean, var) per group, then the
      // t statistic and Welch–Satterthwaite df come from a cross join
      // of two single-row frames — constant-size everything after the
      // scan, so the test costs one aggregate at any corpus size.
      "stat_welch_ttest" -> Q(
        (s, d) => {
          val g = Tables.documents(s, d)
            .filter(col("lang").isin("en", "de"))
            .groupBy("lang")
            .agg(count(lit(1)).cast("double").as("n"),
                 avg(col("n_chars").cast("double")).as("m"),
                 var_samp(col("n_chars").cast("double")).as("v"))
            .localCheckpoint(eager = false) // read twice (both groups)
          val a = g.filter(col("lang") === "en")
            .select(col("n").as("na"), col("m").as("ma"), col("v").as("va"))
          val b = g.filter(col("lang") === "de")
            .select(col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
          val se2 = col("va") / col("na") + col("vb") / col("nb")
          a.crossJoin(b).select(
            col("na").cast("long").as("n_en"),
            col("nb").cast("long").as("n_de"),
            round(col("ma") - col("mb"), 4).as("mean_diff"),
            round((col("ma") - col("mb")) / sqrt(se2), 4).as("t_stat"),
            round(pow(se2, 2) /
              (pow(col("va") / col("na"), 2) / (col("na") - 1)
               + pow(col("vb") / col("nb"), 2) / (col("nb") - 1)), 2).as("df"))
        },
        Some("""WITH g AS (
               |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
               |         avg(CAST(n_chars AS DOUBLE)) AS m,
               |         var_samp(CAST(n_chars AS DOUBLE)) AS v
               |  FROM documents WHERE lang IN ('en', 'de') GROUP BY lang),
               |a AS (SELECT n AS na, m AS ma, v AS va FROM g WHERE lang = 'en'),
               |b AS (SELECT n AS nb, m AS mb, v AS vb FROM g WHERE lang = 'de')
               |SELECT CAST(na AS BIGINT) AS n_en, CAST(nb AS BIGINT) AS n_de,
               |       round(ma - mb, 4) AS mean_diff,
               |       round((ma - mb) / sqrt(va/na + vb/nb), 4) AS t_stat,
               |       round(pow(va/na + vb/nb, 2)
               |         / (pow(va/na, 2) / (na - 1) + pow(vb/nb, 2) / (nb - 1)), 2) AS df
               |FROM a, b""".stripMargin)),

      // Cohen's kappa for the stopword language-ID against the true
      // lang label: chance-corrected agreement from the confusion
      // cells. The cell table is tiny (|langs|²), so po/pe/kappa are
      // cross joins of broadcast single-row aggregates; only the
      // per-doc prediction pass scales with the corpus.
      "stat_cohens_kappa" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          // r17: the confusion matrix is ≤|langs|² cells — the three
          // 1-row aggregates + broadcast crosses fold DRIVER-side over
          // one collect (the bounded-frame altitude; 4 jobs → 1).
          // Arithmetic replicated: exact long marginal products, the
          // same unrounded po/pe feeding kappa, round-4 at the end.
          val cl = TextAnalytics.languageId(docs)
            .join(docs.select(col("doc_id"), col("lang")), "doc_id")
            .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
            .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          def r4(x: Double) = graft.embed.CovMoments.r(x, 4)
          val out: (Option[Double], Option[Double], Option[Double]) =
            if (cl.isEmpty) (None, None, None)
            else {
              val nn = cl.map(_._3).sum.toDouble
              val nd = cl.filter(t => t._1 == t._2).map(_._3).sum.toDouble
              val rM = cl.groupBy(_._1).map { case (l, g) => l -> g.map(_._3).sum }
              val cM = cl.groupBy(_._2).map { case (l, g) => l -> g.map(_._3).sum }
              val rc = (rM.keySet intersect cM.keySet).toSeq.sorted
                .map(l => rM(l) * cM(l)).sum.toDouble
              val po = nd / nn
              val pe = rc / (nn * nn)
              (Some(r4(po)), Some(r4(pe)), Some(r4((po - pe) / (1.0 - pe))))
            }
          import s.implicits._
          Seq(out).toDF("po", "pe", "kappa")
        },
        Some {
          def cnt(words: Seq[String]) =
            s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
              s"t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
          val Seq(en, es, de, fr) = TextAnalytics.Lexica.map { case (_, w) => cnt(w) }
          s"""WITH p AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN $en + $es + $de + $fr = 0 THEN 'und'
             |         WHEN $en >= greatest($es, $de, $fr) THEN 'en'
             |         WHEN $es >= greatest($de, $fr) THEN 'es'
             |         WHEN $de >= $fr THEN 'de'
             |         ELSE 'fr' END AS pred_lang
             |  FROM documents),
             |c AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
             |      FROM p GROUP BY lang, pred_lang),
             |t AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM c),
             |dg AS (SELECT CAST(coalesce(sum(n), 0) AS DOUBLE) AS nd
             |       FROM c WHERE lang = pred_lang),
             |m AS (SELECT CAST(coalesce(sum(r * c2), 0) AS DOUBLE) AS rc FROM
             |        (SELECT lang, sum(n) AS r FROM c GROUP BY lang) ra JOIN
             |        (SELECT pred_lang, sum(n) AS c2 FROM c GROUP BY pred_lang) ca
             |        ON ra.lang = ca.pred_lang)
             |SELECT round(nd / nn, 4) AS po,
             |       round(rc / (nn * nn), 4) AS pe,
             |       round((nd / nn - rc / (nn * nn))
             |             / (1 - rc / (nn * nn)), 4) AS kappa
             |FROM t, dg, m""".stripMargin
        }),

      // Jensen-Shannon divergence between every source pair's unigram
      // distribution over the global top-100 vocabulary: the vocab
      // bound (TakeOrdered) caps the dense zero-filled frame at
      // |sources|·100 rows, and the pair join fans out on TERM, so
      // work is C(|sources|,2)·100 regardless of corpus size. The
      // corpus-mix distance behind domain-weighting decisions.
      "text_js_div" -> Q(
        (s, d) => {
          // (source, term) counts materialize once — three consumers
          // (vocab bound, per-source mass, probabilities) must not
          // each re-scan the corpus
          val tf = Tables.documents(s, d)
            .select(col("source"),
              explode(graft.text.TextPrimitives.tokens(col("text"))).as("term"))
            .groupBy("source", "term").agg(count(lit(1)).as("c"))
            .localCheckpoint(eager = false)
          val top = tf.groupBy("term").agg(sum("c").as("tot"))
            .orderBy(col("tot").desc, col("term")).limit(100).select("term")
          val v = tf.join(top, Seq("term"), "left_semi")
          val tots = v.groupBy("source").agg(sum("c").as("nt"))
          val p = v.join(broadcast(tots), "source")
            .select(col("source"), col("term"), (col("c") / col("nt")).as("p"))
          val dense = tots.select("source").crossJoin(broadcast(top))
            .join(p, Seq("source", "term"), "left")
            .na.fill(0.0, Seq("p"))
            .localCheckpoint(eager = false) // both pair-join sides read it
          dense.select(col("source").as("sa"), col("term"), col("p").as("pa"))
            .join(dense.select(col("source").as("sb"), col("term").as("termb"),
              col("p").as("pb")),
              col("term") === col("termb") && col("sa") < col("sb"))
            .withColumn("m", (col("pa") + col("pb")) / 2)
            .withColumn("kl",
              when(col("pa") > 0, col("pa") * log(col("pa") / col("m"))).otherwise(0.0) +
              when(col("pb") > 0, col("pb") * log(col("pb") / col("m"))).otherwise(0.0))
            .groupBy("sa", "sb")
            .agg(round(sum("kl") * lit(0.5 / math.log(2.0)), 4).as("jsd_bits"))
            .orderBy("sa", "sb")
        },
        Some("""WITH tf AS (
               |  SELECT source, tok AS term, CAST(count(*) AS BIGINT) AS c
               |  FROM (SELECT source,
               |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents)
               |  GROUP BY source, tok),
               |top AS (SELECT term FROM (SELECT term, sum(c) AS tot FROM tf GROUP BY term)
               |        ORDER BY tot DESC, term LIMIT 100),
               |v AS (SELECT tf.source, tf.term, tf.c FROM tf JOIN top USING (term)),
               |tots AS (SELECT source, sum(c) AS nt FROM v GROUP BY source),
               |p AS (SELECT source, term, c * 1.0 / nt AS p FROM v JOIN tots USING (source)),
               |dense AS (SELECT s.source, t.term, coalesce(p.p, 0.0) AS p
               |          FROM (SELECT source FROM tots) s CROSS JOIN top t
               |          LEFT JOIN p ON p.source = s.source AND p.term = t.term),
               |pr AS (SELECT a.source AS sa, b.source AS sb, a.p AS pa, b.p AS pb
               |       FROM dense a JOIN dense b ON a.term = b.term AND a.source < b.source)
               |SELECT sa, sb, round(sum(
               |    CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END +
               |    CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END)
               |  * 0.5 / ln(2), 4) AS jsd_bits
               |FROM pr GROUP BY sa, sb ORDER BY sa, sb""".stripMargin)),

      // mutual information + chi-square independence of (source, lang)
      // in ONE pass over the contingency cells: marginals are tiny
      // re-aggregations of the |S|·|L| cell frame, the dense grid
      // (zero cells included — chi² needs them) is a broadcast cross
      // of the marginals, and the fact table is scanned exactly once.
      "text_mi_chi2" -> Q(
        (s, d) => {
          // the |S|·|L| contingency frame materializes once; the four
          // consumers (marginals ×2, total, grid) are re-aggregations
          // of it, so the corpus is scanned exactly once
          val cell = Tables.documents(s, d)
            .groupBy("source", "lang").agg(count(lit(1)).as("c"))
            .localCheckpoint(eager = false)
          val ms = cell.groupBy("source").agg(sum("c").as("cs"))
          val ml = cell.groupBy("lang").agg(sum("c").as("cl"))
          val tot = cell.agg(sum("c").as("n"))
          val dims = ms.agg(count(lit(1)).as("nsrc"))
            .crossJoin(ml.agg(count(lit(1)).as("nlang")))
          ms.crossJoin(ml)
            .join(cell, Seq("source", "lang"), "left").na.fill(0L, Seq("c"))
            .crossJoin(broadcast(tot))
            .withColumn("e", col("cs").cast("double") * col("cl") / col("n"))
            .agg(max("n").as("n"),
              sum((col("c") - col("e")) * (col("c") - col("e")) / col("e")).as("chi2"),
              sum(when(col("c") > 0,
                col("c") / col("n") * log(col("c").cast("double") * col("n")
                  / (col("cs").cast("double") * col("cl")))).otherwise(0.0)).as("mi"))
            .crossJoin(broadcast(dims))
            .select(col("n"), ((col("nsrc") - 1) * (col("nlang") - 1)).as("dof"),
              round(col("chi2"), 4).as("chi2"),
              round(col("mi") * lit(1.0 / math.log(2.0)), 6).as("mi_bits"))
        },
        Some("""WITH cell AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
               |              FROM documents GROUP BY source, lang),
               |ms AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM cell GROUP BY source),
               |ml AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM cell GROUP BY lang),
               |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
               |dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ms) AS nsrc,
               |                (SELECT CAST(count(*) AS BIGINT) FROM ml) AS nlang),
               |grid AS (SELECT ms.source, ml.lang, ms.cs, ml.cl, coalesce(cell.c, 0) AS c,
               |                CAST(ms.cs AS DOUBLE) * ml.cl / tot.n AS e, tot.n
               |         FROM ms CROSS JOIN ml
               |         LEFT JOIN cell ON cell.source = ms.source AND cell.lang = ml.lang
               |         CROSS JOIN tot)
               |SELECT max(n) AS n,
               |       (SELECT (nsrc - 1) * (nlang - 1) FROM dims) AS dof,
               |       round(sum((c - e) * (c - e) / e), 4) AS chi2,
               |       round(sum(CASE WHEN c > 0
               |                 THEN c * 1.0 / n * ln(CAST(c AS DOUBLE) * n
               |                        / (CAST(cs AS DOUBLE) * cl))
               |                 ELSE 0 END) / ln(2), 6) AS mi_bits
               |FROM grid""".stripMargin)),

      // reliability (calibration) bins for the quality score against
      // the exact-duplicate label: does low quality actually predict
      // duplication? Bins are width-0.1 on the score, the dup label
      // is md5(text) multiplicity (the dedup_exact key), and both
      // sides of the join shuffle on the HASH — never the text.
      "samp_reliability_bins" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d)
          val q = TextAnalytics.qualityScores(docs)
            .join(docs.select(col("doc_id"), md5(col("text")).as("h")), "doc_id")
          val dupc = docs.groupBy(md5(col("text")).as("h"))
            .agg(count(lit(1)).as("nh"))
          q.join(dupc, "h")
            .withColumn("bin", least(floor(col("quality") * 10), lit(9L)))
            .groupBy("bin")
            .agg(count(lit(1)).as("n"),
                 round(avg(when(col("nh") > 1, 1.0).otherwise(0.0)), 4).as("dup_rate"),
                 round(avg("quality"), 4).as("avg_q"))
            .orderBy("bin")
        },
        Some(s"""WITH q AS (
                |  SELECT doc_id, md5(text) AS h,
                |         round((least(n_tok, 100) / 100.0) *
                |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
                |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
                |  FROM (
                |    SELECT doc_id, text, length(text) AS n_chars,
                |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
                |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                |               t -> t IN ($stopList))) AS stop_cnt,
                |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
                |    FROM documents)),
                |dupc AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS nh
                |         FROM documents GROUP BY md5(text))
                |SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS bin,
                |       CAST(count(*) AS BIGINT) AS n,
                |       round(avg(CASE WHEN nh > 1 THEN 1.0 ELSE 0.0 END), 4) AS dup_rate,
                |       round(avg(quality), 4) AS avg_q
                |FROM q JOIN dupc USING (h)
                |GROUP BY bin ORDER BY bin""".stripMargin)),

      // per-source quantile normalization onto the GLOBAL distribution
      // (the cross-source score-calibration step: a value's per-source
      // ecdf is mapped to the smallest global value of ≥ that ecdf,
      // inverse-CDF type 1). Everything runs on (value → count)
      // histograms — the stat_gini values-never-rows bound — so the
      // windows and the bounded inequality join touch ≤ distinct-value
      // frames no matter the corpus size; the output is the |S|·|V|
      // mapping table a pipeline would broadcast back onto rows.
      "samp_quantile_norm" -> Q(
        (s, d) => {
          val t = Tables.documents(s, d).select(col("source"),
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"))
          val hs = t.groupBy("source", "x").agg(count(lit(1)).as("c"))
            .localCheckpoint(eager = false) // three consumers below
          val ns = hs.groupBy("source").agg(sum("c").as("n_s"))
          val ws = Window.partitionBy("source").orderBy("x")
            .rowsBetween(Window.unboundedPreceding, 0)
          val src = hs.join(broadcast(ns), "source")
            .withColumn("ecdf_s", sum("c").over(ws) / col("n_s"))
          val hg = hs.groupBy("x").agg(sum("c").as("c"))
          val wg = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
          val glob = hg.crossJoin(broadcast(hg.agg(sum("c").as("n_g"))))
            .withColumn("ecdf_g", sum("c").over(wg) / col("n_g"))
            .select(col("x").as("gx"), col("ecdf_g"))
          src.join(broadcast(glob), col("ecdf_g") >= col("ecdf_s"))
            .groupBy("source", "x").agg(min("gx").as("q_x"))
            .orderBy("source", "x")
        },
        Some("""WITH t AS (
               |  SELECT source,
               |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x
               |  FROM documents),
               |hs AS (SELECT source, x, CAST(count(*) AS BIGINT) AS c
               |       FROM t GROUP BY source, x),
               |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM hs GROUP BY source),
               |src AS (SELECT hs.source, hs.x,
               |          CAST(sum(c) OVER (PARTITION BY hs.source ORDER BY x
               |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               |            / n_s AS ecdf_s
               |        FROM hs JOIN ns USING (source)),
               |hg AS (SELECT x, CAST(sum(c) AS BIGINT) AS c FROM hs GROUP BY x),
               |ng AS (SELECT CAST(sum(c) AS BIGINT) AS n_g FROM hg),
               |gq AS (SELECT x AS gx,
               |           CAST(sum(c) OVER (ORDER BY x
               |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               |             / n_g AS ecdf_g
               |         FROM hg, ng)
               |SELECT source, x, CAST(min(gx) AS BIGINT) AS q_x
               |FROM src JOIN gq ON ecdf_g >= ecdf_s
               |GROUP BY source, x ORDER BY source, x""".stripMargin)),

      // deterministic shard manifest: hash-assign every doc to one of
      // 16 shards (content-stable — re-runs, appends and repartitions
      // never move a doc) and emit the per-shard stats a downstream
      // tokenizer/loader plans against (doc count, byte and token
      // totals, id range). One grouped agg; the manifest IS the
      // contract a 100 TB export hands to the training job.
      "pipe_shard_manifest" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          Tables.documents(s, d)
            .withColumn("shard",
              md5Long(concat(lit("shard:"), col("doc_id").cast("string"))) % 16)
            .groupBy("shard")
            .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_bytes"),
                 sum(size(graft.text.TextPrimitives.tokens(col("text")))
                   .cast("long")).as("n_tokens"),
                 min("doc_id").as("min_id"), max("doc_id").as("max_id"))
            .orderBy("shard")
        },
        Some("""SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               |         % 16 AS shard,
               |       CAST(count(*) AS BIGINT) AS n_docs,
               |       CAST(sum(n_chars) AS BIGINT) AS n_bytes,
               |       CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT)
               |         AS n_tokens,
               |       min(doc_id) AS min_id, max(doc_id) AS max_id
               |FROM documents GROUP BY shard ORDER BY shard""".stripMargin)),

      // epoch-aware source mixing: smaller sources repeat (epochs =
      // sqrt(max/n_s), the temperature idiom), larger ones pass once.
      // Full repeats explode map-side from a per-source broadcast
      // factor; the fractional epoch admits each doc by deterministic
      // hash — so the emitted corpus is reproducible row-for-row and
      // the plan is scan → broadcast-join → explode, no shuffle of
      // the fact table at all before the final count. The admission
      // threshold is floor()ed EXPLICITLY on both engines (the sf1
      // flush caught DuckDB's CAST(double AS BIGINT) rounding to
      // nearest where Spark's cast truncates — one hash bucket of
      // docs flipped per source), and the display epochs ride the
      // ⌊x·10⁴+0.5⌋ fixed-point idiom off the bit-equal sqrt.
      "pipe_epoch_mix" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val docs = Tables.documents(s, d)
          val per = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
            .localCheckpoint(eager = false) // read by eps AND its max
          val eps = per.crossJoin(broadcast(per.agg(max("n_s").as("mx"))))
            .withColumn("ep", sqrt(col("mx").cast("double") / col("n_s")))
          docs.join(broadcast(eps), "source")
            .withColumn("n_copies", floor(col("ep")) +
              when(pmod(md5Long(concat(col("doc_id").cast("string"), lit("#mix"))),
                  lit(10000L))
                < floor((col("ep") - floor(col("ep"))) * 10000).cast("long"), 1L)
                .otherwise(0L))
            .select(col("source"), col("n_s"), col("ep"),
              explode(sequence(lit(1L), col("n_copies"))).as("copy"))
            .groupBy("source")
            .agg(max("n_s").as("n_docs"),
                 (floor(max("ep") * 10000 + 0.5) / 10000.0).as("epochs"),
                 count(lit(1)).as("n_emitted"))
            .orderBy("source")
        },
        Some("""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
               |             FROM documents GROUP BY source),
               |mx AS (SELECT max(n_s) AS mx FROM per),
               |eps AS (SELECT source, n_s, sqrt(CAST(mx AS DOUBLE) / n_s) AS ep
               |        FROM per, mx),
               |extra AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_extra
               |          FROM documents d JOIN eps USING (source)
               |          WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || '#mix'), 1, 15))::BIGINT
               |                  % 10000
               |                < CAST(floor((ep - floor(ep)) * 10000) AS BIGINT)
               |          GROUP BY d.source)
               |SELECT source, n_s AS n_docs,
               |       floor(ep * 10000 + 0.5) / 10000.0 AS epochs,
               |       CAST(n_s * floor(ep) + coalesce(n_extra, 0) AS BIGINT) AS n_emitted
               |FROM eps LEFT JOIN extra USING (source) ORDER BY source""".stripMargin)),

      // filter-attrition funnel: the per-stage report every curation
      // run ships with — docs and tokens surviving each cumulative
      // quality gate (length → min tokens → stopword ratio → exact
      // dedup). ONE scan computes every per-doc flag, the dedup gate
      // is a keep-first window over md5(text) (hash-partitioned, never
      // global), and the 5-row report is a single aggregate unpivoted
      // with stack() — adding a stage costs two sum() columns, not a
      // rescan, at any corpus size.
      "pipe_filter_attrition" -> Q(
        (s, d) => {
          val t = graft.text.TextPrimitives.tokens(col("text"))
          val flagged = Tables.documents(s, d)
            .select(col("doc_id"), col("n_chars"),
              size(t).cast("long").as("n_tok"),
              size(filter(t, x => x.isin(TextAnalytics.Stopwords: _*)))
                .cast("long").as("stop_cnt"),
              md5(col("text")).as("h"))
            .withColumn("rn",
              row_number().over(Window.partitionBy("h").orderBy("doc_id")))
            .withColumn("c1", col("n_chars") >= 150)
            .withColumn("c2", col("c1") && col("n_tok") >= 40)
            .withColumn("c3",
              col("c2") && col("stop_cnt") * lit(1.0) >= col("n_tok") * lit(0.05))
            .withColumn("c4", col("c3") && col("rn") === 1)
          def dt(c: Column, i: Int) = Seq(
            sum(when(c, 1L).otherwise(0L)).as(s"d$i"),
            sum(when(c, col("n_tok")).otherwise(0L)).as(s"t$i"))
          val stageCols = Seq(count(lit(1)).as("d0"), sum("n_tok").as("t0")) ++
            dt(col("c1"), 1) ++ dt(col("c2"), 2) ++
            dt(col("c3"), 3) ++ dt(col("c4"), 4)
          flagged.agg(stageCols.head, stageCols.tail: _*)
            .select(expr(
              """stack(5,
                |  CAST(0 AS BIGINT), 'raw',            d0, t0,
                |  CAST(1 AS BIGINT), 'len_ge_150',     d1, t1,
                |  CAST(2 AS BIGINT), 'tok_ge_40',      d2, t2,
                |  CAST(3 AS BIGINT), 'stop_ratio_5pc', d3, t3,
                |  CAST(4 AS BIGINT), 'exact_dedup',    d4, t4
                |) AS (stage_no, stage, docs, tokens)""".stripMargin))
            .orderBy("stage_no")
        },
        Some {
          val stop = TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""WITH f AS (
             |  SELECT doc_id, n_chars,
             |    len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |        t -> t IN ($stop))) AS stop_cnt,
             |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents),
             |c AS (SELECT n_tok,
             |        n_chars >= 150 AS c1,
             |        n_chars >= 150 AND n_tok >= 40 AS c2,
             |        n_chars >= 150 AND n_tok >= 40
             |          AND stop_cnt * 1.0 >= n_tok * 0.05 AS c3,
             |        n_chars >= 150 AND n_tok >= 40
             |          AND stop_cnt * 1.0 >= n_tok * 0.05 AND rn = 1 AS c4
             |      FROM f)
             |SELECT CAST(0 AS BIGINT) AS stage_no, 'raw' AS stage,
             |       CAST(count(*) AS BIGINT) AS docs, CAST(sum(n_tok) AS BIGINT) AS tokens
             |FROM c
             |UNION ALL SELECT 1, 'len_ge_150', CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(sum(CASE WHEN c1 THEN n_tok ELSE 0 END) AS BIGINT) FROM c
             |UNION ALL SELECT 2, 'tok_ge_40', CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(sum(CASE WHEN c2 THEN n_tok ELSE 0 END) AS BIGINT) FROM c
             |UNION ALL SELECT 3, 'stop_ratio_5pc', CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(sum(CASE WHEN c3 THEN n_tok ELSE 0 END) AS BIGINT) FROM c
             |UNION ALL SELECT 4, 'exact_dedup', CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(sum(CASE WHEN c4 THEN n_tok ELSE 0 END) AS BIGINT) FROM c
             |ORDER BY stage_no""".stripMargin
        }),

      "emb_norm_invariant" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.sqNorm
          graft.embed.HashEmbedder.embedDocs(Tables.documents(s, d), "doc_id", "text", 64)
            .filter(abs(sqrt(sqNorm(col("embedding"))) - 1.0) < 1e-9)
            .agg(count(lit(1)).as("n"))
        },
        Some("SELECT CAST(count(*) AS BIGINT) AS n FROM documents")),

      // the production-shaped inference path (batched mapPartitions
      // through the JVM-pooled EmbedClient — the reference's external
      // vectorizer integration, document_ingestor.py:605) running the
      // flagship search flow. Same oracle as text_search_e2e: the
      // deterministic raw-sum client makes the service path bit-equal
      // to the distributed groupBy embedder, so one SQL pins BOTH
      // physical paths to the same result — swapping transports
      // (in-plan agg ↔ external service) cannot change any answer
      "emb_service_search" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val svc = new graft.embed.ServiceEmbedder(
            new graft.embed.HashEmbedClientFactory(64, normalize = false),
            dim = 64, batchSize = 32)
          val raw = svc.embedDocs(Tables.documents(s, d), "doc_id", "text")
          val q = raw.filter(col("doc_id") === 3).select(col("embedding").as("qv"))
          raw.crossJoin(broadcast(q))
            .select(col("doc_id"), score(col("embedding"), col("qv")).as("score"))
            .orderBy(col("score").desc, col("doc_id"))
            .limit(10)
        },
        Some {
          val (dot, na, nb) = graft.embed.HashEmbedder.cosineTermsSql(64)
          s"""WITH sums AS (
             |${graft.embed.HashEmbedder.rawSumsSql(64)}),
             |q AS (SELECT * FROM sums WHERE doc_id = 3)
             |SELECT doc_id,
             |       round(CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
             |                  ELSE dot / sqrt(na * nb) END, 6) + 0.0 AS score
             |FROM (SELECT s.doc_id, ($dot) AS dot, ($na) AS na, ($nb) AS nb
             |      FROM sums s, q)
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
        }))
  }
}
