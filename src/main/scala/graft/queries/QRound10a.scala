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
private[graft] object QRound10a {


  // ---------------------------------------------------------------
  // Round-10 additions: classifier/retrieval evaluation metrics,
  // distribution-shift monitors, and a mergeable frequency sketch
  // ---------------------------------------------------------------

  val round10Q: Seq[(String, Q)] = {
    import graft.text.TextAnalytics
    // shared oracle CTE: (doc_id, lang, source, quality) with the
    // 4dp-rounded quality score — the bounded-distinct-value grid
    // every distribution metric below aggregates on
    val stopList = TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
    val qualityCte =
      s"""q AS (
         |  SELECT doc_id, lang, source,
         |         round((least(n_tok, 100) / 100.0) *
         |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
         |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
         |  FROM (
         |    SELECT doc_id, lang, source, length(text) AS n_chars,
         |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
         |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |               t -> t IN ($stopList))) AS stop_cnt,
         |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
         |    FROM documents))""".stripMargin
    def qualityWithLabels(s: SparkSession, d: String) = {
      val docs = Tables.documents(s, d)
      TextAnalytics.qualityScores(docs).drop("n_tok")
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
    }
    Seq(
      // ROC AUC of the quality score as an "is English" classifier —
      // the ranking-quality audit a filtering pipeline runs before
      // trusting a score as a keep/drop signal. Identical machinery to
      // stat_mwu (AUC = U/(n₁n₂)): aggregate per DISTINCT 4dp score
      // value (bounded grid ≤10⁴ rows at any corpus size), midranks
      // from a cumulative window over that grid — never a global sort
      // of docs. Ties handled exactly via midranks.
      "stat_roc_auc" -> Q(
        (s, d) => {
          val t = qualityWithLabels(s, d).select(col("quality").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          val h = t.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
          val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
          h.withColumn("below", coalesce(sum("nx").over(w), lit(0L)))
            .withColumn("midrank",
              col("below").cast("double") + (col("nx") + 1) / 2.0)
            .agg(sum("n1x").as("n1"), sum(col("nx") - col("n1x")).as("n2"),
                 sum(col("n1x") * col("midrank")).as("r1"))
            .select(col("n1").as("n_pos"), col("n2").as("n_neg"),
              when(col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
                .otherwise(round(
                  (col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2)
                    / (col("n1").cast("double") * col("n2")), 4)).as("auc"))
        },
        Some(s"""WITH $qualityCte,
               |t AS (SELECT quality AS x,
               |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g FROM q),
               |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS n1x,
               |             CAST(count(*) AS BIGINT) AS nx FROM t GROUP BY x),
               |r AS (SELECT n1x, nx,
               |        CAST(coalesce(sum(nx) OVER (ORDER BY x
               |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               |          + (nx + 1) / 2.0 AS midrank
               |      FROM h),
               |a AS (SELECT CAST(sum(n1x) AS BIGINT) AS n1,
               |             CAST(sum(nx - n1x) AS BIGINT) AS n2,
               |             sum(n1x * midrank) AS r1 FROM r)
               |SELECT n1 AS n_pos, n2 AS n_neg,
               |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
               |            ELSE round((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)
               |                       / (CAST(n1 AS DOUBLE) * n2), 4) END AS auc
               |FROM a""".stripMargin)),

      // population stability index between the src1 slice and the rest
      // of the corpus over 10 fixed-width quality bins — the standard
      // "did the distribution drift?" gate between two data snapshots.
      // Laplace-smoothed (+0.5/bin) so empty bins stay finite; the
      // full 10-bin spine comes from an explicit sequence, so zero
      // bins appear in the report instead of vanishing. Everything
      // after the one grouped scan is 10-row arithmetic.
      "stat_psi" -> Q(
        (s, d) => {
          val binned = qualityWithLabels(s, d)
            .select(least(floor(col("quality") * 10), lit(9L)).cast("long").as("bin"),
              when(col("source") === "src1", 1L).otherwise(0L).as("is_ref"))
            .groupBy("bin")
            .agg(sum("is_ref").as("nr"), sum(lit(1L) - col("is_ref")).as("nc"))
          val spine = s.range(10).select(col("id").as("bin"))
          val g = spine.join(binned, Seq("bin"), "left")
            .na.fill(0L, Seq("nr", "nc"))
          val tot = g.agg(sum("nr").as("tr"), sum("nc").as("tc"))
          val p = (col("nr") + 0.5) / (col("tr") + 5.0)
          val qq = (col("nc") + 0.5) / (col("tc") + 5.0)
          val contrib = (p - qq) * log(p / qq)
          g.crossJoin(broadcast(tot))
            .select(col("bin"), col("nr").as("n_ref"), col("nc").as("n_cmp"),
              round(contrib, 6).as("contrib"),
              round(sum(contrib).over(Window.partitionBy()), 6).as("psi_total"))
            .orderBy("bin")
        },
        Some(s"""WITH $qualityCte,
               |b AS (SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS bin,
               |             CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS is_ref FROM q),
               |c AS (SELECT bin, CAST(sum(is_ref) AS BIGINT) AS nr,
               |             CAST(sum(1 - is_ref) AS BIGINT) AS nc FROM b GROUP BY bin),
               |g AS (SELECT s.bin, coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
               |      FROM (SELECT unnest(range(10)) AS bin) s
               |      LEFT JOIN c ON s.bin = c.bin),
               |t AS (SELECT CAST(sum(nr) AS BIGINT) AS tr,
               |             CAST(sum(nc) AS BIGINT) AS tc FROM g),
               |x AS (SELECT bin, nr, nc,
               |             ((nr + 0.5) / (tr + 5.0) - (nc + 0.5) / (tc + 5.0))
               |               * ln(((nr + 0.5) / (tr + 5.0)) / ((nc + 0.5) / (tc + 5.0))) AS contrib
               |      FROM g, t)
               |SELECT bin, nr AS n_ref, nc AS n_cmp, round(contrib, 6) AS contrib,
               |       round(sum(contrib) OVER (), 6) AS psi_total
               |FROM x ORDER BY bin""".stripMargin)),

      // 1-D Wasserstein (earth mover's) distance between the quality
      // distributions of English vs non-English docs: W₁ = ∫|F₁−F₂|dx
      // over the bounded grid of distinct 4dp score values — the
      // metric that (unlike KS) weighs HOW FAR mass moved, which is
      // what a data-mixture change actually costs downstream. Same
      // scale shape as stat_roc_auc: one grouped scan, then windows
      // over the ≤10⁴-row value grid.
      "stat_wasserstein" -> Q(
        (s, d) => {
          val t = qualityWithLabels(s, d).select(col("quality").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          val h = t.groupBy("x")
            .agg(sum("g").as("na"), sum(lit(1L) - col("g")).as("nb"))
          val wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
          val wl = Window.orderBy("x")
          val tot = h.agg(sum("na").as("ta"), sum("nb").as("tb"))
          h.crossJoin(broadcast(tot))
            .withColumn("fa", sum("na").over(wc) / col("ta").cast("double"))
            .withColumn("fb", sum("nb").over(wc) / col("tb").cast("double"))
            .withColumn("gap", lead("x", 1).over(wl) - col("x"))
            .filter(col("gap").isNotNull)
            .agg(max("ta").as("n_en"), max("tb").as("n_other"),
              round(sum(abs(col("fa") - col("fb")) * col("gap")), 6).as("w1"))
        },
        Some(s"""WITH $qualityCte,
               |t AS (SELECT quality AS x,
               |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g FROM q),
               |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS na,
               |             CAST(sum(1 - g) AS BIGINT) AS nb FROM t GROUP BY x),
               |tt AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
               |              CAST(sum(nb) AS BIGINT) AS tb FROM h),
               |c AS (SELECT x,
               |             sum(na) OVER (ORDER BY x) / CAST(ta AS DOUBLE) AS fa,
               |             sum(nb) OVER (ORDER BY x) / CAST(tb AS DOUBLE) AS fb,
               |             lead(x) OVER (ORDER BY x) - x AS gap, ta, tb
               |      FROM h, tt)
               |SELECT CAST(max(ta) AS BIGINT) AS n_en, CAST(max(tb) AS BIGINT) AS n_other,
               |       round(sum(abs(fa - fb) * gap), 6) AS w1
               |FROM c WHERE gap IS NOT NULL""".stripMargin)),

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

      // NDCG@10 of embedding search as a RETRIEVAL-QUALITY metric:
      // for query docs 1–5, rank the corpus by exact cosine (raw
      // signed-bucket sums — bit-reproducible in SQL), relevance =
      // same-language-as-query, ideal DCG from the corpus-wide
      // relevant count. Complements the recall evals (ann_jl_recall,
      // dedup_lsh_eval) with a graded-ranking metric. The per-query
      // candidate set is the whole (small) corpus here; at scale the
      // ranking input swaps for the partition-pruned ANN paths and
      // this metric is unchanged downstream.
      "text_ndcg" -> Q(
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
          // top-10 per query via the bounded TopK partial aggregate —
          // a row_number window here would sort the ENTIRE scored
          // corpus on |queries| reducers (5 partitions at any scale);
          // the aggregate shuffles ≤10 rows/partition/query instead.
          // relevance rides the id's low bit (eid = doc_id·2 + rel is
          // monotone in doc_id, so the (sc desc, eid asc) comparator
          // keeps the window formulation's doc_id tie-break).
          val tk = graft.ops.TopK.topk(10)
          val top = scored
            .select(col("qid"), col("sc"),
              (col("doc_id") * 2 +
                when(col("lang") === col("qlang"), 1L).otherwise(0L)).as("eid"))
            .groupBy("qid").agg(tk(col("sc"), col("eid")).as("top"))
            .select(col("qid"), posexplode(col("top")))
            .select(col("qid"), (col("pos") + 1).as("rnk"),
              (col("col.id") % 2).as("rel"))
            .groupBy("qid")
            .agg(sum("rel").as("n_rel_top10"),
              sum(when(col("rel") === 1,
                lit(1.0) / log2(col("rnk") + 1)).otherwise(0.0)).as("dcg"))
          val rel = scored.groupBy("qid")
            .agg(sum(when(col("lang") === col("qlang"), 1L).otherwise(0L)).as("n_rel"))
          top.join(rel, "qid")
            .withColumn("idcg", expr(
              "aggregate(sequence(1, int(least(10, n_rel))), 0D, (a, i) -> a + 1.0 / log2(i + 1))"))
            .select(col("qid"), col("n_rel_top10"),
              when(col("n_rel") === 0, lit(null).cast("double"))
                .otherwise(round(col("dcg") / col("idcg"), 4)).as("ndcg"))
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
             |top AS (SELECT qid,
             |          CAST(sum(CASE WHEN lang = qlang THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_top10,
             |          sum(CASE WHEN lang = qlang THEN 1.0 / log2(rnk + 1) ELSE 0.0 END) AS dcg
             |        FROM rk WHERE rnk <= 10 GROUP BY qid),
             |rel AS (SELECT qid, CAST(sum(CASE WHEN lang = qlang THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
             |        FROM sc GROUP BY qid),
             |id_ AS (SELECT qid, sum(1.0 / log2(i + 1)) AS idcg
             |        FROM rel, LATERAL (SELECT unnest(generate_series(1, CAST(least(10, n_rel) AS BIGINT))) AS i)
             |        GROUP BY qid)
             |SELECT top.qid, n_rel_top10,
             |       CASE WHEN n_rel = 0 THEN NULL
             |            ELSE round(dcg / idcg, 4) END AS ndcg
             |FROM top JOIN rel USING (qid) LEFT JOIN id_ USING (qid)
             |ORDER BY qid""".stripMargin
        }),

      // TOST equivalence test (two one-sided z-tests) on mean per-user
      // event value between the md5 A/B arms: the inverse of ev_ab_test
      // — "are the arms the SAME within ±δ?", which is what a holdout
      // validation or infra migration actually needs to show. Welch SE
      // from per-arm var_samp of per-user means; margin δ = 0.5;
      // equivalent ⇔ both one-sided z's clear 1.6449 (α = 0.05).
      "stat_tost" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val delta = 0.5
          val g = Tables.events(s, d)
            .groupBy("user_id").agg(avg("value").as("uv"))
            .withColumn("arm",
              md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
            .groupBy("arm")
            .agg(count(lit(1)).cast("double").as("n"), avg("uv").as("m"),
                 var_samp("uv").as("v"))
            .localCheckpoint(eager = false) // read twice (both arms)
          val t = g.filter(col("arm") === 1)
            .select(col("n").as("nt"), col("m").as("mt"), col("v").as("vt"))
          val c = g.filter(col("arm") === 0)
            .select(col("n").as("nc"), col("m").as("mc"), col("v").as("vc"))
          val se = sqrt(col("vt") / col("nt") + col("vc") / col("nc"))
          val diff = col("mt") - col("mc")
          val zl = (diff + delta) / se
          val zu = (diff - delta) / se
          // se = 0 (degenerate constant-value corpus) would throw
          // DIVIDE_BY_ZERO under ANSI — NULL the z's, mirrored below
          def guarded(c: Column) =
            when(se === 0.0, lit(null).cast("double")).otherwise(c)
          t.crossJoin(c).select(
            col("nt").cast("long").as("n_t"), col("nc").cast("long").as("n_c"),
            round(diff, 4).as("mean_diff"), round(se, 6).as("se"),
            guarded(round(zl, 4)).as("z_lower"),
            guarded(round(zu, 4)).as("z_upper"),
            when(se === 0.0, lit(null).cast("int"))
              .otherwise((zl > 1.6449 && zu < -1.6449).cast("int")).as("equivalent"))
        },
        Some("""WITH u AS (
               |  SELECT user_id, avg(value) AS uv,
               |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
               |  FROM events GROUP BY user_id),
               |g AS (SELECT arm, CAST(count(*) AS DOUBLE) AS n, avg(uv) AS m,
               |             var_samp(uv) AS v FROM u GROUP BY arm),
               |t AS (SELECT n AS nt, m AS mt, v AS vt FROM g WHERE arm = 1),
               |c AS (SELECT n AS nc, m AS mc, v AS vc FROM g WHERE arm = 0)
               |SELECT CAST(nt AS BIGINT) AS n_t, CAST(nc AS BIGINT) AS n_c,
               |       round(mt - mc, 4) AS mean_diff,
               |       round(sqrt(vt/nt + vc/nc), 6) AS se,
               |       CASE WHEN sqrt(vt/nt + vc/nc) = 0 THEN NULL
               |            ELSE round((mt - mc + 0.5) / sqrt(vt/nt + vc/nc), 4) END AS z_lower,
               |       CASE WHEN sqrt(vt/nt + vc/nc) = 0 THEN NULL
               |            ELSE round((mt - mc - 0.5) / sqrt(vt/nt + vc/nc), 4) END AS z_upper,
               |       CASE WHEN sqrt(vt/nt + vc/nc) = 0 THEN NULL
               |            ELSE CAST((mt - mc + 0.5) / sqrt(vt/nt + vc/nc) > 1.6449
               |                 AND (mt - mc - 0.5) / sqrt(vt/nt + vc/nc) < -1.6449 AS INTEGER) END AS equivalent
               |FROM t, c""".stripMargin)),

      // TextRank keyphrase extraction: weighted PageRank over the
      // word co-occurrence graph (window ≤2 on the stopword-filtered
      // token stream), vocab bounded to the top-150 tokens by
      // frequency so the graph is ≤150 nodes at ANY corpus size —
      // the corpus-scale work is one token count + one pair count,
      // both map-side-combinable; the 4 power iterations run on the
      // collected bounded graph (same altitude call as
      // graph_pagerank's |event-types| chain). Per-iteration round
      // to 7dp pins the trajectory across engines.
      "text_textrank" -> Q(
        (s, d) => {
          import graft.text.TextAnalytics
          val stopArr = typedlit(TextAnalytics.Stopwords)
          val toksRaw = graft.text.TextPrimitives.tokens(col("text"))
          val content = filter(toksRaw, t => !array_contains(stopArr, t))
          val docs = Tables.documents(s, d).select(content.as("a"))
            .localCheckpoint(eager = false) // vocab + two pair streams
          val vocab = docs.select(explode(col("a")).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("freq"))
            .orderBy(col("freq").desc, col("tok")).limit(150)
          def pairs(k: Int) = docs.select(explode(zip_with(
              slice(col("a"), lit(1), greatest(size(col("a")) - k, lit(0))),
              slice(col("a"), lit(k + 1), greatest(size(col("a")) - k, lit(0))),
              (x, y) => concat(x, lit(" "), y))).as("p"))
            .select(split(col("p"), " ").as("sp"))
            .select(element_at(col("sp"), 1).as("x"), element_at(col("sp"), 2).as("y"))
          val e0 = pairs(1).union(pairs(2))
            .filter(col("x") =!= col("y"))
            .select(least(col("x"), col("y")).as("src"),
                    greatest(col("x"), col("y")).as("dst"))
            .join(broadcast(vocab.select(col("tok").as("src"))), "src")
            .join(broadcast(vocab.select(col("tok").as("dst"))), "dst")
            .groupBy("src", "dst").agg(count(lit(1)).as("w"))
          val nodes = vocab.select("tok").collect().map(_.getString(0)).sorted
          val canon = e0.collect()
            .map(r => (r.getAs[String]("src"), r.getAs[String]("dst"), r.getAs[Long]("w")))
            .sortBy(t => (t._1, t._2))
          val bi = canon.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
          val wa = bi.groupBy(_._1).map { case (a, es) => a -> es.map(_._3).sum }
          val edges = bi.map { case (a, b, w) =>
            (a, b, BigDecimal(w.toDouble / wa(a))
              .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble) }
          val nN = nodes.length
          def r7(x: Double) =
            BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
          var rank = nodes.map(t => t -> r7(1.0 / nN)).toMap
          for (_ <- 1 to 4) {
            val in = edges.groupBy(_._2).map { case (dst, es) =>
              dst -> es.sortBy(_._1).map(e => e._3 * rank(e._1)).sum }
            rank = nodes.map(t => t -> r7(0.15 / nN + 0.85 * in.getOrElse(t, 0.0))).toMap
          }
          import s.implicits._
          rank.toSeq.sortBy(_._1).toDF("tok", "r0")
            .select(col("tok"), round(col("r0"), 5).as("pr"))
            .orderBy(col("pr").desc, col("tok")).limit(15)
        },
        Some {
          val stopList = TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          val iters = (1 to 4).map { k =>
            s"""it$k AS (SELECT n.t, round(0.15 / nn.nn + 0.85 * coalesce(
               |  (SELECT sum(e.p * i.r) FROM e JOIN it${k - 1} i ON i.t = e.src
               |   WHERE e.dst = n.t), 0), 7) AS r
               |  FROM nodes n, nn)""".stripMargin
          }.mkString(",\n")
          s"""WITH content AS (
             |  SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |                     t -> t NOT IN ($stopList)) AS a
             |  FROM documents),
             |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq
             |          FROM (SELECT unnest(a) AS tok FROM content)
             |          GROUP BY tok ORDER BY freq DESC, tok LIMIT 150),
             |p1 AS (SELECT a[i] AS x, a[i+1] AS y FROM (
             |         SELECT a, unnest(generate_series(1, len(a) - 1)) AS i FROM content)),
             |p2 AS (SELECT a[i] AS x, a[i+2] AS y FROM (
             |         SELECT a, unnest(generate_series(1, len(a) - 2)) AS i FROM content)),
             |e0 AS (SELECT least(x, y) AS src, greatest(x, y) AS dst,
             |              CAST(count(*) AS BIGINT) AS w
             |       FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
             |       WHERE x <> y AND least(x, y) IN (SELECT tok FROM vocab)
             |         AND greatest(x, y) IN (SELECT tok FROM vocab)
             |       GROUP BY src, dst),
             |bi AS (SELECT src AS a, dst AS b, w FROM e0
             |       UNION ALL SELECT dst, src, w FROM e0),
             |deg AS (SELECT a, CAST(sum(w) AS BIGINT) AS wa FROM bi GROUP BY a),
             |e AS (SELECT a AS src, b AS dst, round(w * 1.0 / wa, 7) AS p
             |      FROM bi JOIN deg USING (a)),
             |nodes AS (SELECT tok AS t FROM vocab),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
             |it0 AS (SELECT t, round(1.0 / nn, 7) AS r FROM nodes, nn),
             |$iters
             |SELECT t AS tok, round(r, 5) AS pr FROM it4
             |ORDER BY pr DESC, tok LIMIT 15""".stripMargin
        }),

      // Cliff's delta effect size for en vs non-en token counts —
      // the non-parametric "how big is the difference" companion to
      // stat_mwu's "is there one": δ = 2·AUC − 1 from the same
      // midrank/rank-sum machinery over the DISTINCT-value histogram
      // (values, never rows), with the conventional magnitude labels
      "stat_cliffs_delta" -> Q(
        (s, d) => {
          val t = Tables.documents(s, d).select(
            size(graft.text.TextPrimitives.tokens(col("text"))).cast("long").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
          val h = t.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
          val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
          val delta =
            ((col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2) * 2
              / (col("n1").cast("double") * col("n2"))) - 1
          h.withColumn("below", coalesce(sum("nx").over(w), lit(0L)))
            .withColumn("midrank",
              col("below").cast("double") + (col("nx") + 1) / 2.0)
            .agg(sum("n1x").as("n1"), sum(col("nx") - col("n1x")).as("n2"),
                 sum(col("n1x") * col("midrank")).as("r1"))
            .select(col("n1").as("n_en"), col("n2").as("n_other"),
              when(col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
                .otherwise(round(delta, 4)).as("delta"),
              when(col("n1") === 0 || col("n2") === 0, lit(null).cast("string"))
                .otherwise(
                  when(abs(delta) < 0.147, "negligible")
                    .when(abs(delta) < 0.33, "small")
                    .when(abs(delta) < 0.474, "medium")
                    .otherwise("large")).as("magnitude"))
        },
        Some("""WITH t AS (
               |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x,
               |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
               |  FROM documents),
               |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS n1x,
               |             CAST(count(*) AS BIGINT) AS nx FROM t GROUP BY x),
               |r AS (SELECT n1x, nx,
               |        CAST(coalesce(sum(nx) OVER (ORDER BY x
               |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               |          + (nx + 1) / 2.0 AS midrank
               |      FROM h),
               |a AS (SELECT CAST(sum(n1x) AS BIGINT) AS n1,
               |             CAST(sum(nx - n1x) AS BIGINT) AS n2,
               |             sum(n1x * midrank) AS r1 FROM r),
               |dl AS (SELECT n1, n2,
               |              (r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2) * 2
               |                / (CAST(n1 AS DOUBLE) * n2) - 1 AS delta
               |       FROM a)
               |SELECT n1 AS n_en, n2 AS n_other,
               |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE round(delta, 4) END AS delta,
               |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
               |            WHEN abs(delta) < 0.147 THEN 'negligible'
               |            WHEN abs(delta) < 0.33 THEN 'small'
               |            WHEN abs(delta) < 0.474 THEN 'medium'
               |            ELSE 'large' END AS magnitude
               |FROM dl""".stripMargin)),

      // ε=1 DP mean of the (already-[0,1]-clipped) quality score per
      // source: the private-release twin of a per-slice quality
      // report. Budget split over the two released statistics (sum
      // and count, sensitivity 1 each ⇒ Laplace scale 2); noise is
      // the same deterministic inverse-CDF draw as priv_dp_counts so
      // the release is reproducible and oracle-exact. The sum rounds
      // to 6dp BEFORE noising so partial-sum grouping can't leak
      // into the release. Count guard: max(1, noisy_n)
      "priv_dp_mean" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          def lap(tag: String) = {
            // u rounds to 6dp BEFORE the inverse-CDF on both engines —
            // the draw must be bit-identical, not just close
            val u = round((md5Long(concat(lit(tag), col("source")))
              % 1000000L + 1L) / lit(1000000.0) - 0.5, 6)
            round(-signum(u) * lit(2.0) *
              log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(u))), 6)
          }
          qualityWithLabels(s, d).groupBy("source")
            .agg(count(lit(1)).as("n_true"),
                 round(sum("quality"), 6).as("sum_true"))
            .select(col("source"), col("n_true"),
              round(col("sum_true") + lap("dpm:"), 6).as("sum_noisy"),
              round(col("n_true") + lap("dpc:"), 6).as("n_noisy"))
            .select(col("source"), col("n_true"), col("sum_noisy"), col("n_noisy"),
              round(col("sum_noisy") / greatest(lit(1.0), col("n_noisy")), 4)
                .as("dp_mean"))
            .orderBy("source")
        },
        Some(s"""WITH $qualityCte,
               |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_true,
               |             round(sum(quality), 6) AS sum_true,
               |             round((('0x' || substr(md5('dpm:' || source), 1, 15))::BIGINT
               |               % 1000000 + 1) / 1000000.0 - 0.5, 6) + 0.0 AS us,
               |             round((('0x' || substr(md5('dpc:' || source), 1, 15))::BIGINT
               |               % 1000000 + 1) / 1000000.0 - 0.5, 6) + 0.0 AS uc
               |      FROM q GROUP BY source),
               |n AS (SELECT source, n_true,
               |             round(sum_true + round(-sign(us) * 2.0
               |               * ln(greatest(1e-12, 1.0 - 2.0 * abs(us))), 6), 6) AS sum_noisy,
               |             round(n_true + round(-sign(uc) * 2.0
               |               * ln(greatest(1e-12, 1.0 - 2.0 * abs(uc))), 6), 6) AS n_noisy
               |      FROM g)
               |SELECT source, n_true, sum_noisy, n_noisy,
               |       round(sum_noisy / greatest(1.0, n_noisy), 4) AS dp_mean
               |FROM n ORDER BY source""".stripMargin)),

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

      // Chao1 species-richness estimate of the vocabulary: how many
      // word types remain UNSEEN given the singleton/doubleton profile
      // — the "is more data worth scanning" complement to the Heaps
      // fit. Bias-corrected form V + f1(f1−1)/(2(f2+1)) (no f2=0
      // division), plus Good–Turing sample coverage 1 − f1/N. The
      // whole estimator is two aggregates over the term-frequency
      // histogram the vocab build already produces.
      "text_chao1" -> Q(
        (s, d) => {
          val freqs = Tables.documents(s, d)
            .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("f"))
          freqs.agg(count(lit(1)).as("v_obs"),
              sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
              sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"),
              sum("f").as("n_tokens"))
            .select(col("v_obs"), col("f1"), col("f2"), col("n_tokens"),
              round(col("v_obs") + col("f1").cast("double") * (col("f1") - 1)
                / ((col("f2") + 1) * 2.0), 2).as("chao1"),
              round(lit(1.0) - col("f1") / col("n_tokens").cast("double"), 6)
                .as("coverage"))
        },
        Some("""WITH fr AS (
               |  SELECT tok, CAST(count(*) AS BIGINT) AS f FROM (
               |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |    FROM documents)
               |  GROUP BY tok)
               |SELECT CAST(count(*) AS BIGINT) AS v_obs,
               |       CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               |       CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
               |       CAST(sum(f) AS BIGINT) AS n_tokens,
               |       round(count(*) + sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
               |               * CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) - 1 AS DOUBLE)
               |               / (2.0 * (sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) + 1)), 2) AS chao1,
               |       round(1.0 - sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
               |               / CAST(sum(f) AS DOUBLE), 6) AS coverage
               |FROM fr""".stripMargin)),

      // Goertzel-style seasonality strength: spectral power of the
      // daily purchase series at candidate periods {2,3,7,14} days —
      // ONE pass builds the |days|-row series, then each period is a
      // cos/sin pair of sums over that bounded frame (no FFT, no
      // per-row state). Trig terms round to 10dp before the products
      // so libm-vs-JDK last-ulp drift can't reach the 4dp report.
      "ts_goertzel" -> Q(
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
          val aggs = sum("x").as("total") +: periods.flatMap { p =>
            Seq(sum(col("x") * col(s"c$p")).as(s"a$p"),
                sum(col("x") * col(s"s$p")).as(s"b$p"))
          }
          withTrig.agg(count(lit(1)).as("n_days"), aggs: _*)
            .select((col("n_days") +: periods.map { p =>
              round(sqrt(col(s"a$p") * col(s"a$p") + col(s"b$p") * col(s"b$p"))
                * 2.0 / col("n_days"), 4).as(s"amp_$p")
            }): _*)
        },
        Some {
          val periods = Seq(2, 3, 7, 14)
          val terms = periods.map { p =>
            s"sum(x * round(cos(day * (2 * pi() / $p)), 10)) AS a$p, " +
              s"sum(x * round(sin(day * (2 * pi() / $p)), 10)) AS b$p"
          }.mkString(",\n             ")
          val amps = periods.map { p =>
            s"round(sqrt(a$p * a$p + b$p * b$p) * 2.0 / n_days, 4) AS amp_$p"
          }.mkString(",\n       ")
          s"""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day, CAST(count(*) AS DOUBLE) AS x
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n_days, sum(x) AS total,
             |             $terms
             |      FROM daily)
             |SELECT n_days,
             |       $amps
             |FROM s""".stripMargin
        }),

      // Cramér's V effect size for the lang × source association —
      // the "how strong" companion to stat_chi2_indep's "is there":
      // V = √(χ²/(n·min(r−1,c−1))), same broadcast-marginal full-grid
      // expected counts (zero observed cells still contribute)
      "stat_cramers_v" -> Q(
        (s, d) => {
          val doc = Tables.documents(s, d)
          val rt = doc.groupBy("lang").agg(count(lit(1)).as("nl"))
          val ct = doc.groupBy("source").agg(count(lit(1)).as("ns"))
          val obs = doc.groupBy("lang", "source").agg(count(lit(1)).as("o"))
          val tot = doc.agg(count(lit(1)).as("n"))
          val chi2 = sum(pow(col("o") - col("e"), 2) / col("e"))
          val mindf = least(countDistinct(col("lang")) - 1,
                            countDistinct(col("source")) - 1)
          rt.crossJoin(broadcast(ct))
            .join(obs, Seq("lang", "source"), "left")
            .na.fill(0L, Seq("o"))
            .crossJoin(broadcast(tot))
            .withColumn("e", col("nl") * col("ns") / col("n").cast("double"))
            .agg(round(chi2, 4).as("chi2"), mindf.as("min_df"), max(col("n")).as("n"),
              when(mindf === 0, lit(null).cast("double"))
                .otherwise(round(sqrt(chi2 / (max(col("n")) * mindf)), 4)).as("v"))
        },
        Some("""WITH rt AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
               |            FROM documents GROUP BY lang),
               |ct AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
               |       FROM documents GROUP BY source),
               |obs AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
               |        FROM documents GROUP BY lang, source),
               |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
               |grid AS (
               |  SELECT rt.lang, ct.source, coalesce(o, 0) AS o, n,
               |         rt.nl * ct.ns / CAST(n AS DOUBLE) AS e
               |  FROM rt CROSS JOIN ct
               |  LEFT JOIN obs ON rt.lang = obs.lang AND ct.source = obs.source
               |  CROSS JOIN tot),
               |a AS (SELECT sum(pow(o - e, 2) / e) AS chi2,
               |             least(count(DISTINCT lang) - 1,
               |                   count(DISTINCT source) - 1) AS min_df,
               |             CAST(max(n) AS BIGINT) AS n
               |      FROM grid)
               |SELECT round(chi2, 4) AS chi2, CAST(min_df AS BIGINT) AS min_df, n,
               |       CASE WHEN min_df = 0 THEN NULL
               |            ELSE round(sqrt(chi2 / (n * min_df)), 4) END AS v
               |FROM a""".stripMargin)),

      // two-NN intrinsic-dimension estimate (Facco et al. 2017): the
      // MLE id = n/Σln(r₂/r₁) from each vector's two nearest-neighbor
      // distances — "how many dimensions does the embedding ACTUALLY
      // use", the manifold complement to emb_anisotropy/emb_dim_stats.
      // Distances round to 6dp (engine-identical ranking); zero-r₁
      // duplicates are excluded as the estimator requires. The
      // pairwise stage is the bounded-corpus oracle form; at scale the
      // candidate pairs come from the LSH/IVF bucketed paths (same
      // note as ann_knn_graph) with the estimator unchanged.
      "emb_twonn_id" -> Q(
        (s, d) => {
          // dense kernel (negated-distance TopK merge) instead of a
          // row_number window over the 4M-pair frame: the window
          // formulation measured 43 s at sf0.1, the kernel ~1 s —
          // same (dist asc, ib) ranking, oracle unchanged
          graft.ann.Ann.nearestDistancesDense(Tables.embeddings(s, d), 2)
            .groupBy(col("vec_id").as("ia"))
            .agg(min(when(col("rnk") === 1, col("dist"))).as("r1"),
                 min(when(col("rnk") === 2, col("dist"))).as("r2"))
            .filter(col("r1") > 0)
            .agg(count(lit(1)).as("n_used"),
                 round(sum(log(col("r2") / col("r1"))), 6).as("sum_log_mu"))
            .select(col("n_used"),
              col("sum_log_mu"),
              when(col("sum_log_mu") <= 0, lit(null).cast("double"))
                .otherwise(round(col("n_used") / col("sum_log_mu"), 4)).as("id_hat"))
        },
        Some("""WITH p AS (
               |  SELECT a.vec_id AS ia, b.vec_id AS ib,
               |         round(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dist
               |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
               |rk AS (SELECT ia, dist,
               |              row_number() OVER (PARTITION BY ia ORDER BY dist, ib) AS rnk
               |       FROM p),
               |nn AS (SELECT ia,
               |              min(CASE WHEN rnk = 1 THEN dist END) AS r1,
               |              min(CASE WHEN rnk = 2 THEN dist END) AS r2
               |       FROM rk WHERE rnk <= 2 GROUP BY ia),
               |a AS (SELECT CAST(count(*) AS BIGINT) AS n_used,
               |             round(sum(ln(r2 / r1)), 6) AS sum_log_mu
               |      FROM nn WHERE r1 > 0)
               |SELECT n_used, sum_log_mu,
               |       CASE WHEN sum_log_mu <= 0 THEN NULL
               |            ELSE round(n_used / sum_log_mu, 4) END AS id_hat
               |FROM a""".stripMargin)),

      // sign-flip permutation test on the A/B mean difference: the
      // assumption-free p-value (no normality, no variance formula) —
      // B=64 deterministic md5 re-randomizations of the per-user arm,
      // T_b for every permutation from ONE wide aggregate over the
      // per-user frame (130 conditional sums — the dim-64 embedder
      // precedent; all map-side), then the p-value is scalar
      // arithmetic on the 1-row result. p = (1+#{|T_b|≥|T_obs|})/(B+1).
      // T's round to 6dp before comparison so both engines classify
      // "extreme" identically.
      "stat_perm_test" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.md5Long
          val B = 64
          def armCol(tag: String) =
            md5Long(concat(lit(tag), col("user_id").cast("string"))) % 2
          val users = Tables.events(s, d)
            .groupBy("user_id").agg(avg("value").as("uv"))
            .select(Seq(col("uv"), armCol("ab:").as("h_obs")) ++
              (0 until B).map(b => armCol(s"perm:$b:").as(s"h$b")): _*)
          def tStat(hs: String): Column = {
            val s1 = col(s"s1_$hs"); val n1 = col(s"n1_$hs")
            // a permutation can land every user in one arm on a tiny
            // corpus — NULL that T (its comparison then counts 0 on
            // both engines) instead of an ANSI divide-by-zero
            when(n1 === 0.0 || n1 === col("n"), lit(null).cast("double"))
              .otherwise(round(s1 / n1 - (col("s") - s1) / (col("n") - n1), 6))
          }
          val aggs =
            Seq(count(lit(1)).cast("double").as("n"), sum("uv").as("s"),
                sum(when(col("h_obs") === 1, col("uv")).otherwise(0.0)).as("s1_obs"),
                sum(when(col("h_obs") === 1, 1.0).otherwise(0.0)).as("n1_obs")) ++
            (0 until B).flatMap(b => Seq(
              sum(when(col(s"h$b") === 1, col("uv")).otherwise(0.0)).as(s"s1_$b"),
              sum(when(col(s"h$b") === 1, 1.0).otherwise(0.0)).as(s"n1_$b")))
          val nExtreme = (0 until B).map(b =>
            when(abs(tStat(b.toString)) >= abs(tStat("obs")), 1).otherwise(0))
            .reduce(_ + _)
          users.agg(aggs.head, aggs.tail: _*)
            .select(round(tStat("obs"), 4).as("t_obs"),
              lit(B).cast("long").as("n_perms"),
              nExtreme.cast("long").as("n_extreme"),
              round((nExtreme + 1) / lit((B + 1).toDouble), 4).as("p_value"))
        },
        Some {
          val B = 64
          def armSql(tag: String) =
            s"('0x' || substr(md5('$tag' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2"
          val hCols = (s"${armSql("ab:")} AS h_obs" +:
            (0 until B).map(b => s"${armSql(s"perm:$b:")} AS h$b")).mkString(",\n         ")
          val aggCols = (Seq(
            "CAST(count(*) AS DOUBLE) AS n", "sum(uv) AS s",
            "sum(CASE WHEN h_obs = 1 THEN uv ELSE 0.0 END) AS s1_obs",
            "sum(CASE WHEN h_obs = 1 THEN 1.0 ELSE 0.0 END) AS n1_obs") ++
            (0 until B).flatMap(b => Seq(
              s"sum(CASE WHEN h$b = 1 THEN uv ELSE 0.0 END) AS s1_$b",
              s"sum(CASE WHEN h$b = 1 THEN 1.0 ELSE 0.0 END) AS n1_$b")))
            .mkString(",\n             ")
          def tSql(hs: String) =
            s"(CASE WHEN n1_$hs = 0 OR n1_$hs = n THEN NULL ELSE " +
              s"round(s1_$hs / n1_$hs - (s - s1_$hs) / (n - n1_$hs), 6) END)"
          val extreme = (0 until B)
            .map(b => s"CASE WHEN abs(${tSql(b.toString)}) >= abs(${tSql("obs")}) THEN 1 ELSE 0 END")
            .mkString(" + ")
          s"""WITH u AS (
             |  SELECT user_id, avg(value) AS uv FROM events GROUP BY user_id),
             |h AS (SELECT uv,
             |         $hCols
             |      FROM u),
             |a AS (SELECT $aggCols
             |      FROM h)
             |SELECT round(${tSql("obs")}, 4) AS t_obs,
             |       CAST($B AS BIGINT) AS n_perms,
             |       CAST($extreme AS BIGINT) AS n_extreme,
             |       round(($extreme + 1) / ${(B + 1).toDouble}, 4) AS p_value
             |FROM a""".stripMargin
        }),

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

      // average local clustering coefficient (Watts–Strogatz) of the
      // near-dup graph: per-node Cᵢ = 2·triᵢ/(degᵢ(degᵢ−1)) averaged
      // over deg≥2 nodes — "do my neighbors know each other", the
      // node-level complement to graph_triangles' global transitivity.
      // Same bounded edge build + degree-oriented wedge join; each
      // closed triangle credits all three corners via one explode.
      "graph_local_cc" -> Q(
        (s, d) => {
          val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false) // degrees + orientation + closure
          val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("dg"))
          val or_ = e0
            .join(broadcast(deg.select(col("v").as("da"), col("dg").as("dga"))), "da")
            .join(broadcast(deg.select(col("v").as("db"), col("dg").as("dgb"))), "db")
            .select(
              when(col("dga") < col("dgb") ||
                   (col("dga") === col("dgb") && col("da") < col("db")),
                struct(col("da").as("u"), col("db").as("w")))
                .otherwise(struct(col("db").as("u"), col("da").as("w"))).as("e"))
            .select(col("e.u").as("u"), col("e.w").as("w"))
          val tri = or_.select(col("u"), col("w").as("v1"))
            .join(or_.select(col("u"), col("w").as("v2")), "u")
            .filter(col("v1") < col("v2"))
            .join(e0, col("v1") === col("da") && col("v2") === col("db"))
            .select(col("u"), col("v1"), col("v2"))
          val perNode = tri
            .select(explode(array(col("u"), col("v1"), col("v2"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("t"))
          deg.filter(col("dg") >= 2)
            .join(perNode, Seq("v"), "left")
            .na.fill(0L, Seq("t"))
            .select((col("t") * 2.0 / (col("dg") * (col("dg") - 1))).as("cc"))
            .agg(count(lit(1)).as("n_deg2_nodes"),
                 round(avg("cc"), 4).as("avg_local_cc"))
        },
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db),
                |edges AS (SELECT da, db FROM (
                |    SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |    FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |  WHERE j >= 0.25),
                |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
                |    SELECT da AS v FROM edges UNION ALL SELECT db FROM edges)
                |  GROUP BY v),
                |orient AS (SELECT CASE WHEN a.dg < b.dg OR (a.dg = b.dg AND da < db)
                |                  THEN da ELSE db END AS u,
                |                  CASE WHEN a.dg < b.dg OR (a.dg = b.dg AND da < db)
                |                  THEN db ELSE da END AS w
                |           FROM edges JOIN deg a ON a.v = da JOIN deg b ON b.v = db),
                |tri AS (SELECT w1.u, w1.w AS v1, w2.w AS v2
                |        FROM orient w1 JOIN orient w2 ON w1.u = w2.u AND w1.w < w2.w
                |        JOIN edges ON w1.w = da AND w2.w = db),
                |pn AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM (
                |    SELECT u AS v FROM tri UNION ALL SELECT v1 FROM tri
                |    UNION ALL SELECT v2 FROM tri)
                |  GROUP BY v)
                |SELECT CAST(count(*) AS BIGINT) AS n_deg2_nodes,
                |       round(avg(coalesce(t, 0) * 2.0 / (dg * (dg - 1))), 4) AS avg_local_cc
                |FROM deg LEFT JOIN pn USING (v) WHERE dg >= 2""".stripMargin)))
  }

  // ---------------------------------------------------------------
  // Round-10 second wave: Markov-model diagnostics off the shared
  // transition-cell materialization, time-series trend/whiteness
  // tests, extreme-value and partial-correlation fits, and the dup
  // graph's degree distribution
  // ---------------------------------------------------------------

  val round10bQ: Seq[(String, Q)] = Seq(
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
        val pairs = transitionCells(s, d).filter(col("to_type").isNotNull)
        val tot = pairs.groupBy("from_type").agg(sum("n").as("tt"))
        val cells = pairs.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"),
                  round(col("n") / col("tt"), 6).as("p"))
          .localCheckpoint(eager = false) // 12 iteration reads + entropy pass
        val states = cells.select("from_type").distinct()
        val kk = states.agg(count(lit(1)).as("k"))
        var v = states.crossJoin(broadcast(kk))
          .select(col("from_type").as("state"),
                  round(lit(1.0) / col("k"), 7).as("v"))
        for (_ <- 1 to 12)
          v = cells.join(broadcast(v), cells("from_type") === v("state"))
            .groupBy("to_type")
            .agg(round(sum(col("p") * col("v")), 7).as("v"))
            .withColumnRenamed("to_type", "state")
        val hi = cells.filter(col("p") > 0).groupBy("from_type")
          .agg(round(-sum(col("p") * log(col("p"))), 6).as("h_i"))
        val er = hi.join(v, hi("from_type") === v("state"))
          .agg(round(sum(col("v") * col("h_i")), 4).as("entropy_rate"))
        er.crossJoin(broadcast(kk))
          .select(col("k").as("n_states"), col("entropy_rate"),
                  when(col("k") > 1, round(log(col("k")), 4))
                    .otherwise(lit(null).cast("double")).as("max_entropy"),
                  when(col("k") > 1 && col("entropy_rate").isNotNull,
                       round(col("entropy_rate") / round(log(col("k")), 4), 4))
                    .otherwise(lit(null).cast("double")).as("efficiency"))
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

    // Ljung–Box whiteness test per type: Q = n(n+2) Σ_{k≤3} r_k²/(n−k)
    // over the hourly-count series, with r_k the ts_acf pairwise
    // autocorrelation (identical aligned-pair corr on both engines,
    // rounded to 6 before squaring). Large Q ⇒ the series is NOT
    // white noise ⇒ the seasonal/trend models downstream have signal
    // to work with. Lags with n ≤ k or undefined r are excluded on
    // both sides; the hourly rollup is ONE checkpointed fact pass.
    "ts_ljung_box" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // lag pairs ×3 + the per-type n
        val nn = hourly.groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"))
        val a = hourly.withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
        val b = hourly.select(col("event_type").as("et2"),
          col("h").as("hb"), col("c").as("cb"))
        a.join(b, col("event_type") === col("et2") &&
            col("hb") === col("h") + col("k"))
          .groupBy("event_type", "k")
          .agg(round(corr("c", "cb"), 6).as("r"))
          .join(broadcast(nn), "event_type")
          .groupBy("event_type")
          .agg(max("n_hours").as("n_hours"),
               sum(when(col("r").isNotNull && col("n_hours") > col("k"), 1L)
                 .otherwise(0L)).as("n_lags"),
               round(max("n_hours") * (max("n_hours") + lit(2)) *
                 sum(when(col("r").isNotNull && col("n_hours") > col("k"),
                       pow(col("r"), 2) / (col("n_hours") - col("k")))
                   .otherwise(lit(0.0))), 4).as("q_lb"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, ts // 3600000000000 AS h,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
             |       FROM hourly GROUP BY 1),
             |l AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS k),
             |rk AS (SELECT a.event_type, l.k, round(corr(a.c, b.c), 6) AS r
             |       FROM hourly a CROSS JOIN l
             |       JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + l.k
             |       GROUP BY a.event_type, l.k)
             |SELECT event_type, max(n_hours) AS n_hours,
             |       CAST(sum(CASE WHEN r IS NOT NULL AND n_hours > k
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_lags,
             |       round(max(n_hours) * (max(n_hours) + 2) *
             |             sum(CASE WHEN r IS NOT NULL AND n_hours > k
             |                      THEN pow(r, 2) / (n_hours - k) ELSE 0.0 END),
             |             4) AS q_lb
             |FROM rk JOIN nn USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Mann–Kendall trend test + Sen's slope per type on the daily
    // count series: S = Σ_{i<j} sign(c_j − c_i), tie-corrected
    // var(S), continuity-corrected z, and the median pairwise slope.
    // The pair self-join is calendar²-bounded per type (the ts_pettitt
    // frame bound); the daily rollup is ONE checkpointed fact pass
    // read by pairs, ties, and the n frame.
    "ts_mann_kendall" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // pairs ×2 + ties + n
        val b = daily.select(col("event_type").as("et2"),
          col("day").as("day2"), col("c").as("c2"))
        val pr = daily.join(b, col("event_type") === col("et2") &&
            col("day2") > col("day"))
          .groupBy("event_type")
          .agg(sum(signum(col("c2") - col("c"))).cast("long").as("s_stat"),
               round(expr("percentile((c2 - c) / (day2 - day), 0.5D)"), 6)
                 .as("sen_slope"))
        val ties = daily.groupBy("event_type", "c")
          .agg(count(lit(1)).cast("double").as("t"))
          .groupBy("event_type")
          .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
            .as("tie_term"))
        val nn = daily.groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("nd"))
        val vs = (col("nd") * (col("nd") - 1) * (lit(2) * col("nd") + 5) -
                  col("tie_term")) / lit(18.0)
        nn.join(ties, "event_type")
          .join(pr, Seq("event_type"), "left")
          .select(col("event_type"), col("nd").cast("long").as("n_days"),
                  col("s_stat"), col("sen_slope"),
                  when(vs > 0 && col("s_stat").isNotNull,
                       round((col("s_stat") - signum(col("s_stat"))) /
                             sqrt(vs), 4))
                    .otherwise(lit(null).cast("double")).as("z"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |pr AS (SELECT a.event_type,
             |         CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_stat,
             |         round(quantile_cont((b.c - a.c) / (b.day - a.day), 0.5), 6)
             |           AS sen_slope
             |       FROM daily a JOIN daily b
             |         ON b.event_type = a.event_type AND b.day > a.day
             |       GROUP BY 1),
             |ties AS (SELECT event_type,
             |           sum(t * (t - 1) * (2 * t + 5)) AS tie_term
             |         FROM (SELECT event_type, CAST(count(*) AS DOUBLE) AS t
             |               FROM daily GROUP BY event_type, c)
             |         GROUP BY 1),
             |nn AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS nd
             |       FROM daily GROUP BY 1)
             |SELECT event_type, CAST(nd AS BIGINT) AS n_days, s_stat, sen_slope,
             |       CASE WHEN (nd * (nd - 1) * (2 * nd + 5) - tie_term) / 18.0 > 0
             |                 AND s_stat IS NOT NULL
             |            THEN round((s_stat - sign(s_stat)) /
             |                   sqrt((nd * (nd - 1) * (2 * nd + 5) - tie_term) / 18.0), 4)
             |       END AS z
             |FROM nn JOIN ties USING (event_type)
             |LEFT JOIN pr USING (event_type)
             |ORDER BY event_type""".stripMargin)),

    // Gumbel extreme-value fit of WEEKLY MAXIMA of daily counts per
    // type (method of moments: β = s√6/π, μ = m − γβ) — the
    // capacity-planning question "how big can a peak week get".
    // p_exceed_max = P(a future weekly max exceeds the observed max).
    // Two tiny rollups; moments rounded to 6 before the closed form
    // so both engines evaluate the identical expression.
    "stat_gumbel" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val weekly = daily
          .groupBy(col("event_type"), expr("day div 7").as("wk"))
          .agg(max("c").as("m"))
        val g = lit(0.5772156649015329) // Euler–Mascheroni
        weekly.groupBy("event_type")
          .agg(count(lit(1)).as("n_weeks"),
               round(avg("m"), 6).as("mean_max"),
               round(stddev_pop(col("m").cast("double")), 6).as("sd_max"),
               max("m").as("max_weekly"))
          .select(col("event_type"), col("n_weeks"), col("max_weekly"),
                  round(col("sd_max") * sqrt(lit(6.0)) / lit(math.Pi), 6)
                    .as("beta"),
                  round(col("mean_max") -
                    g * round(col("sd_max") * sqrt(lit(6.0)) / lit(math.Pi), 6), 6)
                    .as("mu"))
          .withColumn("p_exceed_max",
            when(col("beta") > 0,
                 round(lit(1.0) - exp(-exp(-(col("max_weekly") - col("mu")) /
                                            col("beta"))), 4))
              .otherwise(lit(null).cast("double")))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |weekly AS (SELECT event_type, day // 7 AS wk, max(c) AS m
             |           FROM daily GROUP BY 1, 2),
             |mom AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_weeks,
             |               round(avg(m), 6) AS mean_max,
             |               round(stddev_pop(CAST(m AS DOUBLE)), 6) AS sd_max,
             |               max(m) AS max_weekly
             |        FROM weekly GROUP BY 1),
             |fit AS (SELECT event_type, n_weeks, max_weekly,
             |          round(sd_max * sqrt(6.0) / pi(), 6) AS beta,
             |          round(mean_max - 0.5772156649015329 *
             |                round(sd_max * sqrt(6.0) / pi(), 6), 6) AS mu
             |        FROM mom)
             |SELECT event_type, n_weeks, max_weekly, beta, mu,
             |       CASE WHEN beta > 0
             |            THEN round(1.0 - exp(-exp(-(max_weekly - mu) / beta)), 4)
             |       END AS p_exceed_max
             |FROM fit ORDER BY event_type""".stripMargin)),

    // first-order partial correlation on lineitem: does quantity
    // correlate with revenue AFTER controlling for discount?
    // r_xy·z = (r_xy − r_xz r_yz)/√((1−r_xz²)(1−r_yz²)) off the three
    // pairwise corrs of ONE hash aggregate — the 3-variable
    // confounder check, zero joins, zero windows. Pairwise r rounded
    // to 6 so both engines feed the identical closed form.
    "stat_partial_corr" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.agg(count(lit(1)).as("n_rows"),
               round(corr("l_quantity", "l_extendedprice"), 6).as("r_xy"),
               round(corr("l_quantity", "l_discount"), 6).as("r_xz"),
               round(corr("l_extendedprice", "l_discount"), 6).as("r_yz"))
          .select(col("n_rows"), col("r_xy"), col("r_xz"), col("r_yz"),
                  when((lit(1.0) - pow(col("r_xz"), 2)) > 0 &&
                       (lit(1.0) - pow(col("r_yz"), 2)) > 0,
                       round((col("r_xy") - col("r_xz") * col("r_yz")) /
                             sqrt((lit(1.0) - pow(col("r_xz"), 2)) *
                                  (lit(1.0) - pow(col("r_yz"), 2))), 4))
                    .otherwise(lit(null).cast("double")).as("r_xy_given_z"))
      },
      Some("""WITH c AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |         round(corr(l_quantity, l_extendedprice), 6) AS r_xy,
             |         round(corr(l_quantity, l_discount), 6) AS r_xz,
             |         round(corr(l_extendedprice, l_discount), 6) AS r_yz
             |  FROM lineitem)
             |SELECT n_rows, r_xy, r_xz, r_yz,
             |       CASE WHEN (1.0 - pow(r_xz, 2)) > 0 AND (1.0 - pow(r_yz, 2)) > 0
             |            THEN round((r_xy - r_xz * r_yz) /
             |                   sqrt((1.0 - pow(r_xz, 2)) * (1.0 - pow(r_yz, 2))), 4)
             |       END AS r_xy_given_z
             |FROM c""".stripMargin)),

    // degree distribution of the near-dup graph: log2-bucketed degree
    // histogram + the discrete Hill/MLE power-law exponent
    // α = 1 + n/Σ ln(dᵢ/(d_min−½)) with d_min = 1 — is dup-degree
    // heavy-tailed (one mega-cluster) or thin (pairwise dups)?
    // Shares the bounded edge build every graph_* query uses; the
    // 1-row α frame broadcasts onto the ≤log2(n)-row histogram.
    "graph_degree_dist" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
          .localCheckpoint(eager = false) // degrees read by hist AND alpha
        val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
          .groupBy("v").agg(count(lit(1)).as("dg"))
          .localCheckpoint(eager = false)
        val alpha = deg.agg(count(lit(1)).as("n_nodes"),
            round(lit(1.0) + count(lit(1)) /
              sum(log(col("dg") / lit(0.5))), 4).as("alpha_hill"))
        deg.groupBy(floor(log2(col("dg"))).cast("long").as("deg_bucket"))
          .agg(count(lit(1)).as("n_in_bucket"))
          .crossJoin(broadcast(alpha))
          .select(col("deg_bucket"), col("n_in_bucket"),
                  col("n_nodes"), col("alpha_hill"))
          .orderBy("deg_bucket")
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
              |        FROM (SELECT da AS v FROM e0 UNION ALL SELECT db AS v FROM e0)
              |        GROUP BY v),
              |al AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
              |              round(1.0 + count(*) / sum(ln(dg / 0.5)), 4) AS alpha_hill
              |       FROM deg)
              |SELECT CAST(floor(log2(dg)) AS BIGINT) AS deg_bucket,
              |       CAST(count(*) AS BIGINT) AS n_in_bucket, n_nodes, alpha_hill
              |FROM deg, al
              |GROUP BY 1, n_nodes, alpha_hill ORDER BY 1""".stripMargin)),

    // Dirichlet query-likelihood retrieval (Zhai & Lafferty 2001) —
    // the probabilistic LM complement to BM25 over the same
    // one-explode shuffle; zero-tf query terms contribute the
    // smoothed collection mass so scores are comparable across docs
    "text_lmir" -> Q(
      (s, d) => graft.text.Bm25.dirichletQL(
        Tables.documents(s, d), Seq("spark", "hash", "merge"), 10),
      Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
             |              FROM documents),
             |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
             |tc AS (SELECT sum(dl) AS t_coll FROM dl),
             |hits AS (SELECT doc_id, tok
             |         FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
             |         WHERE tok IN ('spark', 'hash', 'merge')),
             |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
             |       FROM hits GROUP BY 1, 2),
             |cf AS (SELECT tok, CAST(count(*) AS DOUBLE) AS cf FROM hits GROUP BY 1),
             |m AS (SELECT DISTINCT doc_id FROM tf),
             |terms AS (SELECT unnest(['spark', 'hash', 'merge']) AS tok)
             |SELECT doc_id,
             |       CAST(sum(CASE WHEN tf.tf IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_hit_terms,
             |       round(sum(ln((coalesce(tf.tf, 0.0) + 2000.0 * cf / t_coll) /
             |                    (dl + 2000.0))), 4) AS ql
             |FROM m CROSS JOIN terms
             |LEFT JOIN tf USING (doc_id, tok)
             |JOIN cf USING (tok) JOIN dl USING (doc_id), tc
             |GROUP BY doc_id ORDER BY ql DESC, doc_id LIMIT 10""".stripMargin)),

    // lexicon-based sentiment scoring per language: mean token
    // valence over matched terms per doc, rolled up per lang — the
    // cheap quality/tone signal next to text_quality. The 4-term
    // valence lexicon is a broadcast literal on both engines; docs
    // with no lexicon hit are excluded from the doc average (counted
    // separately) rather than imputed 0.
    "text_sentiment" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        val lex = s.createDataFrame(Seq(
          ("fast", 2.0), ("slow", -2.0), ("big", 1.0), ("small", -1.0)))
          .toDF("tok", "val")
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
                  explode(TextPrimitives.tokens(col("text"))).as("tok"))
        val perDoc = toks.join(broadcast(lex), "tok")
          .groupBy("doc_id", "lang")
          .agg(round(avg("val"), 6).as("sent"), count(lit(1)).as("n_hits"))
        val nd = Tables.documents(s, d).groupBy("lang")
          .agg(count(lit(1)).as("n_docs"))
        perDoc.groupBy("lang")
          .agg(count(lit(1)).as("n_scored"),
               round(avg("sent"), 4).as("mean_sentiment"),
               sum(when(col("sent") > 0, 1L).otherwise(0L)).as("n_positive"))
          .join(broadcast(nd), "lang")
          .select(col("lang"), col("n_docs"), col("n_scored"),
                  col("mean_sentiment"), col("n_positive"))
          .orderBy("lang")
      },
      Some("""WITH lex AS (SELECT * FROM (VALUES ('fast', 2.0), ('slow', -2.0),
             |                                   ('big', 1.0), ('small', -1.0))
             |             AS t(tok, val)),
             |toks AS (SELECT doc_id, lang, unnest(
             |           regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |         FROM documents),
             |pd AS (SELECT doc_id, lang, round(avg(val), 6) AS sent,
             |              CAST(count(*) AS BIGINT) AS n_hits
             |       FROM toks JOIN lex USING (tok) GROUP BY 1, 2),
             |nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
             |       FROM documents GROUP BY 1)
             |SELECT lang, n_docs, CAST(count(*) AS BIGINT) AS n_scored,
             |       round(avg(sent), 4) AS mean_sentiment,
             |       CAST(sum(CASE WHEN sent > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_positive
             |FROM pd JOIN nd USING (lang)
             |GROUP BY lang, n_docs ORDER BY lang""".stripMargin)),

    // vocabulary diversity indices per source: Simpson's D = Σpᵢ²
    // (repeat probability), Berger–Parker dominance = max pᵢ, and
    // Pielou evenness J = H/ln V — the one-pass diversity triple the
    // data card reports next to raw entropy. Two hash aggregates
    // ((source,tok) counts → per-source moments), no windows.
    "text_diversity" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        val tc = Tables.documents(s, d)
          .select(col("source"), explode(TextPrimitives.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).cast("double").as("c"))
        tc.groupBy("source")
          .agg(sum("c").as("n_tok"), count(lit(1)).as("v_types"),
               sum(col("c") * col("c")).as("sq"),
               max("c").as("mx"),
               sum(col("c") * log(col("c"))).as("clc"))
          .select(col("source"), col("n_tok").cast("long").as("n_tok"),
                  col("v_types"),
                  round(col("sq") / (col("n_tok") * col("n_tok")), 6).as("simpson_d"),
                  round(col("mx") / col("n_tok"), 6).as("berger_parker"),
                  when(col("v_types") > 1,
                       round((log(col("n_tok")) - col("clc") / col("n_tok")) /
                             log(col("v_types").cast("double")), 4))
                    .otherwise(lit(null).cast("double")).as("evenness"))
          .orderBy("source")
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, CAST(count(*) AS DOUBLE) AS c
             |  FROM (SELECT source, unnest(
             |          regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2),
             |m AS (SELECT source, sum(c) AS n_tok,
             |             CAST(count(*) AS BIGINT) AS v_types,
             |             sum(c * c) AS sq, max(c) AS mx,
             |             sum(c * ln(c)) AS clc
             |      FROM tc GROUP BY 1)
             |SELECT source, CAST(n_tok AS BIGINT) AS n_tok, v_types,
             |       round(sq / (n_tok * n_tok), 6) AS simpson_d,
             |       round(mx / n_tok, 6) AS berger_parker,
             |       CASE WHEN v_types > 1
             |            THEN round((ln(n_tok) - clc / n_tok) /
             |                       ln(CAST(v_types AS DOUBLE)), 4)
             |       END AS evenness
             |FROM m ORDER BY source""".stripMargin)),

    // sorted-neighborhood blocking (Hernández & Stolfo 1995): docs
    // sorted by (length-block, 24-char prefix key), each compared to
    // its next 2 neighbors only — the classic entity-resolution
    // candidate generator, O(n·w) pairs instead of O(n²). Candidates
    // rescored by exact distinct-token Jaccard (map-side set HOFs on
    // the bounded pair frame); the rank join is the ts_acf aligned
    // equi-join idiom, keyed on (block, rank+k).
    "dedup_sorted_nbrhood" -> Q(
      (s, d) => {
        import graft.text.TextPrimitives
        val base = Tables.documents(s, d)
          .filter(col("text").isNotNull)
          .select(col("doc_id"), expr("n_chars DIV 64").as("blk"),
                  lower(substring(trim(col("text")), 1, 24)).as("sk"),
                  array_distinct(TextPrimitives.tokens(col("text"))).as("ts"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("blk").orderBy("sk", "doc_id")))
          .localCheckpoint(eager = false) // both sides of the rank join
        val a = base.withColumn("k", explode(array(lit(1), lit(2))))
        val b = base.select(col("blk").as("blk2"), col("rn").as("rn2"),
          col("doc_id").as("doc2"), col("ts").as("ts2"))
        a.join(b, col("blk") === col("blk2") && col("rn2") === col("rn") + col("k"))
          .withColumn("inter",
            size(array_intersect(col("ts"), col("ts2"))).cast("double"))
          .withColumn("uni",
            (size(col("ts")) + size(col("ts2"))).cast("double") - col("inter"))
          .filter(col("uni") > 0)
          .select(least(col("doc_id"), col("doc2")).as("da"),
                  greatest(col("doc_id"), col("doc2")).as("db"),
                  round(col("inter") / col("uni"), 4).as("j_sn"))
          .filter(col("j_sn") >= 0.5)
          .orderBy("da", "db")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT doc_id, n_chars // 64 AS blk,
             |         lower(substr(trim(text), 1, 24)) AS sk,
             |         list_distinct(
             |           regexp_split_to_array(lower(trim(text)), '\s+')) AS ts,
             |         row_number() OVER (PARTITION BY n_chars // 64
             |           ORDER BY lower(substr(trim(text), 1, 24)), doc_id) AS rn
             |  FROM documents WHERE text IS NOT NULL),
             |k AS (SELECT unnest([1, 2]) AS k),
             |pr AS (SELECT a.doc_id AS x, b.doc_id AS y, a.ts AS ta, b.ts AS tb
             |       FROM base a CROSS JOIN k
             |       JOIN base b ON b.blk = a.blk AND b.rn = a.rn + k.k),
             |sc AS (SELECT x, y,
             |         CAST(len(list_filter(ta, t -> list_contains(tb, t))) AS DOUBLE)
             |           AS inter,
             |         CAST(len(ta) + len(tb) AS DOUBLE) -
             |           len(list_filter(ta, t -> list_contains(tb, t))) AS uni
             |       FROM pr)
             |SELECT least(x, y) AS da, greatest(x, y) AS db,
             |       round(inter / uni, 4) AS j_sn
             |FROM sc WHERE uni > 0 AND round(inter / uni, 4) >= 0.5
             |ORDER BY da, db""".stripMargin)),

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

    // t-closeness audit (Li et al. 2007): per QI group (lang, source),
    // the ordered-EMD distance between the group's sensitive-value
    // distribution (length bins) and the global one —
    // t = Σ|cum(p−q)|/(m−1). Complements k-anonymity/l-diversity:
    // a group can be k-anonymous yet leak via a skewed value dist.
    // Grid = groups × bins (bounded), zero-filled; cumsum windows run
    // partitioned per group; both dists rounded to 6 pre-cumsum.
    "priv_t_closeness" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("lang"), col("source"), expr("n_chars DIV 200").as("bin"))
          .localCheckpoint(eager = false) // global dist + group dist
        val glob = docs.groupBy("bin").agg(count(lit(1)).as("gc"))
        val globN = docs.agg(count(lit(1)).as("gn"))
        val q = glob.crossJoin(broadcast(globN))
          .select(col("bin"), round(col("gc") / col("gn"), 6).as("qp"))
        val grp = docs.groupBy("lang", "source").agg(count(lit(1)).as("n_rows"))
        val cells = docs.groupBy("lang", "source", "bin").agg(count(lit(1)).as("c"))
        val grid = grp.crossJoin(broadcast(q))
          .join(cells, Seq("lang", "source", "bin"), "left")
          .select(col("lang"), col("source"), col("bin"), col("n_rows"), col("qp"),
                  round(coalesce(col("c"), lit(0L)) / col("n_rows"), 6).as("pp"))
        val wc = Window.partitionBy("lang", "source").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mBins = glob.agg(count(lit(1)).as("m"))
        grid.withColumn("cum", sum(col("pp") - col("qp")).over(wc))
          .groupBy("lang", "source")
          .agg(max("n_rows").as("n_rows"), sum(abs(col("cum"))).as("s"))
          .crossJoin(broadcast(mBins))
          .select(col("lang"), col("source"), col("n_rows"),
                  when(col("m") > 1, round(col("s") / (col("m") - 1), 4))
                    .otherwise(lit(null).cast("double")).as("t_dist"))
          .withColumn("violates_t02",
            when(col("t_dist").isNotNull, col("t_dist") > 0.2))
          .orderBy("lang", "source")
      },
      Some("""WITH docs AS (SELECT lang, source, n_chars // 200 AS bin FROM documents),
             |gl AS (SELECT bin, CAST(count(*) AS BIGINT) AS gc FROM docs GROUP BY 1),
             |gn AS (SELECT CAST(count(*) AS BIGINT) AS gn FROM docs),
             |q AS (SELECT bin, round(gc * 1.0 / gn, 6) AS qp FROM gl, gn),
             |grp AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows
             |        FROM docs GROUP BY 1, 2),
             |cells AS (SELECT lang, source, bin, CAST(count(*) AS BIGINT) AS c
             |          FROM docs GROUP BY 1, 2, 3),
             |grid AS (SELECT g.lang, g.source, q.bin, g.n_rows, q.qp,
             |                round(coalesce(c.c, 0) * 1.0 / g.n_rows, 6) AS pp
             |         FROM grp g CROSS JOIN q
             |         LEFT JOIN cells c ON c.lang = g.lang AND c.source = g.source
             |                           AND c.bin = q.bin),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM gl),
             |cm AS (SELECT lang, source, n_rows,
             |              sum(pp - qp) OVER (PARTITION BY lang, source ORDER BY bin
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |       FROM grid)
             |SELECT lang, source, n_rows,
             |       CASE WHEN m > 1 THEN round(sum(abs(cum)) / (m - 1), 4) END AS t_dist,
             |       CASE WHEN m > 1 THEN round(sum(abs(cum)) / (m - 1), 4) > 0.2
             |       END AS violates_t02
             |FROM cm, m
             |GROUP BY lang, source, n_rows, m ORDER BY lang, source""".stripMargin)))
}
