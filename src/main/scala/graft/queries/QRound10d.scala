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
private[graft] object QRound10d {


  val round10gQ: Seq[(String, Q)] = Seq(
    // Fisher's EXACT test on the 2×2 (arm × converted-user) table —
    // the test that stays valid when a segment's conversions are too
    // few for the χ²/z machinery (ev_ab_test, ev_srm). One per-user
    // rollup → 4 counts; the hypergeometric tail is an explicit sum
    // over the ≤min(margin) support (explode of a bounded sequence —
    // conversions, never users), every term closed-form through the
    // shared Stirling lgamma so both engines run the identical tree.
    // Two-sided by the standard "sum all tables no more likely than
    // observed" rule with a 1e-7 log-slack absorbing libm ulp drift.
    "stat_fisher_exact" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ab = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 13).cast("long").as("conv"))
        val cts = ab.agg(
          sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("arm") === 1 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("arm") === 0 && col("conv") === 0, 1L).otherwise(0L)).as("dd"))
          .withColumn("r1", col("a") + col("b"))
          .withColumn("r2", col("c") + col("dd"))
          .withColumn("c1", col("a") + col("c"))
          .withColumn("c2", col("b") + col("dd"))
          .withColumn("n", col("r1") + col("r2"))
        val base = cts
          .withColumn("lconst",
            lfCol(col("r1").cast("double")) + lfCol(col("r2").cast("double")) +
            lfCol(col("c1").cast("double")) + lfCol(col("c2").cast("double")) -
            lfCol(col("n").cast("double")))
          .withColumn("lobs",
            col("lconst") - lfCol(col("a").cast("double")) -
            lfCol((col("r1") - col("a")).cast("double")) -
            lfCol((col("c1") - col("a")).cast("double")) -
            lfCol((col("r2") - col("c1") + col("a")).cast("double")))
        val based = base.localCheckpoint(eager = false) // bounds + terms
        // hypergeometric support as a DISTRIBUTED spark.range (same
        // rationale as stat_bayes_ab: one-row sequence() arrays don't
        // survive production counts); 1-row bounded collect for bounds.
        val bnd = based.select(
          greatest(lit(0L), col("c1") - col("r2")).as("lo"),
          least(col("r1"), col("c1")).as("hi")).collect()(0)
        // empty events → NULL bounds → empty support → 0 rows out
        val (bLo, bHi) =
          if (bnd.isNullAt(0) || bnd.isNullAt(1)) (0L, -1L)
          else (bnd.getLong(0), bnd.getLong(1))
        val terms = s.range(bLo, bHi + 1L).toDF("k")
          .crossJoin(broadcast(based))
          .withColumn("lpk",
            col("lconst") - lfCol(col("k").cast("double")) -
            lfCol((col("r1") - col("k")).cast("double")) -
            lfCol((col("c1") - col("k")).cast("double")) -
            lfCol((col("r2") - col("c1") + col("k")).cast("double")))
        terms.groupBy("a", "b", "c", "dd")
          .agg(round(sum(when(col("lpk") <= col("lobs") + 1e-7,
            exp(col("lpk"))).otherwise(0.0)), 6).as("p_two_sided"))
          .select(col("a").as("n_t_conv"), col("b").as("n_t_no"),
            col("c").as("n_c_conv"), col("dd").as("n_c_no"),
            when(col("b") * col("c") > 0,
              round(col("a") * col("dd") / (col("b") * col("c")).cast("double"), 4))
              .as("odds_ratio"),
            col("p_two_sided"))
      },
      Some(s"""WITH ab AS (
              |  SELECT user_id,
              |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
              |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 13 AS BIGINT) AS conv
              |  FROM events GROUP BY 1, 2),
              |ct AS (SELECT
              |         CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
              |         CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
              |         CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
              |         CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd
              |       FROM ab),
              |mg AS (SELECT *, a + b AS r1, c + dd AS r2, a + c AS c1, b + dd AS c2,
              |              a + b + c + dd AS n
              |       FROM ct),
              |bs AS (SELECT *,
              |         ${sqlLf("r1")} + ${sqlLf("r2")} + ${sqlLf("c1")}
              |           + ${sqlLf("c2")} - ${sqlLf("n")} AS lconst
              |       FROM mg),
              |ob AS (SELECT *, lconst - ${sqlLf("a")} - ${sqlLf("r1 - a")}
              |           - ${sqlLf("c1 - a")} - ${sqlLf("r2 - c1 + a")} AS lobs
              |       FROM bs),
              |tm AS (SELECT *,
              |         lconst - ${sqlLf("k")} - ${sqlLf("r1 - k")}
              |           - ${sqlLf("c1 - k")} - ${sqlLf("r2 - c1 + k")} AS lpk
              |       FROM (SELECT *, CAST(unnest(generate_series(
              |               greatest(0, c1 - r2), least(r1, c1))) AS BIGINT) AS k
              |             FROM ob))
              |SELECT a AS n_t_conv, b AS n_t_no, c AS n_c_conv, dd AS n_c_no,
              |       CASE WHEN b * c > 0
              |            THEN round(a * dd / CAST(b * c AS DOUBLE), 4)
              |       END AS odds_ratio,
              |       round(sum(CASE WHEN lpk <= lobs + 1e-7
              |                      THEN exp(lpk) ELSE 0.0 END), 6) AS p_two_sided
              |FROM tm GROUP BY 1, 2, 3, 4, 5""".stripMargin)),

    // extractive summarization (SumBasic-style): per doc, the top-3
    // sentences by mean corpus token frequency — the "what to show a
    // labeler" primitive. Sentence split + scoring are map-side over
    // the bounded subset; the frequency table is a broadcast join;
    // the pick is a per-doc bounded window. Scores are rounded BEFORE
    // ranking so order ties break identically on both engines.
    "text_extract_summary" -> Q(
      (s, d) => {
        val sub = Tables.documents(s, d).filter(col("doc_id") < 100)
        val sents = sub.select(col("doc_id"),
            posexplode(split(col("text"), "[.!?]+")).as(Seq("pos", "sent")))
          .withColumn("sent", trim(col("sent")))
          .filter(length(col("sent")) > 0)
        val stok = sents.select(col("doc_id"), col("pos"),
            explode(graft.text.TextPrimitives.tokens(col("sent"))).as("tok"))
          .filter(length(col("tok")) > 0)
          .localCheckpoint(eager = false) // vocab + the scoring join
        val freq = stok.groupBy("tok").agg(count(lit(1)).as("tf"))
        val scored = stok.join(broadcast(freq), "tok")
          .groupBy("doc_id", "pos")
          .agg(count(lit(1)).as("n_tok_sent"),
               round(avg(col("tf").cast("double")), 4).as("score"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("pos"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk").cast("long").as("rk"),
            col("pos").cast("long").as("sent_pos"), col("n_tok_sent"),
            col("score"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
             |sents AS (
             |  SELECT doc_id, i - 1 AS pos, trim(arr[i]) AS sent
             |  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
             |        FROM (SELECT doc_id, regexp_split_to_array(text, '[.!?]+') AS arr
             |              FROM sub))
             |  WHERE length(trim(arr[i])) > 0),
             |stok AS (
             |  SELECT doc_id, pos, tok
             |  FROM (SELECT doc_id, pos,
             |          unnest(regexp_split_to_array(lower(trim(sent)), '\s+')) AS tok
             |        FROM sents)
             |  WHERE length(tok) > 0),
             |freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf
             |         FROM stok GROUP BY tok),
             |scored AS (
             |  SELECT doc_id, pos, CAST(count(*) AS BIGINT) AS n_tok_sent,
             |         round(avg(CAST(tf AS DOUBLE)), 4) AS score
             |  FROM stok JOIN freq USING (tok) GROUP BY doc_id, pos)
             |SELECT doc_id, CAST(rk AS BIGINT) AS rk,
             |       CAST(pos AS BIGINT) AS sent_pos, n_tok_sent, score
             |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             |        ORDER BY score DESC, pos) AS rk
             |      FROM scored)
             |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // n-gram novelty by crawl order: what share of each doc's
    // 3-token shingles appear for the FIRST time at that doc — the
    // "is more crawl still adding content" curve, bucketed by doc_id
    // decile. The shingle table is DISTINCT per (doc, sh), so the
    // per-doc novelty count is a second tiny aggregate OVER the
    // first-occurrence table (group the winners by their doc) — the
    // round-10 form re-joined the full gram fan-out against it, a
    // second full-width shuffle that carried no information the
    // winners' own doc ids didn't already have. Per-doc gram counts
    // come map-side off the same checkpointed grams; the only
    // corpus-width shuffle left is the min-per-shingle aggregate.
    "text_ngram_novelty" -> Q(
      (s, d) => {
        // shingle duplicates only exist WITHIN a doc, so the distinct
        // (doc, sh) set is computable row-locally with array_distinct —
        // tokenShingles' .distinct() would shuffle the full gram
        // fan-out for the same result
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.text.TextPrimitives.tokens(col("text")).as("toks"))
          .select(col("doc_id"), array_distinct(transform(
            sequence(lit(0), greatest(size(col("toks")) - 3, lit(0))),
            i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(3))))).as("shs"))
          .localCheckpoint(eager = false) // first-occurrence + per-doc n
        val novPer = docs.select(col("doc_id"), explode(col("shs")).as("sh"))
          .groupBy("sh").agg(min("doc_id").as("fd"))
          .groupBy(col("fd").as("doc_id")).agg(count(lit(1)).as("nov"))
        val perDoc = docs.select(col("doc_id"), size(col("shs")).cast("long").as("n"))
          .join(novPer, Seq("doc_id"), "left")
          .na.fill(0L, Seq("nov"))
          .localCheckpoint(eager = false) // max + bucket rollup
        val mx = perDoc.agg(max("doc_id").as("mx"))
        perDoc.crossJoin(broadcast(mx))
          .withColumn("bucket", expr("(doc_id * 10) div (mx + 1)"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n").as("n_grams"),
               round(sum("nov") / sum("n").cast("double"), 4).as("novelty_rate"))
          .orderBy("bucket")
      },
      Some(s"""WITH g AS (
              |${graft.text.TextPrimitives.tokenShinglesSql("documents", "doc_id", "text", 3)}),
              |fo AS (SELECT sh, CAST(min(doc_id) AS BIGINT) AS fd FROM g GROUP BY sh),
              |nv AS (SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS nov
              |       FROM fo GROUP BY fd),
              |np AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              |       FROM g GROUP BY doc_id),
              |pd AS (SELECT np.doc_id, np.n, coalesce(nv.nov, 0) AS nov
              |       FROM np LEFT JOIN nv USING (doc_id)),
              |mx AS (SELECT max(doc_id) AS mx FROM pd)
              |SELECT (doc_id * 10) // (mx + 1) AS bucket,
              |       CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(n) AS BIGINT) AS n_grams,
              |       round(sum(nov) / CAST(sum(n) AS DOUBLE), 4) AS novelty_rate
              |FROM pd, mx GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // second covariance eigenvalue by DEFLATION: converge v₁ (8
    // rounds), subtract λ₁v₁v₁ᵀ cell-wise (λ₁ and v₁ rounded first so
    // the deflated cells are engine-pinned), converge again — the
    // spectral gap λ₂/λ₁ says whether emb_top_eigen's "one direction"
    // story is real or the top two directions are degenerate. Still
    // ONE corpus-scale aggregate; both iteration chains are joins
    // over 4096 cells.
    "emb_deflated_eigen" -> Q(
      (s, d) => {
        // ONE cross-moment aggregate over the embeddings scan; both
        // 8-step power iterations AND the deflation run driver-side
        // on the bounded d² cells (CovMoments doc) — was the suite's
        // slowest query purely from ~16 scheduled cluster jobs over a
        // ≤4096-row frame
        import graft.embed.CovMoments._
        import s.implicits._
        val cells = covCells(moments(Tables.embeddings(s, d)))
        val dim = cells.length
        def converge(cl: Array[Array[Double]])
            : (Array[Double], Option[Double]) = {
          val v = powerIterate(cl, 8)
          (v, rayleigh(cl, v).map(x => r(x, 6)))
        }
        val (v1, l1) = converge(cells)
        val res = l1 match {
          case Some(lam1) if v1 != null =>
            val cells2 = Array.tabulate(dim, dim)((a, b) =>
              r(cells(a)(b) - lam1 * v1(a) * v1(b), 7))
            val (_, l2) = converge(cells2)
            var trc = 0.0
            (0 until dim).foreach(i => trc += cells(i)(i))
            (Some(lam1), l2,
             l2.filter(_ => lam1 > 0).map(x => r(1.0 - x / lam1, 4)),
             l2.filter(_ => trc > 0).map(x => r((lam1 + x) / trc, 4)))
          case _ => (l1, None, None, None)
        }
        Seq(res).toDF("lambda1", "lambda2", "spectral_gap", "top2_share")
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
              |l1 AS (SELECT CASE WHEN den > 0 THEN round(num / den, 6) END AS lam
              |       FROM (SELECT sum(c.cv * va.x * vb.x) AS num
              |             FROM cells c JOIN v8 va ON va.i = c.a
              |                          JOIN v8 vb ON vb.i = c.b),
              |            (SELECT sum(x*x) AS den FROM v8)),
              |cells2 AS MATERIALIZED (
              |  SELECT c.a, c.b, round(c.cv - l1.lam * va.x * vb.x, 7) AS cv
              |  FROM cells c JOIN v8 va ON va.i = c.a
              |               JOIN v8 vb ON vb.i = c.b, l1),
              |dv0 AS MATERIALIZED (SELECT a AS i, 1.0 AS x FROM cells2 WHERE a = b),
              |${covPowIterSql(8, "cells2", "d")},
              |l2 AS (SELECT CASE WHEN den > 0 THEN round(num / den, 6) END AS lam
              |       FROM (SELECT sum(c.cv * va.x * vb.x) AS num
              |             FROM cells2 c JOIN dv8 va ON va.i = c.a
              |                           JOIN dv8 vb ON vb.i = c.b),
              |            (SELECT sum(x*x) AS den FROM dv8)),
              |tr AS (SELECT sum(cv) AS trc FROM cells WHERE a = b)
              |SELECT l1.lam AS lambda1, l2.lam AS lambda2,
              |       CASE WHEN l1.lam > 0
              |            THEN round(1.0 - l2.lam / l1.lam, 4) END AS spectral_gap,
              |       CASE WHEN trc > 0
              |            THEN round((l1.lam + l2.lam) / trc, 4) END AS top2_share
              |FROM l1, l2, tr""".stripMargin)))

  val round10hQ: Seq[(String, Q)] = Seq(
    // exact Bayesian A/B: P(p_B > p_A) under independent Beta(1,1)
    // posteriors, by the closed-form finite sum (support bounded by
    // arm-B CONVERSIONS, never users) with every log-Beta going
    // through the shared Stirling lgamma — the "probability B is
    // better" number product teams actually want next to ev_ab_test's
    // p-value. One per-user rollup → 4 counts; the sum is an explode
    // of a bounded sequence.
    "stat_bayes_ab" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        def lnB(x: Column, y: Column): Column =
          lgammaCol(x) + lgammaCol(y) - lgammaCol(x + y)
        val ab = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 13).cast("long").as("conv"))
        val cts = ab.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("c_b"))
          .withColumn("aa", (col("c_a") + 1).cast("double"))
          .withColumn("ba", (col("n_a") - col("c_a") + 1).cast("double"))
          .withColumn("bb", (col("n_b") - col("c_b") + 1).cast("double"))
          .localCheckpoint(eager = false) // reused: bound read + terms
        // support 0..c_b as a DISTRIBUTED spark.range — a one-row
        // sequence() array caps at Spark's max array size and puts
        // millions of elements on one task once c_b is production-
        // scale. Reading the bound is a 1-row bounded collect (the
        // graph_pagerank altitude).
        val ctsRow = cts.select(col("c_b")).collect()(0)
        // empty events → NULL counts → empty support → 0 rows out
        // (exactly what explode(sequence(0, NULL)) used to produce)
        val cB = if (ctsRow.isNullAt(0)) -1L else ctsRow.getLong(0)
        val terms = s.range(0L, cB + 1L).toDF("i")
          .crossJoin(broadcast(cts))
          .withColumn("lt",
            lnB(col("aa") + col("i"), col("ba") + col("bb"))
              - log(col("bb") + col("i"))
              - lnB(lit(1.0) + col("i"), col("bb"))
              - lnB(col("aa"), col("ba")))
        terms.groupBy("n_a", "c_a", "n_b", "c_b")
          .agg(round(sum(exp(col("lt"))), 6).as("prob_b_beats_a"))
          .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
            round(col("c_a") / col("n_a").cast("double"), 4).as("rate_a"),
            round(col("c_b") / col("n_b").cast("double"), 4).as("rate_b"),
            col("prob_b_beats_a"))
      },
      Some {
        def lnB(x: String, y: String) = {
          def lg(e: String) = sqlLf(s"($e) - 1.0") // lgamma(e) = lf(e-1)
          s"(${lg(x)} + ${lg(y)} - ${lg(s"($x) + ($y)")})"
        }
        s"""WITH ab AS (
           |  SELECT user_id,
           |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
           |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 13 AS BIGINT) AS conv
           |  FROM events GROUP BY 1, 2),
           |ct AS (SELECT
           |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |         CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           |         CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
           |       FROM ab),
           |pr AS (SELECT *, CAST(c_a + 1 AS DOUBLE) AS aa,
           |              CAST(n_a - c_a + 1 AS DOUBLE) AS ba,
           |              CAST(n_b - c_b + 1 AS DOUBLE) AS bb
           |       FROM ct),
           |tm AS (SELECT *,
           |         ${lnB("aa + i", "ba + bb")} - ln(bb + i)
           |           - ${lnB("1.0 + i", "bb")} - ${lnB("aa", "ba")} AS lt
           |       FROM (SELECT *, CAST(unnest(generate_series(0, c_b)) AS BIGINT) AS i
           |             FROM pr))
           |SELECT n_a, c_a, n_b, c_b,
           |       round(c_a / CAST(n_a AS DOUBLE), 4) AS rate_a,
           |       round(c_b / CAST(n_b AS DOUBLE), 4) AS rate_b,
           |       round(sum(exp(lt)), 6) AS prob_b_beats_a
           |FROM tm GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin
      }),

    // sequential probability ratio test (Wald): daily purchase-share
    // LLR under H1 = 10% lift over the pooled rate vs H0, accumulated
    // day by day against the ±ln 19 bounds (α=β=0.05) — the
    // always-valid "stop the experiment NOW" monitor next to
    // stat_group_seq's scheduled looks. ONE daily conditional rollup;
    // the cumulative sum runs over the calendar-bounded day frame
    // (the ts_pettitt window bound). p0 is broadcast and rounded
    // before the log-ratios so both engines accumulate identical
    // terms.
    "stat_sprt" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"),
               count(lit(1)).as("n"))
          .localCheckpoint(eager = false) // pooled rate + the cum pass
        val p0r = daily.agg(
          round(sum("x") / sum("n").cast("double"), 6).as("p0"))
          .withColumn("p1", round(col("p0") * 1.1, 6))
        val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        daily.crossJoin(broadcast(p0r))
          .withColumn("ok",
            col("p0") > 0 && col("p1") < 1 && col("p1") > col("p0"))
          .withColumn("llr", when(col("ok"),
            col("x") * (log(col("p1")) - log(col("p0"))) +
            (col("n") - col("x")) *
              (log(lit(1.0) - col("p1")) - log(lit(1.0) - col("p0")))))
          .withColumn("cum_llr", round(sum("llr").over(w), 4))
          .select(col("day"), col("x"), col("n"), col("p0"), col("p1"),
            col("cum_llr"),
            when(col("cum_llr") >= 2.9444, lit("accept_h1"))
              .when(col("cum_llr") <= -2.9444, lit("accept_h0"))
              .otherwise(lit("continue")).as("decision"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |p0r AS (SELECT round(sum(x) / CAST(sum(n) AS DOUBLE), 6) AS p0,
             |               round(sum(x) / CAST(sum(n) AS DOUBLE) * 1.1, 6) AS p1
             |        FROM daily),
             |ll AS (SELECT day, x, n, p0, p1,
             |         CASE WHEN p0 > 0 AND p1 < 1 AND p1 > p0
             |              THEN x * (ln(p1) - ln(p0))
             |                   + (n - x) * (ln(1.0 - p1) - ln(1.0 - p0))
             |         END AS llr
             |       FROM daily, p0r),
             |cm AS (SELECT *, round(sum(llr) OVER (ORDER BY day
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_llr
             |       FROM ll)
             |SELECT day, x, n, p0, p1, cum_llr,
             |       CASE WHEN cum_llr >= 2.9444 THEN 'accept_h1'
             |            WHEN cum_llr <= -2.9444 THEN 'accept_h0'
             |            ELSE 'continue' END AS decision
             |FROM cm ORDER BY day""".stripMargin)),

    // MinHash band-configuration tuning curve: the SAME 16-hash
    // signatures grouped under (b,r) ∈ {(8,2),(4,4),(2,8)} — how many
    // candidate pairs each config generates and how similar they
    // estimate (mean matching-component share), next to the theory
    // threshold (1/b)^(1/r). The tuning table behind
    // dedup_minhash_lsh's fixed choice; signatures are computed ONCE,
    // candidates stay bounded by the banding itself.
    "dedup_band_curve" -> Q(
      (s, d) => {
        val sig = graft.dedup.Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 16)
          .localCheckpoint(eager = false) // 3 band groupings + est join
        val configs = Seq((8, 2), (4, 4), (2, 8))
        val estCols = (0 until 16).map(i =>
          when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
          .reduce(_ + _).cast("double") / 16.0
        val parts = configs.map { case (b, r) =>
          val bands = (0 until b).map { band =>
            sig.select(col("doc_id"),
              lit(band).as("band"),
              concat_ws("_", (0 until r).map(j => col(s"m${band * r + j}")): _*)
                .as("bv"))
          }.reduce(_ union _)
          val pairs = bands.as("x").join(bands.as("y"),
              col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
              col("x.doc_id") < col("y.doc_id"))
            .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
            .distinct()
          val sa = sig.toDF(sig.columns.map(c =>
            if (c == "doc_id") "da" else s"a_$c"): _*)
          val sb = sig.toDF(sig.columns.map(c =>
            if (c == "doc_id") "db" else s"b_$c"): _*)
          pairs.join(sa, "da").join(sb, "db")
            .agg(count(lit(1)).as("n_cand"),
                 round(avg(estCols), 4).as("avg_est_j"))
            .select(lit(b.toLong).as("b"), lit(r.toLong).as("r"),
              round(pow(lit(1.0) / b, lit(1.0) / r), 4).as("est_threshold"),
              col("n_cand"), col("avg_est_j"))
        }
        parts.reduce(_ union _).orderBy("b")
      },
      Some {
        val sigSql = graft.dedup.Dedup.minhashSigSql(5, 16, "doc_id < 200")
        val est = (0 until 16).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        def cfg(b: Int, r: Int): String = {
          val bandSel = (0 until b).map { band =>
            val bv = (0 until r).map(j => s"m${band * r + j}").mkString(", ")
            s"SELECT doc_id, $band AS band, concat_ws('_', $bv) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r,
             |       round(power(1.0 / $b, 1.0 / $r), 4) AS est_threshold,
             |       CAST(count(*) AS BIGINT) AS n_cand,
             |       round(avg(($est) / 16.0), 4) AS avg_est_j
             |FROM (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
             |      FROM ($bandSel) x JOIN ($bandSel) y
             |        ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
             |JOIN sig sa ON sa.doc_id = da
             |JOIN sig sb ON sb.doc_id = db""".stripMargin
        }
        s"""WITH sig AS MATERIALIZED (
           |$sigSql)
           |${Seq((8, 2), (4, 4), (2, 8)).map { case (b, r) => cfg(b, r) }
              .mkString("\n UNION ALL \n")}
           |ORDER BY b""".stripMargin
      }),

    // tokenizer fertility per language: BPE-ish tokens per whitespace
    // word and bytes per BPE token — the "how expensive is this
    // language for the tokenizer" table (fertility >> 1 means the
    // vocab underserves the language). Reuses text_token_count's two
    // tokenizations in ONE grouped map-side pass.
    "pipe_tokenizer_fertility" -> Q(
      (s, d) => {
        val t = graft.text.TextAnalytics.tokenCounts(Tables.documents(s, d))
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
            length(col("text")).cast("long").as("n_chars"))
          .join(t, "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
               sum("n_ws").as("n_ws_tokens"),
               sum("n_bpe").as("n_bpe_tokens"),
               sum("n_chars").as("n_chars"))
          .select(col("lang"), col("n_docs"), col("n_ws_tokens"),
            col("n_bpe_tokens"),
            round(col("n_bpe_tokens") / col("n_ws_tokens").cast("double"), 4)
              .as("fertility"),
            round(col("n_chars") / col("n_bpe_tokens").cast("double"), 4)
              .as("chars_per_token"))
          .orderBy("lang")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
             |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
             |  FROM documents)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_ws) AS BIGINT) AS n_ws_tokens,
             |       CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
             |       round(sum(n_bpe) / CAST(sum(n_ws) AS DOUBLE), 4) AS fertility,
             |       round(sum(n_chars) / CAST(sum(n_bpe) AS DOUBLE), 4) AS chars_per_token
             |FROM t GROUP BY lang ORDER BY lang""".stripMargin)))

  val round10iQ: Seq[(String, Q)] = Seq(
    // "All-but-the-top" embedding post-processing (Mu & Viswanath
    // 2018): remove the mean and project out the top covariance
    // direction, then re-measure anisotropy — the standard fix for
    // the "all vectors point the same way" pathology emb_anisotropy
    // diagnoses. μ and v₁ come from the SAME bounded machinery as
    // emb_top_eigen (4096-cell aggregate + 8 pinned power rounds);
    // the transform is an index-join over the 64-rows-per-vector
    // explode — both engines run the identical relational shape, and
    // the before/after scores use emb_anisotropy's exact Σ identity.
    "emb_abtt" -> Q(
      (s, d) => {
        // all-but-the-top without the N·d² explode OR the exploded
        // self-join: per-dim means (pass 1), CENTERED cross-moments
        // (pass 2, Gramian kernel — centered so the addends match the
        // oracle's join form, no raw-sum cancellation), power
        // iteration driver-side on the bounded d² cells, then ONE
        // kernel pass computes projection / residual / both
        // anisotropy sums per row (CovMoments doc)
        import graft.embed.CovMoments._
        import s.implicits._
        val embT = Tables.embeddings(s, d)
        val m1 = moments(embT) // sxx unused here; same single pass
        val vTop =
          if (m1.n < 2) null
          else {
            val mu0 = m1.sx.map(x => r(x / m1.n, 7))
            powerIterate(centeredCells(moments(embT, center = Some(mu0))), 8)
          }
        if (vTop == null) // degenerate corpus: the oracle emits 0 rows
          Seq.empty[(Long, Double, Double, Double)]
            .toDF("n_vecs", "aniso_before", "aniso_after", "reduction")
        else {
          val mu = m1.sx.map(x => r(x / m1.n, 7))
          // one pass: per row xc = x − mu, p = round(Σ xc·v, 7),
          // xr = xc − p·v; accumulate unit-vector per-dim sums +
          // counts for BOTH the raw and residual anisotropy
          type Acc = (Long, Array[Double], Long, Array[Double])
          val (nB, suB, nA, suA) =
            vectors(embT).rdd.treeAggregate(
              (0L, null: Array[Double], 0L, null: Array[Double]): Acc)(
              seqOp = { case ((nb0, sb0, na0, sa0), x) =>
                val dd = x.length
                val sb = if (sb0 == null) new Array[Double](dd) else sb0
                val sa = if (sa0 == null) new Array[Double](dd) else sa0
                val xc = new Array[Double](dd)
                var i = 0; var p = 0.0
                while (i < dd) {
                  xc(i) = x(i) - mu(i); p += xc(i) * vTop(i); i += 1
                }
                val pr = r(p, 7)
                val xr = new Array[Double](dd)
                var nb = 0.0; var na = 0.0
                i = 0
                while (i < dd) {
                  xr(i) = xc(i) - pr * vTop(i)
                  nb += x(i) * x(i); na += xr(i) * xr(i); i += 1
                }
                nb = math.sqrt(nb); na = math.sqrt(na)
                if (nb > 0) { i = 0; while (i < dd) { sb(i) += x(i) / nb; i += 1 } }
                if (na > 0) { i = 0; while (i < dd) { sa(i) += xr(i) / na; i += 1 } }
                (nb0 + (if (nb > 0) 1L else 0L), sb,
                 na0 + (if (na > 0) 1L else 0L), sa)
              },
              combOp = { case ((n1, s1, m1c, t1), (n2, s2, m2c, t2)) =>
                def madd(a: Array[Double], b: Array[Double]) =
                  if (a == null) b else if (b == null) a
                  else { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a }
                (n1 + n2, madd(s1, s2), m1c + m2c, madd(t1, t2))
              })
          def aniso(n: Long, su: Array[Double]): Double = {
            var s2 = 0.0; su.foreach(x => s2 += x * x)
            r((s2 - n) / (n * (n - 1.0)), 6)
          }
          if (nB < 2 || nA < 2)
            Seq.empty[(Long, Double, Double, Double)]
              .toDF("n_vecs", "aniso_before", "aniso_after", "reduction")
          else {
            val ab = aniso(nB, suB)
            val aa = aniso(nA, suA)
            Seq((nB, ab, aa, r(ab - aa, 6)))
              .toDF("n_vecs", "aniso_before", "aniso_after", "reduction")
          }
        }
      },
      Some(s"""WITH ex0 AS MATERIALIZED (
              |  SELECT vec_id,
              |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
              |         CAST(unnest(embedding) AS DOUBLE) AS x
              |  FROM embeddings WHERE embedding IS NOT NULL),
              |mu AS MATERIALIZED (
              |  SELECT i, round(sum(x) / count(*), 7) AS m FROM ex0 GROUP BY i),
              |exc AS MATERIALIZED (
              |  SELECT vec_id, i, x - m AS xc FROM ex0 JOIN mu USING (i)),
              |cells AS MATERIALIZED (
              |  SELECT p.i AS a, q.i AS b,
              |         round(sum(p.xc * q.xc) / count(*), 7) AS cv
              |  FROM exc p JOIN exc q ON p.vec_id = q.vec_id
              |  GROUP BY 1, 2),
              |v0 AS MATERIALIZED (SELECT a AS i, 1.0 AS x FROM cells WHERE a = b),
              |${covPowIterSql(8)},
              |vv AS MATERIALIZED (SELECT i, x AS v FROM v8),
              |proj AS MATERIALIZED (
              |  SELECT vec_id, round(sum(xc * v), 7) AS p
              |  FROM exc JOIN vv USING (i) GROUP BY vec_id),
              |resid AS MATERIALIZED (
              |  SELECT vec_id, i, xc - p * v AS xr
              |  FROM exc JOIN vv USING (i) JOIN proj USING (vec_id)),
              |nb AS MATERIALIZED (
              |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex0
              |  GROUP BY vec_id HAVING sqrt(sum(x * x)) > 0),
              |sb AS (SELECT i, sum(x / nrm) AS su
              |       FROM ex0 JOIN nb USING (vec_id) GROUP BY i),
              |tb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nb),
              |ab AS (SELECT n, round((sum(su * su) - n) / (n * (n - 1.0)), 6) AS ac
              |       FROM sb, tb GROUP BY n),
              |na AS MATERIALIZED (
              |  SELECT vec_id, sqrt(sum(xr * xr)) AS nrm FROM resid
              |  GROUP BY vec_id HAVING sqrt(sum(xr * xr)) > 0),
              |sa AS (SELECT i, sum(xr / nrm) AS su
              |       FROM resid JOIN na USING (vec_id) GROUP BY i),
              |ta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM na),
              |aa AS (SELECT round((sum(su * su) - n) / (n * (n - 1.0)), 6) AS ac
              |       FROM sa, ta GROUP BY n)
              |SELECT ab.n AS n_vecs, ab.ac AS aniso_before, aa.ac AS aniso_after,
              |       round(ab.ac - aa.ac, 6) AS reduction
              |FROM ab, aa""".stripMargin)),

    // Cochran-Mantel-Haenszel stratified 2×2 test + Mantel-Haenszel
    // common odds ratio: the arm effect on conversion CONTROLLING for
    // signup-day-of-week strata — the Simpson's-paradox-proof
    // companion to ev_ab_test (and the formal version of ev_simpson's
    // audit). Per-user first-day rollup → 7 strata × 4 counts;
    // everything after is arithmetic over ≤7 rows. Continuity-
    // corrected χ²₁, p via the shared A&S erfc.
    "stat_cmh" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(min(expr("ts div 86400000000000")).as("fd"),
               (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 >= 13).cast("long").as("conv"))
        val strata = u.withColumn("stratum", pmod(col("fd"), lit(7)))
          .groupBy("stratum")
          .agg(sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
               sum(when(col("arm") === 1 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
               sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
               sum(when(col("arm") === 0 && col("conv") === 0, 1L).otherwise(0L)).as("dd"))
          .withColumn("n", (col("a") + col("b") + col("c") + col("dd")).cast("double"))
          .filter(col("n") >= 2)
        val agg = strata.agg(
          count(lit(1)).as("n_strata"),
          sum(col("a") - (col("a") + col("b")) * (col("a") + col("c")) / col("n"))
            .as("num"),
          sum((col("a") + col("b")) * (col("c") + col("dd")) *
              (col("a") + col("c")) * (col("b") + col("dd")) /
              (col("n") * col("n") * (col("n") - 1.0))).as("vr"),
          sum(col("a") * col("dd") / col("n")).as("rs"),
          sum(col("b") * col("c") / col("n")).as("ss"))
        // continuity correction clamped at 0: when |num| < 0.5 the
        // unclamped form would INFLATE chi2 to 0.25/vr on a near-
        // perfect null instead of shrinking it toward 0
        val chi = agg.withColumn("chi2",
          when(col("vr") > 0,
            round(pow(greatest(abs(col("num")) - 0.5, lit(0.0)), 2)
              / col("vr"), 4)))
        val xx = sqrt(col("chi2") / 2)
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        chi.select(col("n_strata"), col("chi2"),
          when(col("chi2").isNull, lit(null).cast("double")).otherwise(round(
            t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
              + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
              + t1 * lit(1.061405429)))))
            * exp(-xx * xx), 6)).as("p_value"),
          when(col("ss") > 0, round(col("rs") / col("ss"), 4)).as("or_mh"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
             |         min(ts // 86400000000000) AS fd,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 13 AS BIGINT) AS conv
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT fd % 7 AS stratum,
             |         sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS a,
             |         sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS b,
             |         sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS c,
             |         sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS dd
             |       FROM u GROUP BY 1),
             |sf AS (SELECT *, CAST(a + b + c + dd AS DOUBLE) AS n FROM st
             |       WHERE a + b + c + dd >= 2),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
             |              sum(a - (a + b) * (a + c) / n) AS num,
             |              sum((a + b) * (c + dd) * (a + c) * (b + dd)
             |                  / (n * n * (n - 1.0))) AS vr,
             |              sum(a * dd / n) AS rs, sum(b * c / n) AS ss
             |       FROM sf),
             |ch AS (SELECT *, CASE WHEN vr > 0
             |              THEN round(pow(greatest(abs(num) - 0.5, 0), 2) / vr, 4)
             |              END AS chi2
             |       FROM ag),
             |pv AS (SELECT *, sqrt(chi2 / 2) AS xx,
             |              1.0 / (1.0 + 0.3275911 * sqrt(chi2 / 2)) AS t1
             |       FROM ch)
             |SELECT n_strata, chi2,
             |       CASE WHEN chi2 IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p_value,
             |       CASE WHEN ss > 0 THEN round(rs / ss, 4) END AS or_mh
             |FROM pv""".stripMargin)),

    // Deming (orthogonal / total-least-squares) regression per return
    // flag: when BOTH variables carry error, the OLS slope is biased
    // toward zero — the TLS slope is the closed-form top eigendirection
    // of the 2×2 centered covariance, reported NEXT to OLS so the
    // attenuation is visible. ONE hash aggregate of 5 sums per group.
    "stat_deming" -> Q(
      (s, d) => {
        val t = Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_quantity").cast("double").as("x"),
          (col("l_extendedprice") / 1000.0).as("y"))
        t.groupBy("l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
               sum("x").as("sx"), sum("y").as("sy"),
               sum(expr("x*x")).as("sxx"), sum(expr("x*y")).as("sxy"),
               sum(expr("y*y")).as("syy"))
          .withColumn("dxx", col("sxx") - col("sx") * col("sx") / col("n"))
          .withColumn("dyy", col("syy") - col("sy") * col("sy") / col("n"))
          .withColumn("dxy", col("sxy") - col("sx") * col("sy") / col("n"))
          .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
            when(col("dxx") > 0, round(col("dxy") / col("dxx"), 6))
              .as("slope_ols"),
            when(col("dxy") =!= 0, round(
              (col("dyy") - col("dxx") +
                sqrt(pow(col("dyy") - col("dxx"), 2)
                  + lit(4.0) * col("dxy") * col("dxy")))
              / (lit(2.0) * col("dxy")), 6)).as("slope_tls"))
          .orderBy("l_returnflag")
      },
      Some("""WITH t AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
             |                  l_extendedprice / 1000.0 AS y FROM lineitem),
             |g AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
             |             sum(x*y) AS sxy, sum(y*y) AS syy
             |      FROM t GROUP BY 1),
             |c AS (SELECT *, sxx - sx*sx/n AS dxx, syy - sy*sy/n AS dyy,
             |             sxy - sx*sy/n AS dxy
             |      FROM g)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
             |       CASE WHEN dxx > 0 THEN round(dxy / dxx, 6) END AS slope_ols,
             |       CASE WHEN dxy <> 0 THEN round(
             |         (dyy - dxx + sqrt(pow(dyy - dxx, 2) + 4.0*dxy*dxy))
             |         / (2.0 * dxy), 6) END AS slope_tls
             |FROM c ORDER BY l_returnflag""".stripMargin)))

  val round10jQ: Seq[(String, Q)] = Seq(
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
             |FROM c""".stripMargin)),

    // Engle-Granger cointegration check clicks ↔ purchases: OLS the
    // two daily series against each other, then a lag-0 Dickey-Fuller
    // regression of Δe on e_{t-1} over the residuals — a deeply
    // negative t says the series share a common trend (forecast one
    // from the other), near-zero says the relation is spurious. The
    // residual pass reuses the PINNED (rounded-6) OLS coefficients;
    // lag alignment is the Granger day=day+1 equi-join (no window).
    "ts_cointegration" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .cast("double").as("y"),
               sum(when(col("event_type") === "click", 1L).otherwise(0L))
                 .cast("double").as("x"))
          .localCheckpoint(eager = false) // OLS + residual + alignment
        val cf = daily.agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
          .filter(col("dx") > 0)
          .select(col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) / col("dx"), 6)
              .as("beta"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / col("dx") * col("sx")) / col("n"), 6).as("alpha"))
        val e = daily.crossJoin(broadcast(cf))
          .select(col("day"), col("n"),
            (col("y") - col("alpha") - col("beta") * col("x")).as("e"),
            col("beta"))
          .localCheckpoint(eager = false) // both sides of the lag join
        val prev = e.select(col("day").as("dp"), col("e").as("el"))
        val adf = e.join(prev, col("dp") === col("day") - 1)
          .agg(max("n").as("n"), max("beta").as("beta"),
               count(lit(1)).cast("double").as("m"),
               sum(col("el") * (col("e") - col("el"))).as("sed"),
               sum(col("el") * col("el")).as("see"),
               sum(col("e") * col("e")).as("s2"),
               sum(col("e") * col("el")).as("sel"))
        adf.withColumn("rho", when(col("see") > 0, col("sed") / col("see")))
          .withColumn("rss",
            col("s2") - lit(2.0) * (lit(1.0) + col("rho")) * col("sel")
              + pow(lit(1.0) + col("rho"), 2) * col("see"))
          .withColumn("se2",
            when(col("m") > 1 && col("see") > 0,
              col("rss") / (col("m") - 1) / col("see")))
          .select(col("n").cast("long").as("n_days"), col("beta"),
            round(col("rho"), 6).as("rho"),
            when(col("se2") > 0, round(col("rho") / sqrt(col("se2")), 4))
              .as("adf_t"),
            when(col("se2") > 0,
              (col("rho") / sqrt(col("se2")) < -2.86).cast("long"))
              .as("cointegrated_05"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS x
             |  FROM events GROUP BY 1),
             |cf AS (SELECT n, round((n*sxy - sx*sy) / dx, 6) AS beta,
             |              round((sy - (n*sxy - sx*sy) / dx * sx) / n, 6) AS alpha
             |       FROM (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
             |                    sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy,
             |                    count(*) * sum(x*x) - sum(x) * sum(x) AS dx
             |             FROM daily)
             |       WHERE dx > 0),
             |e AS (SELECT day, n, beta, y - alpha - beta * x AS e
             |      FROM daily, cf),
             |p AS (SELECT a.n, a.beta, a.e, b.e AS el
             |      FROM e a JOIN e b ON b.day = a.day - 1),
             |ag AS (SELECT max(n) AS n, max(beta) AS beta,
             |              CAST(count(*) AS DOUBLE) AS m,
             |              sum(el * (e - el)) AS sed, sum(el * el) AS see,
             |              sum(e * e) AS s2, sum(e * el) AS sel
             |       FROM p),
             |rr AS (SELECT *, CASE WHEN see > 0 THEN sed / see END AS rho FROM ag),
             |rs AS (SELECT *,
             |         s2 - 2.0 * (1.0 + rho) * sel + (1.0 + rho) * (1.0 + rho) * see AS rss
             |       FROM rr),
             |sz AS (SELECT *, CASE WHEN m > 1 AND see > 0
             |              THEN rss / (m - 1) / see END AS se2
             |       FROM rs)
             |SELECT CAST(n AS BIGINT) AS n_days, beta, round(rho, 6) AS rho,
             |       CASE WHEN se2 > 0 THEN round(rho / sqrt(se2), 4) END AS adf_t,
             |       CASE WHEN se2 > 0 THEN
             |         CAST(CASE WHEN rho / sqrt(se2) < -2.86 THEN 1 ELSE 0 END AS BIGINT)
             |       END AS cointegrated_05
             |FROM sz""".stripMargin)),

    // one-sample Lilliefors/KS normality check of daily event totals:
    // sup-distance between the daily-count ECDF and the normal CDF at
    // the FITTED (μ̂, σ̂) — both ECDF steps checked, Φ through the
    // shared A&S erf polynomial, all on the DISTINCT-value histogram
    // (values, never rows). The "is a z-test even admissible" gate in
    // front of the parametric monitors.
    "stat_lilliefors" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false) // moments + the value grid
        val m = daily.agg(count(lit(1)).cast("double").as("n"),
            round(avg("y"), 6).as("mu"),
            round(sqrt(var_pop("y")), 6).as("sg"))
        val g = daily.groupBy("y").agg(count(lit(1)).cast("double").as("c"))
        val wv = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
        val steps = g.withColumn("below", coalesce(sum("c").over(wv), lit(0.0)))
          .crossJoin(broadcast(m))
          .filter(col("sg") > 0 && col("n") > 1)
          .withColumn("z", (col("y") - col("mu")) / col("sg"))
          .withColumn("xx", abs(col("z")) / sqrt(lit(2.0)))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("xx")))
          .withColumn("erf2",
            lit(1.0) - col("t1") * (lit(0.254829592) + col("t1")
              * (lit(-0.284496736) + col("t1") * (lit(1.421413741)
              + col("t1") * (lit(-1.453152027)
              + col("t1") * lit(1.061405429))))) * exp(-col("xx") * col("xx")))
          .withColumn("phi",
            when(col("z") >= 0, (lit(1.0) + col("erf2")) / 2)
              .otherwise((lit(1.0) - col("erf2")) / 2))
          .withColumn("dv", greatest(
            abs((col("below") + col("c")) / col("n") - col("phi")),
            abs(col("below") / col("n") - col("phi"))))
        steps.agg(max(col("n")).cast("long").as("n_days"),
            max("mu").as("mu"), max("sg").as("sigma"),
            round(max("dv"), 4).as("d_stat"))
          .withColumn("d_crit_05",
            round(lit(0.895) / sqrt(col("n_days").cast("double")), 4))
          .withColumn("reject_normal",
            (col("d_stat") > col("d_crit_05")).cast("long"))
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |m AS (SELECT CAST(count(*) AS DOUBLE) AS n, round(avg(y), 6) AS mu,
             |             round(sqrt(var_pop(y)), 6) AS sg
             |      FROM daily),
             |g AS (SELECT y, CAST(count(*) AS DOUBLE) AS c FROM daily GROUP BY y),
             |st AS (SELECT y, c,
             |         coalesce(sum(c) OVER (ORDER BY y
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             |         n, mu, sg
             |       FROM g, m WHERE sg > 0 AND n > 1),
             |zz AS (SELECT *, (y - mu) / sg AS z,
             |              abs((y - mu) / sg) / sqrt(2.0) AS xx
             |       FROM st),
             |tt AS (SELECT *, 1.0 / (1.0 + 0.3275911 * xx) AS t1 FROM zz),
             |ph AS (SELECT *,
             |         CASE WHEN z >= 0 THEN (1.0 + ef) / 2
             |              ELSE (1.0 - ef) / 2 END AS phi
             |       FROM (SELECT *,
             |               1.0 - t1 * (0.254829592 + t1 * (-0.284496736
             |                 + t1 * (1.421413741 + t1 * (-1.453152027
             |                 + t1 * 1.061405429)))) * exp(-xx*xx) AS ef
             |             FROM tt)),
             |dv AS (SELECT *, greatest(abs((below + c) / n - phi),
             |                          abs(below / n - phi)) AS dv
             |       FROM ph)
             |SELECT CAST(max(n) AS BIGINT) AS n_days, max(mu) AS mu,
             |       max(sg) AS sigma, round(max(dv), 4) AS d_stat,
             |       round(0.895 / sqrt(max(n)), 4) AS d_crit_05,
             |       CAST(CASE WHEN round(max(dv), 4) > round(0.895 / sqrt(max(n)), 4)
             |            THEN 1 ELSE 0 END AS BIGINT) AS reject_normal
             |FROM dv""".stripMargin)),

    // Hosmer-Lemeshow calibration test of an out-of-sample
    // source→P(en) prior (train even doc_ids, score odd): observed vs
    // expected English counts over 10 fixed-width p̂ bins, HL χ² with
    // the closed-form even-df survival (finite Poisson sum — no
    // incomplete gamma needed). The formal p-value on top of the
    // samp_reliability_bins-style table.
    "stat_hosmer_lemeshow" -> Q(
      (s, d) => {
        // Round 11: the old outcome (exact-dup membership) is ZERO on
        // every doc of this corpus, which made the test vacuous. Now
        // an honest out-of-sample calibration: train a source→P(en)
        // prior on the md5 train half (the samp_hash_split convention
        // — a doc_id-modulus split would align with the synthetic
        // source = doc_id%20 and leave the test half priorless),
        // score the held-out half, HL over p̂ bins. p̂ is a
        // 6dp-rounded ratio, so the per-bin expected sums are exact
        // micro-integer sums in both engines.
        import graft.functions.VectorFunctions.md5Long
        val docs = Tables.documents(s, d)
        val half = md5Long(concat(lit("hl:"), col("doc_id").cast("string"))) % 2
        val prior = docs.filter(half === 0)
          .groupBy("source")
          .agg(round(sum(when(col("lang") === "en", 1L).otherwise(0L))
            / count(lit(1)).cast("double"), 6).as("phat"))
        val bins = docs.filter(half === 1)
          .join(broadcast(prior), "source")
          .withColumn("bin", least(floor(col("phat") * 10), lit(9L)))
          .groupBy("bin")
          .agg(count(lit(1)).cast("double").as("nb"),
               sum(when(col("lang") === "en", 1.0).otherwise(0.0)).as("obs"),
               (sum(round(col("phat") * 1e6, 0).cast("long"))
                 .cast("double") / 1e6).as("exps"))
          .filter(col("exps") > 0 && col("exps") < col("nb"))
        val hl = bins.agg(count(lit(1)).as("n_bins"),
          round(sum(pow(col("obs") - col("exps"), 2)
            / (col("exps") * (lit(1.0) - col("exps") / col("nb")))), 4)
            .as("hl_chi2"))
        // HL df = n_bins - 2, NOT a hardcoded 8: the exps>0 filter can
        // drop bins. Even-df chi-square survival exp(-h)·Σ_{k<m} h^k/k!
        // with m = df/2 terms, CASE-gated so both engines unroll the
        // same truncated sum (df floored to even, clamped ≥ 2).
        val h = col("hl_chi2") / 2
        val m = greatest(floor((col("n_bins") - lit(2)) / lit(2.0)), lit(1.0))
        hl.select(col("n_bins"),
          (m * 2).cast("long").as("df"), col("hl_chi2"),
          round(exp(-h) * (lit(1.0)
            + when(m > 1, h).otherwise(lit(0.0))
            + when(m > 2, h * h / 2).otherwise(lit(0.0))
            + when(m > 3, h * h * h / 6).otherwise(lit(0.0))), 6)
            .as("p_value"))
      },
      Some {
        s"""WITH prior AS (
           |  SELECT source,
           |         round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
           |               / CAST(count(*) AS DOUBLE), 6) AS phat
           |  FROM documents
           |  WHERE ('0x' || substr(md5('hl:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
           |  GROUP BY 1),
           |bins AS (SELECT least(CAST(floor(phat * 10) AS BIGINT), 9) AS bin,
           |                CAST(count(*) AS DOUBLE) AS nb,
           |                sum(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS obs,
           |                CAST(sum(CAST(round(phat * 1e6) AS BIGINT)) AS DOUBLE)
           |                  / 1e6 AS exps
           |         FROM documents d JOIN prior USING (source)
           |         WHERE ('0x' || substr(md5('hl:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 1
           |         GROUP BY 1),
           |fb AS (SELECT * FROM bins WHERE exps > 0 AND exps < nb),
           |hl AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
           |              round(sum((obs - exps)*(obs - exps)
           |                    / (exps * (1.0 - exps / nb))), 4) AS hl_chi2
           |       FROM fb),
           |mm AS (SELECT *, greatest(floor((n_bins - 2) / 2.0), 1.0) AS m,
           |              hl_chi2 / 2 AS h
           |       FROM hl)
           |SELECT n_bins, CAST(m * 2 AS BIGINT) AS df, hl_chi2,
           |       round(exp(-h) * (1.0
           |             + CASE WHEN m > 1 THEN h ELSE 0.0 END
           |             + CASE WHEN m > 2 THEN h*h/2 ELSE 0.0 END
           |             + CASE WHEN m > 3 THEN h*h*h/6 ELSE 0.0 END), 6) AS p_value
           |FROM mm""".stripMargin
      }),

    // ε=1 report-noisy-max release of the most common event type:
    // per-type Laplace(2/ε) noise by deterministic inverse-CDF draws
    // (md5 of the type name), the released argmax next to the true
    // one — the selection-mechanism sibling of priv_dp_counts (which
    // noises the WHOLE histogram; noisy-max pays less privacy budget
    // to release just the winner). |types| rows of arithmetic after
    // one grouped pass.
    "priv_noisy_max" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.events(s, d).filter(col("event_type").isNotNull)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .withColumn("u",
            (pmod(md5Long(concat(lit("nm:"), col("event_type"))), lit(1000000))
              .cast("double") + 0.5) / 1000000.0 - 0.5)
          .withColumn("noise",
            round(lit(-2.0) * signum(col("u"))
              * log(lit(1.0) - lit(2.0) * abs(col("u"))), 6))
          .withColumn("noisy_n", round(col("n") + col("noise"), 6))
        val w = Window.orderBy(col("noisy_n").desc, col("event_type"))
        val wt = Window.orderBy(col("n").desc, col("event_type"))
        g.withColumn("released_rank", row_number().over(w))
          .withColumn("true_rank", row_number().over(wt))
          .select(col("event_type"), col("n"), col("noisy_n"),
            (col("released_rank") === 1).cast("long").as("is_released_max"),
            (col("true_rank") === 1).cast("long").as("is_true_max"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
             |u AS (SELECT *,
             |        ((('0x' || substr(md5('nm:' || event_type), 1, 15))::BIGINT
             |          % 1000000) + 0.5) / 1000000.0 - 0.5 AS u
             |      FROM g),
             |nz AS (SELECT *,
             |         round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)), 6) AS noise
             |       FROM u),
             |nn AS (SELECT *, round(n + noise, 6) AS noisy_n FROM nz),
             |rk AS (SELECT *,
             |         row_number() OVER (ORDER BY noisy_n DESC, event_type) AS rr,
             |         row_number() OVER (ORDER BY n DESC, event_type) AS tr
             |       FROM nn)
             |SELECT event_type, n, noisy_n,
             |       CAST(CASE WHEN rr = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_released_max,
             |       CAST(CASE WHEN tr = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_true_max
             |FROM rk ORDER BY event_type""".stripMargin)))
}
