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
private[graft] object QRound11c {


  val round11jQ: Seq[(String, Q)] = Seq(
    // Breslow–Day homogeneity test of the odds ratio across the
    // stat_cmh strata — CMH asks "is there a common effect?", BD asks
    // "is ONE common OR even plausible?": per stratum the expected
    // count under the Mantel–Haenszel OR solves the closed-form
    // quadratic x²(1−ψ)+x[(n−r1−c1)+ψ(r1+c1)]−ψr1c1 = 0 (root picked
    // inside the margin box), χ² = Σ(a−x)²/V. Cells are exact
    // integers; ψ is pinned to 8dp before broadcast so both engines
    // iterate the identical value. Statistic only (df = K−1).
    "stat_breslow_day" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u0 = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(expr("CAST(floor(percentile(ts div 86400000000000, 0.5D)) AS BIGINT)")
            .as("md"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("np"))
          .localCheckpoint(eager = false) // median cutoff + the cells
        // outcome = heavy purchaser (above the global median purchase
        // count); stratum = the user's median-activity weekday — both
        // chosen to keep every 2x2 cell populated (an always-true
        // "any purchase" outcome degenerates b = d = 0 on this data)
        val med = u0.agg(expr("percentile(np, 0.5D)").as("mnp"))
        val u = u0.crossJoin(broadcast(med))
          .withColumn("conv", (col("np") > col("mnp")).cast("long"))
        val cts = u.withColumn("stratum", pmod(col("md"), lit(7)))
          .groupBy("stratum")
          .agg(sum(when(col("arm") === 1 && col("conv") === 1, 1L)
            .otherwise(0L)).as("a"),
            sum(when(col("arm") === 1 && col("conv") === 0, 1L)
              .otherwise(0L)).as("b"),
            sum(when(col("arm") === 0 && col("conv") === 1, 1L)
              .otherwise(0L)).as("c"),
            sum(when(col("arm") === 0 && col("conv") === 0, 1L)
              .otherwise(0L)).as("dd"))
          .withColumn("n",
            (col("a") + col("b") + col("c") + col("dd")).cast("double"))
          .filter(col("n") >= 2)
          .localCheckpoint(eager = false) // psi agg + the per-stratum pass
        val psi = cts.agg(round(
          sum(col("a") * col("dd") / col("n"))
            / nullif(sum(col("b") * col("c") / col("n")), lit(0.0)), 8)
          .as("psi"))
        val t = cts.crossJoin(broadcast(psi))
          .withColumn("r1", (col("a") + col("b")).cast("double"))
          .withColumn("c1", (col("a") + col("c")).cast("double"))
          .withColumn("qa", lit(1.0) - col("psi"))
          .withColumn("qb", col("n") - col("r1") - col("c1")
            + col("psi") * (col("r1") + col("c1")))
          .withColumn("qc", -col("psi") * col("r1") * col("c1"))
          .withColumn("disc",
            sqrt(greatest(col("qb") * col("qb")
              - lit(4.0) * col("qa") * col("qc"), lit(0.0))))
          .withColumn("x1", (-col("qb") + col("disc"))
            / nullif(lit(2.0) * col("qa"), lit(0.0)))
          .withColumn("x2", (-col("qb") - col("disc"))
            / nullif(lit(2.0) * col("qa"), lit(0.0)))
          .withColumn("lo", greatest(lit(0.0),
            col("r1") + col("c1") - col("n")))
          .withColumn("hi", least(col("r1"), col("c1")))
          .withColumn("x",
            when(abs(lit(1.0) - col("psi")) < 1e-12,
              -col("qc") / nullif(col("qb"), lit(0.0)))
            .when(col("x1").between(col("lo"), col("hi")), col("x1"))
            .otherwise(col("x2")))
          .withColumn("v", lit(1.0) / (lit(1.0) / nullif(col("x"), lit(0.0))
            + lit(1.0) / nullif(col("r1") - col("x"), lit(0.0))
            + lit(1.0) / nullif(col("c1") - col("x"), lit(0.0))
            + lit(1.0) / nullif(col("n") - col("r1") - col("c1") + col("x"),
              lit(0.0))))
        t.agg(count(lit(1)).as("n_strata"), max("psi").as("psi"),
            round(sum(pow(col("a") - col("x"), 2) / col("v")), 4)
              .as("bd_chi2"))
          .select(col("n_strata"), round(col("psi"), 4).as("or_mh"),
            col("bd_chi2"))
      },
      Some("""WITH u0 AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             |           % 2 AS arm,
             |         CAST(floor(quantile_cont(ts // 86400000000000, 0.5)) AS BIGINT) AS md,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
             |  FROM events GROUP BY 1, 2),
             |mq AS (SELECT quantile_cont(np, 0.5) AS mnp FROM u0),
             |u AS (SELECT user_id, arm, md,
             |             CAST(np > mnp AS BIGINT) AS conv
             |      FROM u0, mq),
             |cts AS (SELECT md % 7 AS stratum,
             |          CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |          CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |          CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |          CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd
             |        FROM u GROUP BY 1),
             |ct2 AS (SELECT *, CAST(a + b + c + dd AS DOUBLE) AS n FROM cts
             |        WHERE a + b + c + dd >= 2),
             |ps AS (SELECT round(sum(a * dd / n)
             |               / nullif(sum(b * c / n), 0.0), 8) AS psi
             |       FROM ct2),
             |q AS (SELECT ct2.*, psi,
             |             CAST(a + b AS DOUBLE) AS r1,
             |             CAST(a + c AS DOUBLE) AS c1,
             |             1.0 - psi AS qa,
             |             n - (a + b) - (a + c) + psi * ((a + b) + (a + c)) AS qb,
             |             -psi * (a + b) * (a + c) AS qc
             |      FROM ct2, ps),
             |r AS (SELECT *,
             |             sqrt(greatest(qb * qb - 4.0 * qa * qc, 0.0)) AS disc,
             |             greatest(0.0, r1 + c1 - n) AS lo,
             |             least(r1, c1) AS hi
             |      FROM q),
             |x AS (SELECT *,
             |             CASE WHEN abs(1.0 - psi) < 1e-12
             |                  THEN -qc / nullif(qb, 0.0)
             |                  WHEN (-qb + disc) / nullif(2.0 * qa, 0.0)
             |                       BETWEEN lo AND hi
             |                  THEN (-qb + disc) / nullif(2.0 * qa, 0.0)
             |                  ELSE (-qb - disc) / nullif(2.0 * qa, 0.0)
             |             END AS x
             |      FROM r),
             |v AS (SELECT *, 1.0 / (1.0 / nullif(x, 0.0)
             |             + 1.0 / nullif(r1 - x, 0.0)
             |             + 1.0 / nullif(c1 - x, 0.0)
             |             + 1.0 / nullif(n - r1 - c1 + x, 0.0)) AS v
             |      FROM x)
             |SELECT CAST(count(*) AS BIGINT) AS n_strata,
             |       round(max(psi), 4) AS or_mh,
             |       round(sum(pow(a - x, 2) / v), 4) AS bd_chi2
             |FROM v""".stripMargin)),

    // Iterative proportional fitting (raking) of the source × lang
    // cell table to UNIFORM source and lang margins — the survey-
    // weighting primitive behind balanced training mixes: 3 row/col
    // scaling rounds on the bounded ≤|sources|×|langs| cell grid,
    // run driver-side on collected cells (the graph_pagerank
    // bounded-collect altitude), weights pinned to 7dp per step so
    // the DuckDB twin's chained MATERIALIZED CTEs reproduce them
    // bit-for-bit.
    "samp_raking" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Tables.documents(s, d)
          .groupBy("source", "lang").agg(count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val srcs = rows.map(_._1).distinct.sorted
        val langs = rows.map(_._2).distinct.sorted
        val total = rows.map(_._3).sum.toDouble
        val tRow = total / srcs.length
        val tCol = total / langs.length
        def r7(x: Double) = graft.embed.CovMoments.r(x, 7)
        var w = rows.map { case (s0, l0, n0) => ((s0, l0), n0.toDouble) }.toMap
        for (_ <- 1 to 3) {
          val rowSums = w.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
          w = w.map { case ((s0, l0), v) => ((s0, l0), r7(v * tRow / rowSums(s0))) }
          val colSums = w.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
          w = w.map { case ((s0, l0), v) => ((s0, l0), r7(v * tCol / colSums(l0))) }
        }
        rows.map { case (s0, l0, n0) =>
          (s0, l0, n0, graft.embed.CovMoments.r(w((s0, l0)) / n0, 4))
        }.toSeq.sortBy(t => (t._1, t._2))
          .toDF("source", "lang", "n_docs", "rake_weight")
      },
      Some("""WITH c0 AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n,
             |                   CAST(count(*) AS DOUBLE) AS w
             |            FROM documents GROUP BY 1, 2),
             |m AS (SELECT CAST(sum(n) AS DOUBLE) AS tot,
             |             CAST(count(DISTINCT source) AS DOUBLE) AS ns,
             |             CAST(count(DISTINCT lang) AS DOUBLE) AS nl
             |      FROM c0),
             |r1 AS MATERIALIZED (
             |  SELECT source, lang, n,
             |         round(w * (tot / ns) / sum(w) OVER (PARTITION BY source), 7) AS w
             |  FROM c0, m),
             |c1 AS MATERIALIZED (
             |  SELECT source, lang, n,
             |         round(w * ((SELECT tot / nl FROM m)) / sum(w) OVER (PARTITION BY lang), 7) AS w
             |  FROM r1),
             |r2 AS MATERIALIZED (
             |  SELECT source, lang, n,
             |         round(w * ((SELECT tot / ns FROM m)) / sum(w) OVER (PARTITION BY source), 7) AS w
             |  FROM c1),
             |c2 AS MATERIALIZED (
             |  SELECT source, lang, n,
             |         round(w * ((SELECT tot / nl FROM m)) / sum(w) OVER (PARTITION BY lang), 7) AS w
             |  FROM r2),
             |r3 AS MATERIALIZED (
             |  SELECT source, lang, n,
             |         round(w * ((SELECT tot / ns FROM m)) / sum(w) OVER (PARTITION BY source), 7) AS w
             |  FROM c2),
             |c3 AS MATERIALIZED (
             |  SELECT source, lang, n,
             |         round(w * ((SELECT tot / nl FROM m)) / sum(w) OVER (PARTITION BY lang), 7) AS w
             |  FROM r3)
             |SELECT source, lang, n AS n_docs,
             |       round(w / n, 4) AS rake_weight
             |FROM c3 ORDER BY source, lang""".stripMargin)),

    // Stratified balanced sharding: round-robin within each
    // (source, lang) stratum (rank ordered by doc_id, mod 8) — the
    // anti-skew alternative to pipe_shard_manifest's pure hash
    // shards: every shard gets an equal slice of EVERY stratum, so
    // no shard is all-en or all-one-source. The in-stratum rank is
    // Packing.boundedRowNumber (id-block two-level scan), so a hot
    // stratum never funnels one window partition. Per-shard
    // composition report; balance (max−min ≤ #strata) is spec-pinned.
    "pipe_stratified_shards" -> Q(
      (s, d) => {
        graft.ops.Packing.boundedRowNumber(
            Tables.documents(s, d), Seq("source", "lang"), "doc_id",
            1L << 20, "r")
          .withColumn("shard", ((col("r") - 1) % 8).cast("int"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("source").as("n_sources"),
            countDistinct("lang").as("n_langs"),
            sum("n_chars").as("n_bytes"))
          .orderBy("shard")
      },
      Some("""WITH a AS (
             |  SELECT source, lang, n_chars,
             |         (row_number() OVER (PARTITION BY source, lang
             |            ORDER BY doc_id) - 1) % 8 AS shard
             |  FROM documents)
             |SELECT CAST(shard AS INT) AS shard,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |       CAST(sum(n_chars) AS BIGINT) AS n_bytes
             |FROM a GROUP BY 1 ORDER BY shard""".stripMargin)),

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
             |ORDER BY type_a, type_b""".stripMargin)))

  val round11kQ: Seq[(String, Q)] = Seq(
    // Synchronous label propagation (4 rounds) on the shared near-dup
    // graph — the COMMUNITY view beside graph_modularity's score and
    // graph_conductance's cut: each node adopts its neighborhood's
    // most frequent label, ties to the SMALLEST label, so the whole
    // trajectory is deterministic (no random order, no oscillation
    // damping needed at this depth). Per-round state is |V| rows;
    // every step is a bounded-edge join + grouped argmax. Output is
    // the community size profile.
    "graph_label_prop" -> Q(
      (s, d) => {
        val e0 = graft.dedup.Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
          .select(col("da"), col("db"))
        val nbr = e0.select(col("da").as("v"), col("db").as("n"))
          .union(e0.select(col("db").as("v"), col("da").as("n")))
          .localCheckpoint(eager = false) // read every round
        var lab = nbr.select(col("v")).distinct()
          .withColumn("label", col("v"))
        for (_ <- 1 to 4) {
          val cand = nbr
            .join(lab.select(col("v").as("n"), col("label")), "n")
            .groupBy("v", "label").agg(count(lit(1)).as("c"))
          val mx = cand.groupBy("v").agg(max("c").as("mc"))
          lab = cand.join(mx, "v").filter(col("c") === col("mc"))
            .groupBy("v").agg(min("label").as("label"))
            .localCheckpoint(eager = false) // next round + final count
        }
        lab.groupBy("label").agg(count(lit(1)).as("size"))
          .select(col("label").as("community"), col("size"))
          .orderBy(col("size").desc, col("community"))
      },
      Some(s"""WITH ${dupEdgesSql(120, 0.25)},
              |nbr AS MATERIALIZED (SELECT da AS v, db AS n FROM e0
              |        UNION ALL SELECT db AS v, da AS n FROM e0),
              |l0 AS MATERIALIZED (SELECT DISTINCT v, v AS label FROM nbr),
              |${labelPropIterSql(4)}
              |SELECT label AS community, CAST(count(*) AS BIGINT) AS size
              |FROM l4 GROUP BY 1 ORDER BY size DESC, community""".stripMargin)),

    // Cochran–Armitage trend test: does conversion propensity rise
    // MONOTONICALLY with activity? Users scored by activity quartile
    // (dose 0–3 via broadcast percentile cutoffs), outcome = above-
    // median purchase count; the trend chi² (df = 1) comes off exact
    // BIGINT cell sums in a closed form, so it detects an ordered
    // dose-response that stat_chi2_indep's omnibus test dilutes
    // across df = 3.
    "stat_cochran_armitage" -> Q(
      (s, d) => {
        val u0 = Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("cnt"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("np"))
          .localCheckpoint(eager = false) // cutoffs + the dosing pass
        val cuts = u0.agg(
          expr("percentile(cnt, 0.25D)").as("q1"),
          expr("percentile(cnt, 0.5D)").as("q2"),
          expr("percentile(cnt, 0.75D)").as("q3"),
          expr("percentile(np, 0.5D)").as("mnp"))
        val cells = u0.crossJoin(broadcast(cuts))
          .withColumn("dose",
            (col("cnt") > col("q1")).cast("long")
              + (col("cnt") > col("q2")).cast("long")
              + (col("cnt") > col("q3")).cast("long"))
          .withColumn("resp", (col("np") > col("mnp")).cast("long"))
          .groupBy("dose")
          .agg(count(lit(1)).as("n"), sum("resp").as("r"))
        cells.agg(count(lit(1)).as("g"), sum("n").as("nn"),
            sum("r").as("rr"), sum(col("dose") * col("r")).as("t1"),
            sum(col("dose") * col("n")).as("u1"),
            sum(col("dose") * col("dose") * col("n")).as("u2"))
          .select(col("g").as("n_groups"), col("nn").as("n_total"),
            round(
              (col("nn") * (col("nn") * col("t1") - col("rr") * col("u1"))
                .cast("double") * (col("nn") * col("t1")
                  - col("rr") * col("u1")).cast("double"))
              / (col("rr") * (col("nn") - col("rr"))).cast("double")
              / (col("nn") * col("u2") - col("u1") * col("u1"))
                .cast("double"), 4).as("chi2_trend"),
            signum((col("nn") * col("t1") - col("rr") * col("u1"))
              .cast("double")).as("trend_sign"))
      },
      Some("""WITH u0 AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS np
             |  FROM events GROUP BY 1),
             |cuts AS (SELECT quantile_cont(cnt, 0.25) AS q1,
             |                quantile_cont(cnt, 0.5) AS q2,
             |                quantile_cont(cnt, 0.75) AS q3,
             |                quantile_cont(np, 0.5) AS mnp
             |         FROM u0),
             |cells AS (
             |  SELECT CAST(cnt > q1 AS BIGINT) + CAST(cnt > q2 AS BIGINT)
             |           + CAST(cnt > q3 AS BIGINT) AS dose,
             |         CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CAST(np > mnp AS BIGINT)) AS BIGINT) AS r
             |  FROM u0, cuts GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS g,
             |             CAST(sum(n) AS BIGINT) AS nn,
             |             CAST(sum(r) AS BIGINT) AS rr,
             |             CAST(sum(dose * r) AS BIGINT) AS t1,
             |             CAST(sum(dose * n) AS BIGINT) AS u1,
             |             CAST(sum(dose * dose * n) AS BIGINT) AS u2
             |      FROM cells)
             |SELECT g AS n_groups, nn AS n_total,
             |       round(CAST(nn AS DOUBLE)
             |             * CAST(nn * t1 - rr * u1 AS DOUBLE)
             |             * CAST(nn * t1 - rr * u1 AS DOUBLE)
             |             / CAST(rr * (nn - rr) AS DOUBLE)
             |             / CAST(nn * u2 - u1 * u1 AS DOUBLE), 4)
             |         AS chi2_trend,
             |       CAST(sign(CAST(nn * t1 - rr * u1 AS DOUBLE)) AS DOUBLE)
             |         AS trend_sign
             |FROM t""".stripMargin)),

    // Intraclass correlation ICC(1,1) of document length within
    // source — "how much of length variance is BETWEEN sources?":
    // one-way ANOVA mean squares off the stat_anova per-group exact
    // integer sums, with the unbalanced-design group size k0
    // (n − Σng²/n)/(g−1). The reliability companion to
    // stat_cronbach's item view.
    "stat_icc" -> Q(
      (s, d) => {
        val x = col("n_chars").cast("double")
        Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(x).as("s"), sum(x * x).as("ss"))
          .agg(count(lit(1)).as("k"), sum("n").as("nn"), sum("s").as("st"),
            sum("ss").as("sst"), sum(col("s") * col("s") / col("n")).as("sb"),
            sum(col("n") * col("n")).as("n2"))
          .select(col("k").cast("long").as("k_groups"),
            col("nn").cast("long").as("n_total"),
            round((col("sb") - col("st") * col("st") / col("nn"))
              / (col("k") - 1), 2).as("ms_between"),
            round((col("sst") - col("sb")) / (col("nn") - col("k")), 2)
              .as("ms_within"),
            round(
              ((col("sb") - col("st") * col("st") / col("nn")) / (col("k") - 1)
                - (col("sst") - col("sb")) / (col("nn") - col("k")))
              / ((col("sb") - col("st") * col("st") / col("nn")) / (col("k") - 1)
                + ((col("nn") - col("n2") / col("nn")) / (col("k") - 1) - 1)
                  * ((col("sst") - col("sb")) / (col("nn") - col("k")))), 4)
              .as("icc1"))
      },
      Some("""WITH g AS (
             |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
             |         sum(CAST(n_chars AS DOUBLE)) AS s,
             |         sum(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS ss
             |  FROM documents GROUP BY source),
             |t AS (SELECT CAST(count(*) AS DOUBLE) AS k, sum(n) AS nn,
             |             sum(s) AS st, sum(ss) AS sst,
             |             sum(s * s / n) AS sb, sum(n * n) AS n2
             |      FROM g)
             |SELECT CAST(k AS BIGINT) AS k_groups,
             |       CAST(nn AS BIGINT) AS n_total,
             |       round((sb - st * st / nn) / (k - 1), 2) AS ms_between,
             |       round((sst - sb) / (nn - k), 2) AS ms_within,
             |       round(((sb - st * st / nn) / (k - 1)
             |              - (sst - sb) / (nn - k))
             |             / ((sb - st * st / nn) / (k - 1)
             |                + ((nn - n2 / nn) / (k - 1) - 1)
             |                  * ((sst - sb) / (nn - k))), 4) AS icc1
             |FROM t""".stripMargin)),

    // Centered systematic PPS sampling (size = n_chars, 50 points at
    // (k+0.5)·total/50 along the doc_id-ordered size axis) — the
    // classic design-based alternative to samp_weighted's A-ES draw:
    // deterministic, spread evenly over the stream, and giant docs
    // surface with multiplicity n_hits. The global size cumsum is
    // Packing.boundedCumSum (two-level scan, never a corpus-wide
    // window partition); the point-in-interval count is exact integer
    // floor division in both engines.
    "samp_pps_systematic" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("sz"))
        val cum = graft.ops.Packing.boundedCumSum(
          docs, "doc_id", "sz", 1L << 20, "cum")
        val tot = cum.agg(max("cum").as("tot"))
        cum.crossJoin(broadcast(tot))
          .withColumn("n_hits", expr(
            "(100 * cum + tot) div (2 * tot) - (100 * (cum - sz) + tot) div (2 * tot)"))
          .filter(col("n_hits") >= 1)
          .select(col("doc_id"), col("sz").as("n_chars"), col("n_hits"),
            round(least(lit(1.0), lit(50.0) * col("sz") / col("tot")), 6)
              .as("pi"))
          .orderBy("doc_id")
      },
      Some("""WITH c AS (
             |  SELECT doc_id, CAST(n_chars AS BIGINT) AS sz,
             |         sum(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id) AS cum
             |  FROM documents),
             |t AS (SELECT max(cum) AS tot FROM c)
             |SELECT doc_id, sz AS n_chars,
             |       CAST((100 * cum + tot) // (2 * tot)
             |         - (100 * (cum - sz) + tot) // (2 * tot) AS BIGINT) AS n_hits,
             |       round(least(1.0, 50.0 * sz / tot), 6) AS pi
             |FROM c, t
             |WHERE (100 * cum + tot) // (2 * tot)
             |        - (100 * (cum - sz) + tot) // (2 * tot) >= 1
             |ORDER BY doc_id""".stripMargin)))

  val round11lQ: Seq[(String, Q)] = Seq(
    // D'Agostino K² omnibus normality test on doc length — the
    // finite-sample z-transforms of skewness and kurtosis that
    // stat_jarque_bera's asymptotic form skips (JB needs n in the
    // thousands before its chi² is honest; K² is calibrated at small
    // n too). Moments come off the two-pass centered sums around the
    // broadcast 6dp mean; g1/b2 are pinned to 6dp before the shared
    // closed-form transform so both engines feed identical inputs to
    // the ln/sqrt/cbrt tree.
    "stat_dagostino" -> Q(
      (s, d) => {
        val x = Tables.documents(s, d)
          .select(col("n_chars").cast("double").as("x"))
        val mu = x.agg(round(avg("x"), 6).as("mu"))
        val g = x.crossJoin(broadcast(mu))
          .agg(count(lit(1)).cast("double").as("n"),
            sum(pow(col("x") - col("mu"), 2)).as("s2"),
            sum(pow(col("x") - col("mu"), 3)).as("s3"),
            sum(pow(col("x") - col("mu"), 4)).as("s4"))
          .select(col("n"),
            round((col("s3") / col("n"))
              / pow(col("s2") / col("n"), 1.5), 6).as("g1"),
            round((col("s4") / col("n"))
              / pow(col("s2") / col("n"), 2.0), 6).as("b2"))
        g.withColumn("y", col("g1") * sqrt((col("n") + 1) * (col("n") + 3)
            / (lit(6.0) * (col("n") - 2))))
          .withColumn("b2t", lit(3.0) * (col("n") * col("n")
              + lit(27.0) * col("n") - 70) * (col("n") + 1) * (col("n") + 3)
            / ((col("n") - 2) * (col("n") + 5) * (col("n") + 7)
              * (col("n") + 9)))
          .withColumn("w2", lit(-1.0) + sqrt(lit(2.0) * (col("b2t") - 1)))
          .withColumn("dl", lit(1.0) / sqrt(log(sqrt(col("w2")))))
          .withColumn("al", sqrt(lit(2.0) / (col("w2") - 1)))
          .withColumn("z1", col("dl") * log(col("y") / col("al")
            + sqrt(col("y") / col("al") * (col("y") / col("al")) + 1)))
          .withColumn("eb2", lit(3.0) * (col("n") - 1) / (col("n") + 1))
          .withColumn("vb2", lit(24.0) * col("n") * (col("n") - 2)
            * (col("n") - 3) / ((col("n") + 1) * (col("n") + 1)
              * (col("n") + 3) * (col("n") + 5)))
          .withColumn("xx", (col("b2") - col("eb2")) / sqrt(col("vb2")))
          .withColumn("sb", lit(6.0) * (col("n") * col("n")
              - lit(5.0) * col("n") + 2) / ((col("n") + 7) * (col("n") + 9))
            * sqrt(lit(6.0) * (col("n") + 3) * (col("n") + 5)
              / (col("n") * (col("n") - 2) * (col("n") - 3))))
          .withColumn("aa", lit(6.0) + lit(8.0) / col("sb")
            * (lit(2.0) / col("sb")
              + sqrt(lit(1.0) + lit(4.0) / (col("sb") * col("sb")))))
          .withColumn("z2", ((lit(1.0) - lit(2.0) / (lit(9.0) * col("aa")))
            - cbrt((lit(1.0) - lit(2.0) / col("aa"))
              / (lit(1.0) + col("xx")
                * sqrt(lit(2.0) / (col("aa") - 4)))))
            / sqrt(lit(2.0) / (lit(9.0) * col("aa"))))
          .select(col("n").cast("long").as("n_total"),
            col("g1").as("skew_g1"), col("b2").as("kurt_b2"),
            round(col("z1"), 4).as("z_skew"),
            round(col("z2"), 4).as("z_kurt"),
            round(col("z1") * col("z1") + col("z2") * col("z2"), 4)
              .as("k2_stat"))
      },
      Some("""WITH mu AS (SELECT round(avg(CAST(n_chars AS DOUBLE)), 6) AS mu
             |            FROM documents),
             |g0 AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |              sum(pow(CAST(n_chars AS DOUBLE) - mu, 2)) AS s2,
             |              sum(pow(CAST(n_chars AS DOUBLE) - mu, 3)) AS s3,
             |              sum(pow(CAST(n_chars AS DOUBLE) - mu, 4)) AS s4
             |       FROM documents, mu),
             |g AS (SELECT n, round((s3 / n) / pow(s2 / n, 1.5), 6) AS g1,
             |             round((s4 / n) / pow(s2 / n, 2.0), 6) AS b2
             |      FROM g0),
             |t1 AS (SELECT *,
             |         g1 * sqrt((n + 1) * (n + 3) / (6.0 * (n - 2))) AS y,
             |         -1.0 + sqrt(2.0 * (3.0 * (n * n + 27.0 * n - 70)
             |           * (n + 1) * (n + 3)
             |           / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) - 1)) AS w2
             |       FROM g),
             |t2 AS (SELECT *, 1.0 / sqrt(ln(sqrt(w2))) AS dl,
             |              sqrt(2.0 / (w2 - 1)) AS al
             |       FROM t1),
             |t3 AS (SELECT *, dl * ln(y / al + sqrt(y / al * (y / al) + 1)) AS z1,
             |         (b2 - 3.0 * (n - 1) / (n + 1))
             |           / sqrt(24.0 * n * (n - 2) * (n - 3)
             |             / ((n + 1) * (n + 1) * (n + 3) * (n + 5))) AS xx,
             |         6.0 * (n * n - 5.0 * n + 2) / ((n + 7) * (n + 9))
             |           * sqrt(6.0 * (n + 3) * (n + 5)
             |             / (n * (n - 2) * (n - 3))) AS sb
             |       FROM t2),
             |t4 AS (SELECT *, 6.0 + 8.0 / sb * (2.0 / sb
             |         + sqrt(1.0 + 4.0 / (sb * sb))) AS aa
             |       FROM t3),
             |t5 AS (SELECT *, ((1.0 - 2.0 / (9.0 * aa))
             |         - cbrt((1.0 - 2.0 / aa)
             |           / (1.0 + xx * sqrt(2.0 / (aa - 4)))))
             |         / sqrt(2.0 / (9.0 * aa)) AS z2
             |       FROM t4)
             |SELECT CAST(n AS BIGINT) AS n_total, g1 AS skew_g1,
             |       b2 AS kurt_b2, round(z1, 4) AS z_skew,
             |       round(z2, 4) AS z_kurt,
             |       round(z1 * z1 + z2 * z2, 4) AS k2_stat
             |FROM t5""".stripMargin)),

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
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("hb", expr("ts div 3600000000000"))
          .localCheckpoint(eager = false) // supports + both join sides
        val nu = ev.agg(countDistinct("user_id").as("nu"))
        val supp = ev.groupBy("event_type")
          .agg(countDistinct("user_id").as("su"))
        val a = ev.select(col("user_id"), col("event_type").as("ta"),
            col("ts").as("tsa"), col("hb"))
          .withColumn("jb", explode(array(col("hb"), col("hb") + 1)))
          .drop("hb")
        val b = ev.select(col("user_id"), col("event_type").as("tb"),
          col("ts").as("tsb"), col("hb").as("jb"))
        val pairs = a.join(b, Seq("user_id", "jb"))
          .filter(col("tsb") > col("tsa")
            && col("tsb") - col("tsa") <= 3600000000000L)
          .groupBy("ta", "tb").agg(countDistinct("user_id").as("n_users"))
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
      Some("""WITH ev AS (SELECT user_id, event_type, ts FROM events),
             |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
             |       FROM ev),
             |supp AS (SELECT event_type,
             |                CAST(count(DISTINCT user_id) AS BIGINT) AS su
             |         FROM ev GROUP BY 1),
             |p AS (SELECT a.user_id, a.event_type AS ta, b.event_type AS tb
             |      FROM ev a JOIN ev b ON a.user_id = b.user_id
             |       AND b.ts > a.ts AND b.ts - a.ts <= 3600000000000),
             |pairs AS (SELECT ta, tb,
             |                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |          FROM p GROUP BY 1, 2)
             |SELECT ta AS type_a, tb AS type_b, n_users,
             |       round(n_users / CAST(sa.su AS DOUBLE), 4) AS confidence,
             |       round(n_users * nu / CAST(sa.su * sb.su AS DOUBLE), 4)
             |         AS lift
             |FROM pairs JOIN supp sa ON pairs.ta = sa.event_type
             |           JOIN supp sb ON pairs.tb = sb.event_type, nu
             |ORDER BY type_a, type_b""".stripMargin)),

    // Temperature-annealed domain-mixture schedule: epoch e of 5
    // reweights each source by n^(1-e/4) — proportional sampling at
    // epoch 0 annealing to uniform by epoch 4, the standard curriculum
    // for rebalancing low-resource domains across a training run
    // (beside pipe_epoch_mix's fixed mix). The whole grid is
    // |sources|×5 rows; allocations come off the 4dp-rounded weight so
    // both engines place identical doc budgets.
    "pipe_mixture_schedule" -> Q(
      (s, d) => {
        val src = Tables.documents(s, d).groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
        val tot = src.agg(sum("n_docs").as("total"))
        val g = src.crossJoin(s.range(0, 5).toDF("epoch"))
          .withColumn("tau", lit(1.0) - col("epoch") / lit(4.0))
          .withColumn("wraw", pow(col("n_docs").cast("double"), col("tau")))
        val wt = g.groupBy("epoch").agg(sum("wraw").as("wtot"))
        g.join(broadcast(wt), "epoch").crossJoin(broadcast(tot))
          .withColumn("mix_weight", round(col("wraw") / col("wtot"), 4))
          .select(col("epoch"), col("source"), col("n_docs"),
            col("mix_weight"),
            floor(col("mix_weight") * col("total") + lit(0.5)).cast("long")
              .as("alloc_docs"))
          .orderBy("epoch", "source")
      },
      Some("""WITH src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             |             FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM src),
             |g AS (SELECT source, n_docs, e AS epoch,
             |             pow(CAST(n_docs AS DOUBLE), 1.0 - e / 4.0) AS wraw
             |      FROM src, (SELECT unnest(generate_series(0, 4)) AS e)),
             |wt AS (SELECT epoch, sum(wraw) AS wtot FROM g GROUP BY 1)
             |SELECT CAST(g.epoch AS BIGINT) AS epoch, source, n_docs,
             |       round(wraw / wtot, 4) AS mix_weight,
             |       CAST(floor(round(wraw / wtot, 4) * total + 0.5) AS BIGINT)
             |         AS alloc_docs
             |FROM g JOIN wt ON g.epoch = wt.epoch, tot
             |ORDER BY epoch, source""".stripMargin)),

    // Interpolated Kneser–Ney bigram perplexity of the corpus over
    // its own bigram table (d = 0.75) — the LM quality signal CCNet-
    // style pipelines bin documents by, beside text_lm_score's add-k
    // unigram surprise: continuation counts N1+(·w) give rare-but-
    // productive tokens their real probability mass. Everything is
    // exact integer count tables joined once; the entropy sum is one
    // aggregate over bigram TYPES (weighted by count), never a
    // per-token pass.
    "text_kn_perplexity" -> Q(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(graft.text.TextPrimitives.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 2)
        val bg = toks.select(explode(transform(
            sequence(lit(0), size(col("toks")) - 2),
            i => struct(
              element_at(col("toks"), (i + 1).cast("int")).as("v"),
              element_at(col("toks"), (i + 2).cast("int")).as("w"))))
            .as("p"))
          .select(col("p.v").as("v"), col("p.w").as("w"))
        val cvw = bg.groupBy("v", "w").agg(count(lit(1)).as("c"))
          .localCheckpoint(eager = false) // read 4×: cv, nb, bt, terms
        val cv = cvw.groupBy("v")
          .agg(sum("c").as("cvt"), count(lit(1)).as("n1f"))
        val nb = cvw.groupBy("w").agg(count(lit(1)).as("n1b"))
        val bt = cvw.agg(count(lit(1)).as("btypes"), sum("c").as("btok"))
        cvw.join(cv, "v").join(nb, "w").crossJoin(broadcast(bt))
          .withColumn("pkn",
            greatest(col("c") - lit(0.75), lit(0.0)) / col("cvt")
              + lit(0.75) * col("n1f") / col("cvt")
                * (col("n1b").cast("double") / col("btypes")))
          .groupBy("btypes", "btok")
          .agg(sum(col("c") * log(col("pkn"))).as("ll"))
          .select(col("btok").as("n_bigrams"),
            col("btypes").as("n_bigram_types"),
            round(-col("ll") / col("btok"), 4).as("cross_entropy"),
            round(exp(-col("ll") / col("btok")), 2).as("perplexity"))
      },
      Some("""WITH t AS (
             |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents
             |  WHERE len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2),
             |bg AS (SELECT toks[i] AS v, toks[i + 1] AS w
             |       FROM t, LATERAL (SELECT unnest(
             |         generate_series(1, len(toks) - 1)) AS i)),
             |cvw AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c
             |        FROM bg GROUP BY 1, 2),
             |cv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cvt,
             |              CAST(count(*) AS BIGINT) AS n1f
             |       FROM cvw GROUP BY 1),
             |nb AS (SELECT w, CAST(count(*) AS BIGINT) AS n1b
             |       FROM cvw GROUP BY 1),
             |bt AS (SELECT CAST(count(*) AS BIGINT) AS btypes,
             |              CAST(sum(c) AS BIGINT) AS btok
             |       FROM cvw),
             |p AS (SELECT c, btypes, btok,
             |             greatest(c - 0.75, 0.0) / cvt
             |               + 0.75 * n1f / cvt
             |                 * (CAST(n1b AS DOUBLE) / btypes) AS pkn
             |      FROM cvw JOIN cv USING (v) JOIN nb USING (w), bt)
             |SELECT btok AS n_bigrams, btypes AS n_bigram_types,
             |       round(-sum(c * ln(pkn)) / btok, 4) AS cross_entropy,
             |       round(exp(-sum(c * ln(pkn)) / btok), 2) AS perplexity
             |FROM p GROUP BY btypes, btok""".stripMargin)))

  val round11mQ: Seq[(String, Q)] = Seq(
    // Holt double exponential smoothing (level + linear trend,
    // α=0.3, β=0.1) of the daily event count, with a 7-day-ahead
    // forecast and one-step RMSE — the trend-aware forecaster beside
    // ts_backtest's seasonal-naive and ev_ewma_bounded's level-only
    // smoother. The series is calendar-bounded, so the fold runs
    // driver-side on the collected days (graph_pagerank altitude),
    // 7dp-pinned per step and mirrored by an unrolled CTE chain.
    "ts_holt_linear" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.embed.CovMoments.r
        val series = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("v"))
          .orderBy("day").collect()
          .map(row => row.getLong(1).toDouble)
        if (series.isEmpty)
          Seq.empty[(Long, Double, Double, Double, Double)]
            .toDF("n_days", "level", "trend", "forecast_7d", "rmse_1step")
        else {
          var l = series.head; var b = 0.0; var sse = 0.0
          series.tail.foreach { x =>
            val pred = l + b
            sse = r(sse + (x - pred) * (x - pred), 7)
            val lNew = r(0.3 * x + 0.7 * (l + b), 7)
            b = r(0.1 * (lNew - l) + 0.9 * b, 7)
            l = lNew
          }
          val n = series.length
          val rmse = if (n > 1) r(math.sqrt(sse / (n - 1)), 4) else 0.0
          Seq((n.toLong, r(l, 4), r(b, 4), r(l + 7 * b, 4), rmse))
            .toDF("n_days", "level", "trend", "forecast_7d", "rmse_1step")
        }
      },
      Some(s"""WITH daily AS (
              |  SELECT ts // 86400000000000 AS day,
              |         CAST(count(*) AS BIGINT) AS v
              |  FROM events GROUP BY 1),
              |dd AS (SELECT v, row_number() OVER (ORDER BY day) AS rn
              |       FROM daily),
              |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dd),
              |st1 AS (SELECT CAST(v AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b,
              |               CAST(0 AS DOUBLE) AS sse
              |        FROM dd WHERE rn = 1),
              |${holtIterSql(30)}
              |SELECT n AS n_days, round(l, 4) AS level, round(b, 4) AS trend,
              |       round(l + 7 * b, 4) AS forecast_7d,
              |       CASE WHEN n > 1 THEN round(sqrt(sse / (n - 1)), 4)
              |            ELSE 0.0 END AS rmse_1step
              |FROM st30, nn""".stripMargin)),

    // Brunner–Munzel test of doc length, en vs all other languages —
    // the rank-based two-sample test that, unlike stat_mwu, stays
    // honest when the two groups have DIFFERENT shapes/variances
    // (the common case for language subsets). Midranks come from the
    // stat_mwu value-histogram idiom (windows over DISTINCT lengths,
    // never rows); placements use the within-group midrank maps; the
    // Welch-type df keeps the t-reference finite-sample-honest.
    "stat_brunner_munzel" -> Q(
      (s, d) => {
        val b = Tables.documents(s, d)
          .select(col("n_chars").cast("long").as("x"),
            when(col("lang") === "en", 1).otherwise(0).as("g"))
          .localCheckpoint(eager = false) // histograms + the row pass
        val wAll = Window.orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1)
        val rcMap = b.groupBy("x").agg(count(lit(1)).as("cnt"))
          .withColumn("f", coalesce(sum("cnt").over(wAll), lit(0L)))
          .select(col("x"), (col("f") + (col("cnt") + 1) / lit(2.0)).as("rc"))
        val wG = Window.partitionBy("g").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1)
        val rwMap = b.groupBy("g", "x").agg(count(lit(1)).as("cnt"))
          .withColumn("f", coalesce(sum("cnt").over(wG), lit(0L)))
          .select(col("g"), col("x"),
            (col("f") + (col("cnt") + 1) / lit(2.0)).as("rw"))
        val rows = b.join(broadcast(rcMap), "x")
          .join(broadcast(rwMap), Seq("g", "x"))
          .localCheckpoint(eager = false) // means + placements
        val gs = rows.groupBy("g")
          .agg(count(lit(1)).as("n"), round(avg("rc"), 6).as("m"))
        val pl = rows.join(broadcast(gs), "g")
          .withColumn("p", col("rc") - col("rw") - col("m")
            + (col("n") + 1) / lit(2.0))
          .groupBy("g").agg(sum(col("p") * col("p")).as("ssq"))
        gs.join(pl, "g")
          .withColumn("s2", col("ssq") / (col("n") - 1))
          .agg(sum(when(col("g") === 1, col("n"))).as("n1"),
            sum(when(col("g") === 0, col("n"))).as("n2"),
            sum(when(col("g") === 1, col("m"))).as("m1"),
            sum(when(col("g") === 0, col("m"))).as("m2"),
            sum(when(col("g") === 1, col("n") * col("s2"))).as("v1"),
            sum(when(col("g") === 0, col("n") * col("s2"))).as("v2"))
          .select(col("n1").cast("long").as("n_en"),
            col("n2").cast("long").as("n_other"),
            round((col("m1") - (col("n1") + 1) / lit(2.0)) / col("n2"), 4)
              .as("p_hat"),
            round(col("n1") * col("n2") * (col("m2") - col("m1"))
              / ((col("n1") + col("n2"))
                * sqrt(col("v1") + col("v2"))), 4).as("w_stat"),
            round(pow(col("v1") + col("v2"), 2)
              / (pow(col("v1"), 2) / (col("n1") - 1)
                + pow(col("v2"), 2) / (col("n2") - 1)), 2).as("df"))
      },
      Some("""WITH b AS (SELECT CAST(n_chars AS BIGINT) AS x,
             |                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
             |           FROM documents),
             |rc AS (SELECT x, coalesce(sum(cnt) OVER (ORDER BY x
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |           + (cnt + 1) / 2.0 AS rc
             |       FROM (SELECT x, count(*) AS cnt FROM b GROUP BY x)),
             |rw AS (SELECT g, x, coalesce(sum(cnt) OVER (PARTITION BY g
             |           ORDER BY x
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |           + (cnt + 1) / 2.0 AS rw
             |       FROM (SELECT g, x, count(*) AS cnt FROM b GROUP BY g, x)),
             |rws AS (SELECT b.g, rc.rc, rw.rw
             |        FROM b JOIN rc USING (x)
             |               JOIN rw ON rw.g = b.g AND rw.x = b.x),
             |gs AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             |              round(avg(rc), 6) AS m
             |       FROM rws GROUP BY g),
             |pl AS (SELECT r.g,
             |              sum((r.rc - r.rw - gs.m + (gs.n + 1) / 2.0)
             |                * (r.rc - r.rw - gs.m + (gs.n + 1) / 2.0)) AS ssq
             |       FROM rws r JOIN gs ON gs.g = r.g GROUP BY r.g),
             |t AS (SELECT sum(CASE WHEN gs.g = 1 THEN n END) AS n1,
             |             sum(CASE WHEN gs.g = 0 THEN n END) AS n2,
             |             sum(CASE WHEN gs.g = 1 THEN m END) AS m1,
             |             sum(CASE WHEN gs.g = 0 THEN m END) AS m2,
             |             sum(CASE WHEN gs.g = 1
             |                 THEN n * (ssq / (n - 1)) END) AS v1,
             |             sum(CASE WHEN gs.g = 0
             |                 THEN n * (ssq / (n - 1)) END) AS v2
             |      FROM gs JOIN pl ON gs.g = pl.g)
             |SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n2 AS BIGINT) AS n_other,
             |       round((m1 - (n1 + 1) / 2.0) / n2, 4) AS p_hat,
             |       round(n1 * n2 * (m2 - m1)
             |             / ((n1 + n2) * sqrt(v1 + v2)), 4) AS w_stat,
             |       round(pow(v1 + v2, 2) / (pow(v1, 2) / (n1 - 1)
             |             + pow(v2, 2) / (n2 - 1)), 2) AS df
             |FROM t""".stripMargin)),

    // Piecewise-linear trend around the Pettitt changepoint: locate
    // the break on the daily purchase series (the ts_pettitt argmax),
    // then fit an exact-integer OLS slope to each side — "how fast
    // was it moving before vs after the break", the effect-size
    // companion to ts_pettitt's detection p-value. Day frame is
    // calendar-bounded; slopes come off exact BIGINT sums.
    "ts_segmented_trend" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("v"))
          .localCheckpoint(eager = false) // pettitt pair frame + segments
        val st = daily.select(col("day").as("t"), col("v").as("vt"))
          .crossJoin(daily.select(col("v").as("vj")))
          .groupBy("t")
          .agg(sum(signum(col("vt") - col("vj"))).cast("long").as("s"))
        val w = Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cp = st.withColumn("u", sum("s").over(w))
          .withColumn("au", abs(col("u")))
          .orderBy(col("au").desc, col("t")).limit(1)
          .select(col("t").as("cp"))
        daily.crossJoin(broadcast(cp))
          .withColumn("seg",
            when(col("day") <= col("cp"), "pre").otherwise("post"))
          .groupBy("seg")
          .agg(max("cp").as("cp_day"), count(lit(1)).as("n_days"),
            sum("day").as("sx"), sum("v").as("sy"),
            sum(col("day") * col("v")).as("sxy"),
            sum(col("day") * col("day")).as("sx2"))
          .select(col("seg"), col("cp_day"), col("n_days"),
            round((col("n_days") * col("sxy") - col("sx") * col("sy"))
              .cast("double")
              / (col("n_days") * col("sx2") - col("sx") * col("sx"))
                .cast("double"), 6).as("slope"),
            round(col("sy") / col("n_days").cast("double"), 4)
              .as("mean_level"))
          .orderBy(col("seg").desc) // pre before post
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS v
             |  FROM events GROUP BY 1),
             |s AS (SELECT a.day AS t, CAST(sum(sign(a.v - b.v)) AS BIGINT) AS s
             |      FROM daily a CROSS JOIN daily b GROUP BY a.day),
             |u AS (SELECT t, CAST(sum(s) OVER (ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |        AS BIGINT) AS u
             |      FROM s),
             |cp AS (SELECT t AS cp FROM u ORDER BY abs(u) DESC, t LIMIT 1),
             |seg AS (SELECT CASE WHEN day <= cp THEN 'pre' ELSE 'post' END
             |          AS seg, cp, day, v
             |        FROM daily, cp),
             |f AS (SELECT seg, CAST(max(cp) AS BIGINT) AS cp_day,
             |             CAST(count(*) AS BIGINT) AS n_days,
             |             CAST(sum(day) AS BIGINT) AS sx,
             |             CAST(sum(v) AS BIGINT) AS sy,
             |             CAST(sum(day * v) AS BIGINT) AS sxy,
             |             CAST(sum(day * day) AS BIGINT) AS sx2
             |      FROM seg GROUP BY 1)
             |SELECT seg, cp_day, n_days,
             |       round(CAST(n_days * sxy - sx * sy AS DOUBLE)
             |             / CAST(n_days * sx2 - sx * sx AS DOUBLE), 6)
             |         AS slope,
             |       round(sy / CAST(n_days AS DOUBLE), 4) AS mean_level
             |FROM f ORDER BY seg DESC""".stripMargin)),

    // Mood's median test of doc length across languages — the
    // assumption-free k-sample location test beside stat_kruskal's
    // rank version: exact integer above/below-grand-median cells per
    // language into a plain chi² (df = k−1). Useless power on tiny
    // shifts, but immune to outliers and shape — the robustness
    // cross-check a length-drift monitor wants.
    "stat_mood_median" -> Q(
      (s, d) => {
        val x = Tables.documents(s, d)
          .select(col("lang"), col("n_chars").cast("long").as("x"))
        val med = x.agg(expr("percentile(x, 0.5D)").as("med"))
        val cells = x.crossJoin(broadcast(med))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum((col("x") > col("med")).cast("long")).as("a"))
        val tot = cells.agg(sum("n").as("nn"), sum("a").as("aa"))
        cells.crossJoin(broadcast(tot))
          .withColumn("ea", col("n") * col("aa") / col("nn").cast("double"))
          .withColumn("eb",
            col("n") * (col("nn") - col("aa")) / col("nn").cast("double"))
          .agg(count(lit(1)).as("k_groups"), max("nn").as("n_total"),
            round(sum(pow(col("a") - col("ea"), 2) / col("ea")
              + pow((col("n") - col("a")) - col("eb"), 2) / col("eb")), 4)
              .as("chi2"))
          .select(col("k_groups"), col("n_total"),
            (col("k_groups") - 1).as("df"), col("chi2"))
      },
      Some("""WITH x AS (SELECT lang, CAST(n_chars AS BIGINT) AS x
             |           FROM documents),
             |med AS (SELECT quantile_cont(x, 0.5) AS med FROM x),
             |cells AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |                 CAST(sum(CAST(x > med AS BIGINT)) AS BIGINT) AS a
             |          FROM x, med GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |               CAST(sum(a) AS BIGINT) AS aa
             |        FROM cells)
             |SELECT CAST(count(*) AS BIGINT) AS k_groups,
             |       max(nn) AS n_total,
             |       CAST(count(*) - 1 AS BIGINT) AS df,
             |       round(sum(pow(a - n * aa / CAST(nn AS DOUBLE), 2)
             |               / (n * aa / CAST(nn AS DOUBLE))
             |             + pow((n - a) - n * (nn - aa) / CAST(nn AS DOUBLE), 2)
             |               / (n * (nn - aa) / CAST(nn AS DOUBLE))), 4) AS chi2
             |FROM cells, tot""".stripMargin)))

  val round11nQ: Seq[(String, Q)] = Seq(
    // Schuster periodogram of the daily event count at harmonics
    // k = 1..14 — the full spectral profile beside ts_goertzel's
    // single probe and ts_spectral_entropy's scalar. t = day − min
    // (broadcast, no rank window), span n = max−min+1, so gapped
    // calendars keep honest phases; A/B sums are pinned to 6dp before
    // squaring so the libm-vs-JDK cos ulp never reaches the output.
    "ts_periodogram" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("v"))
        val span = daily.agg(min("day").as("d0"),
          (max("day") - min("day") + 1).as("n"))
        daily.crossJoin(broadcast(span))
          .withColumn("t", (col("day") - col("d0")).cast("double"))
          .crossJoin(s.range(1, 15).toDF("k"))
          .withColumn("arg",
            lit(2.0) * lit(math.Pi) * col("k") * col("t") / col("n"))
          .groupBy("k", "n")
          .agg(round(sum(col("v") * cos(col("arg"))), 6).as("a"),
            round(sum(col("v") * sin(col("arg"))), 6).as("b"))
          .select(col("k"), round(col("n") / col("k").cast("double"), 2)
              .as("period_days"),
            round((col("a") * col("a") + col("b") * col("b")) / col("n"), 4)
              .as("power"))
          .orderBy("k")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS v
             |  FROM events GROUP BY 1),
             |span AS (SELECT min(day) AS d0,
             |                CAST(max(day) - min(day) + 1 AS BIGINT) AS n
             |         FROM daily),
             |g AS (SELECT k, n,
             |        round(sum(v * cos(2.0 * pi() * k * CAST(day - d0 AS DOUBLE) / n)), 6) AS a,
             |        round(sum(v * sin(2.0 * pi() * k * CAST(day - d0 AS DOUBLE) / n)), 6) AS b
             |      FROM daily, span,
             |           (SELECT unnest(generate_series(1, 14)) AS k)
             |      GROUP BY 1, 2)
             |SELECT CAST(k AS BIGINT) AS k,
             |       round(n / CAST(k AS DOUBLE), 2) AS period_days,
             |       round((a * a + b * b) / n, 4) AS power
             |FROM g ORDER BY k""".stripMargin)),

    // One-way ANCOVA: does language still shift TOKEN count once the
    // obvious covariate (character length) is regressed out? Pooled
    // within-group slope + the F for the adjusted group effect, all
    // from exact integer sums (the stat_anova altitude extended to
    // cross-moments) — the "is the group effect real or just length"
    // control stat_anova cannot answer.
    "stat_ancova" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("lang"),
            col("n_chars").cast("double").as("x"),
            size(graft.text.TextPrimitives.tokens(col("text")))
              .cast("double").as("y"))
        val g = base.groupBy("lang")
          .agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
        g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
            sum("sx").as("tx"), sum("sy").as("ty"),
            sum("sxx").as("txx"), sum("sxy").as("txy"),
            sum("syy").as("tyy"),
            sum(col("sxx") - col("sx") * col("sx") / col("n")).as("wxx"),
            sum(col("sxy") - col("sx") * col("sy") / col("n")).as("wxy"),
            sum(col("syy") - col("sy") * col("sy") / col("n")).as("wyy"))
          .select(col("k").cast("long").as("k_groups"),
            col("nn").cast("long").as("n_total"),
            round(col("wxy") / col("wxx"), 6).as("common_slope"),
            round(
              (((col("tyy") - col("ty") * col("ty") / col("nn"))
                - pow(col("txy") - col("tx") * col("ty") / col("nn"), 2)
                  / (col("txx") - col("tx") * col("tx") / col("nn")))
                - (col("wyy") - pow(col("wxy"), 2) / col("wxx")))
              / (col("k") - 1)
              / ((col("wyy") - pow(col("wxy"), 2) / col("wxx"))
                / (col("nn") - col("k") - 1)), 4).as("f_adj"))
      },
      Some("""WITH b AS (
             |  SELECT lang, CAST(n_chars AS DOUBLE) AS x,
             |         CAST(len(regexp_split_to_array(lower(trim(text)),
             |           '\s+')) AS DOUBLE) AS y
             |  FROM documents),
             |g AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             |             sum(x * y) AS sxy, sum(y * y) AS syy
             |      FROM b GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS DOUBLE) AS k, sum(n) AS nn,
             |             sum(sx) AS tx, sum(sy) AS ty, sum(sxx) AS txx,
             |             sum(sxy) AS txy, sum(syy) AS tyy,
             |             sum(sxx - sx * sx / n) AS wxx,
             |             sum(sxy - sx * sy / n) AS wxy,
             |             sum(syy - sy * sy / n) AS wyy
             |      FROM g)
             |SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_total,
             |       round(wxy / wxx, 6) AS common_slope,
             |       round((((tyy - ty * ty / nn)
             |               - pow(txy - tx * ty / nn, 2) / (txx - tx * tx / nn))
             |              - (wyy - pow(wxy, 2) / wxx))
             |             / (k - 1)
             |             / ((wyy - pow(wxy, 2) / wxx) / (nn - k - 1)), 4)
             |         AS f_adj
             |FROM t""".stripMargin)),

    // Welch's heteroskedastic one-way ANOVA of doc length across
    // languages — the k-sample version of stat_welch_ttest, honest
    // when group variances differ (which stat_bartlett shows they
    // do): precision weights n/s², Welch-corrected F* and fractional
    // df2, all off exact integer group sums.
    "stat_welch_anova" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(col("lang"), col("n_chars").cast("double").as("x"))
          .groupBy("lang")
          .agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("s"), sum(col("x") * col("x")).as("ss"))
          .withColumn("m", col("s") / col("n"))
          .withColumn("v", (col("ss") - col("s") * col("s") / col("n"))
            / (col("n") - 1))
          .withColumn("w", col("n") / col("v"))
        val t = g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
          sum("w").as("ww"), sum(col("w") * col("m")).as("wm"))
        g.crossJoin(broadcast(t))
          .withColumn("mg", col("wm") / col("ww"))
          .agg(max("k").as("k"), max("nn").as("nn"),
            sum(col("w") * pow(col("m") - col("mg"), 2)).as("a"),
            sum(pow(lit(1.0) - col("w") / col("ww"), 2) / (col("n") - 1))
              .as("h"))
          .select(col("k").cast("long").as("k_groups"),
            col("nn").cast("long").as("n_total"),
            round((col("a") / (col("k") - 1))
              / (lit(1.0) + lit(2.0) * (col("k") - 2)
                / (col("k") * col("k") - 1) * col("h")), 4).as("f_star"),
            (col("k") - 1).cast("long").as("df1"),
            round((col("k") * col("k") - 1)
              / (lit(3.0) * col("h")), 2).as("df2"))
      },
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |         sum(CAST(n_chars AS DOUBLE)) AS s,
             |         sum(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE))
             |           AS ss
             |  FROM documents GROUP BY 1),
             |g2 AS (SELECT *, s / n AS m,
             |              (ss - s * s / n) / (n - 1) AS v,
             |              n / ((ss - s * s / n) / (n - 1)) AS w
             |       FROM g),
             |t AS (SELECT CAST(count(*) AS DOUBLE) AS k, sum(n) AS nn,
             |             sum(w) AS ww, sum(w * m) AS wm
             |      FROM g2),
             |f AS (SELECT max(k) AS k, max(nn) AS nn,
             |             sum(w * pow(m - wm / ww, 2)) AS a,
             |             sum(pow(1.0 - w / ww, 2) / (n - 1)) AS h
             |      FROM g2, t)
             |SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_total,
             |       round((a / (k - 1))
             |             / (1.0 + 2.0 * (k - 2) / (k * k - 1) * h), 4)
             |         AS f_star,
             |       CAST(k - 1 AS BIGINT) AS df1,
             |       round((k * k - 1) / (3.0 * h), 2) AS df2
             |FROM f""".stripMargin)),

    // Exponential mechanism releasing the "largest source" under
    // ε=0.1 differential privacy — the selection-query companion to
    // priv_noisy_max's Laplace ranking: per-candidate Gumbel
    // perturbation of ε·u/2 (the Gumbel-max trick IS the exponential
    // mechanism), with md5-seeded uniforms (the priv_noisy_max
    // convention) so the draw is reproducible; exact selection
    // probabilities reported beside the draw via the max-shifted
    // softmax.
    "priv_exp_mech" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("n"))
          .withColumn("u",
            (pmod(md5Long(concat(lit("em:"), col("source"))), lit(1000000))
              .cast("double") + 0.5) / 1000000.0)
          .withColumn("gum", round(-log(-log(col("u"))), 6))
          .withColumn("score", round(lit(0.05) * col("n") + col("gum"), 6))
        val mx = g.agg(max("n").as("mx"))
        val sm = g.crossJoin(broadcast(mx))
          .withColumn("e", exp(lit(0.05) * (col("n") - col("mx"))))
        val z = sm.agg(sum("e").as("z"))
        val w = Window.orderBy(col("score").desc, col("source"))
        sm.crossJoin(broadcast(z))
          .withColumn("rk", row_number().over(w))
          .select(col("source"), col("n"),
            round(col("e") / col("z"), 6).as("select_prob"),
            col("gum").as("gumbel"),
            (col("rk") === 1).cast("long").as("is_released"))
          .orderBy("source")
      },
      Some("""WITH g AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1),
             |u AS (SELECT *,
             |        ((('0x' || substr(md5('em:' || source), 1, 15))::BIGINT
             |          % 1000000) + 0.5) / 1000000.0 AS u
             |      FROM g),
             |gu AS (SELECT *, round(-ln(-ln(u)), 6) AS gum FROM u),
             |sc AS (SELECT *, round(0.05 * n + gum, 6) AS score FROM gu),
             |mx AS (SELECT max(n) AS mx FROM sc),
             |sm AS (SELECT sc.*, exp(0.05 * (n - mx)) AS e FROM sc, mx),
             |z AS (SELECT sum(e) AS z FROM sm),
             |rk AS (SELECT *, row_number() OVER
             |         (ORDER BY score DESC, source) AS rk
             |       FROM sm)
             |SELECT source, n, round(e / (SELECT z FROM z), 6) AS select_prob,
             |       gum AS gumbel,
             |       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT)
             |         AS is_released
             |FROM rk ORDER BY source""".stripMargin)))
}
