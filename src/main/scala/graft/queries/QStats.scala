package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.store.VectorStore
import graft.store.VectorStore.pointsSql
import graft.QDsl._

/** Statistics & experimentation tests/estimators — SparkEntry query family (regrouped from the round-named
  * inventory files in round 15; same query names, same bodies —
  * SparkEntry assembles the full map and the driver contract). */
private[graft] object QStats {

  val statsQA: Seq[(String, Q)] = Seq(
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
        Some(s"""WITH $qualityCteSql,
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
        Some(s"""WITH $qualityCteSql,
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
        Some(s"""WITH $qualityCteSql,
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
             |FROM t""".stripMargin))
  )

  val statsQB: Seq[(String, Q)] = Seq(
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

    // Durbin-Watson autocorrelation-of-residuals audit per event type:
    // fit daily count ~ day by closed-form OLS (exact integer sums),
    // broadcast the |types|-row coefficient table back onto the SAME
    // checkpointed daily frame, and run DW = sum((e_t - e_{t-1})^2) /
    // sum(e^2) as one per-type lag window over O(days) rows. DW ~ 2
    // means the linear-trend residuals are white; ~0 means the trend
    // model is missing strong positive autocorrelation. Slope and
    // intercept are rounded to 6 BEFORE the residual pass so both
    // engines compute identical residuals.
    "stat_durbin_watson" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).cast("double").as("c"))
          .localCheckpoint(eager = false) // coefficient fit + residual pass
        val coef = daily.groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"),
               sum(col("day").cast("double")).as("sx"), sum("c").as("sy"),
               sum(col("day").cast("double") * col("day")).as("sxx"),
               sum(col("day").cast("double") * col("c")).as("sxy"))
          .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
          .filter(col("dx") > 0)
          .select(col("event_type"), col("n").cast("long").as("n_days"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) / col("dx"), 6)
              .as("slope"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / col("dx") * col("sx")) / col("n"), 6).as("icept"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.join(broadcast(coef), "event_type")
          .withColumn("e", col("c") - col("icept") - col("slope") * col("day"))
          .withColumn("el", lag("e", 1).over(w))
          .groupBy("event_type")
          .agg(max("n_days").as("n_days"), max("slope").as("slope"),
               sum(col("e") * col("e")).as("see"),
               sum(pow(col("e") - col("el"), 2)).as("sd"))
          .select(col("event_type"), col("n_days"), col("slope"),
            when(col("see") > 0 && col("n_days") >= 2,
              round(col("sd") / col("see"), 4)).as("dw"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS DOUBLE) AS c
             |  FROM events GROUP BY 1, 2),
             |coef AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             |                sum(CAST(day AS DOUBLE)) AS sx, sum(c) AS sy,
             |                sum(CAST(day AS DOUBLE) * day) AS sxx,
             |                sum(CAST(day AS DOUBLE) * c) AS sxy
             |         FROM daily GROUP BY 1),
             |cf AS (SELECT event_type, CAST(n AS BIGINT) AS n_days,
             |              round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
             |              round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS icept
             |       FROM coef WHERE n*sxx - sx*sx > 0),
             |r AS (SELECT d.event_type, cf.n_days, cf.slope,
             |             d.c - cf.icept - cf.slope * d.day AS e,
             |             lag(d.c - cf.icept - cf.slope * d.day)
             |               OVER (PARTITION BY d.event_type ORDER BY d.day) AS el
             |      FROM daily d JOIN cf ON cf.event_type = d.event_type)
             |SELECT event_type, max(n_days) AS n_days, max(slope) AS slope,
             |       CASE WHEN sum(e*e) > 0 AND max(n_days) >= 2
             |            THEN round(sum((e - el)*(e - el)) / sum(e*e), 4)
             |       END AS dw
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Breusch-Pagan heteroscedasticity test on lineitem price ~
    // quantity: does residual VARIANCE drift with quantity,
    // invalidating constant-variance
    // OLS inference? The whole test - main fit, squared residuals,
    // auxiliary regression of e^2 on x, LM = n*R^2_aux - collapses to
    // closed-form arithmetic over the 14 raw mixed moments
    // sum(x^i y^j), i+j <= 4, from ONE hash aggregate (the
    // stat_moments power-sum idiom; y pre-scaled by 1e-4 to keep
    // 4th-power sums well inside double range). p from the chi^2_1
    // survival erfc(sqrt(LM/2)) via the shared A&S 7.1.26 polynomial.
    "stat_breusch_pagan" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_quantity").cast("double").as("x"),
          (col("l_extendedprice") / 10000.0).as("y"))
        val m = li.agg(count(lit(1)).cast("double").as("n"),
          sum("x").as("m10"), sum("y").as("m01"),
          sum(expr("x*x")).as("m20"), sum(expr("x*y")).as("m11"),
          sum(expr("y*y")).as("m02"),
          sum(expr("x*x*x")).as("m30"), sum(expr("x*x*y")).as("m21"),
          sum(expr("x*y*y")).as("m12"), sum(expr("y*y*y")).as("m03"),
          sum(expr("x*x*x*x")).as("m40"), sum(expr("x*x*x*y")).as("m31"),
          sum(expr("x*x*y*y")).as("m22"), sum(expr("x*y*y*y")).as("m13"),
          sum(expr("y*y*y*y")).as("m04"))
        val withCoef = m
          .withColumn("dxm", col("n") * col("m20") - col("m10") * col("m10"))
          .filter(col("dxm") > 0)
          .withColumn("b", (col("n") * col("m11") - col("m10") * col("m01")) / col("dxm"))
          .withColumn("a", (col("m01") - col("b") * col("m10")) / col("n"))
        val u = withCoef
          .withColumn("su",
            col("m02") - lit(2) * col("a") * col("m01") - lit(2) * col("b") * col("m11")
              + col("n") * col("a") * col("a")
              + lit(2) * col("a") * col("b") * col("m10")
              + col("b") * col("b") * col("m20"))
          .withColumn("sxu",
            col("m12") - lit(2) * col("a") * col("m11") - lit(2) * col("b") * col("m21")
              + col("a") * col("a") * col("m10")
              + lit(2) * col("a") * col("b") * col("m20")
              + col("b") * col("b") * col("m30"))
          .withColumn("su2",
            col("m04") - lit(4) * col("a") * col("m03") - lit(4) * col("b") * col("m13")
              + lit(6) * (col("a") * col("a") * col("m02")
                + lit(2) * col("a") * col("b") * col("m12")
                + col("b") * col("b") * col("m22"))
              - lit(4) * (col("a") * col("a") * col("a") * col("m01")
                + lit(3) * col("a") * col("a") * col("b") * col("m11")
                + lit(3) * col("a") * col("b") * col("b") * col("m21")
                + col("b") * col("b") * col("b") * col("m31"))
              + col("n") * pow(col("a"), 4)
              + lit(4) * pow(col("a"), 3) * col("b") * col("m10")
              + lit(6) * col("a") * col("a") * col("b") * col("b") * col("m20")
              + lit(4) * col("a") * pow(col("b"), 3) * col("m30")
              + pow(col("b"), 4) * col("m40"))
          .withColumn("du", col("n") * col("su2") - col("su") * col("su"))
          .withColumn("cvu", col("n") * col("sxu") - col("m10") * col("su"))
          .withColumn("bp",
            when(col("du") > 0,
              round(col("n") * col("cvu") * col("cvu")
                / (col("dxm") * col("du")), 4)))
        u.withColumn("xx", sqrt(col("bp") / 2))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("xx")))
          .select(col("n").cast("long").as("n_rows"),
            round(col("b"), 6).as("slope"),
            col("bp").as("bp_stat"),
            when(col("bp").isNull, lit(null).cast("double")).otherwise(round(
              col("t1") * (lit(0.254829592) + col("t1") * (lit(-0.284496736)
                + col("t1") * (lit(1.421413741) + col("t1") * (lit(-1.453152027)
                + col("t1") * lit(1.061405429)))))
              * exp(-col("xx") * col("xx")), 6)).as("p_value"))
      },
      Some("""WITH t AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
             |                  l_extendedprice / 10000.0 AS y FROM lineitem),
             |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS m10, sum(y) AS m01, sum(x*x) AS m20,
             |             sum(x*y) AS m11, sum(y*y) AS m02, sum(x*x*x) AS m30,
             |             sum(x*x*y) AS m21, sum(x*y*y) AS m12, sum(y*y*y) AS m03,
             |             sum(x*x*x*x) AS m40, sum(x*x*x*y) AS m31,
             |             sum(x*x*y*y) AS m22, sum(x*y*y*y) AS m13,
             |             sum(y*y*y*y) AS m04
             |      FROM t),
             |c1 AS (SELECT *, n*m20 - m10*m10 AS dxm FROM m WHERE n*m20 - m10*m10 > 0),
             |c2 AS (SELECT *, (n*m11 - m10*m01) / dxm AS b FROM c1),
             |c3 AS (SELECT *, (m01 - b*m10) / n AS a FROM c2),
             |c4 AS (SELECT *,
             |         m02 - 2*a*m01 - 2*b*m11 + n*a*a + 2*a*b*m10 + b*b*m20 AS su,
             |         m12 - 2*a*m11 - 2*b*m21 + a*a*m10 + 2*a*b*m20 + b*b*m30 AS sxu,
             |         m04 - 4*a*m03 - 4*b*m13
             |           + 6*(a*a*m02 + 2*a*b*m12 + b*b*m22)
             |           - 4*(a*a*a*m01 + 3*a*a*b*m11 + 3*a*b*b*m21 + b*b*b*m31)
             |           + n*a*a*a*a + 4*a*a*a*b*m10 + 6*a*a*b*b*m20
             |           + 4*a*b*b*b*m30 + b*b*b*b*m40 AS su2
             |       FROM c3),
             |c5 AS (SELECT *, n*su2 - su*su AS du, n*sxu - m10*su AS cvu FROM c4),
             |c6 AS (SELECT *, CASE WHEN du > 0
             |                 THEN round(n*cvu*cvu / (dxm*du), 4) END AS bp
             |       FROM c5),
             |c7 AS (SELECT *, sqrt(bp / 2) AS xx,
             |              1.0 / (1.0 + 0.3275911 * sqrt(bp / 2)) AS t1
             |       FROM c6)
             |SELECT CAST(n AS BIGINT) AS n_rows, round(b, 6) AS slope,
             |       bp AS bp_stat,
             |       CASE WHEN bp IS NULL THEN NULL ELSE round(
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p_value
             |FROM c7""".stripMargin)),

    // Cronbach's alpha internal-consistency of the size rubric: do
    // the three per-doc items (capped char score, capped token score,
    // capped distinct-token score) measure ONE underlying "document
    // size" trait, or is the composite averaging unrelated signals?
    // (Round 11: items rebuilt on QUANTITIES THAT VARY in this corpus
    // — the old alpha-fraction/non-punct items are constant 1.0 on
    // the synthetic text, which made alpha a degenerate 0.) alpha = k/(k-1) * (1 - sum(var_i)/var_total)
    // over population variances - one map-side item projection (the
    // text_charclass regex-strip idiom) and ONE 4-variance aggregate.
    // Cronbach's alpha over three doc-quality items. EXACT-INTEGER
    // sums (round-11): the round-8 two-pass centered altitude still
    // summed doubles, whose partial-merge order flipped a boundary
    // value's 4dp round between runs (round-10 verdict). Now each item
    // is scaled to integer micro-units (round(i*1e6) AS BIGINT) per
    // row; the ONE aggregate sums x and x^2 as exact integers (Spark
    // decimal(38,0), DuckDB HUGEINT) - bitwise identical regardless of
    // partition merge order. var_pop = (n*Sxx - Sx^2)/n^2 off the
    // exact sums; the only double ops are single divisions at the end,
    // which are order-free. alpha = 1.5*(1 - sum(num_i)/num_t) shares
    // the n^2 factor so it divides the exact numerators directly.
    "stat_cronbach" -> Q(
      (s, d) => {
        val tk = graft.text.TextPrimitives.tokens(col("text"))
        val dec = "decimal(38,0)"
        val items = Tables.documents(s, d).select(
          round(least(col("n_chars") / 2000.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("x1"),
          round(least(size(tk) / 100.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("x2"),
          round(least(size(array_distinct(tk)) / 60.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("x3"))
          .withColumn("xt", col("x1") + col("x2") + col("x3"))
        items.agg(
          count(lit(1)).as("n_docs"),
          sum(col("x1").cast(dec)).as("s1"),
          sum(col("x2").cast(dec)).as("s2"),
          sum(col("x3").cast(dec)).as("s3"),
          sum(col("xt").cast(dec)).as("st"),
          sum((col("x1") * col("x1")).cast(dec)).as("q1"),
          sum((col("x2") * col("x2")).cast(dec)).as("q2"),
          sum((col("x3") * col("x3")).cast(dec)).as("q3"),
          sum((col("xt") * col("xt")).cast(dec)).as("qt"))
          .select(col("n_docs"),
            (col("n_docs") * col("q1") - col("s1") * col("s1"))
              .cast("double").as("u1"),
            (col("n_docs") * col("q2") - col("s2") * col("s2"))
              .cast("double").as("u2"),
            (col("n_docs") * col("q3") - col("s3") * col("s3"))
              .cast("double").as("u3"),
            (col("n_docs") * col("qt") - col("st") * col("st"))
              .cast("double").as("ut"))
          .select(col("n_docs"),
            round(col("u1") / (col("n_docs") * col("n_docs") * 1e12), 6)
              .as("var_len"),
            round(col("u2") / (col("n_docs") * col("n_docs") * 1e12), 6)
              .as("var_tok"),
            round(col("u3") / (col("n_docs") * col("n_docs") * 1e12), 6)
              .as("var_vocab"),
            when(col("ut") > 0,
              round(lit(1.5) * (lit(1.0)
                - (col("u1") + col("u2") + col("u3")) / col("ut")), 4))
              .as("alpha"))
      },
      Some("""WITH it AS MATERIALIZED (
             |  SELECT CAST(round(least(n_chars / 2000.0, 1.0) * 1e6) AS BIGINT) AS x1,
             |         CAST(round(least(len(regexp_split_to_array(lower(trim(text)),
             |           '\s+')) / 100.0, 1.0) * 1e6) AS BIGINT) AS x2,
             |         CAST(round(least(len(list_distinct(regexp_split_to_array(
             |           lower(trim(text)), '\s+'))) / 60.0, 1.0) * 1e6) AS BIGINT) AS x3
             |  FROM documents),
             |it2 AS (SELECT *, x1 + x2 + x3 AS xt FROM it),
             |cm AS (
             |  SELECT count(*) AS n_docs,
             |         sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3, sum(xt) AS st,
             |         sum(x1*x1) AS q1, sum(x2*x2) AS q2,
             |         sum(x3*x3) AS q3, sum(xt*xt) AS qt
             |  FROM it2),
             |u AS (
             |  SELECT n_docs,
             |         CAST(n_docs*q1 - s1*s1 AS DOUBLE) AS u1,
             |         CAST(n_docs*q2 - s2*s2 AS DOUBLE) AS u2,
             |         CAST(n_docs*q3 - s3*s3 AS DOUBLE) AS u3,
             |         CAST(n_docs*qt - st*st AS DOUBLE) AS ut
             |  FROM cm)
             |SELECT CAST(n_docs AS BIGINT) AS n_docs,
             |       round(u1 / (CAST(n_docs AS DOUBLE) * n_docs * 1e12), 6) AS var_len,
             |       round(u2 / (CAST(n_docs AS DOUBLE) * n_docs * 1e12), 6) AS var_tok,
             |       round(u3 / (CAST(n_docs AS DOUBLE) * n_docs * 1e12), 6) AS var_vocab,
             |       CASE WHEN ut > 0
             |            THEN round(1.5 * (1.0 - (u1 + u2 + u3) / ut), 4)
             |       END AS alpha
             |FROM u""".stripMargin)),

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
          // the 4-margin product is computed in DOUBLE from the first
          // factor (both engines, same left-assoc order): at sf10 the
          // per-user event density pushes every first-day into one
          // stratum, margins reach ~n/2 ≈ 75k and the raw 64-bit
          // product overflows (caught by the sf10 flush; DuckDB's
          // HUGEINT sums masked it oracle-side). Margins are ≤2^53 so
          // each factor is exact; the result feeds double math anyway.
          sum((col("a") + col("b")).cast("double") * (col("c") + col("dd")) *
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
             |              sum(CAST(a + b AS DOUBLE) * (c + dd) * (a + c) * (b + dd)
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
    // Power sums in EXACT INTEGERS (sf10 flush): float Σx², Σxy, Σy²
    // over 24M rows/group carry merge-order noise, and the centered
    // differences (dyy − dxx) cancel catastrophically — the 6dp
    // slope_tls round diverged at sf10 (…033 vs …035). Quantity is
    // integral and price is exact cents, so the five sums are
    // BIGINT/DECIMAL(38,0); the double math runs ONCE on exact
    // aggregates in identical expression order on both engines.
    "stat_deming" -> Q(
      (s, d) => {
        val t = Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))").as("yu"))
        t.groupBy("l_returnflag")
          .agg(count(lit(1)).as("nl"),
               sum("x").as("sxi"), sum(expr("x*x")).as("sxxi"),
               sum("yu").as("syu"), sum(expr("x*yu")).as("sxyu"),
               sum(expr("yu*yu")).as("syyu"))
          .withColumn("n", col("nl").cast("double"))
          .withColumn("sx", col("sxi").cast("double"))
          .withColumn("sy", col("syu").cast("double") / 100000.0)
          .withColumn("sxx", col("sxxi").cast("double"))
          .withColumn("sxy", col("sxyu").cast("double") / 100000.0)
          .withColumn("syy", col("syyu").cast("double") / 10000000000.0)
          .withColumn("dxx", col("sxx") - col("sx") * col("sx") / col("n"))
          .withColumn("dyy", col("syy") - col("sy") * col("sy") / col("n"))
          .withColumn("dxy", col("sxy") - col("sx") * col("sy") / col("n"))
          .select(col("l_returnflag"), col("nl").as("n_rows"),
            when(col("dxx") > 0, round(col("dxy") / col("dxx"), 6))
              .as("slope_ols"),
            when(col("dxy") =!= 0, round(
              (col("dyy") - col("dxx") +
                sqrt(pow(col("dyy") - col("dxx"), 2)
                  + lit(4.0) * col("dxy") * col("dxy")))
              / (lit(2.0) * col("dxy")), 6)).as("slope_tls"))
          .orderBy("l_returnflag")
      },
      Some("""WITH t AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
             |                  CAST(round(l_extendedprice * 100) AS HUGEINT) AS yu
             |           FROM lineitem),
             |g AS (SELECT l_returnflag, count(*) AS nl,
             |             sum(x) AS sxi, sum(x*x) AS sxxi,
             |             sum(yu) AS syu, sum(x*yu) AS sxyu, sum(yu*yu) AS syyu
             |      FROM t GROUP BY 1),
             |dd AS (SELECT l_returnflag, nl, CAST(nl AS DOUBLE) AS n,
             |              CAST(sxi AS DOUBLE) AS sx,
             |              CAST(syu AS DOUBLE) / 100000.0 AS sy,
             |              CAST(sxxi AS DOUBLE) AS sxx,
             |              CAST(sxyu AS DOUBLE) / 100000.0 AS sxy,
             |              CAST(syyu AS DOUBLE) / 10000000000.0 AS syy
             |       FROM g),
             |c AS (SELECT *, sxx - sx*sx/n AS dxx, syy - sy*sy/n AS dyy,
             |             sxy - sx*sy/n AS dxy
             |      FROM dd)
             |SELECT l_returnflag, CAST(nl AS BIGINT) AS n_rows,
             |       CASE WHEN dxx > 0 THEN round(dxy / dxx, 6) END AS slope_ols,
             |       CASE WHEN dxy <> 0 THEN round(
             |         (dyy - dxx + sqrt(pow(dyy - dxx, 2) + 4.0*dxy*dxy))
             |         / (2.0 * dxy), 6) END AS slope_tls
             |FROM c ORDER BY l_returnflag""".stripMargin)),

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
      })
  )

  val statsQC: Seq[(String, Q)] = Seq(
    // Dunn's post-hoc test: WHICH language pairs differ after
    // stat_kruskal rejects — pairwise z on tie-corrected mean
    // midranks (the same VALUE-level rank machinery, never a row
    // rank), Bonferroni-adjusted over the k(k-1)/2 comparisons. The
    // pair frame is |langs|², bounded by the language domain.
    "stat_dunn_test" -> Q(
      (s, d) => {
        val cells = Tables.documents(s, d)
          .groupBy(col("lang"), col("n_chars").cast("long").as("x"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false) // value ranks + group sums
        val wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
        val ranks = cells.groupBy("x").agg(sum("cnt").as("t"))
          .withColumn("f", coalesce(sum("t").over(wx), lit(0L)))
          .select(col("x"), col("t"), (col("f") * 2 + col("t") + 1).as("rank2"))
          .localCheckpoint(eager = false) // rank join + tie term
        val grp = cells.join(broadcast(ranks), "x")
          .groupBy("lang").agg(sum("cnt").as("n_g"),
            (sum(col("cnt") * col("rank2")) / 2.0 / sum("cnt")).as("mr"))
          .localCheckpoint(eager = false) // both sides of the pair join
        val tot = cells.agg(sum("cnt").cast("double").as("nn"))
          .crossJoin(broadcast(ranks.agg(
            sum(col("t").cast("double") * col("t") * col("t") - col("t"))
              .as("tie"))))
        val k = grp.agg(count(lit(1)).cast("double").as("k"))
        val pairs = grp.select(col("lang").as("la"), col("n_g").as("na"),
            col("mr").as("ma"))
          .join(grp.select(col("lang").as("lb"), col("n_g").as("nb"),
            col("mr").as("mb")), col("la") < col("lb"))
          .crossJoin(broadcast(tot)).crossJoin(broadcast(k))
        val s2 = (col("nn") * (col("nn") + 1)
          - col("tie") / (col("nn") - 1)) / 12.0 *
          (lit(1.0) / col("na") + lit(1.0) / col("nb"))
        val zc = pairs.withColumn("z",
          when(s2 > 0, round((col("ma") - col("mb")) / sqrt(s2), 4)))
        val xx = abs(col("z")) / sqrt(lit(2.0))
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        zc.withColumn("p",
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
                + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
                + t1 * lit(1.061405429)))))
              * exp(-xx * xx), 6)))
          .withColumn("m", col("k") * (col("k") - 1) / 2)
          .select(col("la"), col("lb"),
            col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
            col("z"), col("p"),
            when(col("p").isNotNull,
              round(least(col("p") * col("m"), lit(1.0)), 6)).as("p_bonf"),
            when(col("p").isNotNull,
              (round(least(col("p") * col("m"), lit(1.0)), 6) < 0.05)
                .cast("long")).as("reject_05"))
          .orderBy("la", "lb")
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
             |g AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_g,
             |             sum(cnt * rank2) / 2.0 / sum(cnt) AS mr
             |      FROM cells JOIN rk USING (x) GROUP BY lang),
             |tt AS (SELECT CAST(sum(cnt) AS DOUBLE) AS nn FROM cells),
             |te AS (SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie FROM rk),
             |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM g),
             |pr AS (SELECT a.lang AS la, b.lang AS lb, a.n_g AS na, b.n_g AS nb,
             |              a.mr AS ma, b.mr AS mb, nn, tie, k
             |       FROM g a JOIN g b ON a.lang < b.lang, tt, te, kk),
             |zz AS (SELECT *,
             |         (nn * (nn + 1) - tie / (nn - 1)) / 12.0
             |           * (1.0 / na + 1.0 / nb) AS s2
             |       FROM pr),
             |zc AS (SELECT *, CASE WHEN s2 > 0
             |              THEN round((ma - mb) / sqrt(s2), 4) END AS z
             |       FROM zz),
             |pv AS (SELECT *, abs(z) / sqrt(2.0) AS xx,
             |              1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t1
             |       FROM zc),
             |pp AS (SELECT *,
             |         CASE WHEN z IS NULL THEN NULL ELSE round(
             |           t1 * (0.254829592 + t1 * (-0.284496736
             |             + t1 * (1.421413741 + t1 * (-1.453152027
             |             + t1 * 1.061405429)))) * exp(-xx*xx), 6) END AS p
             |       FROM pv)
             |SELECT la, lb, na AS n_a, nb AS n_b, z, p,
             |       CASE WHEN p IS NOT NULL
             |            THEN round(least(p * (k * (k - 1) / 2), 1.0), 6)
             |       END AS p_bonf,
             |       CASE WHEN p IS NOT NULL THEN CAST(CASE WHEN
             |         round(least(p * (k * (k - 1) / 2), 1.0), 6) < 0.05
             |         THEN 1 ELSE 0 END AS BIGINT)
             |       END AS reject_05
             |FROM pp ORDER BY la, lb""".stripMargin)),

    // exact sign test on paired pre/post per-user mean values
    // (ev_cuped's calendar halves): distribution-free "did users
    // move" with an EXACT two-sided binomial p — ties dropped, the
    // tail sum bounded by min(n+, n-) runs through the shared
    // Stirling lgamma (ln C(n,k) - n ln 2). The assumption-free
    // companion to stat_mcnemar's χ² on a continuous outcome.
    // The up/down/tie classification is exact-rational: value is
    // cent-quantized by the generator, so mean_post vs mean_pre is
    // decided by cross-multiplied LONG cent sums (s_post·c_pre vs
    // s_pre·c_post) — a float avg() would let summation order pick
    // the side of a true tie (one user flipped at the sf30 flush).
    "stat_sign_test" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .withColumn("day", expr("ts div 86400000000000"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .localCheckpoint(eager = false) // bounds + the per-user halves
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val diffs = ud.crossJoin(broadcast(bounds))
          .withColumn("post",
            (col("day") >= expr("(mn + mx + 1) div 2")).cast("long"))
          .groupBy("user_id")
          .agg(sum(when(col("post") === 0, col("cents"))).as("s_pre"),
               count(when(col("post") === 0, lit(1))).as("c_pre"),
               sum(when(col("post") === 1, col("cents"))).as("s_post"),
               count(when(col("post") === 1, lit(1))).as("c_post"))
          .filter(col("c_pre") > 0 && col("c_post") > 0 &&
            col("s_pre") * col("c_post") =!= col("s_post") * col("c_pre"))
        val cts = diffs.agg(
          sum(when(col("s_post") * col("c_pre") > col("s_pre") * col("c_post"),
            1L).otherwise(0L)).as("n_up"),
          sum(when(col("s_post") * col("c_pre") < col("s_pre") * col("c_post"),
            1L).otherwise(0L)).as("n_down"))
          .withColumn("n", col("n_up") + col("n_down"))
          .withColumn("kmin", least(col("n_up"), col("n_down")))
        val terms = cts
          .withColumn("k", explode(sequence(lit(0L), col("kmin"))))
          .withColumn("lp",
            lfCol(col("n").cast("double")) - lfCol(col("k").cast("double")) -
            lfCol((col("n") - col("k")).cast("double")) -
            col("n") * lit(math.log(2.0)))
        terms.groupBy("n_up", "n_down", "n")
          .agg(sum(exp(col("lp"))).as("tail"))
          .select(col("n_up"), col("n_down"),
            when(col("n") > 0,
              round(least(lit(2.0) * col("tail"), lit(1.0)), 6)).as("p_exact"))
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
              |         ts // 86400000000000 AS day
              |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
              |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
              |ud AS (SELECT user_id,
              |         sum(CASE WHEN day < (mn + mx + 1) // 2 THEN cents END) AS s_pre,
              |         count(CASE WHEN day < (mn + mx + 1) // 2 THEN 1 END) AS c_pre,
              |         sum(CASE WHEN day >= (mn + mx + 1) // 2 THEN cents END) AS s_post,
              |         count(CASE WHEN day >= (mn + mx + 1) // 2 THEN 1 END) AS c_post
              |       FROM ev, b GROUP BY user_id),
              |df AS (SELECT * FROM ud WHERE c_pre > 0 AND c_post > 0
              |       AND s_pre * c_post <> s_post * c_pre),
              |ct AS (SELECT
              |         CAST(sum(CASE WHEN s_post * c_pre > s_pre * c_post
              |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
              |         CAST(sum(CASE WHEN s_post * c_pre < s_pre * c_post
              |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_down
              |       FROM df),
              |nn AS (SELECT *, n_up + n_down AS n, least(n_up, n_down) AS kmin
              |       FROM ct),
              |tm AS (SELECT *,
              |         ${sqlLf("n")} - ${sqlLf("k")} - ${sqlLf("n - k")}
              |           - n * ln(2.0) AS lp
              |       FROM (SELECT *, CAST(unnest(generate_series(0, kmin)) AS BIGINT) AS k
              |             FROM nn))
              |SELECT n_up, n_down,
              |       CASE WHEN n > 0
              |            THEN round(least(2.0 * sum(exp(lp)), 1.0), 6)
              |       END AS p_exact
              |FROM tm GROUP BY n_up, n_down, n""".stripMargin)),

    // binomial overdispersion check of daily conversion: Pearson
    // dispersion φ = Σ(x_d − n_d·p̂)²/(n_d·p̂(1−p̂)) / (D−1) over the
    // per-day (active users, converted users) rollup — φ ≈ 1 means
    // the binomial z-tests upstream are honest, φ >> 1 means
    // clustered conversions and understated error bars. One DISTINCT
    // per-(day,user) pass; everything after is |days| arithmetic.
    "stat_overdispersion" -> Q(
      (s, d) => {
        val du = Tables.events(s, d)
          .groupBy(expr("ts div 86400000000000").as("day"), col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val daily = du.groupBy("day")
          .agg(count(lit(1)).cast("double").as("n"),
               sum("conv").cast("double").as("x"))
          .localCheckpoint(eager = false) // pooled rate + the sum
        val pool = daily.agg((sum("x") / sum("n")).as("p"),
          count(lit(1)).cast("double").as("dd"))
        daily.crossJoin(broadcast(pool))
          .filter(col("p") > 0 && col("p") < 1 && col("dd") > 1)
          .agg(max("dd").cast("long").as("n_days"),
               round(max("p"), 6).as("p_pool"),
               round(sum(pow(col("x") - col("n") * col("p"), 2)
                 / (col("n") * col("p") * (lit(1.0) - col("p"))))
                 / (max("dd") - 1), 4).as("phi"))
          .withColumn("overdispersed", (col("phi") > 1.5).cast("long"))
      },
      Some("""WITH du AS (
             |  SELECT ts // 86400000000000 AS day, user_id,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY 1, 2),
             |daily AS (SELECT day, CAST(count(*) AS DOUBLE) AS n,
             |                 CAST(sum(conv) AS DOUBLE) AS x
             |          FROM du GROUP BY day),
             |pool AS (SELECT sum(x) / sum(n) AS p,
             |                CAST(count(*) AS DOUBLE) AS dd
             |         FROM daily),
             |ag AS (SELECT CAST(max(dd) AS BIGINT) AS n_days,
             |              round(max(p), 6) AS p_pool,
             |              round(sum((x - n*p)*(x - n*p) / (n*p*(1.0 - p)))
             |                    / (max(dd) - 1), 4) AS phi
             |       FROM daily, pool
             |       WHERE p > 0 AND p < 1 AND dd > 1)
             |SELECT n_days, p_pool, phi,
             |       CAST(CASE WHEN phi > 1.5 THEN 1 ELSE 0 END AS BIGINT)
             |         AS overdispersed
             |FROM ag""".stripMargin)),

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
      }),

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
             |ORDER BY cook DESC, day""".stripMargin)),

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
             |FROM cw""".stripMargin))
  )

  val statsQD: Seq[(String, Q)] = Seq(
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
             |FROM cells, tot""".stripMargin)),

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
             |FROM f""".stripMargin))
  )

  val statsQE: Seq[(String, Q)] = Seq(
    // Exact two-sided binomial test of the md5 arm split against the
    // designed 1/2 — the small-n-honest companion to ev_srm's χ²
    // gate (χ² is asymptotic; a 40-user segment needs the exact
    // tail). Support 0..n as a DISTRIBUTED spark.range (the
    // stat_fisher_exact altitude: a one-row sequence() would put n
    // elements on one task at production user counts); every term
    // closed-form through the shared Stirling lgamma so both engines
    // sum the identical tree. Two-sided by "all outcomes no more
    // likely than observed" with the 1e-7 log-slack absorbing ulp.
    "stat_binom_test" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val cts = Tables.events(s, d)
          .select(col("user_id"),
            (md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
              .as("arm")).distinct()
          .agg(count(lit(1)).as("n"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("k"))
          .withColumn("lobs",
            lfCol(col("n").cast("double")) - lfCol(col("k").cast("double"))
              - lfCol((col("n") - col("k")).cast("double"))
              + col("n") * math.log(0.5))
          .localCheckpoint(eager = false) // bound read + term join
        val row = cts.select(col("n")).collect()(0)
        val nU = if (row.isNullAt(0)) -1L else row.getLong(0)
        s.range(0L, nU + 1L).toDF("i")
          .crossJoin(broadcast(cts))
          .withColumn("lpi",
            lfCol(col("n").cast("double")) - lfCol(col("i").cast("double"))
              - lfCol((col("n") - col("i")).cast("double"))
              + col("n") * math.log(0.5))
          .groupBy("n", "k")
          .agg(round(sum(when(col("lpi") <= col("lobs") + 1e-7,
            exp(col("lpi"))).otherwise(0.0)), 6).as("p_two_sided"))
          .select(col("n").as("n_users"), col("k").as("k_arm1"),
            round(col("k") / col("n").cast("double"), 4).as("p_hat"),
            col("p_two_sided"))
      },
      Some(s"""WITH u AS (
              |  SELECT DISTINCT user_id,
              |         ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm
              |  FROM events),
              |ct AS (SELECT CAST(count(*) AS BIGINT) AS n,
              |              CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k
              |       FROM u),
              |ob AS (SELECT *, ${sqlLf("n")} - ${sqlLf("k")} - ${sqlLf("n - k")}
              |                 + n * ln(0.5) AS lobs
              |       FROM ct),
              |tm AS (SELECT *, ${sqlLf("n")} - ${sqlLf("i")} - ${sqlLf("n - i")}
              |                 + n * ln(0.5) AS lpi
              |       FROM (SELECT *, CAST(unnest(generate_series(0, n)) AS BIGINT) AS i
              |             FROM ob))
              |SELECT n AS n_users, k AS k_arm1,
              |       round(k / CAST(n AS DOUBLE), 4) AS p_hat,
              |       round(sum(CASE WHEN lpi <= lobs + 1e-7
              |                      THEN exp(lpi) ELSE 0.0 END), 6) AS p_two_sided
              |FROM tm GROUP BY n, k""".stripMargin)),

    // Cochran's Q across the three funnel actions (view, click,
    // purchase) as within-subject binary treatments — "is the user a
    // HEAVY (≥13-event) doer of the action", since bare incidence
    // saturates (every active user does all three at least once):
    // do the three actions have the same heavy-usage rate, accounting
    // for the fact that the SAME users generate all three columns (a
    // χ² on pooled counts would ignore that pairing — McNemar
    // generalized to k=3). ONE per-user conditional rollup; Q and its
    // exact even-df survival exp(-Q/2) (df = k-1 = 2) from integer
    // sums only — no double accumulation anywhere before the final
    // division.
    "stat_cochran_q" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            (sum(when(col("event_type") === "view", 1L).otherwise(0L)) >= 13)
              .cast("long").as("t1"),
            (sum(when(col("event_type") === "click", 1L).otherwise(0L)) >= 13)
              .cast("long").as("t2"),
            (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 13)
              .cast("long").as("t3"))
          .withColumn("r", col("t1") + col("t2") + col("t3"))
        u.agg(count(lit(1)).as("n_users"),
            sum("t1").as("c1"), sum("t2").as("c2"), sum("t3").as("c3"),
            sum("r").as("t"), sum(col("r") * col("r")).as("r2"))
          .withColumn("num",
            lit(2L) * (lit(3L) * (col("c1") * col("c1") + col("c2") * col("c2")
              + col("c3") * col("c3")) - col("t") * col("t")))
          .withColumn("den", lit(3L) * col("t") - col("r2"))
          .select(col("n_users"), col("c1").as("n_view"),
            col("c2").as("n_click"), col("c3").as("n_purchase"),
            when(col("den") > 0,
              round(col("num") / col("den").cast("double"), 4)).as("q_stat"),
            when(col("den") > 0,
              round(exp(-col("num") / col("den").cast("double") / 2.0), 6))
              .as("p_value"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |           >= 13 AS BIGINT) AS t1,
             |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |           >= 13 AS BIGINT) AS t2,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |           >= 13 AS BIGINT) AS t3
             |  FROM events GROUP BY 1),
             |r AS (SELECT *, t1 + t2 + t3 AS r FROM u),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |             CAST(sum(t1) AS BIGINT) AS c1,
             |             CAST(sum(t2) AS BIGINT) AS c2,
             |             CAST(sum(t3) AS BIGINT) AS c3,
             |             CAST(sum(r) AS BIGINT) AS t,
             |             CAST(sum(r * r) AS BIGINT) AS r2
             |      FROM r),
             |q AS (SELECT *,
             |        2 * (3 * (c1*c1 + c2*c2 + c3*c3) - t*t) AS num,
             |        3 * t - r2 AS den
             |      FROM a)
             |SELECT n_users, c1 AS n_view, c2 AS n_click, c3 AS n_purchase,
             |       CASE WHEN den > 0
             |            THEN round(num / CAST(den AS DOUBLE), 4) END AS q_stat,
             |       CASE WHEN den > 0
             |            THEN round(exp(-num / CAST(den AS DOUBLE) / 2.0), 6)
             |       END AS p_value
             |FROM q""".stripMargin)),

    // Lin's concordance correlation between two [0,1] length scores
    // that CLAIM the same scale (chars/1000 vs tokens*5/1000 — the
    // ~5-chars-per-token rule of thumb): Pearson r says they co-vary;
    // CCC additionally penalizes the location/scale bias between
    // them — the right statistic when two scorers claim to measure
    // the SAME trait. Exact integer micro-unit sums (the
    // stat_cronbach round-11 altitude): CCC = 2(n·Sxy − SxSy) /
    // ((n·Sxx − Sx²) + (n·Syy − Sy²) + (Sx − Sy)²) is computed
    // entirely on exact integers, so the result is bitwise stable
    // under any partition merge order.
    "stat_lin_ccc" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val it = Tables.documents(s, d).select(
          round(least(col("n_chars") / 1000.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("x"),
          round(least(size(graft.text.TextPrimitives.tokens(col("text")))
            * 5.0 / 1000.0, lit(1.0)) * 1e6, 0)
            .cast("long").as("y"))
        it.agg(count(lit(1)).as("n_docs"),
            sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
            sum((col("x") * col("x")).cast(dec)).as("qx"),
            sum((col("y") * col("y")).cast(dec)).as("qy"),
            sum((col("x") * col("y")).cast(dec)).as("qxy"))
          .select(col("n_docs"),
            (col("n_docs") * col("qx") - col("sx") * col("sx"))
              .cast("double").as("ux"),
            (col("n_docs") * col("qy") - col("sy") * col("sy"))
              .cast("double").as("uy"),
            (lit(2) * (col("n_docs") * col("qxy") - col("sx") * col("sy")))
              .cast("double").as("uxy"),
            ((col("sx") - col("sy")) * (col("sx") - col("sy")))
              .cast("double").as("dd"))
          .select(col("n_docs"),
            when(col("ux") > 0 && col("uy") > 0,
              round(col("uxy") / (lit(2.0) * sqrt(col("ux") * col("uy"))), 4))
              .as("pearson_r"),
            when(col("ux") + col("uy") + col("dd") > 0,
              round(col("uxy") / (col("ux") + col("uy") + col("dd")), 4))
              .as("lin_ccc"))
      },
      Some("""WITH it AS (
             |  SELECT CAST(round(least(n_chars / 1000.0, 1.0) * 1e6) AS BIGINT) AS x,
             |         CAST(round(least(len(regexp_split_to_array(lower(trim(text)),
             |           '\s+')) * 5.0 / 1000.0, 1.0) * 1e6) AS BIGINT) AS y
             |  FROM documents),
             |a AS (SELECT count(*) AS n_docs,
             |             sum(x) AS sx, sum(y) AS sy,
             |             sum(x*x) AS qx, sum(y*y) AS qy, sum(x*y) AS qxy
             |      FROM it),
             |u AS (SELECT n_docs,
             |             CAST(n_docs*qx - sx*sx AS DOUBLE) AS ux,
             |             CAST(n_docs*qy - sy*sy AS DOUBLE) AS uy,
             |             CAST(2 * (n_docs*qxy - sx*sy) AS DOUBLE) AS uxy,
             |             CAST((sx - sy) * (sx - sy) AS DOUBLE) AS dd
             |      FROM a)
             |SELECT CAST(n_docs AS BIGINT) AS n_docs,
             |       CASE WHEN ux > 0 AND uy > 0
             |            THEN round(uxy / (2.0 * sqrt(ux * uy)), 4)
             |       END AS pearson_r,
             |       CASE WHEN ux + uy + dd > 0
             |            THEN round(uxy / (ux + uy + dd), 4)
             |       END AS lin_ccc
             |FROM u""".stripMargin)),

    // Closed-form 2-feature ridge regression per source — token count
    // on (chars, distinct tokens), λ = 0.1·n so the shrinkage is
    // row-count invariant (the same λ' per observation at any SF):
    // β = (X'X + λI)⁻¹X'y on the CENTERED within-group Gram via the
    // explicit 2×2 adjugate. Reported next to the OLS slopes so the
    // collinearity-driven shrinkage is visible (chars and vocabulary
    // size are strongly correlated — OLS inflates, ridge tames). ONE
    // grouped pass of exact-in-double integer sums (the stat_ols_fit
    // altitude). (Round 11: z was the punctuation count, constant 0
    // on this corpus — swapped for a feature that varies.)
    "stat_ridge_fit" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select(col("source"),
          col("n_chars").cast("double").as("x"),
          size(array_distinct(graft.text.TextPrimitives.tokens(col("text"))))
            .cast("double").as("z"),
          size(graft.text.TextPrimitives.tokens(col("text")))
            .cast("double").as("y"))
        val g = base.groupBy("source")
          .agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("z").as("sz"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("z") * col("z")).as("szz"),
            sum(col("x") * col("z")).as("sxz"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("z") * col("y")).as("szy"))
          .withColumn("dxx", col("sxx") - col("sx") * col("sx") / col("n"))
          .withColumn("dzz", col("szz") - col("sz") * col("sz") / col("n"))
          .withColumn("dxz", col("sxz") - col("sx") * col("sz") / col("n"))
          .withColumn("dxy", col("sxy") - col("sx") * col("sy") / col("n"))
          .withColumn("dzy", col("szy") - col("sz") * col("sy") / col("n"))
          .withColumn("lam", col("n") * 0.1)
        val det0 = col("dxx") * col("dzz") - col("dxz") * col("dxz")
        val detR = (col("dxx") + col("lam")) * (col("dzz") + col("lam")) -
          col("dxz") * col("dxz")
        g.select(col("source"), col("n").cast("long").as("n_docs"),
            when(det0 > 0, round(
              (col("dzz") * col("dxy") - col("dxz") * col("dzy")) / det0, 6))
              .as("ols_chars"),
            when(det0 > 0, round(
              (col("dxx") * col("dzy") - col("dxz") * col("dxy")) / det0, 6))
              .as("ols_vocab"),
            when(detR > 0, round(
              ((col("dzz") + col("lam")) * col("dxy")
                - col("dxz") * col("dzy")) / detR, 6)).as("ridge_chars"),
            when(detR > 0, round(
              ((col("dxx") + col("lam")) * col("dzy")
                - col("dxz") * col("dxy")) / detR, 6)).as("ridge_vocab"))
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT source, CAST(n_chars AS DOUBLE) AS x,
             |         CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)),
             |           '\s+'))) AS DOUBLE) AS z,
             |         CAST(len(regexp_split_to_array(lower(trim(text)),
             |           '\s+')) AS DOUBLE) AS y
             |  FROM documents),
             |g AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
             |             sum(x) AS sx, sum(z) AS sz, sum(y) AS sy,
             |             sum(x*x) AS sxx, sum(z*z) AS szz, sum(x*z) AS sxz,
             |             sum(x*y) AS sxy, sum(z*y) AS szy
             |      FROM b GROUP BY 1),
             |c AS (SELECT source, n,
             |             sxx - sx*sx/n AS dxx, szz - sz*sz/n AS dzz,
             |             sxz - sx*sz/n AS dxz, sxy - sx*sy/n AS dxy,
             |             szy - sz*sy/n AS dzy, n * 0.1 AS lam
             |      FROM g),
             |dt AS (SELECT *, dxx*dzz - dxz*dxz AS det0,
             |              (dxx + lam)*(dzz + lam) - dxz*dxz AS detr
             |       FROM c)
             |SELECT source, CAST(n AS BIGINT) AS n_docs,
             |       CASE WHEN det0 > 0
             |            THEN round((dzz*dxy - dxz*dzy) / det0, 6) END AS ols_chars,
             |       CASE WHEN det0 > 0
             |            THEN round((dxx*dzy - dxz*dxy) / det0, 6) END AS ols_vocab,
             |       CASE WHEN detr > 0
             |            THEN round(((dzz + lam)*dxy - dxz*dzy) / detr, 6)
             |       END AS ridge_chars,
             |       CASE WHEN detr > 0
             |            THEN round(((dxx + lam)*dzy - dxz*dxy) / detr, 6)
             |       END AS ridge_vocab
             |FROM dt ORDER BY source""".stripMargin)),

    // Method-of-moments Gamma fit of per-user same-type interarrival
    // times — the parametric traffic model behind ev_interarrival's
    // histogram and ev_bot_flags' CV heuristic: shape k < 1 means
    // bursty (heavier than exponential), k ≈ 1 memoryless, k > 1
    // regular. Gaps land as INTEGER seconds (nanos DIV 1e9), so the
    // per-type Σg and Σg² are exact integer sums (decimal/HUGEINT)
    // and k = S²/(nQ−S²), θ = (nQ−S²)/(nS) are single end divisions —
    // merge-order proof. One lag window per (user,type), one rollup.
    "stat_gamma_fit" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val gaps = Tables.events(s, d)
          .withColumn("prev", lag("ts", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("event_type"),
            expr("(ts - prev) div 1000000000").as("g"))
          .filter(col("g") > 0)
        gaps.groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            sum(col("g").cast(dec)).as("sg"),
            sum((col("g") * col("g")).cast(dec)).as("qg"))
          .select(col("event_type"), col("n_gaps"),
            (col("n_gaps") * col("qg") - col("sg") * col("sg"))
              .cast("double").as("u"),
            col("sg").cast("double").as("sgd"), col("n_gaps").as("n"))
          .select(col("event_type"), col("n_gaps"),
            round(col("sgd") / col("n"), 2).as("mean_gap_s"),
            when(col("u") > 0,
              round(col("sgd") * col("sgd") / col("u"), 4)).as("shape_k"),
            when(col("u") > 0 && col("sgd") > 0,
              round(col("u") / (col("n").cast("double") * col("sgd")), 2))
              .as("scale_theta_s"))
          .orderBy("event_type")
      },
      Some("""WITH gp AS (
             |  SELECT event_type,
             |         (ts - lag(ts, 1) OVER (PARTITION BY user_id, event_type
             |            ORDER BY ts, event_id)) // 1000000000 AS g
             |  FROM events),
             |gaps AS (SELECT event_type, g FROM gp WHERE g > 0),
             |a AS (SELECT event_type, count(*) AS n, sum(g) AS sg,
             |             sum(g * g) AS qg
             |      FROM gaps GROUP BY 1),
             |u AS (SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
             |             CAST(n*qg - sg*sg AS DOUBLE) AS u,
             |             CAST(sg AS DOUBLE) AS sgd, CAST(n AS DOUBLE) AS nd
             |      FROM a)
             |SELECT event_type, n_gaps,
             |       round(sgd / nd, 2) AS mean_gap_s,
             |       CASE WHEN u > 0 THEN round(sgd * sgd / u, 4) END AS shape_k,
             |       CASE WHEN u > 0 AND sgd > 0
             |            THEN round(u / (nd * sgd), 2) END AS scale_theta_s
             |FROM u ORDER BY event_type""".stripMargin)),

    // Continuous power-law tail exponent of per-user activity
    // (Clauset–Shalizi–Newman MLE at fixed xmin = 5):
    // α = 1 + n_tail / Σ ln(x/xmin) — the one-number heavy-tail
    // summary graph_degree_dist's histogram and ev_pareto's share
    // only gesture at (α ≤ 2 ⇒ infinite mean: plan for whales). The
    // per-user ln terms are pinned to integer micro-units before the
    // sum (exact decimal/HUGEINT accumulation — the stat_cronbach
    // altitude applied to a transcendental), so the MLE is bitwise
    // reproducible; plus the Hill-style SE α−1/√n.
    "stat_powerlaw_alpha" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val tail = Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("x"))
          .filter(col("x") >= 5)
          .select(round(log(col("x") / 5.0) * 1e6, 0).cast("long").as("lx"))
        tail.agg(count(lit(1)).as("n_tail"),
            sum(col("lx").cast(dec)).as("sl"))
          .select(col("n_tail"),
            col("sl").cast("double").as("sld"), col("n_tail").as("n"))
          .select(col("n_tail"), lit(5L).as("xmin"),
            when(col("sld") > 0,
              round(lit(1.0) + col("n") * 1e6 / col("sld"), 4)).as("alpha"),
            when(col("sld") > 0,
              round((col("n") * 1e6 / col("sld")) / sqrt(col("n")), 4))
              .as("alpha_se"))
      },
      Some("""WITH ua AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |tl AS (SELECT CAST(round(ln(x / 5.0) * 1e6) AS BIGINT) AS lx
             |       FROM ua WHERE x >= 5),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n_tail, sum(lx) AS sl
             |      FROM tl),
             |u AS (SELECT n_tail, CAST(sl AS DOUBLE) AS sld,
             |             CAST(n_tail AS DOUBLE) AS nd
             |      FROM a)
             |SELECT n_tail, CAST(5 AS BIGINT) AS xmin,
             |       CASE WHEN sld > 0
             |            THEN round(1.0 + nd * 1e6 / sld, 4) END AS alpha,
             |       CASE WHEN sld > 0
             |            THEN round((nd * 1e6 / sld) / sqrt(nd), 4)
             |       END AS alpha_se
             |FROM u""".stripMargin)),

    // Many-to-one comparisons vs the reference language: Welch z of
    // every lang's doc length against 'en' with Bonferroni-adjusted
    // two-sided p — the Dunnett-style "which locales differ from the
    // flagship corpus" report (Bonferroni in place of Dunnett's
    // tabulated critical values keeps both engines closed-form while
    // staying conservative). Group moments from ONE exact-integer
    // grouped pass; the control row is a broadcast 1-row join; p via
    // the shared A&S erf polynomial.
    "stat_vs_control" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val g = Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast(dec)).as("sx"),
            sum((col("n_chars") * col("n_chars")).cast(dec)).as("qx"))
          .select(col("lang"), col("n"),
            (col("sx").cast("double") / col("n")).as("m"),
            when(col("n") > 1,
              (col("n") * col("qx") - col("sx") * col("sx")).cast("double")
                / (col("n").cast("double") * (col("n") - 1))).as("v"))
          .localCheckpoint(eager = false) // control row + treatment rows
        val ctrl = g.filter(col("lang") === "en")
          .select(col("n").as("nc"), col("m").as("mc"), col("v").as("vc"))
        val k = g.agg(count(lit(1)).as("k"))
        val se2 = col("v") / col("n") + col("vc") / col("nc")
        val z = (col("m") - col("mc")) / sqrt(se2)
        val xx = abs(z) / math.sqrt(2.0)
        val t1 = lit(1.0) / (lit(1.0) + lit(0.3275911) * xx)
        val praw = t1 * (lit(0.254829592) + t1 * (lit(-0.284496736)
          + t1 * (lit(1.421413741) + t1 * (lit(-1.453152027)
          + t1 * lit(1.061405429))))) * exp(-xx * xx)
        g.filter(col("lang") =!= "en")
          .crossJoin(broadcast(ctrl)).crossJoin(broadcast(k))
          .select(col("lang"), col("n").as("n_docs"),
            round(col("m") - col("mc"), 2).as("mean_diff"),
            when(se2 > 0, round(z, 4)).as("welch_z"),
            when(se2 > 0, round(least(lit(1.0), praw * (col("k") - 1)), 6))
              .as("p_bonf"))
          .orderBy("lang")
      },
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |         sum(n_chars) AS sx, sum(n_chars * n_chars) AS qx
             |  FROM documents GROUP BY 1),
             |m AS (SELECT lang, n, CAST(sx AS DOUBLE) / n AS m,
             |             CASE WHEN n > 1 THEN CAST(n*qx - sx*sx AS DOUBLE)
             |                  / (CAST(n AS DOUBLE) * (n - 1)) END AS v
             |      FROM g),
             |c AS (SELECT n AS nc, m AS mc, v AS vc FROM m WHERE lang = 'en'),
             |k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM m),
             |z AS (SELECT lang, n, m.m, m.v, nc, mc, vc, k.k,
             |             v / n + vc / nc AS se2,
             |             (m.m - mc) / sqrt(v / n + vc / nc) AS z
             |      FROM m, c, k WHERE lang <> 'en'),
             |p AS (SELECT *, abs(z) / sqrt(2.0) AS xx,
             |             1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)) AS t1
             |      FROM z)
             |SELECT lang, n AS n_docs, round(m - mc, 2) AS mean_diff,
             |       CASE WHEN se2 > 0 THEN round(z, 4) END AS welch_z,
             |       CASE WHEN se2 > 0 THEN round(least(1.0,
             |         t1 * (0.254829592 + t1 * (-0.284496736
             |           + t1 * (1.421413741 + t1 * (-1.453152027
             |           + t1 * 1.061405429)))) * exp(-xx*xx) * (k - 1)), 6)
             |       END AS p_bonf
             |FROM p ORDER BY lang""".stripMargin)),

    // Peaks-over-threshold GPD tail fit of the event value (method of
    // moments over the exceedances above the exact type-1 95th
    // percentile): ξ < 0 bounded tail, ξ ≈ 0 exponential, ξ > 0
    // power-law — THE extreme-value summary behind "what will the
    // worst day cost" capacity planning, beside stat_gumbel's
    // block-maxima view. Values are exact 2dp (cents as BIGINT), the
    // percentile is an inverse-CDF walk over the DISTINCT cents
    // histogram (the stat_mwu values-never-rows bound), and all GPD
    // moments come from exact integer Σy/Σy² — merge-order proof.
    "stat_gpd_tail" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val cents = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")))
          .select(round(col("value") * 100, 0).cast("long").as("c"))
          .localCheckpoint(eager = false) // histogram + exceedances
        val h = cents.groupBy("c").agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
        val tot = h.agg(sum("cnt").as("n"))
        val u = h.withColumn("cum", sum("cnt").over(w))
          .crossJoin(broadcast(tot))
          .filter(col("cum") >= expr("(95 * n + 99) div 100"))
          .agg(min("c").as("u"))
        val ex = cents.crossJoin(broadcast(u))
          .filter(col("c") > col("u"))
          .select((col("c") - col("u")).as("y"), col("u"))
        ex.groupBy("u")
          .agg(count(lit(1)).as("n_exceed"),
            sum(col("y").cast(dec)).as("sy"),
            sum((col("y") * col("y")).cast(dec)).as("qy"))
          .select(round(col("u") / 100.0, 2).as("threshold"),
            col("n_exceed"),
            col("sy").cast("double").as("syd"),
            (col("n_exceed") * col("qy") - col("sy") * col("sy"))
              .cast("double").as("v"), col("n_exceed").as("n"))
          .select(col("threshold"), col("n_exceed"),
            round(col("syd") / col("n") / 100.0, 4).as("mean_excess"),
            when(col("v") > 0, round(lit(0.5) * (lit(1.0)
              - col("syd") * col("syd") / col("v")), 4)).as("xi"),
            when(col("v") > 0, round(lit(0.5) * (col("syd") / col("n"))
              * (lit(1.0) + col("syd") * col("syd") / col("v")) / 100.0, 4))
              .as("sigma"))
      },
      Some("""WITH cents AS (
             |  SELECT CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             |h AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt
             |      FROM cents GROUP BY 1),
             |cum AS (SELECT c, sum(cnt) OVER (ORDER BY c
             |          ROWS UNBOUNDED PRECEDING) AS cum
             |        FROM h),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
             |u AS (SELECT min(c) AS u FROM cum, tot
             |      WHERE cum >= (95 * n + 99) // 100),
             |ex AS (SELECT c - u AS y, u FROM cents, u WHERE c > u),
             |a AS (SELECT u, count(*) AS n, sum(y) AS sy, sum(y * y) AS qy
             |      FROM ex GROUP BY 1),
             |m AS (SELECT round(u / 100.0, 2) AS threshold,
             |             CAST(n AS BIGINT) AS n_exceed,
             |             CAST(sy AS DOUBLE) AS syd,
             |             CAST(n*qy - sy*sy AS DOUBLE) AS v,
             |             CAST(n AS DOUBLE) AS nd
             |      FROM a)
             |SELECT threshold, n_exceed,
             |       round(syd / nd / 100.0, 4) AS mean_excess,
             |       CASE WHEN v > 0
             |            THEN round(0.5 * (1.0 - syd * syd / v), 4) END AS xi,
             |       CASE WHEN v > 0
             |            THEN round(0.5 * (syd / nd)
             |                 * (1.0 + syd * syd / v) / 100.0, 4)
             |       END AS sigma
             |FROM m""".stripMargin)),

    // Two-component Gaussian mixture EM on the doc-length histogram
    // (3 unrolled iterations): is the corpus ONE length population or
    // a short/long blend (boilerplate vs articles)? E-step
    // responsibilities per DISTINCT length value; M-step moments as
    // EXACT integer micro-unit sums (the stat_cronbach altitude), so
    // every iteration is merge-order-proof and the Spark driver loop
    // and the DuckDB unrolled-CTE chain follow bit-identical
    // trajectories (params re-rounded to 4/6dp between iterations —
    // the ts_holt_linear pinning idiom). Corpus-scale work is ONE
    // value-histogram aggregate; the EM runs on ≤|distinct lengths|
    // rows driver-side (the graph_pagerank bounded-collect altitude —
    // the histogram is bounded by the length domain, not the corpus).
    "stat_mixture_em" -> Q(
      (s, d) => {
        import s.implicits._
        val h = Tables.documents(s, d).filter(col("n_chars").isNotNull)
          .groupBy(col("n_chars").cast("long").as("x"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        def r4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
        def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
        if (h.isEmpty) {
          Seq.empty[(Long, Double, Double, Double, Double, Double, Double)]
            .toDF("n_docs", "w1", "mu1", "sigma1", "mu2", "sigma2",
              "separation")
        } else {
          val n = h.map(_._2).sum
          def pct(p: Long): Long = {
            val tgt = (p * n + 99) / 100
            var cum = 0L
            h.find { case (_, c) => { cum += c; cum >= tgt } }.get._1
          }
          val sS = h.map { case (x, c) => x * c }.sum
          val qS = h.map { case (x, c) => x * x * c }.sum
          var mu1 = pct(25).toDouble
          var mu2 = pct(75).toDouble
          val v0 = r4((n.toDouble * qS - sS.toDouble * sS) / (n.toDouble * n))
          var v1 = v0; var v2 = v0; var w1 = 0.5
          for (_ <- 1 to 3) {
            var t1s = 0L; var u1s = 0L; var vt1s = 0L
            var t2s = 0L; var u2s = 0L; var vt2s = 0L
            h.foreach { case (xl, c) =>
              val x = xl.toDouble
              val e1 = math.exp(-(x - mu1) * (x - mu1) / (2 * v1)) / math.sqrt(v1)
              val e2 = math.exp(-(x - mu2) * (x - mu2) / (2 * v2)) / math.sqrt(v2)
              val den = w1 * e1 + (1 - w1) * e2
              val r1 = if (den > 0) r6(w1 * e1 / den) else 0.5
              val t1 = math.floor(c * r1 * 1e6 + 0.5).toLong
              val u1 = math.floor(c * r1 * x * 1e6 + 0.5).toLong
              val vt1 = math.floor(c * r1 * x * x * 1e6 + 0.5).toLong
              t1s += t1; u1s += u1; vt1s += vt1
              t2s += c * 1000000L - t1
              u2s += c * xl * 1000000L - u1
              vt2s += c * xl * xl * 1000000L - vt1
            }
            if (t1s > 0 && t2s > 0) {
              w1 = r6(t1s.toDouble / (1e6 * n))
              mu1 = r4(u1s.toDouble / t1s)
              v1 = r4(vt1s.toDouble / t1s - mu1 * mu1)
              mu2 = r4(u2s.toDouble / t2s)
              v2 = r4(vt2s.toDouble / t2s - mu2 * mu2)
            }
          }
          val sep =
            if (v1 > 0 && v2 > 0) r4((mu2 - mu1) / math.sqrt((v1 + v2) / 2))
            else Double.NaN
          Seq((n, w1, mu1,
            if (v1 > 0) r4(math.sqrt(v1)) else Double.NaN,
            mu2, if (v2 > 0) r4(math.sqrt(v2)) else Double.NaN, sep))
            .toDF("n_docs", "w1", "mu1", "sigma1", "mu2", "sigma2",
              "separation")
        }
      },
      Some {
        // one EM iteration: pK (params) -> p{K+1}, via responsibilities
        // rounded to 6dp and integer micro-unit moment sums
        def iter(k: Int): String = {
          val p = s"p${k - 1}"
          s"""r$k AS (SELECT h.x, h.c, $p.w1, $p.mu1, $p.v1, $p.mu2, $p.v2,
             |  round($p.w1 * (exp(-(h.x - $p.mu1)*(h.x - $p.mu1)/(2*$p.v1))/sqrt($p.v1))
             |    / ($p.w1 * (exp(-(h.x - $p.mu1)*(h.x - $p.mu1)/(2*$p.v1))/sqrt($p.v1))
             |       + (1 - $p.w1) * (exp(-(h.x - $p.mu2)*(h.x - $p.mu2)/(2*$p.v2))/sqrt($p.v2))), 6) AS r1
             |  FROM h, $p),
             |t$k AS (SELECT x, c,
             |  CAST(round(c * r1 * 1e6) AS BIGINT) AS t1,
             |  CAST(round(c * r1 * x * 1e6) AS BIGINT) AS u1,
             |  CAST(round(c * r1 * x * x * 1e6) AS BIGINT) AS vt1
             |  FROM r$k),
             |q$k AS (SELECT sum(t1) AS t1s, sum(u1) AS u1s, sum(vt1) AS vt1s,
             |  sum(c * 1000000 - t1) AS t2s,
             |  sum(c * x * 1000000 - u1) AS u2s,
             |  sum(c * x * x * 1000000 - vt1) AS vt2s,
             |  sum(c) AS n FROM t$k),
             |p$k AS (SELECT
             |  round(CAST(t1s AS DOUBLE) / (1e6 * n), 6) AS w1,
             |  round(CAST(u1s AS DOUBLE) / t1s, 4) AS mu1,
             |  round(CAST(vt1s AS DOUBLE) / t1s
             |        - round(CAST(u1s AS DOUBLE) / t1s, 4)
             |          * round(CAST(u1s AS DOUBLE) / t1s, 4), 4) AS v1,
             |  round(CAST(u2s AS DOUBLE) / t2s, 4) AS mu2,
             |  round(CAST(vt2s AS DOUBLE) / t2s
             |        - round(CAST(u2s AS DOUBLE) / t2s, 4)
             |          * round(CAST(u2s AS DOUBLE) / t2s, 4), 4) AS v2
             |  FROM q$k)""".stripMargin
        }
        s"""WITH h AS MATERIALIZED (
           |  SELECT CAST(n_chars AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS c
           |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
           |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           |              CAST(sum(x * c) AS BIGINT) AS s,
           |              CAST(sum(x * x * c) AS BIGINT) AS q
           |       FROM h),
           |cm AS (SELECT x, sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
           |         AS cum FROM h),
           |p0 AS (SELECT
           |  0.5 AS w1,
           |  CAST((SELECT min(x) FROM cm, nn WHERE cum >= (25*n+99)//100) AS DOUBLE) AS mu1,
           |  (SELECT round(CAST(n*q - s*s AS DOUBLE)/(CAST(n AS DOUBLE)*n), 4) FROM nn) AS v1,
           |  CAST((SELECT min(x) FROM cm, nn WHERE cum >= (75*n+99)//100) AS DOUBLE) AS mu2,
           |  (SELECT round(CAST(n*q - s*s AS DOUBLE)/(CAST(n AS DOUBLE)*n), 4) FROM nn) AS v2),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)}
           |SELECT nn.n AS n_docs, p3.w1, p3.mu1,
           |       round(sqrt(p3.v1), 4) AS sigma1,
           |       p3.mu2, round(sqrt(p3.v2), 4) AS sigma2,
           |       round((p3.mu2 - p3.mu1) / sqrt((p3.v1 + p3.v2) / 2), 4)
           |         AS separation
           |FROM p3, nn""".stripMargin
      }),

    // Logistic regression by 3 unrolled IRLS Newton steps — the
    // workhorse classifier, fit DISTRIBUTED: P(doc is English) on
    // (scaled length, letter-'e' fraction — the classic one-letter
    // langid signal) — the language prior a router would use before
    // the full n-gram langid pass. Each step is ONE
    // map-side-combinable aggregate of the 9 weighted cross-moments
    // (every per-row term pinned to integer micro-units before the
    // exact decimal/HUGEINT sum — the stat_cronbach altitude), then a
    // closed-form 3×3 Cramer solve on the 1-row result; β re-rounded
    // to 6dp between steps so the Spark chain and the DuckDB unrolled
    // CTEs follow bit-identical trajectories. No collect anywhere —
    // three passes over the corpus, exactly what IRLS costs at
    // 100 TB. Deviance-free output: β̂ plus the fitted base rate.
    "stat_logistic_irls" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val docs = Tables.documents(s, d)
        val f = docs
          .select((col("n_chars") / 1000.0).as("x1"),
            ((length(col("text")) - length(regexp_replace(col("text"), "e", "")))
              / greatest(length(col("text")), lit(1)).cast("double")).as("x2"),
            when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
          .localCheckpoint(eager = false) // one read per IRLS step
        var params = f.sparkSession.range(1).select(
          lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"),
          lit(0L).as("n"))
        for (_ <- 1 to 3) {
          val z = col("b0") + col("b1") * col("x1") + col("b2") * col("x2")
          val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
          def mi(e: Column, nm: String) =
            sum(round(e * 1e6, 0).cast("long").cast(dec)).as(nm)
          val it = f.crossJoin(broadcast(params))
            .withColumn("p", p)
            .withColumn("w", col("p") * (lit(1.0) - col("p")))
            .withColumn("r", col("y") - col("p"))
          val q = it.agg(
            count(lit(1)).as("n"),
            mi(col("w"), "a00"), mi(col("w") * col("x1"), "a01"),
            mi(col("w") * col("x2"), "a02"),
            mi(col("w") * col("x1") * col("x1"), "a11"),
            mi(col("w") * col("x1") * col("x2"), "a12"),
            mi(col("w") * col("x2") * col("x2"), "a22"),
            mi(col("r"), "g0"), mi(col("r") * col("x1"), "g1"),
            mi(col("r") * col("x2"), "g2"),
            max("b0").as("b0"), max("b1").as("b1"), max("b2").as("b2"))
          def dv(c: String) = (col(c).cast("double") / 1e6)
          val (a00, a01, a02) = (dv("a00"), dv("a01"), dv("a02"))
          val (a11, a12, a22) = (dv("a11"), dv("a12"), dv("a22"))
          val (g0, g1, g2) = (dv("g0"), dv("g1"), dv("g2"))
          val det = a00 * (a11 * a22 - a12 * a12) -
            a01 * (a01 * a22 - a12 * a02) + a02 * (a01 * a12 - a11 * a02)
          val d0 = g0 * (a11 * a22 - a12 * a12) -
            a01 * (g1 * a22 - a12 * g2) + a02 * (g1 * a12 - a11 * g2)
          val d1 = a00 * (g1 * a22 - g2 * a12) -
            g0 * (a01 * a22 - a12 * a02) + a02 * (a01 * g2 - g1 * a02)
          val d2 = a00 * (a11 * g2 - a12 * g1) -
            a01 * (a01 * g2 - g1 * a02) + g0 * (a01 * a12 - a11 * a02)
          params = q.select(
            when(abs(det) > 1e-12, round(col("b0") + d0 / det, 6))
              .otherwise(col("b0")).as("b0"),
            when(abs(det) > 1e-12, round(col("b1") + d1 / det, 6))
              .otherwise(col("b1")).as("b1"),
            when(abs(det) > 1e-12, round(col("b2") + d2 / det, 6))
              .otherwise(col("b2")).as("b2"),
            col("n"))
        }
        val zf = col("b0") + col("b1") * col("x1") + col("b2") * col("x2")
        f.crossJoin(broadcast(params))
          .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-zf)), 6))
          .groupBy("b0", "b1", "b2", "n")
          .agg(round(sum(round(col("p") * 1e6, 0).cast("long").cast(dec))
            .cast("double") / 1e6 / max("n"), 4).as("fitted_rate"))
          .select(col("n").as("n_docs"), col("b0").as("beta0"),
            col("b1").as("beta_len"), col("b2").as("beta_efrac"),
            col("fitted_rate"))
      },
      Some {
        def iter(k: Int): String = {
          val p = s"p${k - 1}"
          s"""r$k AS (SELECT f.x1, f.x2, f.y,
             |  round(1.0 / (1.0 + exp(-($p.b0 + $p.b1 * f.x1 + $p.b2 * f.x2))), 6) AS p,
             |  $p.b0 AS b0, $p.b1 AS b1, $p.b2 AS b2
             |  FROM f, $p),
             |t$k AS (SELECT b0, b1, b2, y - p AS r, p * (1.0 - p) AS w, x1, x2
             |  FROM r$k),
             |q$k AS (SELECT count(*) AS n,
             |  sum(CAST(round(w * 1e6) AS BIGINT)) AS a00,
             |  sum(CAST(round(w * x1 * 1e6) AS BIGINT)) AS a01,
             |  sum(CAST(round(w * x2 * 1e6) AS BIGINT)) AS a02,
             |  sum(CAST(round(w * x1 * x1 * 1e6) AS BIGINT)) AS a11,
             |  sum(CAST(round(w * x1 * x2 * 1e6) AS BIGINT)) AS a12,
             |  sum(CAST(round(w * x2 * x2 * 1e6) AS BIGINT)) AS a22,
             |  sum(CAST(round(r * 1e6) AS BIGINT)) AS g0,
             |  sum(CAST(round(r * x1 * 1e6) AS BIGINT)) AS g1,
             |  sum(CAST(round(r * x2 * 1e6) AS BIGINT)) AS g2,
             |  max(b0) AS b0, max(b1) AS b1, max(b2) AS b2
             |  FROM t$k),
             |s$k AS (SELECT n, b0, b1, b2,
             |  CAST(a00 AS DOUBLE)/1e6 AS a00, CAST(a01 AS DOUBLE)/1e6 AS a01,
             |  CAST(a02 AS DOUBLE)/1e6 AS a02, CAST(a11 AS DOUBLE)/1e6 AS a11,
             |  CAST(a12 AS DOUBLE)/1e6 AS a12, CAST(a22 AS DOUBLE)/1e6 AS a22,
             |  CAST(g0 AS DOUBLE)/1e6 AS g0, CAST(g1 AS DOUBLE)/1e6 AS g1,
             |  CAST(g2 AS DOUBLE)/1e6 AS g2
             |  FROM q$k),
             |p$k AS (SELECT n,
             |  CASE WHEN abs(a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |                + a02*(a01*a12 - a11*a02)) > 1e-12
             |       THEN round(b0 + (g0*(a11*a22 - a12*a12)
             |              - a01*(g1*a22 - a12*g2) + a02*(g1*a12 - a11*g2))
             |            / (a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |               + a02*(a01*a12 - a11*a02)), 6)
             |       ELSE b0 END AS b0,
             |  CASE WHEN abs(a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |                + a02*(a01*a12 - a11*a02)) > 1e-12
             |       THEN round(b1 + (a00*(g1*a22 - g2*a12)
             |              - g0*(a01*a22 - a12*a02) + a02*(a01*g2 - g1*a02))
             |            / (a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |               + a02*(a01*a12 - a11*a02)), 6)
             |       ELSE b1 END AS b1,
             |  CASE WHEN abs(a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |                + a02*(a01*a12 - a11*a02)) > 1e-12
             |       THEN round(b2 + (a00*(a11*g2 - a12*g1)
             |              - a01*(a01*g2 - g1*a02) + g0*(a01*a12 - a11*a02))
             |            / (a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
             |               + a02*(a01*a12 - a11*a02)), 6)
             |       ELSE b2 END AS b2
             |  FROM s$k)"""
        }
        s"""WITH f AS MATERIALIZED (
           |  SELECT d.n_chars / 1000.0 AS x1,
           |         (length(d.text) - length(replace(d.text, 'e', '')))
           |           / CAST(greatest(length(d.text), 1) AS DOUBLE) AS x2,
           |         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
           |  FROM documents d),
           |p0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)},
           |ff AS (SELECT f.*, p3.*,
           |  round(1.0 / (1.0 + exp(-(p3.b0 + p3.b1 * f.x1 + p3.b2 * f.x2))), 6) AS p
           |  FROM f, p3)
           |SELECT CAST(max(n) AS BIGINT) AS n_docs,
           |       max(b0) AS beta0, max(b1) AS beta_len,
           |       max(b2) AS beta_efrac,
           |       round(CAST(sum(CAST(round(p * 1e6) AS BIGINT)) AS DOUBLE)
           |             / 1e6 / max(n), 4) AS fitted_rate
           |FROM ff""".stripMargin
      }),

    // Holm step-down multiple-testing correction over the same
    // per-metric Welch z family stat_fdr BH-adjusts: padj_i =
    // cummax_j≤i min(1, (m−j+1)·p_j) — controls FWER (strictly
    // stronger than BH's FDR) with NO independence assumption, the
    // right gate when any single false positive is expensive. All
    // windows run on the ≤|event types| rollup (stat_fdr's bound).
    "stat_holm" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")) &&
                  col("event_type").isNotNull)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("event_type")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
               avg(when(col("arm") === 1, col("value"))).as("m_t"),
               avg(when(col("arm") === 0, col("value"))).as("m_c"),
               var_samp(when(col("arm") === 1, col("value"))).as("v_t"),
               var_samp(when(col("arm") === 0, col("value"))).as("v_c"))
          .withColumn("se2", col("v_t") / col("n_t") + col("v_c") / col("n_c"))
          .withColumn("z",
            when(col("n_t") < 2 || col("n_c") < 2 || col("se2") <= 0.0,
                 lit(null).cast("double"))
              .otherwise(round((col("m_t") - col("m_c")) / sqrt(col("se2")), 6)))
          .withColumn("x", abs(col("z")) / sqrt(lit(2.0)))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("x")))
          .withColumn("p",
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              col("t1") * (lit(0.254829592) + col("t1") * (lit(-0.284496736)
                + col("t1") * (lit(1.421413741) + col("t1") * (lit(-1.453152027)
                + col("t1") * lit(1.061405429)))))
              * exp(-col("x") * col("x")), 6)))
        val wR = Window.orderBy(col("p"), col("event_type"))
        val wAll = Window.partitionBy(lit(1))
        val wCum = wR.rowsBetween(Window.unboundedPreceding, 0)
        g.filter(col("p").isNotNull)
          .withColumn("rank", row_number().over(wR))
          .withColumn("m", count(lit(1)).over(wAll))
          .withColumn("step",
            round(least(lit(1.0), (col("m") - col("rank") + 1) * col("p")), 6))
          .withColumn("p_holm", round(max("step").over(wCum), 6))
          .select(col("event_type"), col("z"), col("p"),
            col("rank").cast("long").as("rank"), col("p_holm"),
            (col("p_holm") <= 0.05).cast("long").as("reject"))
          .orderBy("rank")
      },
      Some("""WITH e AS (
             |  SELECT event_type, value,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value) AND event_type IS NOT NULL),
             |g AS (
             |  SELECT event_type,
             |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |         avg(CASE WHEN arm = 1 THEN value END) AS m_t,
             |         avg(CASE WHEN arm = 0 THEN value END) AS m_c,
             |         var_samp(CASE WHEN arm = 1 THEN value END) AS v_t,
             |         var_samp(CASE WHEN arm = 0 THEN value END) AS v_c
             |  FROM e GROUP BY event_type),
             |z AS (SELECT *, v_t / n_t + v_c / n_c AS se2,
             |        CASE WHEN n_t < 2 OR n_c < 2 OR v_t / n_t + v_c / n_c <= 0.0
             |             THEN NULL
             |             ELSE round((m_t - m_c) / sqrt(v_t / n_t + v_c / n_c), 6)
             |        END AS z
             |      FROM g),
             |p AS (SELECT event_type, z,
             |        CASE WHEN z IS NULL THEN NULL ELSE round(
             |          (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |          * (0.254829592 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |            * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |              * (1.421413741 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |                * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |                  * 1.061405429))))
             |          * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0))), 6) END AS p
             |      FROM z WHERE z IS NOT NULL),
             |r AS (SELECT *, row_number() OVER (ORDER BY p, event_type) AS rank,
             |             count(*) OVER () AS m
             |      FROM p),
             |st AS (SELECT *, round(least(1.0, (m - rank + 1) * p), 6) AS step
             |       FROM r),
             |h AS (SELECT *, round(max(step) OVER (ORDER BY rank
             |               ROWS UNBOUNDED PRECEDING), 6) AS p_holm
             |      FROM st)
             |SELECT event_type, z, p, CAST(rank AS BIGINT) AS rank, p_holm,
             |       CAST(p_holm <= 0.05 AS BIGINT) AS reject
             |FROM h ORDER BY rank""".stripMargin)),

    // Fixed-effect inverse-variance meta-analysis of the per-language
    // vs-'en' length effects (stat_vs_control's family pooled into
    // ONE estimate): pooled Δ, its SE, Cochran's Q and the I²
    // heterogeneity share — "is there one cross-locale effect, or do
    // locales genuinely differ" (I² high ⇒ the pooled number is a
    // fiction). Group moments from the same exact-integer pass;
    // everything after is ≤|langs| arithmetic.
    "stat_meta_analysis" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val g = Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast(dec)).as("sx"),
            sum((col("n_chars") * col("n_chars")).cast(dec)).as("qx"))
          .filter(col("n") > 1)
          .select(col("lang"), col("n"),
            (col("sx").cast("double") / col("n")).as("m"),
            ((col("n") * col("qx") - col("sx") * col("sx")).cast("double")
              / (col("n").cast("double") * (col("n") - 1))).as("v"))
          .localCheckpoint(eager = false) // control row + effect rows
        val ctrl = g.filter(col("lang") === "en")
          .select(col("n").as("nc"), col("m").as("mc"), col("v").as("vc"))
        val eff = g.filter(col("lang") =!= "en")
          .crossJoin(broadcast(ctrl))
          .select(col("lang"),
            round(col("m") - col("mc"), 6).as("di"),
            round(col("v") / col("n") + col("vc") / col("nc"), 6).as("vi"))
          .filter(col("vi") > 0)
        val fe = eff.agg(count(lit(1)).as("k"),
          sum(lit(1.0) / col("vi")).as("sw"),
          sum(col("di") / col("vi")).as("swd"))
          .withColumn("pooled", col("swd") / col("sw"))
        eff.crossJoin(broadcast(fe))
          .agg(max("k").as("k"),
            round(max("pooled"), 4).as("pooled_diff"),
            round(lit(1.0) / sqrt(max("sw")), 4).as("pooled_se"),
            round(sum(pow(col("di") - col("pooled"), 2) / col("vi")), 4)
              .as("q_het"))
          .select(col("k").as("k_studies"), col("pooled_diff"),
            col("pooled_se"), col("q_het"),
            when(col("q_het") > 0, round(
              greatest(lit(0.0), (col("q_het") - (col("k") - 1))
                / col("q_het")), 4)).as("i2"))
      },
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |         sum(n_chars) AS sx, sum(n_chars * n_chars) AS qx
             |  FROM documents GROUP BY 1 HAVING count(*) > 1),
             |m AS (SELECT lang, n, CAST(sx AS DOUBLE) / n AS m,
             |             CAST(n*qx - sx*sx AS DOUBLE)
             |               / (CAST(n AS DOUBLE) * (n - 1)) AS v
             |      FROM g),
             |c AS (SELECT n AS nc, m AS mc, v AS vc FROM m WHERE lang = 'en'),
             |eff AS (SELECT lang, round(m.m - mc, 6) AS di,
             |               round(m.v / n + vc / nc, 6) AS vi
             |        FROM m, c WHERE lang <> 'en'),
             |ef AS (SELECT * FROM eff WHERE vi > 0),
             |fe AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |              sum(1.0 / vi) AS sw, sum(di / vi) AS swd
             |       FROM ef),
             |a AS (SELECT max(k) AS k,
             |             round(max(swd / sw), 4) AS pooled_diff,
             |             round(1.0 / sqrt(max(sw)), 4) AS pooled_se,
             |             round(sum(pow(di - swd / sw, 2) / vi), 4) AS q_het
             |      FROM ef, fe)
             |SELECT k AS k_studies, pooled_diff, pooled_se, q_het,
             |       CASE WHEN q_het > 0
             |            THEN round(greatest(0.0, (q_het - (k - 1)) / q_het), 4)
             |       END AS i2
             |FROM a""".stripMargin))
  )

  val statsQF: Seq[(String, Q)] = Seq(
    // Murphy decomposition of the Brier score for the same
    // out-of-sample source→P(en) prior stat_hosmer_lemeshow tests:
    // Brier = reliability − resolution + uncertainty over the p̂
    // bins — HL says WHETHER calibration fails, this says what the
    // forecast is worth (resolution) and how much of the error is
    // mis-calibration (reliability). p̂ is a 6dp ratio and y is 0/1,
    // so every sum is an exact micro-integer (the stat_cronbach
    // altitude); the identity is spec-pinned.
    "stat_brier_decomp" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val docs = Tables.documents(s, d)
        val half = md5Long(concat(lit("hl:"), col("doc_id").cast("string"))) % 2
        val prior = docs.filter(half === 0)
          .groupBy("source")
          .agg(round(sum(when(col("lang") === "en", 1L).otherwise(0L))
            / count(lit(1)).cast("double"), 6).as("phat"))
        val t = docs.filter(half === 1)
          .join(broadcast(prior), "source")
          .select(round(col("phat") * 1e6, 0).cast("long").as("pm"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
          .localCheckpoint(eager = false) // bin pass + global pass
        val bins = t.groupBy("pm")
          .agg(count(lit(1)).as("nb"), sum("y").as("yb"))
        val tot = t.agg(count(lit(1)).as("n"), sum("y").as("ny"),
          sum((col("pm") - col("y") * 1000000L)
            * (col("pm") - col("y") * 1000000L)).cast(dec).as("qb"))
        bins.crossJoin(broadcast(tot))
          .agg(max("n").as("n"), max("ny").as("ny"),
            max("qb").cast("double").as("qbd"),
            sum(col("nb")
              * pow(col("pm").cast("double") / 1e6
                - col("yb").cast("double") / col("nb"), 2)).as("rel"),
            sum(col("nb")
              * pow(col("yb").cast("double") / col("nb")
                - col("ny").cast("double") / col("n"), 2)).as("res"))
          .select(col("n").as("n_test"),
            round(col("qbd") / col("n") / 1e12, 6).as("brier"),
            round(col("rel") / col("n"), 6).as("reliability"),
            round(col("res") / col("n"), 6).as("resolution"),
            round((col("ny").cast("double") / col("n"))
              * (lit(1.0) - col("ny").cast("double") / col("n")), 6)
              .as("uncertainty"))
      },
      Some("""WITH prior AS (
             |  SELECT source,
             |         round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |               / CAST(count(*) AS DOUBLE), 6) AS phat
             |  FROM documents
             |  WHERE ('0x' || substr(md5('hl:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
             |  GROUP BY 1),
             |t AS MATERIALIZED (
             |  SELECT CAST(round(phat * 1e6) AS BIGINT) AS pm,
             |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents d JOIN prior USING (source)
             |  WHERE ('0x' || substr(md5('hl:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 1),
             |bins AS (SELECT pm, CAST(count(*) AS BIGINT) AS nb,
             |                CAST(sum(y) AS BIGINT) AS yb
             |         FROM t GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(y) AS BIGINT) AS ny,
             |               sum((pm - y * 1000000) * (pm - y * 1000000)) AS qb
             |        FROM t),
             |a AS (SELECT max(n) AS n, max(ny) AS ny,
             |             CAST(max(qb) AS DOUBLE) AS qbd,
             |             sum(nb * pow(CAST(pm AS DOUBLE) / 1e6
             |                   - CAST(yb AS DOUBLE) / nb, 2)) AS rel,
             |             sum(nb * pow(CAST(yb AS DOUBLE) / nb
             |                   - CAST(ny AS DOUBLE) / n, 2)) AS res
             |      FROM bins, tot)
             |SELECT n AS n_test,
             |       round(qbd / n / 1e12, 6) AS brier,
             |       round(rel / n, 6) AS reliability,
             |       round(res / n, 6) AS resolution,
             |       round((CAST(ny AS DOUBLE) / n)
             |             * (1.0 - CAST(ny AS DOUBLE) / n), 6) AS uncertainty
             |FROM a""".stripMargin)),

    // Page–Hinkley sequential drift detector on the daily event-count
    // series: PH_t = Σ_{s≤t}(x_s − μ − δ) minus its running minimum,
    // alarm when PH_t > λ = 3σ — the cumulative-deviation monitor that
    // fires on slow drifts 3σ-per-point rules (ts_seasonal) never see.
    // μ and σ come from exact integer power sums and are pinned to
    // 6dp; each term is then converted to integer micro-units BEFORE
    // the running sums, so both cumsum and running-min are pure
    // integer window arithmetic — no float accumulation order anywhere
    // (a double cumsum would be at the mercy of DuckDB's segment-tree
    // summation order). Windows run on the calendar-bounded day frame.
    "stat_page_hinkley" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.events(s, d)
          .groupBy(expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // moment pass + sequential scan
        val m = daily.agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("s1"),
            sum((col("x") * col("x")).cast(dec)).as("s2"))
          .select(
            round(col("s1").cast("double") / col("n"), 6).as("mu"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")) / col("n"), 6).as("sigma"))
          .select(col("mu"),
            round(col("sigma") * 0.05, 6).as("delta"),
            round(col("sigma") * 3.0, 6).as("lambda"))
          .select(col("lambda"),
            round((col("mu") + col("delta")) * 1e6, 0).cast("long").as("ref_u"))
        val wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        daily.crossJoin(broadcast(m))
          .withColumn("term_u", col("x") * 1000000L - col("ref_u"))
          .withColumn("cum_u", sum("term_u").over(wc))
          .withColumn("min_u", min("cum_u").over(wc))
          .withColumn("ph", round((col("cum_u") - col("min_u"))
            .cast("double") / 1e6, 4))
          .select(col("day"), col("x"), col("ph"),
            (col("ph") > col("lambda")).cast("long").as("alarm"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |mo AS (
             |  SELECT round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mu,
             |         round(sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x)
             |               AS DOUBLE)) / count(*), 6) AS sigma
             |  FROM daily),
             |cf AS (SELECT round(sigma * 3.0, 6) AS lambda,
             |              CAST(round((mu + round(sigma * 0.05, 6)) * 1e6)
             |                   AS BIGINT) AS ref_u
             |       FROM mo),
             |r AS (
             |  SELECT day, x,
             |         sum(x * 1000000 - ref_u) OVER (ORDER BY day
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u,
             |         lambda
             |  FROM daily, cf),
             |ph AS (
             |  SELECT day, x, lambda,
             |         round(CAST(cum_u - min(cum_u) OVER (ORDER BY day
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           AS DOUBLE) / 1e6, 4) AS ph
             |  FROM r)
             |SELECT day, x, ph, CAST(ph > lambda AS BIGINT) AS alarm
             |FROM ph ORDER BY day""".stripMargin)),

    // Grubbs max-normed-residual statistic per event type over the
    // daily-count series: G = max_t |x_t − x̄| / s with the argmax day
    // — "which single day is the biggest outlier, and how big" (the
    // one-shot companion to stat_esd's masking-proof peeling;
    // statistic-only like stat_bartlett — no hardcoded t-quantile).
    // x̄ and s are pinned to 6dp from exact integer power sums, the
    // per-day score to 6dp before the rank, so the argmax and its
    // smallest-day tie-break are engine-identical.
    "stat_grubbs" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(eager = false) // moment pass + score pass
        val mom = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("s1"),
            sum((col("x") * col("x")).cast(dec)).as("s2"))
          .filter(col("n") >= 3)
          .select(col("event_type"), col("n").as("n_days"),
            round(col("s1").cast("double") / col("n"), 6).as("mu"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
                .cast("double") / (col("n").cast("double") * (col("n") - 1))), 6)
              .as("sd"))
          .filter(col("sd") > 0)
        val wr = Window.partitionBy("event_type")
          .orderBy(col("g").desc, col("day"))
        daily.join(broadcast(mom), "event_type")
          .withColumn("g", round(abs(col("x") - col("mu")) / col("sd"), 6))
          .withColumn("rk", row_number().over(wr))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("n_days"), col("day").as("peak_day"),
            col("x").as("x_peak"), col("g").as("g_stat"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts // 86400000000000 AS day,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |mom AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |         round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mu,
             |         round(sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x)
             |               AS DOUBLE) / (CAST(count(*) AS DOUBLE) * (count(*) - 1))), 6) AS sd
             |  FROM daily GROUP BY event_type
             |  HAVING count(*) >= 3),
             |sc AS (
             |  SELECT d.event_type, m.n_days, d.day, d.x,
             |         round(abs(d.x - m.mu) / m.sd, 6) AS g,
             |         row_number() OVER (PARTITION BY d.event_type
             |           ORDER BY round(abs(d.x - m.mu) / m.sd, 6) DESC, d.day) AS rk
             |  FROM daily d JOIN mom m USING (event_type)
             |  WHERE m.sd > 0)
             |SELECT event_type, n_days, day AS peak_day, x AS x_peak,
             |       g AS g_stat
             |FROM sc WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // Hotelling T² two-sample test of (chars, tokens) jointly, en vs
    // de — the MULTIVARIATE welch: two features that are individually
    // "significant" can be one correlated effect, and T² is the test
    // that knows the difference. One conditional pass of exact integer
    // Gram sums per group; pooled covariance entries and the mean gap
    // are 6dp-pinned before the closed-form 2×2 inverse, so the
    // statistic is engine-identical. Statistic-only (no hardcoded F
    // quantile), like stat_bartlett.
    "stat_hotelling_t2" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        val g = Tables.documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .select(when(col("lang") === "en", 1L).otherwise(0L).as("g"),
            col("n_chars").as("x"), size(toks).cast("long").as("y"))
          .groupBy("g")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
            sum((col("x") * col("x")).cast(dec)).as("sxx"),
            sum((col("y") * col("y")).cast(dec)).as("syy"),
            sum((col("x") * col("y")).cast(dec)).as("sxy"))
          .localCheckpoint(eager = false) // both arms read below
        val a = g.filter(col("g") === 1).select(col("n").as("n1"),
          col("sx").as("sx1"), col("sy").as("sy1"), col("sxx").as("sxx1"),
          col("syy").as("syy1"), col("sxy").as("sxy1"))
        val b = g.filter(col("g") === 0).select(col("n").as("n2"),
          col("sx").as("sx2"), col("sy").as("sy2"), col("sxx").as("sxx2"),
          col("syy").as("syy2"), col("sxy").as("sxy2"))
        def css(n: Column, s2: Column, s1a: Column, s1b: Column) =
          (n * s2 - s1a * s1b).cast("double") / n.cast("double")
        a.crossJoin(b)
          .select(col("n1"), col("n2"),
            round((col("sx1").cast("double") / col("n1")
              - col("sx2").cast("double") / col("n2")), 6).as("dx"),
            round((col("sy1").cast("double") / col("n1")
              - col("sy2").cast("double") / col("n2")), 6).as("dy"),
            round((css(col("n1"), col("sxx1"), col("sx1"), col("sx1"))
              + css(col("n2"), col("sxx2"), col("sx2"), col("sx2")))
              / (col("n1") + col("n2") - 2).cast("double"), 6).as("pxx"),
            round((css(col("n1"), col("syy1"), col("sy1"), col("sy1"))
              + css(col("n2"), col("syy2"), col("sy2"), col("sy2")))
              / (col("n1") + col("n2") - 2).cast("double"), 6).as("pyy"),
            round((css(col("n1"), col("sxy1"), col("sx1"), col("sy1"))
              + css(col("n2"), col("sxy2"), col("sx2"), col("sy2")))
              / (col("n1") + col("n2") - 2).cast("double"), 6).as("pxy"))
          .withColumn("det",
            col("pxx") * col("pyy") - col("pxy") * col("pxy"))
          .select(col("n1"), col("n2"),
            when(col("det") > 0 && col("n1") > 1 && col("n2") > 1, round(
              (col("n1") * col("n2")).cast("double") / (col("n1") + col("n2"))
                * (col("dx") * col("dx") * col("pyy")
                   - lit(2.0) * col("dx") * col("dy") * col("pxy")
                   + col("dy") * col("dy") * col("pxx")) / col("det"), 4))
              .as("t2"))
          .withColumn("f_stat",
            round(col("t2") * (col("n1") + col("n2") - 3).cast("double")
              / (lit(2.0) * (col("n1") + col("n2") - 2)), 4))
      },
      Some(s"""WITH f AS (
             |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g,
             |         n_chars AS x,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
             |              AS BIGINT) AS y
             |  FROM documents WHERE lang IN ('en', 'de')),
             |gm AS (
             |  SELECT g, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             |         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
             |  FROM f GROUP BY g),
             |ab AS (
             |  SELECT a.n AS n1, b.n AS n2,
             |         round(CAST(a.sx AS DOUBLE) / a.n
             |               - CAST(b.sx AS DOUBLE) / b.n, 6) AS dx,
             |         round(CAST(a.sy AS DOUBLE) / a.n
             |               - CAST(b.sy AS DOUBLE) / b.n, 6) AS dy,
             |         round((CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE) / a.n
             |              + CAST(b.n * b.sxx - b.sx * b.sx AS DOUBLE) / b.n)
             |               / CAST(a.n + b.n - 2 AS DOUBLE), 6) AS pxx,
             |         round((CAST(a.n * a.syy - a.sy * a.sy AS DOUBLE) / a.n
             |              + CAST(b.n * b.syy - b.sy * b.sy AS DOUBLE) / b.n)
             |               / CAST(a.n + b.n - 2 AS DOUBLE), 6) AS pyy,
             |         round((CAST(a.n * a.sxy - a.sx * a.sy AS DOUBLE) / a.n
             |              + CAST(b.n * b.sxy - b.sx * b.sy AS DOUBLE) / b.n)
             |               / CAST(a.n + b.n - 2 AS DOUBLE), 6) AS pxy
             |  FROM (SELECT * FROM gm WHERE g = 1) a,
             |       (SELECT * FROM gm WHERE g = 0) b),
             |t AS (
             |  SELECT n1, n2,
             |         CASE WHEN pxx * pyy - pxy * pxy > 0 AND n1 > 1 AND n2 > 1
             |              THEN round(CAST(n1 * n2 AS DOUBLE) / (n1 + n2)
             |                * (dx * dx * pyy - 2.0 * dx * dy * pxy
             |                   + dy * dy * pxx)
             |                / (pxx * pyy - pxy * pxy), 4) END AS t2
             |  FROM ab)
             |SELECT n1, n2, t2,
             |       round(t2 * CAST(n1 + n2 - 3 AS DOUBLE)
             |             / (2.0 * (n1 + n2 - 2)), 4) AS f_stat
             |FROM t""".stripMargin)),

    // Bland–Altman agreement analysis of the two [0,1] length scores
    // stat_lin_ccc compares (chars/1000 vs tokens·5/1000): bias,
    // limits of agreement, and the share of docs outside them — the
    // method-comparison plot as a table ("do the scales agree, and
    // where do they break"). The per-doc difference is the INTEGER
    // chars − 5·tokens in milli-units, so every moment is exact; the
    // LoA bounds are pinned before the outside-count comparisons.
    "stat_bland_altman" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        val dm = Tables.documents(s, d)
          .select((col("n_chars") - lit(5L) * size(toks)).as("dm"))
          .localCheckpoint(eager = false) // moments + outside count
        val m = dm.agg(count(lit(1)).as("n"),
            sum(col("dm").cast(dec)).as("s1"),
            sum((col("dm") * col("dm")).cast(dec)).as("s2"))
          .select(col("n"),
            round(col("s1").cast("double") / col("n") / 1000.0, 6).as("bias"),
            round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")
              / (col("n").cast("double") * (col("n") - 1))) / 1000.0, 6)
              .as("sd"))
          .select(col("n"), col("bias"), col("sd"),
            round(col("bias") - col("sd") * 1.96, 6).as("loa_lo"),
            round(col("bias") + col("sd") * 1.96, 6).as("loa_hi"))
        dm.crossJoin(broadcast(m))
          .agg(first("n").as("n_docs"), first("bias").as("bias"),
            first("loa_lo").as("loa_lo"), first("loa_hi").as("loa_hi"),
            round(sum(when(col("dm").cast("double") / 1000.0 < col("loa_lo")
                || col("dm").cast("double") / 1000.0 > col("loa_hi"), 1L)
              .otherwise(0L)).cast("double") / count(lit(1)), 4)
              .as("pct_outside"))
      },
      Some(s"""WITH dm AS (
             |  SELECT n_chars - 5 * len(regexp_split_to_array(lower(trim(text)),
             |           '\\s+')) AS dm
             |  FROM documents),
             |m0 AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |         round(CAST(sum(dm) AS DOUBLE) / count(*) / 1000.0, 6) AS bias,
             |         round(sqrt(CAST(count(*) * sum(dm * dm) - sum(dm) * sum(dm)
             |               AS DOUBLE) / (CAST(count(*) AS DOUBLE) * (count(*) - 1)))
             |               / 1000.0, 6) AS sd
             |  FROM dm),
             |m AS (SELECT n, bias,
             |             round(bias - sd * 1.96, 6) AS loa_lo,
             |             round(bias + sd * 1.96, 6) AS loa_hi
             |      FROM m0)
             |SELECT m.n AS n_docs, m.bias, m.loa_lo, m.loa_hi,
             |       round(CAST(sum(CASE WHEN CAST(dm.dm AS DOUBLE) / 1000.0 < m.loa_lo
             |                    OR CAST(dm.dm AS DOUBLE) / 1000.0 > m.loa_hi
             |                    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
             |         AS pct_outside
             |FROM dm, m GROUP BY m.n, m.bias, m.loa_lo, m.loa_hi""".stripMargin)),

    // Youden J optimal operating point for the quality score as an
    // "is English" classifier — stat_roc_auc says HOW WELL the score
    // ranks; this says WHERE to cut it: the threshold maximizing
    // TPR − FPR off the same DISTINCT-value histogram (values, never
    // rows), with the smallest-threshold tie-break pinned. The number
    // a filtering pipeline actually configures.
    "stat_youden" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val t = graft.text.TextAnalytics.qualityScores(docs).drop("n_tok")
          .join(docs.select("doc_id", "lang"), "doc_id")
          .select(col("quality").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("g"))
        val h = t.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
        val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
        val r = h
          .withColumn("b1", coalesce(sum("n1x").over(w), lit(0L)))
          .withColumn("ba", coalesce(sum("nx").over(w), lit(0L)))
          .localCheckpoint(eager = false) // totals + per-threshold scan
        val tot = r.agg(sum("n1x").as("n1"),
          sum(col("nx") - col("n1x")).as("n2"))
        r.crossJoin(broadcast(tot))
          .select(col("x").as("threshold"),
            round((col("n1") - col("b1")).cast("double") / col("n1"), 6)
              .as("tpr"),
            round((col("n2") - (col("ba") - col("b1"))).cast("double")
              / col("n2"), 6).as("fpr"))
          .withColumn("j_stat", round(col("tpr") - col("fpr"), 6))
          .orderBy(col("j_stat").desc, col("threshold"))
          .limit(1)
      },
      Some(s"""WITH q0 AS (
              |  SELECT round((least(n_tok, 100) / 100.0) *
              |               (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
              |               (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS x,
              |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
              |  FROM (
              |    SELECT lang, length(text) AS n_chars,
              |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
              |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
              |               t -> t IN ($stopListSql))) AS stop_cnt,
              |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
              |    FROM documents)),
              |h AS (SELECT x, CAST(sum(g) AS BIGINT) AS n1x,
              |             CAST(count(*) AS BIGINT) AS nx FROM q0 GROUP BY x),
              |r AS (SELECT x, n1x, nx,
              |        CAST(coalesce(sum(n1x) OVER (ORDER BY x
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b1,
              |        CAST(coalesce(sum(nx) OVER (ORDER BY x
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ba
              |      FROM h),
              |tt AS (SELECT CAST(sum(n1x) AS BIGINT) AS n1,
              |              CAST(sum(nx - n1x) AS BIGINT) AS n2 FROM r),
              |j AS (
              |  SELECT x AS threshold,
              |         round(CAST(n1 - b1 AS DOUBLE) / n1, 6) AS tpr,
              |         round(CAST(n2 - (ba - b1) AS DOUBLE) / n2, 6) AS fpr
              |  FROM r, tt)
              |SELECT threshold, tpr, fpr,
              |       round(tpr - fpr, 6) AS j_stat
              |FROM j ORDER BY round(tpr - fpr, 6) DESC, threshold
              |LIMIT 1""".stripMargin)),

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

    // Benjamini–Yekutieli FDR control for the per-metric Welch z
    // family — BH (stat_fdr) assumes independence/PRDS; BY's harmonic
    // c(m) factor keeps FDR ≤ α under ARBITRARY dependence, the honest
    // choice when one experiment moves correlated metrics. c(m) is an
    // ordered list fold (identical sequential sum both engines,
    // 9dp-pinned); windows run on the ≤|event types| rollup.
    "stat_fdr_by" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val g = Tables.events(s, d)
          .filter(col("value").isNotNull && !isnan(col("value")) &&
                  col("event_type").isNotNull)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("event_type")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
               avg(when(col("arm") === 1, col("value"))).as("m_t"),
               avg(when(col("arm") === 0, col("value"))).as("m_c"),
               var_samp(when(col("arm") === 1, col("value"))).as("v_t"),
               var_samp(when(col("arm") === 0, col("value"))).as("v_c"))
          .withColumn("se2", col("v_t") / col("n_t") + col("v_c") / col("n_c"))
          .withColumn("z",
            when(col("n_t") < 2 || col("n_c") < 2 || col("se2") <= 0.0,
                 lit(null).cast("double"))
              .otherwise(round((col("m_t") - col("m_c")) / sqrt(col("se2")), 6)))
          .withColumn("xx", abs(col("z")) / sqrt(lit(2.0)))
          .withColumn("t1", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("xx")))
          .withColumn("p",
            when(col("z").isNull, lit(null).cast("double")).otherwise(round(
              col("t1") * (lit(0.254829592) + col("t1") * (lit(-0.284496736)
                + col("t1") * (lit(1.421413741) + col("t1") * (lit(-1.453152027)
                + col("t1") * lit(1.061405429)))))
              * exp(-col("xx") * col("xx")), 6)))
        val wR = Window.orderBy(col("p"), col("event_type"))
        val wAll = Window.partitionBy(lit(1))
        val wUp = Window.orderBy(col("rank").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        g.filter(col("p").isNotNull)
          .withColumn("rank", row_number().over(wR))
          .withColumn("m", count(lit(1)).over(wAll))
          .withColumn("cm", expr(
            "round(aggregate(sequence(1L, m), 0D, (a, i) -> a + 1.0 / i), 9)"))
          .withColumn("step",
            round(least(lit(1.0),
              col("cm") * col("m") * col("p") / col("rank")), 6))
          .withColumn("p_by", round(min("step").over(wUp), 6))
          .select(col("event_type"), col("z"), col("p"),
            col("rank").cast("long").as("rank"), col("p_by"),
            (col("p_by") <= 0.05).cast("long").as("reject"))
          .orderBy("rank")
      },
      Some("""WITH e AS (
             |  SELECT event_type, value,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
             |  FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value) AND event_type IS NOT NULL),
             |g AS (
             |  SELECT event_type,
             |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             |         avg(CASE WHEN arm = 1 THEN value END) AS m_t,
             |         avg(CASE WHEN arm = 0 THEN value END) AS m_c,
             |         var_samp(CASE WHEN arm = 1 THEN value END) AS v_t,
             |         var_samp(CASE WHEN arm = 0 THEN value END) AS v_c
             |  FROM e GROUP BY event_type),
             |z AS (SELECT *, v_t / n_t + v_c / n_c AS se2,
             |        CASE WHEN n_t < 2 OR n_c < 2 OR v_t / n_t + v_c / n_c <= 0.0
             |             THEN NULL
             |             ELSE round((m_t - m_c) / sqrt(v_t / n_t + v_c / n_c), 6)
             |        END AS z
             |      FROM g),
             |p AS (SELECT event_type, z,
             |        CASE WHEN z IS NULL THEN NULL ELSE round(
             |          (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |          * (0.254829592 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |            * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |              * (1.421413741 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |                * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))
             |                  * 1.061405429))))
             |          * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0))), 6) END AS p
             |      FROM z WHERE z IS NOT NULL),
             |r AS (SELECT *, row_number() OVER (ORDER BY p, event_type) AS rank,
             |             count(*) OVER () AS m
             |      FROM p),
             |cm AS (SELECT *, round(list_sum(list_transform(range(1, m + 1),
             |               i -> 1.0 / i)), 9) AS cm
             |       FROM r),
             |st AS (SELECT *, round(least(1.0, cm * m * p / rank), 6) AS step
             |       FROM cm),
             |h AS (SELECT *, round(min(step) OVER (ORDER BY rank DESC
             |               ROWS UNBOUNDED PRECEDING), 6) AS p_by
             |      FROM st)
             |SELECT event_type, z, p, CAST(rank AS BIGINT) AS rank, p_by,
             |       CAST(p_by <= 0.05 AS BIGINT) AS reject
             |FROM h ORDER BY rank""".stripMargin)),

    // Hash-quality audit for the md5 machinery every deterministic
    // split/arm/shard in this engine rides on: chi-square uniformity
    // of the md5-derived uniform over 1000 equal bins, with the
    // Wilson–Hilferty normal approximation for a p-value — if THIS
    // fails, every samp_hash_split/ab-arm result upstream is suspect.
    // Exact integer bin counts; the statistic is integer arithmetic
    // into one ratio.
    "stat_hash_uniformity" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val bins = Tables.orders(s, d)
          .select((pmod(md5Long(concat(lit("hu:"),
            col("o_orderkey").cast("string"))), lit(1000000)) / 1000)
            .cast("long").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("o"))
        bins.agg(sum(col("o")).as("n"), count(lit(1)).as("k"),
            sum((col("o") * col("o")).cast(dec)).as("q"),
            max(col("o")).as("mx"))
          .select(col("n"), col("k"),
            // χ² = Σ(o−e)²/e = K·Σo²/n − n over the FULL 1000-bin
            // spine; empty bins add (0−e)²/e = e each, i.e. the
            // identity still holds with K = 1000 even if k < 1000
            round(lit(1000.0) * col("q").cast("double")
              / col("n").cast("double") - col("n"), 4).as("chi2"),
            round(col("mx").cast("double")
              / (col("n").cast("double") / 1000.0) - 1.0, 4)
              .as("max_bin_excess"))
          .withColumn("wh_z", round(
            (pow(col("chi2") / 999.0, 1.0 / 3.0)
              - (lit(1.0) - lit(2.0) / (9.0 * 999.0)))
              / sqrt(lit(2.0) / (9.0 * 999.0)), 4))
          .select(col("n").as("n_keys"), col("chi2"), col("wh_z"),
            col("max_bin_excess"),
            (abs(col("wh_z")) <= 3.0).cast("long").as("uniform_ok"))
      },
      Some("""WITH b AS (
             |  SELECT (('0x' || substr(md5('hu:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
             |          % 1000000) // 1000 AS bin
             |  FROM orders),
             |c AS (SELECT bin, CAST(count(*) AS BIGINT) AS o FROM b GROUP BY bin),
             |a AS (SELECT CAST(sum(o) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             |             sum(o * o) AS q, CAST(max(o) AS BIGINT) AS mx
             |      FROM c),
             |s AS (SELECT n, k,
             |        round(1000.0 * CAST(q AS DOUBLE) / CAST(n AS DOUBLE) - n, 4) AS chi2,
             |        round(CAST(mx AS DOUBLE) / (CAST(n AS DOUBLE) / 1000.0) - 1.0, 4)
             |          AS max_bin_excess
             |      FROM a),
             |w AS (SELECT *, round((pow(chi2 / 999.0, 1.0 / 3.0)
             |               - (1.0 - 2.0 / (9.0 * 999.0)))
             |               / sqrt(2.0 / (9.0 * 999.0)), 4) AS wh_z
             |      FROM s)
             |SELECT n AS n_keys, chi2, wh_z, max_bin_excess,
             |       CAST(abs(wh_z) <= 3.0 AS BIGINT) AS uniform_ok
             |FROM w""".stripMargin)),

    // Poisson rate-ratio test of purchases per user between md5 arms
    // (counts, not values — ev_ab_test's mean-spend z can't see a
    // pure frequency effect): RR with the Wald CI on ln RR,
    // exposure-adjusted by arm user counts. Exact integer counts into
    // two lns; significant = CI excludes 1.
    "stat_poisson_ratio" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("x"))
        u.agg(
            sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("x1"),
            sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("x0"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"))
          .filter(col("x1") > 0 && col("x0") > 0)
          .select(col("x1"), col("x0"), col("n1"), col("n0"),
            round((col("x1").cast("double") / col("n1"))
              / (col("x0").cast("double") / col("n0")), 4).as("rate_ratio"),
            round(sqrt(lit(1.0) / col("x1") + lit(1.0) / col("x0")), 6)
              .as("se_lnrr"))
          .select(col("x1"), col("x0"), col("n1"), col("n0"),
            col("rate_ratio"),
            round(exp(log(col("rate_ratio")) - lit(1.96) * col("se_lnrr")), 4)
              .as("ci_lo"),
            round(exp(log(col("rate_ratio")) + lit(1.96) * col("se_lnrr")), 4)
              .as("ci_hi"))
          .withColumn("significant",
            (col("ci_lo") > 1.0 || col("ci_hi") < 1.0).cast("long"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |a AS (
             |  SELECT CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS x1,
             |         CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS x0,
             |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
             |  FROM u),
             |r AS (
             |  SELECT x1, x0, n1, n0,
             |         round((CAST(x1 AS DOUBLE) / n1)
             |               / (CAST(x0 AS DOUBLE) / n0), 4) AS rate_ratio,
             |         round(sqrt(1.0 / x1 + 1.0 / x0), 6) AS se_lnrr
             |  FROM a WHERE x1 > 0 AND x0 > 0)
             |SELECT x1, x0, n1, n0, rate_ratio,
             |       round(exp(ln(rate_ratio) - 1.96 * se_lnrr), 4) AS ci_lo,
             |       round(exp(ln(rate_ratio) + 1.96 * se_lnrr), 4) AS ci_hi,
             |       CAST(round(exp(ln(rate_ratio) - 1.96 * se_lnrr), 4) > 1.0
             |            OR round(exp(ln(rate_ratio) + 1.96 * se_lnrr), 4) < 1.0
             |            AS BIGINT) AS significant
             |FROM r""".stripMargin)),

    // 5-fold cross-validated ridge: tokens regressed on (chars,
    // distinct tokens) at λ = c·n_train for c ∈ {0.01, 0.1, 1} — the
    // missing model-SELECTION step behind stat_ridge_fit's fixed
    // λ = 0.1n. All nine Gram sums are exact integers per md5 fold;
    // each fold's TRAIN sums are total − fold (no second scan), the
    // closed-form 2×2 adjugate solves per (fold, c), and per-row
    // squared residuals are pinned to 1e-4 units so every CV-MSE is
    // an exact decimal sum. One grouped pass + one broadcast-join
    // eval pass.
    "stat_ridge_cv" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val dec = "decimal(38,0)"
        val toks = graft.text.TextPrimitives.tokens(col("text"))
        val base = Tables.documents(s, d)
          .select(
            (md5Long(concat(lit("cv:"), col("doc_id").cast("string"))) % 5)
              .as("f"),
            col("n_chars").as("x"),
            size(array_distinct(toks)).cast("long").as("z"),
            size(toks).cast("long").as("y"))
          .localCheckpoint(eager = false) // fold sums + the eval pass
        val folds = base.groupBy("f")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("sx"), sum(col("z").cast(dec)).as("sz"),
            sum(col("y").cast(dec)).as("sy"),
            sum((col("x") * col("x")).cast(dec)).as("sxx"),
            sum((col("z") * col("z")).cast(dec)).as("szz"),
            sum((col("x") * col("z")).cast(dec)).as("sxz"),
            sum((col("x") * col("y")).cast(dec)).as("sxy"),
            sum((col("z") * col("y")).cast(dec)).as("szy"))
          .localCheckpoint(eager = false) // totals + per-fold trains
        val tot = folds.agg(sum("n").as("tn"), sum("sx").as("tsx"),
          sum("sz").as("tsz"), sum("sy").as("tsy"), sum("sxx").as("tsxx"),
          sum("szz").as("tszz"), sum("sxz").as("tsxz"), sum("sxy").as("tsxy"),
          sum("szy").as("tszy"))
        val train = folds.crossJoin(broadcast(tot))
          .select(col("f"),
            (col("tn") - col("n")).cast("double").as("n"),
            (col("tsx") - col("sx")).cast("double").as("sx"),
            (col("tsz") - col("sz")).cast("double").as("sz"),
            (col("tsy") - col("sy")).cast("double").as("sy"),
            (col("tsxx") - col("sxx")).cast("double").as("sxx"),
            (col("tszz") - col("szz")).cast("double").as("szz"),
            (col("tsxz") - col("sxz")).cast("double").as("sxz"),
            (col("tsxy") - col("sxy")).cast("double").as("sxy"),
            (col("tszy") - col("szy")).cast("double").as("szy"))
          .withColumn("lc", explode(array(lit(0.01), lit(0.1), lit(1.0))))
          .withColumn("dxx", col("sxx") - col("sx") * col("sx") / col("n"))
          .withColumn("dzz", col("szz") - col("sz") * col("sz") / col("n"))
          .withColumn("dxz", col("sxz") - col("sx") * col("sz") / col("n"))
          .withColumn("dxy", col("sxy") - col("sx") * col("sy") / col("n"))
          .withColumn("dzy", col("szy") - col("sz") * col("sy") / col("n"))
          .withColumn("lam", col("lc") * col("n"))
          .withColumn("det", (col("dxx") + col("lam")) * (col("dzz") + col("lam"))
            - col("dxz") * col("dxz"))
          .select(col("f"), col("lc"),
            round(((col("dzz") + col("lam")) * col("dxy")
              - col("dxz") * col("dzy")) / col("det"), 6).as("b1"),
            round(((col("dxx") + col("lam")) * col("dzy")
              - col("dxz") * col("dxy")) / col("det"), 6).as("b2"),
            round(col("sx") / col("n"), 6).as("xb"),
            round(col("sz") / col("n"), 6).as("zb"),
            round(col("sy") / col("n"), 6).as("yb"))
        base.withColumn("lc", explode(array(lit(0.01), lit(0.1), lit(1.0))))
          .join(broadcast(train), Seq("f", "lc"))
          .withColumn("e", col("y") - (col("yb")
            + col("b1") * (col("x") - col("xb"))
            + col("b2") * (col("z") - col("zb"))))
          .groupBy("lc")
          .agg(count(lit(1)).as("n"),
            sum(round(col("e") * col("e") * 1e4, 0).cast(dec)).as("se"))
          .select(col("lc").as("lambda_c"),
            round(col("se").cast("double") / 1e4 / col("n"), 4).as("cv_mse"))
          .orderBy("lambda_c")
      },
      Some("""WITH b AS (
             |  SELECT ('0x' || substr(md5('cv:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS f,
             |         n_chars AS x,
             |         CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) AS z,
             |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS y
             |  FROM documents),
             |fs AS (
             |  SELECT f, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(z) AS sz,
             |         sum(y) AS sy, sum(x * x) AS sxx, sum(z * z) AS szz,
             |         sum(x * z) AS sxz, sum(x * y) AS sxy, sum(z * y) AS szy
             |  FROM b GROUP BY f),
             |t AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sz) AS tsz,
             |             sum(sy) AS tsy, sum(sxx) AS tsxx, sum(szz) AS tszz,
             |             sum(sxz) AS tsxz, sum(sxy) AS tsxy, sum(szy) AS tszy
             |      FROM fs),
             |lcs AS (SELECT CAST(unnest([0.01, 0.1, 1.0]) AS DOUBLE) AS lc),
             |tr0 AS (
             |  SELECT f, CAST(tn - n AS DOUBLE) AS n,
             |         CAST(tsx - sx AS DOUBLE) AS sx, CAST(tsz - sz AS DOUBLE) AS sz,
             |         CAST(tsy - sy AS DOUBLE) AS sy, CAST(tsxx - sxx AS DOUBLE) AS sxx,
             |         CAST(tszz - szz AS DOUBLE) AS szz, CAST(tsxz - sxz AS DOUBLE) AS sxz,
             |         CAST(tsxy - sxy AS DOUBLE) AS sxy, CAST(tszy - szy AS DOUBLE) AS szy
             |  FROM fs, t),
             |tr1 AS (
             |  SELECT f, lc,
             |         sxx - sx * sx / n AS dxx, szz - sz * sz / n AS dzz,
             |         sxz - sx * sz / n AS dxz, sxy - sx * sy / n AS dxy,
             |         szy - sz * sy / n AS dzy, lc * n AS lam,
             |         sx / n AS xb0, sz / n AS zb0, sy / n AS yb0
             |  FROM tr0, lcs),
             |tr AS (
             |  SELECT f, lc,
             |         round(((dzz + lam) * dxy - dxz * dzy)
             |               / ((dxx + lam) * (dzz + lam) - dxz * dxz), 6) AS b1,
             |         round(((dxx + lam) * dzy - dxz * dxy)
             |               / ((dxx + lam) * (dzz + lam) - dxz * dxz), 6) AS b2,
             |         round(xb0, 6) AS xb, round(zb0, 6) AS zb,
             |         round(yb0, 6) AS yb
             |  FROM tr1),
             |ev AS (
             |  SELECT tr.lc,
             |         CAST(round((b.y - (tr.yb + tr.b1 * (b.x - tr.xb)
             |           + tr.b2 * (b.z - tr.zb)))
             |           * (b.y - (tr.yb + tr.b1 * (b.x - tr.xb)
             |           + tr.b2 * (b.z - tr.zb))) * 1e4) AS HUGEINT) AS e2
             |  FROM b JOIN tr ON tr.f = b.f)
             |SELECT lc AS lambda_c,
             |       round(CAST(sum(e2) AS DOUBLE) / 1e4 / count(*), 4) AS cv_mse
             |FROM ev GROUP BY lc ORDER BY lambda_c""".stripMargin)),

    // Odds ratio of heavy-purchaser (≥13 purchases) incidence between
    // md5 arms with the Woolf log CI — THE reporting staple between
    // stat_fisher_exact's p-value and stat_breslow_day's
    // across-strata question: one 2×2 table, exact integer cells,
    // two lns.
    "stat_odds_ratio" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val u = Tables.events(s, d)
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .groupBy("user_id", "arm")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 13).cast("long").as("heavy"))
        u.agg(
            sum(when(col("arm") === 1 && col("heavy") === 1, 1L).otherwise(0L))
              .as("a"),
            sum(when(col("arm") === 1 && col("heavy") === 0, 1L).otherwise(0L))
              .as("b"),
            sum(when(col("arm") === 0 && col("heavy") === 1, 1L).otherwise(0L))
              .as("c"),
            sum(when(col("arm") === 0 && col("heavy") === 0, 1L).otherwise(0L))
              .as("dd"))
          .filter(col("a") > 0 && col("b") > 0 && col("c") > 0 && col("dd") > 0)
          .select(col("a"), col("b"), col("c"), col("dd").as("d"),
            round((col("a") * col("dd")).cast("double")
              / (col("b") * col("c")), 4).as("odds_ratio"),
            round(sqrt(lit(1.0) / col("a") + lit(1.0) / col("b")
              + lit(1.0) / col("c") + lit(1.0) / col("dd")), 6).as("se_lnor"))
          .select(col("a"), col("b"), col("c"), col("d"), col("odds_ratio"),
            round(exp(log(col("odds_ratio")) - lit(1.96) * col("se_lnor")), 4)
              .as("ci_lo"),
            round(exp(log(col("odds_ratio")) + lit(1.96) * col("se_lnor")), 4)
              .as("ci_hi"))
          .withColumn("significant",
            (col("ci_lo") > 1.0 || col("ci_hi") < 1.0).cast("long"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 13 AS BIGINT) AS heavy
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT CAST(sum(CASE WHEN arm = 1 AND heavy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |         CAST(sum(CASE WHEN arm = 1 AND heavy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |         CAST(sum(CASE WHEN arm = 0 AND heavy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |         CAST(sum(CASE WHEN arm = 0 AND heavy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM u),
             |r AS (
             |  SELECT a, b, c, d,
             |         round(CAST(a * d AS DOUBLE) / (b * c), 4) AS odds_ratio,
             |         round(sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d), 6) AS se_lnor
             |  FROM t WHERE a > 0 AND b > 0 AND c > 0 AND d > 0)
             |SELECT a, b, c, d, odds_ratio,
             |       round(exp(ln(odds_ratio) - 1.96 * se_lnor), 4) AS ci_lo,
             |       round(exp(ln(odds_ratio) + 1.96 * se_lnor), 4) AS ci_hi,
             |       CAST(round(exp(ln(odds_ratio) - 1.96 * se_lnor), 4) > 1.0
             |            OR round(exp(ln(odds_ratio) + 1.96 * se_lnor), 4) < 1.0
             |            AS BIGINT) AS significant
             |FROM r""".stripMargin))
  )

  val statsQG: Seq[(String, Q)] = Seq(
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
             |FROM p ORDER BY cooks_d DESC, doc_id LIMIT 10""".stripMargin))
  )

  val statsQ: Seq[(String, Q)] = statsQA ++ statsQB ++ statsQC ++ statsQD ++ statsQE ++ statsQF ++ statsQG
}
