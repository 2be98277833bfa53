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
private[graft] object QDedup {


  val dedup: Seq[(String, Q)] = {
    import graft.dedup.Dedup
    Seq(
      "dedup_exact" -> Q(
        (s, d) => Dedup.exact(Tables.documents(s, d)),
        Some("""SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id,
               |       CAST(count(*) AS BIGINT) AS n_dups
               |FROM documents GROUP BY h ORDER BY h""".stripMargin)),

      "dedup_ngram_jaccard" -> Q(
        (s, d) => Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25),
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db)
                |SELECT da, db, round(j, 4) AS jaccard FROM (
                |  SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |  FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |WHERE j >= 0.25 ORDER BY da, db""".stripMargin)),

      // exact-recall near-dup join via prefix filtering (PPJoin idea):
      // the oracle is BRUTE FORCE — passing hash-equal proves the
      // prefix filter loses nothing while joining only on rare tokens
      "dedup_prefix_filter" -> Q(
        (s, d) => Dedup.prefixFilterJaccard(docsUnder(s, d, 120), 0.7),
        Some("""WITH dt AS (
               |  SELECT DISTINCT doc_id, tok
               |  FROM (SELECT doc_id,
               |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
               |        FROM documents WHERE doc_id < 120)),
               |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS cnt FROM dt GROUP BY doc_id),
               |i AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS ni
               |      FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc_id < b.doc_id
               |      GROUP BY da, db)
               |SELECT da, db, round(j, 4) AS jaccard FROM (
               |  SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
               |  FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
               |WHERE j >= 0.7 ORDER BY da, db""".stripMargin)),

      // triangle count + transitivity of the near-dup pair graph (the
      // density audit that distinguishes tight dup cliques from
      // chained false positives). Edges are the ngram-Jaccard pairs;
      // each edge is ORIENTED away from its lower-(degree, id)
      // endpoint, so every triangle has exactly one pivot and wedge
      // fan-out is O(√|E|) per vertex — hub nodes never pivot, which
      // is what keeps the wedge join alive on power-law dup graphs.
      // The oracle counts the same triangles by the naive canonical
      // three-way self-join, proving orientation loses nothing.
      "graph_triangles" -> Q(
        (s, d) => {
          val e0 = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db")) // canonical: da < db, unique
            // four consumers (degrees, orientation, closure, count):
            // checkpoint so the shingle join runs ONCE, not per branch
            .localCheckpoint(eager = false)
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
          val wedges = or_.select(col("u"), col("w").as("v1"))
            .join(or_.select(col("u"), col("w").as("v2")), "u")
            .filter(col("v1") < col("v2"))
          val tri = wedges
            .join(e0, col("v1") === col("da") && col("v2") === col("db"))
            .agg(count(lit(1)).as("t"))
          val stats = deg.agg(count(lit(1)).as("n_nodes"),
            sum(col("dg") * (col("dg") - 1)).as("swd"))
          val ne = e0.agg(count(lit(1)).as("n_edges"))
          tri.crossJoin(broadcast(stats)).crossJoin(broadcast(ne))
            .select(col("n_nodes"), col("n_edges"), col("t").as("n_triangles"),
              when(col("swd").isNull || col("swd") === 0, lit(null).cast("double"))
                .otherwise(round(lit(6.0) * col("t") / col("swd"), 4))
                .as("transitivity"))
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
                |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
                |        FROM (SELECT da AS v FROM edges UNION ALL SELECT db AS v FROM edges)
                |        GROUP BY v),
                |tri AS (SELECT CAST(count(*) AS BIGINT) AS t
                |        FROM edges e1
                |        JOIN edges e2 ON e2.da = e1.da AND e2.db > e1.db
                |        JOIN edges e3 ON e3.da = e1.db AND e3.db = e2.db),
                |st AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                |              CAST(sum(dg * (dg - 1)) AS BIGINT) AS swd FROM deg),
                |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges)
                |SELECT n_nodes, n_edges, t AS n_triangles,
                |       CASE WHEN swd IS NULL OR swd = 0 THEN NULL
                |            ELSE round(6.0 * t / swd, 4) END AS transitivity
                |FROM tri, st, ne""".stripMargin)),

      // 2-core of the near-dup graph by 6 unrolled peeling rounds:
      // drop degree-<2 nodes, recompute, repeat — the standard
      // "strip the chains, keep the cliques" pass that separates
      // true dup clusters from chained false positives before
      // canonical-doc election. Each round is one degree aggregate +
      // two semi-joins on that round's CHECKPOINTED edge frame (the
      // shingle join runs once; rounds never rescan the corpus), so
      // a round costs O(|E_t|) shuffle — and |E_t| only shrinks.
      // Fixed rounds, not to-convergence: both engines run the same
      // 6 (the oracle unrolls them), so results match even if a long
      // chain is still mid-peel. Output = surviving nodes with their
      // in-core degree.
      "graph_kcore" -> Q(
        (s, d) => {
          var edges = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false)
          for (_ <- 1 to 6) {
            val keep = edges
              .select(explode(array(col("da"), col("db"))).as("v"))
              .groupBy("v").agg(count(lit(1)).as("dg"))
              .filter(col("dg") >= 2).select("v")
            edges = edges
              .join(keep.withColumnRenamed("v", "da"), Seq("da"), "left_semi")
              .join(keep.withColumnRenamed("v", "db"), Seq("db"), "left_semi")
              .localCheckpoint(eager = false) // read twice next round
          }
          edges.select(explode(array(col("da"), col("db"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("core_deg"))
            .orderBy("v")
        },
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db),
                |e0 AS MATERIALIZED (SELECT da, db FROM (
                |    SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |    FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |  WHERE j >= 0.25),
                |${kcoreIterSql(6, 2)}
                |SELECT v, CAST(count(*) AS BIGINT) AS core_deg
                |FROM (SELECT da AS v FROM e6 UNION ALL SELECT db AS v FROM e6)
                |GROUP BY v ORDER BY v""".stripMargin)),

      // LSH index quality audit: banded-MinHash candidate pairs scored
      // against the EXACT Jaccard truth set on a bounded subset —
      // precision/recall of the index itself, the audit that decides
      // band/row tuning before a full-corpus run. Pure composition of
      // two existing primitives + three 1-row aggregates. At sf0.01
      // the measured point (recall 0.18 at J≥0.25 under b=4, r=2,
      // s-curve midpoint ≈ 0.5) is the s-curve doing its job: this
      // config targets high-similarity pairs, and the audit is what
      // tells you to widen the bands before chasing looser dups
      "dedup_lsh_eval" -> Q(
        (s, d) => {
          val docs = docsUnder(s, d, 120)
          val cand = Dedup.minhashLshPairs(
            Dedup.minhashSignatures(docs, 5, 8), 8, 2)
          val truth = Dedup.ngramJaccard(docs, 5, 0.25).select(col("da"), col("db"))
          val hit = cand.join(truth, Seq("da", "db"), "left_semi")
          cand.agg(count(lit(1)).as("n_cand"))
            .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
            .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
            .select(col("n_cand"), col("n_truth"), col("n_hit"),
              when(col("n_cand") === 0, lit(null).cast("double"))
                .otherwise(round(col("n_hit") / col("n_cand"), 4)).as("prec"),
              when(col("n_truth") === 0, lit(null).cast("double"))
                .otherwise(round(col("n_hit") / col("n_truth"), 4)).as("recall"))
        },
        Some {
          val bandSelects = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""WITH sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 120")}),
             |bands AS ($bandSelects),
             |cand AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |         FROM bands a JOIN bands b2
             |           ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
             |s AS (
             |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
             |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
             |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
             |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db),
             |truth AS (SELECT da, db FROM (
             |  SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
             |  FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
             |  WHERE j >= 0.25),
             |m AS (SELECT (SELECT count(*) FROM cand) AS n_cand,
             |             (SELECT count(*) FROM truth) AS n_truth,
             |             (SELECT count(*) FROM cand JOIN truth USING (da, db)) AS n_hit)
             |SELECT CAST(n_cand AS BIGINT) AS n_cand,
             |       CAST(n_truth AS BIGINT) AS n_truth,
             |       CAST(n_hit AS BIGINT) AS n_hit,
             |       CASE WHEN n_cand = 0 THEN NULL
             |            ELSE round(n_hit * 1.0 / n_cand, 4) END AS prec,
             |       CASE WHEN n_truth = 0 THEN NULL
             |            ELSE round(n_hit * 1.0 / n_truth, 4) END AS recall
             |FROM m""".stripMargin
        }),

      // degree assortativity of the near-dup graph: Pearson r between
      // endpoint degrees over DIRECTED edge copies (the standard
      // undirected convention — each edge contributes both (du,dw)
      // and (dw,du)). Positive r = dup cliques of similar size link
      // to each other; strongly negative r = hub-and-spoke chains,
      // the signature of a boilerplate shingle bridging unrelated
      // docs. Degrees are a broadcast |V|-row table joined back onto
      // the checkpointed edge frame — the corpus-scale shingle join
      // runs ONCE; everything after is O(|E|) with no shuffle join.
      "graph_assort" -> Q(
        (s, d) => {
          val e0 = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            // three consumers (degrees, directed copies, edge count)
            .localCheckpoint(eager = false)
          val deg = e0.select(explode(array(col("da"), col("db"))).as("v"))
            .groupBy("v").agg(count(lit(1)).as("dg"))
          val dir = e0.select(col("da").as("u"), col("db").as("w"))
            .union(e0.select(col("db").as("u"), col("da").as("w")))
          dir
            .join(broadcast(deg.select(col("v").as("u"), col("dg").as("du"))), "u")
            .join(broadcast(deg.select(col("v").as("w"), col("dg").as("dw"))), "w")
            .agg(count(lit(1)).as("n_dir"),
                 corr(col("du").cast("double"), col("dw").cast("double")).as("r"))
            .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
            .select(col("n_nodes"), expr("n_dir div 2").as("n_edges"),
              when(col("r").isNull || isnan(col("r")), lit(null).cast("double"))
                .otherwise(round(col("r"), 4)).as("assortativity"))
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
                |        FROM (SELECT da AS v FROM e0 UNION ALL SELECT db AS v FROM e0)
                |        GROUP BY v),
                |dir AS (SELECT da AS u, db AS w FROM e0
                |        UNION ALL SELECT db AS u, da AS w FROM e0),
                |j AS (SELECT d1.dg AS du, d2.dg AS dw FROM dir
                |      JOIN deg d1 ON d1.v = dir.u JOIN deg d2 ON d2.v = dir.w),
                |a AS (SELECT CAST(count(*) AS BIGINT) AS n_dir,
                |             corr(CAST(du AS DOUBLE), CAST(dw AS DOUBLE)) AS r
                |      FROM j),
                |n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
                |SELECT n_nodes, n_dir // 2 AS n_edges,
                |       CASE WHEN r IS NULL OR isnan(r) THEN NULL
                |            ELSE round(r, 4) END AS assortativity
                |FROM a, n""".stripMargin)),

      // Adamic–Adar link prediction on the near-dup graph: for every
      // NON-adjacent pair sharing ≥1 neighbor, score Σ 1/ln(deg(z))
      // over common neighbors z — the "these two docs dup the same
      // things but not yet each other" candidates a curator reviews
      // before tightening the Jaccard threshold. Wedge self-join on
      // the checkpointed neighbor frame (pivot z is the join key, so
      // the shuffle partitions by pivot exactly as graph_triangles
      // does); deg(z) ≥ 2 for any wedge pivot, so ln is never 0. The
      // final TakeOrderedAndProject keeps only the top 20 — no
      // global sort at scale.
      "graph_adamic_adar" -> Q(
        (s, d) => {
          val e0 = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false) // nbr expansion + anti-join back
          val nb = e0.select(col("da").as("z"), col("db").as("x"))
            .union(e0.select(col("db").as("z"), col("da").as("x")))
            .localCheckpoint(eager = false) // wedge join reads it twice
          val deg = nb.groupBy("z").agg(count(lit(1)).as("dg"))
          nb.select(col("z"), col("x").as("u"))
            .join(nb.select(col("z"), col("x").as("v")), "z")
            .filter(col("u") < col("v"))
            .join(broadcast(deg), "z")
            .groupBy("u", "v")
            .agg(count(lit(1)).as("common"),
                 round(sum(lit(1.0) / log(col("dg").cast("double"))), 4).as("aa"))
            .join(e0, col("u") === col("da") && col("v") === col("db"), "left_anti")
            .orderBy(col("aa").desc, col("u"), col("v"))
            .limit(20)
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |nb AS (SELECT da AS z, db AS x FROM e0
                |       UNION ALL SELECT db AS z, da AS x FROM e0),
                |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS dg FROM nb GROUP BY z),
                |w AS (SELECT a.x AS u, b.x AS v, a.z
                |      FROM nb a JOIN nb b ON a.z = b.z AND a.x < b.x),
                |sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS common,
                |              round(sum(1.0 / ln(CAST(dg AS DOUBLE))), 4) AS aa
                |       FROM w JOIN deg USING (z) GROUP BY u, v),
                |nonadj AS (SELECT sc.* FROM sc
                |           WHERE NOT EXISTS (SELECT 1 FROM e0
                |                             WHERE e0.da = sc.u AND e0.db = sc.v))
                |SELECT u, v, common, aa FROM nonadj
                |ORDER BY aa DESC, u, v LIMIT 20""".stripMargin)),

      // bounded BFS from the lowest-id node in the near-dup graph:
      // 4 unrolled frontier expansions (both engines run the SAME 4,
      // oracle unrolls them), each one distinct-expand + anti-join on
      // that round's CHECKPOINTED depth table — the corpus-scale
      // shingle join runs once, a round costs O(frontier·avg-degree)
      // shuffle, and first-reach = shortest depth because a visited
      // node never re-enters. The "how far does this dup cluster
      // chain" probe a curator runs on a suspicious component.
      "graph_bfs" -> Q(
        (s, d) => {
          val e0 = Dedup.ngramJaccard(docsUnder(s, d, 120), 5, 0.25)
            .select(col("da"), col("db"))
            .localCheckpoint(eager = false)
          val nbr = e0.select(col("da").as("v"), col("db").as("n"))
            .union(e0.select(col("db").as("v"), col("da").as("n")))
            .localCheckpoint(eager = false) // read once per round
          // da < db on every edge, so min(da) IS the global min node
          var dt = e0.agg(min(col("da")).as("v"))
            .withColumn("depth", lit(0L))
            .localCheckpoint(eager = false)
          for (k <- 1 to 4) {
            val fr = dt.filter(col("depth") === (k - 1).toLong)
            val nxt = fr.join(nbr, "v").select(col("n").as("v")).distinct()
              .join(dt, Seq("v"), "left_anti")
              .withColumn("depth", lit(k.toLong))
            dt = dt.union(nxt)
              .localCheckpoint(eager = false) // next round reads twice
          }
          dt.orderBy("v").select(col("v"), col("depth"))
        },
        Some(s"""WITH ${dupEdgesSql(120, 0.25)},
                |nbr AS (SELECT da AS v, db AS n FROM e0
                |        UNION ALL SELECT db AS v, da AS n FROM e0),
                |d0 AS (SELECT min(da) AS v, CAST(0 AS BIGINT) AS depth FROM e0),
                |${bfsIterSql(4)}
                |SELECT v, depth FROM d4 ORDER BY v""".stripMargin)),

      // shingle document-frequency profile (log2-bucketed histogram):
      // the skew audit that SETS the df cap dedup_jaccard_capped
      // applies — the tail buckets are exactly the stop-shingles whose
      // fan-out would explode the intersection join. floor(log2(df))
      // is exact at powers of two on both engines
      "dedup_df_profile" -> Q(
        (s, d) => graft.text.TextPrimitives
          .charShingles(docsUnder(s, d, 200), "doc_id", "text", 5)
          .groupBy("sh").agg(count(lit(1)).as("df"))
          .select(floor(log2(col("df"))).cast("long").as("b"))
          .groupBy("b").agg(count(lit(1)).as("n_shingles"))
          .orderBy("b"),
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 200")}),
                |df AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM s GROUP BY sh)
                |SELECT CAST(floor(log2(df)) AS BIGINT) AS b,
                |       CAST(count(*) AS BIGINT) AS n_shingles
                |FROM df GROUP BY b ORDER BY b""".stripMargin)),

      // skew-safe Jaccard: shingles above the document-frequency cap
      // are dropped before the intersection join, bounding every join
      // key's fan-out at maxDf² (stop-shingle skew death at web scale)
      "dedup_jaccard_capped" -> Q(
        (s, d) => Dedup.ngramJaccardCapped(docsUnder(s, d, 120), 5, 0.25, 92),
        Some(s"""WITH s0 AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |s AS (SELECT s0.doc_id, s0.sh FROM s0 JOIN (
                |        SELECT sh FROM s0 GROUP BY sh HAVING count(*) <= 92) ok
                |      ON s0.sh = ok.sh),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY da, db)
                |SELECT da, db, round(j, 4) AS jaccard FROM (
                |  SELECT da, db, ni * 1.0 / (ca.cnt + cb.cnt - ni) AS j
                |  FROM i JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db)
                |WHERE j >= 0.25 ORDER BY da, db""".stripMargin)),

      // asymmetric shingle containment |A∩B|/|A| — catches documents
      // embedded inside larger ones, which symmetric Jaccard misses
      "dedup_containment" -> Q(
        (s, d) => {
          val sh = graft.text.TextPrimitives.charShingles(docsUnder(s, d, 120), "doc_id", "text", 5)
          val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("cnt"))
          val a = sh.toDF("da", "sh")
          val b = sh.toDF("db", "sh")
          a.join(b, Seq("sh")).filter(col("da") =!= col("db"))
            .groupBy("da", "db").agg(count(lit(1)).as("ni"))
            .join(cnt.toDF("da", "na"), "da")
            .withColumn("c", col("ni") * lit(1.0) / col("na"))
            .filter(col("c") >= 0.6)
            .select(col("da"), col("db"), round(col("c"), 4).as("containment"))
            .orderBy("da", "db")
        },
        Some(s"""WITH s AS (
                |${graft.text.TextPrimitives.charShinglesSql("documents", "doc_id", "text", 5, "doc_id < 120")}),
                |c AS (SELECT doc_id, count(*) AS cnt FROM s GROUP BY doc_id),
                |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
                |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id <> b.doc_id
                |      GROUP BY da, db)
                |SELECT da, db, round(cc, 4) AS containment FROM (
                |  SELECT da, db, ni * 1.0 / ca.cnt AS cc
                |  FROM i JOIN c ca ON ca.doc_id = da)
                |WHERE cc >= 0.6 ORDER BY da, db""".stripMargin)),

      "dedup_minhash_sig" -> Q(
        (s, d) => Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 8),
        Some(s"""WITH sig AS (
                |${Dedup.minhashSigSql(5, 8, "doc_id < 200")})
                |SELECT * FROM sig ORDER BY doc_id""".stripMargin)),

      "dedup_minhash_tok" -> Q(
        (s, d) => Dedup.minhashSignaturesTokens(docsUnder(s, d, 200), 2, 8),
        Some(s"""WITH sig AS (
                |${Dedup.minhashOverSql(
                   graft.text.TextPrimitives.tokenShinglesSql(
                     "documents", "doc_id", "text", 2, "doc_id < 200"), 8)})
                |SELECT * FROM sig ORDER BY doc_id""".stripMargin)),

      "dedup_minhash_lsh" -> Q(
        (s, d) => Dedup.minhashLshPairs(
          Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 8), 8, 2),
        Some {
          val bandSelects = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""WITH sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
             |bands AS ($bandSelects)
             |SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id
             |ORDER BY da, db""".stripMargin
        }),

      // incremental dedup: a NEW batch (doc_id 150–249) screened
      // against the EXISTING corpus (doc_id < 150) — the corpus
      // signature table is precomputed once, only batch signatures are
      // computed per increment, candidates come from the band
      // equi-join (batch×corpus never materializes)
      "dedup_incremental" -> Q(
        (s, d) => Dedup.minhashLshPairsIncremental(
          Dedup.minhashSignatures(docsUnder(s, d, 150), 5, 8),
          Dedup.minhashSignatures(Tables.documents(s, d)
            .filter(col("doc_id") >= 150 && col("doc_id") < 250), 5, 8),
          8, 2),
        Some {
          def bandSelects(src: String) = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM $src"
          }.mkString(" UNION ALL ")
          s"""WITH sigc AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 150")}),
             |sigb AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id >= 150 AND doc_id < 250")}),
             |bc AS (${bandSelects("sigc")}),
             |bb AS (${bandSelects("sigb")})
             |SELECT DISTINCT c.doc_id AS da, b2.doc_id AS db
             |FROM bc c JOIN bb b2 ON c.b = b2.b AND c.bv = b2.bv
             |ORDER BY da, db""".stripMargin
        }),

      // canonical-doc assignment: transitive closure of the LSH dup
      // graph (DuckDB oracle via recursive CTE). The label table is
      // built ONCE per (context, dir) — map-side minhash basis, no
      // signature shuffle — and shared with dedup_keep_best below.
      "dedup_clusters" -> Q(
        (s, d) => Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
          .orderBy("doc_id"),
        Some(s"""WITH RECURSIVE sig AS (
                |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
                |bands AS (${(0 until 4).map(b =>
                   s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                   .mkString(" UNION ALL ")}),
                |pairs AS (
                |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
                |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
                |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
                |reach(src, lbl) AS (
                |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
                |  UNION
                |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src)
                |SELECT src AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster
                |FROM reach GROUP BY src ORDER BY src""".stripMargin)),

      // canonical selection: per duplicate cluster keep the highest-
      // quality member — composed ON TOP of the shared label table
      // (computed once by dedup_clusters above), the way a real
      // pipeline derives its keep/drop decision from one CC pass
      "dedup_keep_best" -> Q(
        (s, d) => Dedup.keepBest(
          Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2),
          graft.text.TextAnalytics.qualityScores(docsUnder(s, d, 200))),
        Some {
          val stopList = graft.text.TextAnalytics.Stopwords.map(w => s"'$w'").mkString(",")
          s"""WITH RECURSIVE sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
             |bands AS (${(0 until 4).map(b =>
                s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                .mkString(" UNION ALL ")}),
             |pairs AS (
             |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
             |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
             |reach(src, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
             |  UNION
             |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
             |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
             |q AS (
             |  SELECT doc_id,
             |    round((least(n_tok, 100) / 100.0) *
             |          (1.0 - punct_cnt * 1.0 / greatest(n_chars, 1)) *
             |          (0.2 + 0.8 * (stop_cnt * 1.0 / greatest(n_tok, 1))), 4) AS quality
             |  FROM (
             |    SELECT doc_id, length(text) AS n_chars,
             |           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             |           len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             |               t -> t IN ($stopList))) AS stop_cnt,
             |           len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
             |    FROM documents WHERE doc_id < 200)),
             |j AS (
             |  SELECT cc.doc_id, cluster, quality, row_number() OVER (
             |    PARTITION BY cluster ORDER BY quality DESC, cc.doc_id) AS rn
             |  FROM cc JOIN q USING (doc_id))
             |SELECT CAST(cluster AS BIGINT) AS cluster,
             |       CAST(count(*) AS BIGINT) AS n_members,
             |       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS kept_doc,
             |       max(quality) AS best_quality
             |FROM j GROUP BY cluster ORDER BY cluster""".stripMargin
        }),

      // dup-cluster size histogram (the dedup audit chart: how much of
      // the corpus sits in clusters of 1, 2, 3… members) — two tiny
      // aggregates ON TOP of the shared CC label table, so the audit
      // is ~free once dedup_clusters has run
      "dedup_cluster_sizes" -> Q(
        (s, d) => Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
          .groupBy("cluster").agg(count(lit(1)).as("sz"))
          .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
          .orderBy("sz"),
        Some(s"""WITH RECURSIVE sig AS (
                |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
                |bands AS (${(0 until 4).map(b =>
                   s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig")
                   .mkString(" UNION ALL ")}),
                |pairs AS (
                |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
                |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
                |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db, da FROM pairs),
                |reach(src, lbl) AS (
                |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
                |  UNION
                |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
                |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
                |szs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz FROM cc GROUP BY cluster)
                |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters
                |FROM szs GROUP BY sz ORDER BY sz""".stripMargin)),

      // fuzzy near-dup by edit distance on document prefixes (exact
      // integer distances — Spark and DuckDB levenshtein agree).
      // Blocked scale path: positional-unigram prefix filter feeds an
      // equi-join; exact levenshtein runs only on candidates
      // (Dedup.levenshteinPairs, equivalence spec vs the quadratic).
      "dedup_levenshtein" -> Q(
        (s, d) => Dedup.levenshteinPairs(docsUnder(s, d, 80), 40, 25, q = 1),
        Some("""SELECT a.doc_id AS da, b.doc_id AS db,
               |       CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
               |FROM (SELECT doc_id, substring(text, 1, 40) AS p FROM documents WHERE doc_id < 80) a
               |JOIN (SELECT doc_id, substring(text, 1, 40) AS p FROM documents WHERE doc_id < 80) b
               |  ON a.doc_id < b.doc_id
               |WHERE levenshtein(a.p, b.p) <= 25
               |ORDER BY da, db""".stripMargin)),

      "dedup_simhash" -> Q(
        (s, d) => Dedup.simhashPairs(docsUnder(s, d, 200), 6),
        Some(s"""WITH sig AS (
                |${Dedup.simhashSql("doc_id < 200")})
                |SELECT da, db, dist FROM (
                |  SELECT a.doc_id AS da, b.doc_id AS db,
                |         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
                |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
                |WHERE dist <= 6 ORDER BY da, db""".stripMargin)),

      "dedup_embed_cosine" -> Q(
        (s, d) => Dedup.embeddingNearDup(Tables.embeddings(s, d), 0.4),
        Some("""SELECT va, vb, score FROM (
               |  SELECT a.vec_id AS va, b.vec_id AS vb,
               |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) + 0.0 AS score
               |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
               |WHERE score >= 0.4 ORDER BY va, vb""".stripMargin)),

      // train/test contamination audit: the LSH near-dup candidate
      // pairs crossed with the deterministic hash split — counts of
      // candidate pairs that straddle split boundaries are exactly the
      // leakage a decontamination pass must remove. Pure composition
      // of two existing primitives; the split column is a map-side
      // expression, so the only added cost is two equi-joins against
      // the (doc_id, split) projection
      "pipe_split_leakage" -> Q(
        (s, d) => {
          val pairs = Dedup.minhashLshPairs(
            Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 8), 8, 2)
          val splits = graft.ops.Sampling
            .hashSplit(Tables.documents(s, d), "doc_id", 80, 10)
            .select(col("doc_id"), col("split"))
          pairs
            .join(splits.select(col("doc_id").as("da"), col("split").as("split_a")), "da")
            .join(splits.select(col("doc_id").as("db"), col("split").as("split_b")), "db")
            .filter(col("split_a") =!= col("split_b"))
            .groupBy("split_a", "split_b")
            .agg(count(lit(1)).as("n_pairs"))
            .orderBy("split_a", "split_b")
        },
        Some {
          val bandSelects = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""WITH sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
             |bands AS ($bandSelects),
             |pr AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |       FROM bands a JOIN bands b2
             |         ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
             |sp AS (SELECT doc_id,
             |              CASE WHEN b < 80 THEN 'train'
             |                   WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |       FROM (SELECT doc_id,
             |               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
             |             FROM documents))
             |SELECT sa.split AS split_a, sb.split AS split_b,
             |       CAST(count(*) AS BIGINT) AS n_pairs
             |FROM pr JOIN sp sa ON pr.da = sa.doc_id
             |        JOIN sp sb ON pr.db = sb.doc_id
             |WHERE sa.split <> sb.split
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
        }),

      // leakage-PROOF splitting — the FIX for what pipe_split_leakage
      // detects: hash the dup-CLUSTER label instead of the doc id, so
      // every near-dup family lands in one split by construction. The
      // query re-runs the LSH candidate audit against the new split
      // and reports n_leaked (0 whenever the candidate pairs are a
      // subset of the clustered pairs, i.e. always — candidates ARE
      // the cluster edges). Family-atomic splits trade proportion
      // accuracy for leakage-freedom: a giant dup family moves as one
      // unit (this corpus's aggressive b=4/r=2 banding produces one —
      // dedup_cluster_sizes is the audit that would flag it)
      "samp_cluster_split" -> Q(
        (s, d) => {
          val labels = Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
          val split = graft.ops.Sampling.hashSplit(labels, "cluster", 80, 10)
          val pairs = Dedup.minhashLshPairs(
            Dedup.minhashSignatures(docsUnder(s, d, 200), 5, 8), 8, 2)
          val leaks = pairs
            .join(split.select(col("doc_id").as("da"), col("split").as("sa")), "da")
            .join(split.select(col("doc_id").as("db"), col("split").as("sb")), "db")
            .filter(col("sa") =!= col("sb"))
            .agg(count(lit(1)).as("n_leaked"))
          split.groupBy("split").agg(count(lit(1)).as("n_docs"))
            .crossJoin(broadcast(leaks))
            .orderBy("split")
        },
        Some {
          val bandSelects = (0 until 4).map { b =>
            s"SELECT doc_id, $b AS b, concat_ws('_', m${2 * b}, m${2 * b + 1}) AS bv FROM sig"
          }.mkString(" UNION ALL ")
          s"""WITH RECURSIVE sig AS (
             |${Dedup.minhashSigSql(5, 8, "doc_id < 200")}),
             |bands AS ($bandSelects),
             |pr AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
             |       FROM bands a JOIN bands b2
             |         ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id),
             |edges AS (SELECT da, db FROM pr UNION ALL SELECT db, da FROM pr),
             |reach(src, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
             |  UNION
             |  SELECT e.da, r.lbl FROM reach r JOIN edges e ON e.db = r.src),
             |cc AS (SELECT src AS doc_id, min(lbl) AS cluster FROM reach GROUP BY src),
             |sp AS (SELECT doc_id,
             |              CASE WHEN bk < 80 THEN 'train'
             |                   WHEN bk < 90 THEN 'val' ELSE 'test' END AS split
             |       FROM (SELECT doc_id,
             |               ('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 15))::BIGINT % 100 AS bk
             |             FROM cc)),
             |lk AS (SELECT CAST(count(*) AS BIGINT) AS n_leaked
             |       FROM pr JOIN sp a ON pr.da = a.doc_id
             |               JOIN sp b2 ON pr.db = b2.doc_id
             |       WHERE a.split <> b2.split)
             |SELECT split, CAST(count(*) AS BIGINT) AS n_docs, n_leaked
             |FROM sp, lk GROUP BY split, n_leaked ORDER BY split""".stripMargin
        }),

      // exact-substring dedup at n-gram granularity (the suffix-array
      // pass of RefinedWeb/Gopher, re-expressed relationally): hash
      // every 8-token window, count distinct docs per window hash, and
      // report per-doc coverage by cross-doc duplicated spans. Explode
      // is map-side; the only shuffles are the groupBy on the gram hash
      // and one equi-join back — both scale linearly with token count
      "dedup_span_ngrams" -> Q(
        (s, d) => {
          val t = graft.text.TextPrimitives.tokens(col("text"))
          val grams = Tables.documents(s, d)
            .select(col("doc_id"), t.as("t"))
            .select(col("doc_id"), explode(
              when(size(col("t")) >= 8,
                transform(sequence(lit(1), size(col("t")) - 7),
                  i => graft.functions.VectorFunctions.md5Long(
                    concat_ws(" ", slice(col("t"), i, lit(8))))))
              .otherwise(array().cast("array<bigint>"))).as("g"))
          val dc = grams.groupBy("g").agg(countDistinct("doc_id").as("ndocs"))
          grams.filter(col("doc_id") < 100)
            .join(dc, "g")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_grams"),
                 sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup"))
            .select(col("doc_id"), col("n_grams"), col("n_dup"),
                    round(col("n_dup") / col("n_grams"), 4).as("dup_frac"))
            .orderBy("doc_id")
        },
        Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
               |              FROM documents),
               |grams AS (SELECT doc_id,
               |                 ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT AS g
               |          FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
               |                FROM toks)),
               |dc AS (SELECT g, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs
               |       FROM grams GROUP BY g)
               |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               |       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               |       round(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_frac
               |FROM grams JOIN dc USING (g)
               |WHERE doc_id < 100
               |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

      // SemDeDup: coarse-cluster, then keep-first greedy drop inside
      // each cell — the quadratic scan never leaves a cell, so the
      // shuffle is one equi-join on cid (cells ∝ √N keeps them bounded)
      "dedup_semantic" -> Q(
        (s, d) => Dedup.semanticDedup(Tables.embeddings(s, d), 4, 0.4),
        Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               |               FROM embeddings WHERE vec_id < 4),
               |scored AS (
               |  SELECT e.vec_id, e.embedding, c.cid,
               |         row_number() OVER (PARTITION BY e.vec_id
               |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
               |  FROM embeddings e, cents c),
               |a AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
               |drp AS (SELECT DISTINCT x.cid, y.vec_id AS vb
               |        FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
               |        WHERE round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) + 0.0 >= 0.4),
               |n AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs FROM a GROUP BY cid),
               |dn AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_dropped FROM drp GROUP BY cid)
               |SELECT n.cid, n_vecs, CAST(coalesce(n_dropped, 0) AS BIGINT) AS n_dropped,
               |       round(coalesce(n_dropped, 0) * 1.0 / n_vecs, 4) AS drop_frac
               |FROM n LEFT JOIN dn USING (cid) ORDER BY n.cid""".stripMargin)))
  }
}
