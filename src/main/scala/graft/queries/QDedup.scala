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
        (s, d) => QDsl.dupEdges(s, d),
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
          val e0 = QDsl.dupEdges(s, d)
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
          // r17: the 6 peeling rounds fold DRIVER-side over the
          // collected bounded edge list (≤C(120,2) rows by
          // construction) — pure integer degree counts and set
          // filters, so the fold is EXACTLY the in-plan result with
          // ~18 jobs (degree agg + two semi-joins + checkpoint per
          // round) removed. The corpus-scale shingle join still runs
          // once, distributed.
          var es = QDsl.dupEdges(s, d)
            .select(col("da"), col("db")).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          for (_ <- 1 to 6) {
            val keep = es.flatMap(e => Seq(e._1, e._2))
              .groupBy(identity).collect { case (v, g) if g.size >= 2 => v }
              .toSet
            es = es.filter(e => keep(e._1) && keep(e._2))
          }
          import s.implicits._
          es.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
            .map { case (v, g) => (v, g.size.toLong) }.toSeq
            .toDF("v", "core_deg")
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
          val e0 = QDsl.dupEdges(s, d)
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
          val e0 = QDsl.dupEdges(s, d)
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
          val e0 = QDsl.dupEdges(s, d)
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

  // regrouped from the round-named inventory files in round 15
  // (pure move — same query names, same bodies)
  val dedupR: Seq[(String, Q)] = Seq(
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

    // content-defined chunking (the FastCDC/rsync family): cut the
    // text wherever the rolling 8-gram hash ≡ 0 (mod 32) — boundaries
    // move WITH the content, so an insertion early in a doc doesn't
    // shift every later chunk the way fixed-width chunking does —
    // then count duplicate chunks corpus-wide by content hash. The
    // storage/transfer-dedup primitive next to the retrieval-oriented
    // text_chunking. Zero-shuffle chunking: the whole gram-scan →
    // chunk-hash pipeline is ONE compiled CdcChunks expression call
    // per document (functions/CdcKernel.scala) emitting
    // array<struct<h: md5, clen>>, so the text is consumed inside the
    // expression and only (doc_id, 16-byte hash, clen) rows exist
    // after the explode — nothing document-sized reaches the final
    // distinct-count aggregate's shuffle. Measured history of the
    // rejected shapes is in CdcKernel's scaladoc (r16 explode+Window
    // shipped text through two shuffles; the HOF and posexplode forms
    // were zero-shuffle but 1.2–2.1× slower, interpreted lambdas and
    // intra-task Generate copies respectively).
    "dedup_cdc_chunks" -> Q(
      (s, d) => {
        import graft.functions.CdcChunks
        Tables.documents(s, d)
          .filter(col("text").isNotNull && length(col("text")) >= 8)
          .select(col("doc_id"),
            explode(CdcChunks(col("text"), 8, 32)).as("c"))
          .select(col("doc_id"), col("c.h").as("h"), col("c.clen").as("clen"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
               count(lit(1)).as("n_chunks"),
               countDistinct(col("h")).as("n_unique"),
               round(lit(1.0) - countDistinct(col("h"))
                 / count(lit(1)), 4).as("dedup_ratio"),
               round(avg(col("clen")), 4).as("mean_len"))
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

    // bloom-filter incremental dedup (the 100 TB daily-increment
    // screen): a 2^16-bit / 3-hash bloom over the EXISTING corpus's
    // content hashes, probed by the new batch — the filter is a
    // DISTINCT bit-position table bounded by m (broadcastable at any
    // corpus size), membership is "all 3 positions present" via one
    // semi-join + HAVING, and the report quantifies exactly what a
    // bloom buys: hits vs true dups vs false positives at the
    // measured load factor. All-md5 arithmetic, bit-exact on both
    // engines; the exact-dup flag comes from the content-hash set.
    "dedup_bloom_incremental" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val ks = array(lit(0), lit(1), lit(2))
        def positions(df: DataFrame) = df
          .withColumn("h", md5(col("text")))
          .select(col("doc_id"), col("h"), explode(ks).as("k"))
          .withColumn("pos",
            pmod(md5Long(concat(col("h"), lit(":"), col("k").cast("string"))),
              lit(65536)))
        val corpus = Tables.documents(s, d).filter(col("doc_id") < 150)
        val batch = Tables.documents(s, d)
          .filter(col("doc_id") >= 150 && col("doc_id") < 250)
        val bloom = positions(corpus).select("pos").distinct()
          .localCheckpoint(eager = false) // bits_set + the probe join
        val corpusH = corpus.select(md5(col("text")).as("h")).distinct()
        val probed = positions(batch)
          .join(broadcast(bloom), Seq("pos"), "left_semi")
          .groupBy("doc_id", "h").agg(count(lit(1)).as("n_pos_hit"))
        val flags = batch.select(col("doc_id"), md5(col("text")).as("h"))
          .join(probed.select(col("doc_id"), col("n_pos_hit")), Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_pos_hit"))
          .withColumn("bloom_hit", (col("n_pos_hit") === 3).cast("long"))
          .join(broadcast(corpusH.withColumn("exact", lit(1L))), Seq("h"), "left")
          .na.fill(0L, Seq("exact"))
        val bits = bloom.agg(count(lit(1)).as("bits_set"))
        flags.agg(count(lit(1)).as("n_batch"),
            sum("bloom_hit").as("n_bloom_hits"),
            sum("exact").as("n_exact_dups"),
            sum(when(col("bloom_hit") === 1 && col("exact") === 0, 1L)
              .otherwise(0L)).as("n_false_pos"))
          .crossJoin(broadcast(bits))
          .select(col("n_batch"), col("n_bloom_hits"), col("n_exact_dups"),
            col("n_false_pos"),
            round(col("n_false_pos") / col("n_batch").cast("double"), 6)
              .as("fp_rate"),
            col("bits_set"),
            round(col("bits_set") / lit(65536.0), 4).as("load_factor"))
      },
      Some("""WITH ks AS (SELECT CAST(unnest([0, 1, 2]) AS INT) AS k),
             |cp AS (SELECT DISTINCT
             |         ('0x' || substr(md5(md5(text) || ':' || k::VARCHAR), 1, 15))::BIGINT
             |           % 65536 AS pos
             |       FROM documents, ks WHERE doc_id < 150),
             |bh AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 150),
             |bp AS (SELECT doc_id, md5(text) AS h, k,
             |         ('0x' || substr(md5(md5(text) || ':' || k::VARCHAR), 1, 15))::BIGINT
             |           % 65536 AS pos
             |       FROM documents, ks WHERE doc_id >= 150 AND doc_id < 250),
             |pr AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS n_pos_hit
             |       FROM bp WHERE pos IN (SELECT pos FROM cp)
             |       GROUP BY doc_id, h),
             |fl AS (SELECT b.doc_id,
             |              CASE WHEN coalesce(pr.n_pos_hit, 0) = 3 THEN 1 ELSE 0 END AS bloom_hit,
             |              CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END AS exact
             |       FROM (SELECT doc_id, md5(text) AS h FROM documents
             |             WHERE doc_id >= 150 AND doc_id < 250) b
             |       LEFT JOIN pr ON pr.doc_id = b.doc_id
             |       LEFT JOIN bh ON bh.h = b.h),
             |bits AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM cp)
             |SELECT CAST(count(*) AS BIGINT) AS n_batch,
             |       CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
             |       CAST(sum(exact) AS BIGINT) AS n_exact_dups,
             |       CAST(sum(CASE WHEN bloom_hit = 1 AND exact = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_false_pos,
             |       round(sum(CASE WHEN bloom_hit = 1 AND exact = 0 THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 6) AS fp_rate,
             |       bits_set, round(bits_set / 65536.0, 4) AS load_factor
             |FROM fl, bits GROUP BY bits_set""".stripMargin)),

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

    // Cross-source duplicate matrix off the SHARED cluster-label
    // table (one CC pass now amortized across 5 readers): for every
    // source pair, how many multi-doc near-dup clusters contain docs
    // from both — the "is source B just a mirror of source A"
    // pre-licensing / dedup-priority readout. Per-cluster source sets
    // are ≤|sources| distinct rows per cluster, so the pair join is
    // bounded by clusters × sources², never documents².
    "dedup_cross_source" -> Q(
      (s, d) => {
        import graft.dedup.Dedup
        val labels = Dedup.clusterLabelsShared(docsUnder(s, d, 200), d, 5, 8, 2)
        val multi = labels.groupBy("cluster").agg(count(lit(1)).as("csz"))
          .filter(col("csz") >= 2)
        val cs = labels.join(multi, "cluster")
          .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
          .select("cluster", "source").distinct()
          .localCheckpoint(eager = false) // both sides of the pair join
        cs.select(col("cluster"), col("source").as("src_a"))
          .join(cs.select(col("cluster"), col("source").as("src_b")), "cluster")
          .filter(col("src_a") <= col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("n_clusters"))
          .orderBy("src_a", "src_b")
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
              |mc AS (SELECT cluster FROM cc GROUP BY cluster HAVING count(*) >= 2),
              |cs AS (SELECT DISTINCT cc.cluster, d.source
              |       FROM cc JOIN mc USING (cluster)
              |       JOIN documents d USING (doc_id))
              |SELECT a.source AS src_a, b.source AS src_b,
              |       CAST(count(*) AS BIGINT) AS n_clusters
              |FROM cs a JOIN cs b ON a.cluster = b.cluster AND a.source <= b.source
              |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin)),

    // Winnowing fingerprints (Schleimer et al. 2003 — the MOSS
    // algorithm): hash every 5-token gram, keep each window-of-4's
    // MINIMUM hash (dedup'd), and candidate near-dup pairs are docs
    // sharing ≥ 2 fingerprints. The guarantee minhash doesn't give:
    // any shared run of ≥ 8 tokens is DETECTED (no per-band luck),
    // with fingerprint density ~2/(w+1). Per-doc windows partition by
    // doc (bounded by doc length); the pair join runs on the selected
    // fingerprints only, orders of magnitude below the gram fan-out.
    "dedup_winnowing" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        // tokenGrams doesn't carry the gram's order in the doc, and
        // winnowing needs it — posexplode keeps the position
        val docs = docsUnder(s, d, 200)
          .select(col("doc_id"),
            graft.text.TextPrimitives.tokens(col("text")).as("toks"))
          .select(col("doc_id"), posexplode(transform(
            sequence(lit(0), greatest(size(col("toks")) - 5, lit(0))),
            i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(5)))))
            .as(Seq("pos", "g")))
          .select(col("doc_id"), col("pos"), md5Long(col("g")).as("h"))
        val w = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(0, 3)
        val fps = docs
          .withColumn("wm", min("h").over(w))
          .select(col("doc_id"), col("wm").as("fp")).distinct()
          .localCheckpoint(eager = false) // stats + the pair join
        val pairs = fps.select(col("doc_id").as("da"), col("fp"))
          .join(fps.select(col("doc_id").as("db"), col("fp")), "fp")
          .filter(col("da") < col("db"))
          .groupBy("da", "db").agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2)
        pairs.orderBy("da", "db")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
             |  FROM documents WHERE doc_id < 200),
             |g AS (
             |  SELECT doc_id, i AS pos,
             |         ('0x' || substr(md5(array_to_string(t[i+1:i+5], ' ')), 1, 15))::BIGINT AS h
             |  FROM (SELECT doc_id, t,
             |               unnest(generate_series(0, greatest(len(t) - 5, 0))) AS i
             |        FROM toks)),
             |fp AS (
             |  SELECT DISTINCT doc_id,
             |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
             |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
             |  FROM g)
             |SELECT a.doc_id AS da, b.doc_id AS db,
             |       CAST(count(*) AS BIGINT) AS shared
             |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |GROUP BY da, db HAVING count(*) >= 2
             |ORDER BY da, db""".stripMargin)),

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
             |FROM r ORDER BY bits_per_key""".stripMargin))
  )
}
