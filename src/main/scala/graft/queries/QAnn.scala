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
private[graft] object QAnn {


  val annQ: Seq[(String, Q)] = {
    import graft.ann.Ann
    Seq(
      "ann_topk_batch" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val q = emb.filter(col("vec_id") <= 4)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"))
          Ann.bruteForceTopK(emb, q, 5)
        },
        Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               |           FROM embeddings WHERE vec_id <= 4),
               |sc AS (SELECT qid, e.vec_id,
               |              round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS score
               |       FROM embeddings e, q WHERE e.vec_id <> qid)
               |SELECT qid, vec_id, score, rnk FROM (
               |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
               |  FROM sc)
               |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

      // the 2D block-matrix kernel under the DuckDB oracle (round 14):
      // tile=17 / blockRows=129 force MANY tiles × MANY blocks on this
      // corpus, so the oracle adjudicates the partial-TopK-on-both-axes
      // merge itself, not just the fast path (AnnSpec pins row-equality
      // separately; this row makes the kernel hash-gated every round)
      "ann_blocked_topk" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val q = emb.filter(col("vec_id") < 64)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"))
          Ann.bruteForceTopKBlocked(emb, q, 5, tile = 17, blockRows = 129)
        },
        Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               |           FROM embeddings WHERE vec_id < 64),
               |sc AS (SELECT qid, e.vec_id,
               |              round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS score
               |       FROM embeddings e, q WHERE e.vec_id <> qid)
               |SELECT qid, vec_id, score, rnk FROM (
               |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
               |  FROM sc)
               |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

      // exact k-NN graph (k=5) with the two statistics SNN-style
      // clustering and SemDeDup audits read off it: per node, how many
      // of its top-5 are MUTUAL (it is also in their top-5) and how
      // many share its label (homophily). Edges come from the TopK
      // partial aggregate (map-side bounded, no window over the
      // pairwise set); mutuality is a self-equi-join on the 5·n edge
      // list, label joins broadcast the (vec_id,label) dim. At corpus
      // scale the pairwise stage swaps for the LSH/IVF-bucketed
      // candidate generation already in ann/Ann.scala — the graph
      // statistics are unchanged downstream of the edge list.
      "ann_knn_graph" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          // dense kernel: all-vectors-as-queries is the case where the
          // BNLJ row-per-pair cost dominates (AnnSpec pins row-equality
          // with bruteForceTopK; ~10× at the 2000-query oracle corpus).
          // r17: unordered edge build (downstream is joins/aggregates —
          // the orderBy cost a range exchange + sampling pass before
          // the checkpoint), and mutuality + homophily fused into ONE
          // aggregate over the edge list: the reversed-edge left join
          // flags mutual edges on the same rows the label joins ride,
          // so the second aggregate + the aggregate-vs-aggregate outer
          // join disappear (2 HashAggregate chains + SMJ → 1 chain;
          // n_mutual = Σ flag ≡ the old count-per-qid with its
          // coalesce(_, 0) — every qid keeps ≥1 row in both forms)
          val edges = Ann.bruteForceTopKDenseUnordered(emb,
              emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), 5)
            .select(col("qid"), col("vec_id").as("nid"))
            .localCheckpoint(eager = false) // read 2×: forward + reversed
          val lbl = emb.select(col("vec_id"), col("label"))
          val rev = edges.select(col("nid").as("qid"), col("qid").as("nid"),
            lit(1L).as("rev"))
          edges
            .join(broadcast(lbl.select(col("vec_id").as("qid"),
                                       col("label").as("ql"))), "qid")
            .join(broadcast(lbl.select(col("vec_id").as("nid"),
                                       col("label").as("nl"))), "nid")
            .join(rev, Seq("qid", "nid"), "left")
            .groupBy("qid")
            .agg(sum(when(col("ql") === col("nl"), 1).otherwise(0))
                .as("n_same_label"),
              coalesce(sum(col("rev")), lit(0L)).as("n_mutual"))
            .select(col("qid").as("vec_id"), col("n_same_label"),
                    col("n_mutual"))
            .orderBy("vec_id")
        },
        // ORACLE SCALE IDIOM (sf10 flush): the per-qid top-5 rides
        // the shared greedy max-threshold CTE chain (QDsl.knnEdgeCtes
        // — see its scaladoc for why the window and NOT-EXISTS
        // formulations both spilled past the box's disk at 1e9 pairs).
        Some {
          s"""WITH ${QDsl.knnEdgeCtes()},
             |mu AS (SELECT a.qid, CAST(count(*) AS BIGINT) AS n_mutual
             |       FROM ed a JOIN ed b ON a.qid = b.nid AND a.nid = b.qid
             |       GROUP BY a.qid),
             |ho AS (SELECT qid,
             |         CAST(sum(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END) AS BIGINT)
             |           AS n_same_label
             |       FROM ed JOIN embeddings ql ON ed.qid = ql.vec_id
             |               JOIN embeddings nl ON ed.nid = nl.vec_id
             |       GROUP BY qid)
             |SELECT ho.qid AS vec_id, n_same_label,
             |       CAST(coalesce(n_mutual, 0) AS BIGINT) AS n_mutual
             |FROM ho LEFT JOIN mu USING (qid) ORDER BY vec_id""".stripMargin
        }),

      // MMR diversified re-ranking (λ=0.5): relevant-but-diverse top-5
      // out of a top-20 cosine pool — the greedy loop is a pure
      // Catalyst HOF over the one packed candidate array
      // (ann/Mmr.scala); the oracle unrolls the same 5 greedy steps as
      // chained CTEs with identical rounding and id tie-breaks
      "ann_mmr_rerank" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
          graft.ann.Mmr.rerank(emb.filter(col("vec_id") =!= 0), q, 20, 5, 0.5)
        },
        Some(
          s"""WITH qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
             |cand AS (SELECT vec_id,
             |                round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) + 0.0 AS sim,
             |                embedding::DOUBLE[] AS emb
             |         FROM embeddings, qv WHERE vec_id <> 0
             |         ORDER BY sim DESC, vec_id LIMIT 20),
             |sel0 AS (SELECT vec_id, sim, emb, 0 AS rank FROM cand WHERE false),
             |${mmrUnrolledSql(5)}
             |SELECT CAST(rank AS BIGINT) AS rank, vec_id, sim FROM sel5 ORDER BY rank""".stripMargin
        )),

      // greedy k-center coreset (farthest-point traversal) over a
      // bounded pool — the diverse-subset primitive for curation.
      // Same HOF-on-one-packed-array shape as MMR: only the pool scan
      // grows with data; the oracle unrolls the identical greedy
      "samp_coreset" -> Q(
        (s, d) => graft.ann.Coreset.kCenter(
          Tables.embeddings(s, d).filter(col("vec_id") < 100), 6),
        Some(s"""WITH cand AS (SELECT vec_id, embedding::DOUBLE[] AS emb
               |              FROM embeddings WHERE vec_id < 100),
               |sel1 AS (SELECT vec_id, emb, 1 AS rank FROM cand
               |         ORDER BY vec_id LIMIT 1),
               |${kcenterUnrolledSql(6)}
               |SELECT CAST(rank AS BIGINT) AS rank, vec_id
               |FROM sel6 ORDER BY rank""".stripMargin)),

      // served from the bucket-PARTITIONED materialized index: the
      // probe neighborhood equi-joins the partition column, so the
      // measured plan prunes unprobed buckets (plan-guarded)
      "ann_lsh_bucketed" -> Q(
        (s, d) => graft.ann.AnnIndex.lshTopKIndexed(s, d, Seq(0L, 1L, 2L),
          nPlanes = 6, dim = 64, k = 3),
        Some("""WITH planes AS (
               |  SELECT p, list_transform(generate_series(0, 63), dd ->
               |    (('0x' || substr(md5(concat_ws('_', 'pl', p, dd)), 1, 15))::BIGINT % 2001 - 1000) / 1000.0) AS w
               |  FROM generate_series(0, 5) t(p)),
               |sig AS (
               |  SELECT vec_id,
               |         CAST(sum(CASE WHEN list_inner_product(embedding::DOUBLE[], w) > 0
               |                       THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
               |  FROM embeddings, planes GROUP BY vec_id),
               |q AS (SELECT s.vec_id AS qid, e.embedding::DOUBLE[] AS qv, s.bucket AS qb
               |      FROM sig s JOIN embeddings e USING (vec_id) WHERE s.vec_id IN (0, 1, 2)),
               |cand AS (
               |  SELECT qid, e.vec_id,
               |         round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS score
               |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id, q
               |  WHERE e.vec_id <> qid AND bit_count(xor(s.bucket, qb)) <= 1)
               |SELECT qid, vec_id, score, rnk FROM (
               |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
               |  FROM cand)
               |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin)),

      // contrastive hard-negative mining: for each anchor, the
      // highest-cosine vector with a DIFFERENT label — the negative a
      // contrastive/triplet trainer wants. Same bounded TopK partial
      // aggregate as batched search (k=1 row per partition per anchor)
      "emb_hard_negatives" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val anchors = emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                    col("label").as("qlab"))
          val agg = graft.ops.TopK.topk(1)
          emb.crossJoin(broadcast(anchors))
            .filter(col("label") =!= col("qlab"))
            .select(col("qid"),
              graft.functions.VectorFunctions.score(col("embedding"), col("qv")).as("score"),
              col("vec_id"))
            .groupBy("qid")
            .agg(agg(col("score"), col("vec_id")).as("top"))
            .select(col("qid"), explode(col("top")))
            .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"))
            .orderBy("qid")
        },
        Some("""WITH a AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS qlab
               |           FROM embeddings WHERE vec_id < 10),
               |sc AS (SELECT qid, e.vec_id,
               |              round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS score
               |       FROM embeddings e, a WHERE e.label <> a.qlab)
               |SELECT qid, vec_id, score FROM (
               |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
               |  FROM sc)
               |WHERE rn = 1 ORDER BY qid""".stripMargin)),

      // contrastive TRIPLET mining (anchor, hardest positive, hardest
      // negative): pos = least-similar same-label (the pair the model
      // must pull together), neg = most-similar cross-label (the pair
      // it must push apart). Arg-min/max via struct-ordered min/max
      // aggregates — deterministic ties (score, then id), single scan,
      // map-side partials; anchors broadcast
      "emb_triplets" -> Q(
        (s, d) => {
          val emb = Tables.embeddings(s, d)
          val anchors = emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                    col("label").as("qlab"))
          val scored = emb.crossJoin(broadcast(anchors))
            .filter(col("vec_id") =!= col("qid"))
            .select(col("qid"), col("qlab"), col("label"), col("vec_id"),
              graft.functions.VectorFunctions.score(col("embedding"), col("qv")).as("sc"))
          val pos = scored.filter(col("label") === col("qlab"))
            .groupBy("qid").agg(min(struct(col("sc"), col("vec_id"))).as("p"))
            .select(col("qid"), col("p.vec_id").as("pos_id"),
                    col("p.sc").as("pos_score"))
          val neg = scored.filter(col("label") =!= col("qlab"))
            .groupBy("qid")
            .agg(max(struct(col("sc"), (-col("vec_id")).as("nid"))).as("n"))
            .select(col("qid"), (-col("n.nid")).as("neg_id"),
                    col("n.sc").as("neg_score"))
          pos.join(neg, "qid").orderBy("qid")
        },
        Some("""WITH a AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS qlab
               |           FROM embeddings WHERE vec_id < 10),
               |sc AS (SELECT qid, qlab, e.label, e.vec_id,
               |              round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) + 0.0 AS sc
               |       FROM embeddings e, a WHERE e.vec_id <> qid),
               |p AS (SELECT qid, vec_id AS pos_id, sc AS pos_score FROM (
               |        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sc ASC, vec_id ASC) AS rn
               |        FROM sc WHERE label = qlab) WHERE rn = 1),
               |n AS (SELECT qid, vec_id AS neg_id, sc AS neg_score FROM (
               |        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id ASC) AS rn
               |        FROM sc WHERE label <> qlab) WHERE rn = 1)
               |SELECT qid, pos_id, pos_score, neg_id, neg_score
               |FROM p JOIN n USING (qid) ORDER BY qid""".stripMargin)),

      // embedding analytics: per-label centroid + intra-cluster
      // cohesion (training-data quality / drift monitoring)
      "emb_label_cohesion" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.cosineSim
          val emb = Tables.embeddings(s, d)
          val dims = emb.select(col("label"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          val cent = dims.groupBy("label", "i")
            .agg(avg(col("x").cast("double")).as("ax"))
            .groupBy("label")
            .agg(transform(sort_array(collect_list(struct(col("i"), col("ax")))),
              e => e.getField("ax")).as("cv"))
          emb.join(broadcast(cent), "label")
            .select(col("label"), cosineSim(col("embedding"), col("cv")).as("c"))
            .groupBy("label")
            .agg(count(lit(1)).as("n"), round(avg("c"), 4).as("cohesion"))
            .orderBy("label")
        },
        Some("""WITH dims AS (
               |  SELECT label, unnest(embedding) AS x,
               |         generate_subscripts(embedding, 1) AS i
               |  FROM embeddings),
               |cent AS (
               |  SELECT label, list(ax ORDER BY i) AS cv FROM (
               |    SELECT label, i, avg(x) AS ax FROM dims GROUP BY label, i)
               |  GROUP BY label)
               |SELECT e.label, CAST(count(*) AS BIGINT) AS n,
               |       round(avg(list_cosine_similarity(e.embedding::DOUBLE[], c.cv)), 4) AS cohesion
               |FROM embeddings e JOIN cent c ON e.label = c.label
               |GROUP BY e.label ORDER BY e.label""".stripMargin)),

      // centroid-based silhouette per label — cluster-quality audit
      // one level up from cohesion: a = cosine distance to OWN
      // centroid, b = distance to the NEAREST OTHER centroid,
      // s = (b−a)/max(a,b). The |labels|-row centroid table
      // broadcasts, so the per-point work is a broadcast cross join
      // (|rows|×|labels|) that never shuffles the embeddings; the
      // per-point scores are pinned to ×1e6 longs before the
      // per-label average so both engines accumulate identical
      // integers. Singleton corpora (no other label) score 0.
      "emb_silhouette" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.cosineSim
          val emb = Tables.embeddings(s, d)
          val dims = emb.select(col("label"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          val cent = dims.groupBy("label", "i")
            .agg(avg(col("x").cast("double")).as("ax"))
            .groupBy("label")
            .agg(transform(sort_array(collect_list(struct(col("i"), col("ax")))),
              e => e.getField("ax")).as("cv"))
            .select(col("label").as("clabel"), col("cv"))
          val p = emb.crossJoin(broadcast(cent))
            .select(col("vec_id"), col("label"), col("clabel"),
              round(lit(1.0) - cosineSim(col("embedding"), col("cv")), 6)
                .as("dist"))
            .groupBy("vec_id", "label").agg(
              min(when(col("clabel") === col("label"), col("dist"))).as("a"),
              min(when(col("clabel") =!= col("label"), col("dist"))).as("b"))
          p.select(col("label"),
              when(col("a").isNull || col("b").isNull, lit(0L))
                .when(greatest(col("a"), col("b")) > 0,
                  round((col("b") - col("a"))
                    / greatest(col("a"), col("b")) * 1e6, 0).cast("long"))
                .otherwise(lit(0L)).as("s_l"))
            .groupBy("label").agg(count(lit(1)).as("n"),
              round(sum("s_l").cast("double") / count(lit(1)) / 1e6, 4)
                .as("silhouette"))
            .orderBy("label")
        },
        Some("""WITH dims AS (
               |  SELECT label, unnest(embedding) AS x,
               |         generate_subscripts(embedding, 1) AS i
               |  FROM embeddings),
               |cent AS (
               |  SELECT label AS clabel, list(ax ORDER BY i) AS cv FROM (
               |    SELECT label, i, avg(x) AS ax FROM dims GROUP BY label, i)
               |  GROUP BY label),
               |p AS (SELECT e.vec_id, e.label,
               |        min(CASE WHEN c.clabel = e.label THEN
               |          round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6)
               |          END) AS a,
               |        min(CASE WHEN c.clabel <> e.label THEN
               |          round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6)
               |          END) AS b
               |      FROM embeddings e, cent c GROUP BY e.vec_id, e.label),
               |s AS (SELECT label,
               |        CASE WHEN a IS NULL OR b IS NULL THEN 0
               |             WHEN greatest(a, b) > 0
               |             THEN CAST(round((b - a) / greatest(a, b) * 1000000)
               |                    AS BIGINT)
               |             ELSE 0 END AS s_l
               |      FROM p)
               |SELECT label, CAST(count(*) AS BIGINT) AS n,
               |       round(sum(s_l) * 1.0 / count(*) / 1000000.0, 4) AS silhouette
               |FROM s GROUP BY label ORDER BY label""".stripMargin)),

      // deterministic per-label balanced sampling (class rebalancing
      // for training sets)
      "samp_stratified" -> Q(
        (s, d) => graft.ops.Sampling.stratified(
            Tables.embeddings(s, d), "label", "vec_id", 20)
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("vec_id").as("sum_vid"))
          .orderBy("label"),
        Some("""SELECT label, CAST(count(*) AS BIGINT) AS n,
               |       CAST(sum(vec_id) AS BIGINT) AS sum_vid FROM (
               |  SELECT label, vec_id, row_number() OVER (
               |    PARTITION BY label
               |    ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
               |             vec_id) AS rn
               |  FROM embeddings)
               |WHERE rn <= 20 GROUP BY label ORDER BY label""".stripMargin)),

      // per-dimension mean/spread of the embedding column — the
      // distribution-drift monitor for embedding pipelines
      // one matrix-free power-iteration step toward the top principal
      // direction: v' ∝ Σ_rows x·(x·v₀), v₀ = e₀ — distributed linear
      // algebra as a per-dimension sum aggregate (the Krylov/momentum
      // building block for drift monitoring without MLlib), rounded
      // before normalization so both engines normalize identical sums
      "emb_power_iter" -> Q(
        (s, d) => {
          val sums = Tables.embeddings(s, d)
            .select(posexplode(col("embedding")).as(Seq("i", "x")),
                    element_at(col("embedding"), 1).cast("double").as("x0"))
            .groupBy(col("i").cast("long").as("i"))
            .agg(round(sum(col("x").cast("double") * col("x0")), 4).as("sj"))
          val norm = sums.agg(round(sqrt(sum(col("sj") * col("sj"))), 4).as("nn"))
          sums.crossJoin(broadcast(norm))
            .select(col("i"), col("sj"), round(col("sj") / col("nn"), 6).as("vj"))
            .orderBy("i")
        },
        Some("""WITH sums AS (
               |  SELECT CAST(i - 1 AS BIGINT) AS i, round(sum(x * x0), 4) AS sj
               |  FROM (SELECT generate_subscripts(embedding, 1) AS i,
               |               CAST(unnest(embedding) AS DOUBLE) AS x,
               |               CAST(embedding[1] AS DOUBLE) AS x0
               |        FROM embeddings)
               |  GROUP BY i),
               |norm AS (SELECT round(sqrt(sum(sj * sj)), 4) AS nn FROM sums)
               |SELECT i, sj, round(sj / nn, 6) AS vj
               |FROM sums, norm ORDER BY i""".stripMargin)),

      "emb_dim_stats" -> Q(
        (s, d) => Tables.embeddings(s, d)
          .select(posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("i").cast("long").as("i"))
          .agg(count(lit(1)).as("n"),
               round(avg(col("x").cast("double")), 6).as("mean"),
               round(stddev(col("x").cast("double")), 6).as("sd"))
          .orderBy("i"),
        Some("""SELECT CAST(i - 1 AS BIGINT) AS i, CAST(count(*) AS BIGINT) AS n,
               |       round(avg(x), 6) AS mean, round(stddev_samp(x), 6) AS sd
               |FROM (SELECT generate_subscripts(embedding, 1) AS i,
               |             CAST(unnest(embedding) AS DOUBLE) AS x
               |      FROM embeddings)
               |GROUP BY i ORDER BY i""".stripMargin)),

      // embedding drift A/B: per-dimension mean shift between two
      // halves of the corpus (old batch vs new batch stand-in:
      // vec_id parity) — ONE conditional aggregate per dim; the
      // monitor a re-embedding rollout watches. Shift computed from
      // the ROUNDED means so both engines subtract identical values
      "emb_drift" -> Q(
        (s, d) => Tables.embeddings(s, d)
          .select((col("vec_id") % 2).cast("int").as("h"),
                  posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("i").cast("long").as("i"))
          .agg(round(avg(when(col("h") === 0, col("x").cast("double"))), 6).as("mean_a"),
               round(avg(when(col("h") === 1, col("x").cast("double"))), 6).as("mean_b"))
          .withColumn("shift", round(col("mean_a") - col("mean_b"), 6))
          .orderBy("i"),
        Some("""SELECT CAST(i - 1 AS BIGINT) AS i,
               |       round(avg(CASE WHEN h = 0 THEN x END), 6) AS mean_a,
               |       round(avg(CASE WHEN h = 1 THEN x END), 6) AS mean_b,
               |       round(round(avg(CASE WHEN h = 0 THEN x END), 6)
               |             - round(avg(CASE WHEN h = 1 THEN x END), 6), 6) AS shift
               |FROM (SELECT CAST(vec_id % 2 AS INTEGER) AS h,
               |             generate_subscripts(embedding, 1) AS i,
               |             CAST(unnest(embedding) AS DOUBLE) AS x
               |      FROM embeddings)
               |GROUP BY i ORDER BY i""".stripMargin)),

      // per-dim z-score whitening (drift correction before indexing /
      // contrastive training): stats collapse to ONE broadcast array
      // row, the whitening is a per-row transform HOF — the corpus is
      // scanned once, never exploded through a shuffle (the oracle's
      // explode-join-regroup is the same math, not the same plan)
      "emb_whiten" -> Q(
        (s, d) => graft.embed.Whitening.whiten(Tables.embeddings(s, d))
          .select(col("vec_id"),
            element_at(col("z"), 1).as("z1"),
            element_at(col("z"), 2).as("z2"),
            round(sqrt(aggregate(col("z"), lit(0.0), (acc, v) => acc + v * v)), 6)
              .as("znorm"))
          .orderBy("vec_id"),
        Some("""WITH st AS (
               |  SELECT i, round(avg(x), 6) AS mean,
               |         round(coalesce(stddev_samp(x), 0.0), 6) AS sd
               |  FROM (SELECT generate_subscripts(embedding, 1) AS i,
               |               CAST(unnest(embedding) AS DOUBLE) AS x
               |        FROM embeddings)
               |  GROUP BY i),
               |z AS (
               |  SELECT e.vec_id, s.i,
               |         CASE WHEN s.sd = 0 THEN 0.0
               |              ELSE round((CAST(e.embedding[s.i] AS DOUBLE) - s.mean) / s.sd, 6)
               |         END AS z
               |  FROM embeddings e JOIN st s ON true)
               |SELECT vec_id,
               |       max(CASE WHEN i = 1 THEN z END) AS z1,
               |       max(CASE WHEN i = 2 THEN z END) AS z2,
               |       round(sqrt(sum(z * z)), 6) AS znorm
               |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

      // leave-one-out 1-NN label accuracy (embedding-quality metric
      // for labeled training data); integer counts — exact compare.
      // Scale shape: the QUERY sample (300 vecs) is the broadcast
      // side, the corpus is streamed once, and min-struct partial-
      // aggregates map-side — per-task state is O(|queries|), the
      // corpus never shuffles. At 100 TB the sample stays bounded
      // while the corpus side grows; ann/Ann.knn1Lsh is the spec'd
      // candidate-pruned variant when the query set is itself large.
      "emb_knn_accuracy" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val corpus = Tables.embeddings(s, d)
            .select(col("vec_id").as("vb"), col("embedding").as("eb"),
                    col("label").as("lb"))
          val queries = Tables.embeddings(s, d).filter(col("vec_id") < 300)
            .select(col("vec_id").as("va"), col("embedding").as("ea"),
                    col("label").as("la"))
          corpus.crossJoin(broadcast(queries))
            .filter(col("va") =!= col("vb"))
            .select(col("va"), col("la"), col("vb"), col("lb"),
              (lit(1.0) - score(col("ea"), col("eb"))).as("ns"))
            .groupBy("va", "la")
            // min of (1-score, vb, lb) == nearest by (score desc, vb)
            .agg(min(struct(col("ns"), col("vb"), col("lb"))).as("m"))
            .groupBy("la")
            .agg(count(lit(1)).as("n"),
                 sum(when(col("la") === col("m.lb"), 1L).otherwise(0L)).as("n_correct"))
            .orderBy("la")
        },
        Some("""WITH e AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 300),
               |p AS (SELECT a.vec_id AS va, a.label AS la, b.label AS lb, b.vec_id AS vb,
               |             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) + 0.0 AS s
               |      FROM e a, embeddings b WHERE a.vec_id <> b.vec_id),
               |nn AS (SELECT la, lb FROM (
               |  SELECT *, row_number() OVER (PARTITION BY va ORDER BY s DESC, vb) AS rn
               |  FROM p) WHERE rn = 1)
               |SELECT la, CAST(count(*) AS BIGINT) AS n,
               |       CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
               |FROM nn GROUP BY la ORDER BY la""".stripMargin)),

      // int8 scalar quantization of the embedding column (integer
      // code outputs — the compare is exact by construction)
      // 1-bit binary quantization: sign bits packed into two 32-bit
      // halves (no sign-bit ambiguity across engines), Hamming
      // distance by xor+popcount — 64 dims in 8 bytes, a 32× scan-
      // I/O cut for the candidate pass of a binary-quantized index
      "vec_binary_quant" -> Q(
        (s, d) => {
          def pack(off: Int) = aggregate(
            sequence(lit(0), lit(31)), lit(0L),
            (acc, i) => acc + when(
              element_at(col("embedding"), i + lit(off + 1)) > 0,
              pow(lit(2.0), i).cast("long")).otherwise(lit(0L)))
          val packed = Tables.embeddings(s, d)
            .select(col("vec_id"), pack(0).as("lo"), pack(32).as("hi"))
          val q = packed.filter(col("vec_id") === 7)
            .select(col("lo").as("qlo"), col("hi").as("qhi"))
          packed.crossJoin(broadcast(q))
            .filter(col("vec_id") =!= 7)
            .select(col("vec_id"),
              (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
               bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("long").as("ham"))
            .orderBy(col("ham"), col("vec_id")).limit(10)
        },
        Some("""WITH packed AS (
               |  SELECT vec_id,
               |    CAST(list_sum(list_transform(generate_series(0, 31),
               |      i -> CASE WHEN embedding[i + 1] > 0 THEN power(2.0, i) ELSE 0.0 END)) AS BIGINT) AS lo,
               |    CAST(list_sum(list_transform(generate_series(0, 31),
               |      i -> CASE WHEN embedding[i + 33] > 0 THEN power(2.0, i) ELSE 0.0 END)) AS BIGINT) AS hi
               |  FROM embeddings),
               |q AS (SELECT lo AS qlo, hi AS qhi FROM packed WHERE vec_id = 7)
               |SELECT vec_id,
               |       CAST(bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)) AS BIGINT) AS ham
               |FROM packed, q WHERE vec_id <> 7
               |ORDER BY ham, vec_id LIMIT 10""".stripMargin)),

      // Matryoshka truncation: search on the 16-dim prefix of the
      // embedding (MRL-style nested representation) — 4× cheaper
      // candidate scoring with the same plan shape as full-dim search
      "vec_matryoshka" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions.score
          val emb = Tables.embeddings(s, d)
            .select(col("vec_id"), slice(col("embedding"), 1, 16).as("e16"))
          val q = emb.filter(col("vec_id") === 7).select(col("e16").as("q16"))
          emb.crossJoin(broadcast(q))
            .filter(col("vec_id") =!= 7)
            .select(col("vec_id"),
              (round(score(col("e16"), col("q16")), 6) + lit(0.0)).as("score"))
            .orderBy(col("score").desc, col("vec_id")).limit(10)
        },
        Some("""WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS e16 FROM embeddings),
               |q AS (SELECT e16 AS q16 FROM e WHERE vec_id = 7)
               |SELECT vec_id, round(list_cosine_similarity(e16, q16), 6) + 0.0 AS score
               |FROM e, q WHERE vec_id <> 7
               |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)),

      "vec_scalar_quant" -> Q(
        (s, d) => graft.ann.Quant.encode(Tables.embeddings(s, d))
          .select(col("vec_id"),
                  aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
                  array_min(col("codes")).as("code_min"),
                  array_max(col("codes")).as("code_max"))
          .orderBy("vec_id"),
        Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               |                     unnest(embedding) AS x
               |              FROM embeddings),
               |p AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
               |      FROM dims GROUP BY i),
               |codes AS (SELECT vec_id,
               |                 CASE WHEN mx = mn THEN 0
               |                      ELSE CAST(round((x::DOUBLE - mn) / (mx - mn) * 255.0) AS BIGINT)
               |                 END AS c
               |          FROM dims JOIN p USING (i))
               |SELECT vec_id, CAST(sum(c) AS BIGINT) AS code_sum,
               |       CAST(min(c) AS BIGINT) AS code_min,
               |       CAST(max(c) AS BIGINT) AS code_max
               |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

      // quantization fidelity report: per-vector cosine between the
      // original embedding and its int8 round-trip (encode → decode) —
      // the acceptance gate before switching ANN candidate generation
      // to the 4×-smaller codes
      "vec_quant_fidelity" -> Q(
        (s, d) => {
          import graft.functions.VectorFunctions
          graft.ann.Quant.decode(graft.ann.Quant.encode(Tables.embeddings(s, d)))
            .select(col("vec_id"),
              VectorFunctions.score(col("embedding"), col("dequant")).as("fid"))
            .agg(count(lit(1)).as("n_vectors"),
                 round(avg("fid"), 4).as("avg_fid"),
                 round(min("fid"), 4).as("min_fid"))
        },
        Some("""WITH dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               |                     unnest(embedding) AS x
               |              FROM embeddings),
               |p AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
               |      FROM dims GROUP BY i),
               |dq AS (SELECT vec_id, i,
               |              CASE WHEN mx = mn THEN mn
               |                   ELSE mn + CAST(round((x::DOUBLE - mn) / (mx - mn) * 255.0) AS BIGINT)
               |                        * (mx - mn) / 255.0 END AS y
               |       FROM dims JOIN p USING (i)),
               |dqa AS (SELECT vec_id, list(y ORDER BY i) AS dqv FROM dq GROUP BY vec_id),
               |c AS (SELECT e.vec_id,
               |             round(list_cosine_similarity(e.embedding::DOUBLE[], a.dqv), 6) + 0.0 AS fid
               |      FROM embeddings e JOIN dqa a USING (vec_id))
               |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               |       round(avg(fid), 4) AS avg_fid,
               |       round(min(fid), 4) AS min_fid
               |FROM c""".stripMargin)),

      // residual (two-stage) scalar quantization: int8 the residual
      // against the per-label centroid — same 8 bits over a tighter
      // range; QuantSpec asserts fidelity strictly beats plain int8
      "vec_residual_quant" -> Q(
        (s, d) => graft.ann.Quant.residualFidelity(
            Tables.embeddings(s, d), "label")
          .agg(count(lit(1)).as("n_vectors"),
               round(avg("fid"), 4).as("avg_fid"),
               round(min("fid"), 4).as("min_fid")),
        Some("""WITH dims AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
               |                     unnest(embedding) AS x
               |              FROM embeddings),
               |cent AS (SELECT label, i, avg(x::DOUBLE) AS m FROM dims GROUP BY label, i),
               |res AS (SELECT vec_id, i, x::DOUBLE - m AS r, m
               |        FROM dims JOIN cent USING (label, i)),
               |p AS (SELECT i, min(r) AS mn, max(r) AS mx FROM res GROUP BY i),
               |rq AS (SELECT vec_id, i,
               |              m + CASE WHEN mx = mn THEN r
               |                       ELSE mn + round((r - mn) / (mx - mn) * 255.0)
               |                            * (mx - mn) / 255.0 END AS y
               |       FROM res JOIN p USING (i)),
               |ra AS (SELECT vec_id, list(y ORDER BY i) AS rec FROM rq GROUP BY vec_id),
               |c AS (SELECT e.vec_id,
               |             round(list_cosine_similarity(e.embedding::DOUBLE[], a.rec), 6) + 0.0 AS fid
               |      FROM embeddings e JOIN ra a USING (vec_id))
               |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               |       round(avg(fid), 4) AS avg_fid,
               |       round(min(fid), 4) AS min_fid
               |FROM c""".stripMargin)),

      // one Lloyd's step of the IVF coarse quantizer, oracled: nearest
      // seed centroid by squared L2 (ties → smallest cid), then
      // per-cell re-centering (first two dims shown)
      "ann_kmeans_step" -> Q(
        (s, d) => {
          import graft.functions.VectorExpressions.{sqNorm, dot => vdot}
          val emb = Tables.embeddings(s, d)
          val centsRow = emb.filter(col("vec_id") < 8)
            .agg(sort_array(collect_list(
              struct(col("vec_id").as("cid"), col("embedding").as("cv")))).as("cents"))
          emb.crossJoin(broadcast(centsRow))
            .withColumn("key", element_at(array_sort(transform(col("cents"),
              e => struct(
                (sqNorm(col("embedding")) + sqNorm(e.getField("cv")) -
                  vdot(col("embedding"), e.getField("cv")) * 2).as("dd"),
                e.getField("cid").as("cid")))), 1))
            .select(col("vec_id"), col("embedding"), col("key.cid").as("cid"))
            .groupBy("cid")
            .agg(count(lit(1)).as("n"),
                 round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("c0"),
                 round(avg(element_at(col("embedding"), 2).cast("double")), 6).as("c1"))
            .orderBy("cid")
        },
        Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               |               FROM embeddings WHERE vec_id < 8),
               |a AS (SELECT e.vec_id, e.embedding, cid,
               |        row_number() OVER (PARTITION BY e.vec_id ORDER BY
               |          list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) +
               |          list_inner_product(cv, cv) -
               |          list_inner_product(e.embedding::DOUBLE[], cv) * 2, cid) AS rn
               |      FROM embeddings e, cents)
               |SELECT cid, CAST(count(*) AS BIGINT) AS n,
               |       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c0,
               |       round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c1
               |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid""".stripMargin)),

      // product-quantization ADC search, oracled: 4×16-d subspaces,
      // codebooks = seed-vector slices, per-subspace argmin codes,
      // asymmetric distance = Σ_s d(q_s, c_{s,code_s}), top-5.
      // All sums explicitly left-associated on both engines.
      "vec_pq_adc" -> Q(
        (s, d) => {
          import graft.functions.VectorExpressions.{sqNorm, dot => vdot}
          val emb = Tables.embeddings(s, d)
          val dsub = 16
          def sub(c: Column, si: Int) = slice(c, lit(si * dsub + 1), lit(dsub))
          def sqd(a: Column, b: Column) = sqNorm(a) + sqNorm(b) - vdot(a, b) * 2
          val centCols = (0 until 4).map(si =>
            sort_array(collect_list(struct(col("vec_id").as("cid"),
              sub(col("embedding"), si).as("cv")))).as(s"c$si"))
          val centsRow = emb.filter(col("vec_id") < 4)
            .agg(centCols.head, centCols.tail: _*)
          val q = emb.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
          def termFor(si: Int): Column = {
            val key = element_at(array_sort(transform(col(s"c$si"),
              e => struct(sqd(sub(col("embedding"), si), e.getField("cv")).as("dd"),
                          e.getField("cid").as("cid")))), 1)
            sqd(sub(col("qv"), si),
                element_at(col(s"c$si"),
                  (key.getField("cid") + 1).cast("int")).getField("cv"))
          }
          val adc = ((termFor(0) + termFor(1)) + termFor(2)) + termFor(3)
          val w = Window.orderBy(col("adc").asc, col("vec_id"))
          emb.filter(col("vec_id") =!= 42)
            .crossJoin(broadcast(centsRow)).crossJoin(broadcast(q))
            .select(col("vec_id"), (round(adc, 6) + lit(0.0)).as("adc"))
            .orderBy(col("adc").asc, col("vec_id")).limit(5)
            .withColumn("rnk", row_number().over(w).cast("long"))
            .orderBy("rnk")
        },
        Some {
          def ip(a: String, b: String) = s"list_inner_product($a, $b)"
          def sl(v: String) = s"$v[s.s*16+1 : s.s*16+16]"
          def sqdSql(a: String, b: String) =
            s"${ip(sl(a), sl(a))} + ${ip(sl(b), sl(b))} - ${ip(sl(a), sl(b))} * 2"
          s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cents AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 4),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 42),
             |sub AS (SELECT x.vec_id, s.s, c.cid, ${sqdSql("x.v", "c.v")} AS dd
             |        FROM e x, generate_series(0, 3) s(s), cents c
             |        WHERE x.vec_id <> 42),
             |chosen AS (SELECT vec_id, s, cid FROM (
             |  SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
             |  FROM sub) WHERE rn = 1),
             |qd AS (SELECT s.s, c.cid, ${sqdSql("q.qv", "c.v")} AS dq
             |       FROM q, generate_series(0, 3) s(s), cents c),
             |t AS (SELECT vec_id,
             |        max(CASE WHEN s = 0 THEN dq END) AS t0,
             |        max(CASE WHEN s = 1 THEN dq END) AS t1,
             |        max(CASE WHEN s = 2 THEN dq END) AS t2,
             |        max(CASE WHEN s = 3 THEN dq END) AS t3
             |      FROM chosen JOIN qd USING (s, cid) GROUP BY vec_id)
             |SELECT vec_id, adc, rnk FROM (
             |  SELECT vec_id, round(((t0 + t1) + t2) + t3, 6) + 0.0 AS adc,
             |         CAST(row_number() OVER (
             |           ORDER BY round(((t0 + t1) + t2) + t3, 6) + 0.0, vec_id) AS BIGINT) AS rnk
             |  FROM t)
             |WHERE rnk <= 5 ORDER BY rnk""".stripMargin
        }),

      // served from the cell-PARTITIONED materialized index: probed
      // cells equi-join the partition column (pruned I/O, plan-guarded)
      "ann_ivf_probe" -> Q(
        (s, d) => graft.ann.AnnIndex.ivfProbeIndexed(s, d,
          nCents = 4, qid = 42L, nprobe = 2, k = 5),
        Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               |               FROM embeddings WHERE vec_id < 4),
               |scored AS (
               |  SELECT e.vec_id, e.embedding, c.cid,
               |         row_number() OVER (PARTITION BY e.vec_id
               |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
               |  FROM embeddings e, cents c),
               |assigned AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
               |probes AS (SELECT cid AS pcid FROM scored WHERE vec_id = 42 AND rn <= 2),
               |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42)
               |SELECT vec_id, cid, score, rnk FROM (
               |  SELECT a.vec_id, a.cid,
               |         round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv), 6) + 0.0 AS score,
               |         CAST(row_number() OVER (
               |           ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv), 6) + 0.0 DESC, a.vec_id) AS BIGINT) AS rnk
               |  FROM assigned a, probes, q
               |  WHERE a.cid = pcid AND a.vec_id <> 42)
               |WHERE rnk <= 5 ORDER BY rnk""".stripMargin)))
  }

  // ---------------------------------------------------------------
  // Multimodal (SURVEY §2 #27)
  // ---------------------------------------------------------------

  val multimodalQ: Seq[(String, Q)] = Seq(
    "mm_binary_meta" -> Q(
      (s, d) => graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d)),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       hm % 1024 + 1 AS width, (hm // 1024) % 1024 + 1 AS height
             |FROM (SELECT doc_id, text, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // video frame-sampling fan-out (every 30th frame) as a pure
    // Catalyst explode — the oracle-able twin of
    // Multimodal.sampleFrames' mapPartitions shape
    "mm_frame_sample" -> Q(
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 2) // kind = video
        .select(col("doc_id"),
                (graft.functions.VectorFunctions.md5Long(col("text")) % 240 + 1).as("n_frames"))
        .select(col("doc_id"),
                explode(sequence(lit(0L), col("n_frames") - 1, lit(30L))).as("frame_idx"))
        .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 30)) AS BIGINT) AS frame_idx
             |FROM (SELECT doc_id,
             |             ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1 AS n_frames
             |      FROM documents WHERE doc_id % 3 = 2)
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // resize-to-box metadata math (max side 256, aspect preserved) —
    // floor() made explicit on both sides (DuckDB CAST rounds)
    "mm_resize_box" -> Q(
      (s, d) => graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d))
        .withColumn("scale",
          least(lit(1.0), lit(256.0) / greatest(col("width"), col("height"))))
        .select(col("doc_id"), col("width"), col("height"),
                greatest(lit(1L), floor(col("width") * col("scale")).cast("long")).as("new_w"),
                greatest(lit(1L), floor(col("height") * col("scale")).cast("long")).as("new_h"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, width, height,
             |       greatest(1, CAST(floor(width * scale) AS BIGINT)) AS new_w,
             |       greatest(1, CAST(floor(height * scale) AS BIGINT)) AS new_h
             |FROM (SELECT doc_id, width, height,
             |             least(1.0, 256.0 / greatest(width, height)) AS scale
             |      FROM (SELECT doc_id, hm % 1024 + 1 AS width,
             |                   (hm // 1024) % 1024 + 1 AS height
             |            FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |                  FROM documents)))
             |ORDER BY doc_id""".stripMargin)),

    // ViT-style patch grid: resize to 224 max-side (same math as
    // mm_resize_box), then fan out one row per 16x16 patch with pixel
    // offsets and edge-clipped extents — the coordinate plan an image
    // encoder's decode stage consumes. Explode is map-side; per-image
    // fan-out is bounded by (224/16)^2 = 196 patches
    "mm_patch_grid" -> Q(
      (s, d) => graft.multimodal.Multimodal.binaryMeta(Tables.documents(s, d))
        .filter(col("doc_id") < 30)
        .withColumn("scale",
          least(lit(1.0), lit(224.0) / greatest(col("width"), col("height"))))
        .select(col("doc_id"),
          greatest(lit(1L), floor(col("width") * col("scale")).cast("long")).as("w"),
          greatest(lit(1L), floor(col("height") * col("scale")).cast("long")).as("h"))
        .withColumn("npx", expr("(w + 15) DIV 16"))
        .select(col("doc_id"), col("w"), col("h"), col("npx"),
          explode(sequence(lit(0L), col("npx") * expr("(h + 15) DIV 16") - 1)).as("p"))
        .select(col("doc_id"), col("w"), col("h"), col("p"),
          (pmod(col("p"), col("npx")) * 16).as("x0"),
          (expr("p DIV npx") * 16).as("y0"),
          least(lit(16L), col("w") - pmod(col("p"), col("npx")) * 16).as("pw"),
          least(lit(16L), col("h") - expr("p DIV npx") * 16).as("ph"))
        .orderBy("doc_id", "p"),
      Some("""SELECT doc_id, w, h, p,
             |       (p % npx) * 16 AS x0, (p // npx) * 16 AS y0,
             |       least(16, w - (p % npx) * 16) AS pw,
             |       least(16, h - (p // npx) * 16) AS ph
             |FROM (
             |  SELECT doc_id, w, h, npx,
             |         CAST(unnest(generate_series(0, npx * ((h + 15) // 16) - 1)) AS BIGINT) AS p
             |  FROM (
             |    SELECT doc_id, w, h, (w + 15) // 16 AS npx
             |    FROM (
             |      SELECT doc_id,
             |             greatest(1, CAST(floor(width * scale) AS BIGINT)) AS w,
             |             greatest(1, CAST(floor(height * scale) AS BIGINT)) AS h
             |      FROM (SELECT doc_id, width, height,
             |                   least(1.0, 224.0 / greatest(width, height)) AS scale
             |            FROM (SELECT doc_id, hm % 1024 + 1 AS width,
             |                         (hm // 1024) % 1024 + 1 AS height
             |                  FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |                        FROM documents WHERE doc_id < 30))))))
             |ORDER BY doc_id, p""".stripMargin)),

    // audio segmentation: fixed 10s windows from (sample_rate,
    // n_samples) metadata with tail-padding flag — the fan-out an
    // ASR/audio-embedding pipeline feeds to its decoder (decode
    // itself stubbed; md5-derived fake metadata, same as mm_binary_meta)
    "mm_audio_windows" -> Q(
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 1) // kind = audio
        .select(col("doc_id"), graft.functions.VectorFunctions.md5Long(col("text")).as("hm"))
        .selectExpr("doc_id",
          "element_at(array(8000L, 16000L, 44100L), CAST(hm % 3 AS INT) + 1) AS sr",
          "hm % 2000000 + 1 AS n_samples")
        .selectExpr("doc_id", "sr", "n_samples", "sr * 10 AS win",
          "(n_samples + sr * 10 - 1) DIV (sr * 10) AS n_win")
        .select(col("doc_id"), col("sr"), col("n_samples"),
          explode(sequence(lit(0L), col("n_win") - 1)).as("win_idx"),
          col("win"), col("n_win"))
        .select(col("doc_id"), col("sr"), col("n_samples"), col("win_idx"),
          (col("win_idx") * col("win")).as("start_sample"),
          least(col("win_idx") * col("win") + col("win"), col("n_samples")).as("end_sample"),
          (col("win_idx") === col("n_win") - 1 && col("n_samples") % col("win") =!= 0)
            .cast("int").as("padded"))
        .orderBy("doc_id", "win_idx"),
      Some("""SELECT doc_id, sr, n_samples, win_idx,
             |       win_idx * win AS start_sample,
             |       least(win_idx * win + win, n_samples) AS end_sample,
             |       CAST(win_idx = n_win - 1 AND n_samples % win <> 0 AS INTEGER) AS padded
             |FROM (
             |  SELECT doc_id, sr, n_samples, win, n_win,
             |         CAST(unnest(generate_series(0, n_win - 1)) AS BIGINT) AS win_idx
             |  FROM (
             |    SELECT doc_id, sr, n_samples, sr * 10 AS win,
             |           (n_samples + sr * 10 - 1) // (sr * 10) AS n_win
             |    FROM (
             |      SELECT doc_id, CAST(([8000, 16000, 44100])[CAST(hm % 3 AS INTEGER) + 1] AS BIGINT) AS sr,
             |             hm % 2000000 + 1 AS n_samples
             |      FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hm
             |            FROM documents WHERE doc_id % 3 = 1))))
             |ORDER BY doc_id, win_idx""".stripMargin)),

    // shot-boundary detection over the sampled frame sequence: the
    // per-frame "feature" is the decode stub (deterministic hash per
    // (doc, frame) — no codecs in this container; the Spark-side
    // plumbing is the real part), a cut is a frame whose feature
    // jumps > 600 from its predecessor, shots = cuts + 1. The lag
    // window is bounded by the per-video frame count (≤ 240), never
    // the corpus, so the shape survives any number of videos.
    "mm_shot_bounds" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.md5Long
        val frames = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 2) // kind = video
          .select(col("doc_id"),
            (md5Long(col("text")) % 240 + 1).as("n_frames"))
          .select(col("doc_id"), col("n_frames"),
            explode(sequence(lit(0L), col("n_frames") - 1)).as("f"))
          .withColumn("feat",
            md5Long(concat(col("doc_id").cast("string"), lit("#"),
              col("f").cast("string"))) % 1000)
        val w = Window.partitionBy("doc_id").orderBy("f")
        frames.withColumn("pf", lag(col("feat"), 1).over(w))
          .groupBy("doc_id", "n_frames")
          .agg(sum(when(abs(col("feat") - col("pf")) > 600, 1L).otherwise(0L))
            .as("n_cuts"))
          .withColumn("n_shots", col("n_cuts") + 1)
          .orderBy("doc_id")
      },
      Some("""WITH fr AS (
             |  SELECT doc_id, n_frames,
             |         CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS f
             |  FROM (SELECT doc_id,
             |               ('0x' || substr(md5(text), 1, 15))::BIGINT % 240 + 1 AS n_frames
             |        FROM documents WHERE doc_id % 3 = 2)),
             |ft AS (SELECT doc_id, n_frames, f,
             |         ('0x' || substr(md5(doc_id::VARCHAR || '#' || f::VARCHAR), 1, 15))::BIGINT
             |           % 1000 AS feat
             |       FROM fr),
             |lg AS (SELECT doc_id, n_frames, feat,
             |         lag(feat) OVER (PARTITION BY doc_id ORDER BY f) AS pf FROM ft)
             |SELECT doc_id, n_frames,
             |       CAST(sum(CASE WHEN abs(feat - pf) > 600 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
             |       CAST(sum(CASE WHEN abs(feat - pf) > 600 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_shots
             |FROM lg GROUP BY doc_id, n_frames ORDER BY doc_id""".stripMargin)))

  // regrouped from the round-named inventory files in round 15
  // (pure move — same query names, same bodies)
  val annR: Seq[(String, Q)] = Seq(
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

    // NN-descent graph refinement (Dong et al. 2011) — THE build
    // primitive behind graph ANN indexes: start from a cheap ring
    // seed k-NN graph, repeatedly score neighbors-of-neighbors (both
    // directions) and keep the best 5, measure recall against the
    // exact graph after each round. Candidate scoring touches ONLY
    // the ≤55·n candidate edges (never the n² grid — that join is
    // the bounded truth oracle, the same documented altitude as
    // dedup_embed_cosine); two rounds shown converging. vec_ids are
    // dense 0..n−1 by the testdata contract, so the ring is pure
    // modular arithmetic — no global window anywhere.
    "ann_nn_descent" -> Q(
      (s, d) => {
        // r17: the whole refinement folds DRIVER-side over the ONE
        // distributed pass (the ≤300-row bounded pool collect) — the
        // in-plan form chained ~20 jobs (truth join + window, two
        // refine rounds of 4 joins + distinct + window each, three
        // recall probes) over frames bounded by construction at
        // ≤55·300 candidate edges. Scoring reuses the spec-pinned
        // kernel fn (cosineRounded6Kernel ≡ the score() expression ≡
        // the oracle's list_cosine_similarity round-6), every other
        // step is integer/set arithmetic, and the final round-4 is
        // Spark's own BigDecimal HALF_UP — bit-identical output.
        val pool = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull && col("vec_id") < 300)
          .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        val embOf = pool.toMap
        val ids = pool.map(_._1)
        val sc = graft.ann.Ann.cosineRounded6Kernel
        // per-a top-5 by (score desc, b asc) — the row_number() tie
        // order of the in-plan window, exact on round-6 doubles
        def top5(scored: Seq[(Long, Long, Double)]): Seq[(Long, Long)] =
          scored.groupBy(_._1).toSeq.flatMap { case (_, g) =>
            g.sortBy { case (_, b, sv) => (-sv, b) }.take(5)
              .map { case (a, b, _) => (a, b) }
          }
        val truth = top5(for {
          (a, ea) <- pool.toSeq; (b, eb) <- pool if a != b
        } yield (a, b, sc(ea, eb))).toSet
        val seed: Seq[(Long, Long)] =
          for { a <- ids.toSeq; i <- 1L to 5L } yield (a, (a + i) % 300L)
        // inner-join closure of the in-plan scoreOf: candidates whose
        // endpoint is outside the pool drop (fa/fb were inner joins)
        def scoreOf(g: Seq[(Long, Long)]): Seq[(Long, Long, Double)] =
          g.collect { case (a, b) if embOf.contains(a) && embOf.contains(b) =>
            (a, b, sc(embOf(a), embOf(b))) }
        def refine(g: Seq[(Long, Long)]): Seq[(Long, Long)] = {
          val rev = g.map { case (a, b) => (b, a) }
          val byA = g.groupBy(_._1)   // m -> (m, b) rows of g
          val byB = g.groupBy(_._2)   // m -> (a, m) rows of g
          val nn = g.flatMap { case (a, m) =>
            byA.getOrElse(m, Nil).map { case (_, b) => (a, b) } } ++
            g.flatMap { case (a, m) =>
              byB.getOrElse(m, Nil).map { case (b, _) => (a, b) } }
          val cand = (g ++ rev ++ nn).filter { case (a, b) => a != b }.distinct
          top5(scoreOf(cand))
        }
        val r1 = refine(seed)
        val r2 = refine(r1)
        val nTruth = truth.size.toLong
        def rec(g: Seq[(Long, Long)], stage: String): (String, Long, Double) = {
          val nHit = g.count(truth.contains)
          // Spark's round() passes NaN/Infinity through (the empty-
          // table 0/0 case must keep executing, as the in-plan form
          // did — RobustnessSurfaceSpec)
          val r = nHit.toDouble / nTruth
          (stage, nTruth,
            if (r.isNaN || r.isInfinite) r
            else java.math.BigDecimal.valueOf(r)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
        }
        import s.implicits._
        Seq(rec(seed, "0_seed"), rec(r1, "1_round"), rec(r2, "2_round"))
          .toDF("stage", "n_truth", "recall")
          .orderBy("stage")
      },
      Some("""WITH f AS MATERIALIZED (
             |  SELECT vec_id AS id, embedding::DOUBLE[] AS emb
             |  FROM embeddings WHERE embedding IS NOT NULL AND vec_id < 300),
             |p AS MATERIALIZED (
             |  SELECT a.id AS a, b.id AS b,
             |         round(list_cosine_similarity(a.emb, b.emb), 6) + 0.0 AS s
             |  FROM f a JOIN f b ON a.id <> b.id),
             |truth AS MATERIALIZED (
             |  SELECT a, b FROM (SELECT a, b, row_number() OVER
             |      (PARTITION BY a ORDER BY s DESC, b) AS rk FROM p)
             |  WHERE rk <= 5),
             |seed AS MATERIALIZED (
             |  SELECT id AS a, (id + i) % 300 AS b
             |  FROM f, (SELECT CAST(unnest(generate_series(1, 5)) AS BIGINT) AS i)),
             |c1 AS (SELECT DISTINCT a, b FROM (
             |         SELECT a, b FROM seed
             |         UNION SELECT b AS a, a AS b FROM seed
             |         UNION SELECT g1.a, g2.b FROM seed g1
             |           JOIN seed g2 ON g1.b = g2.a
             |         UNION SELECT g1.a, g2.a AS b FROM seed g1
             |           JOIN seed g2 ON g1.b = g2.b)
             |       WHERE a <> b),
             |r1 AS MATERIALIZED (
             |  SELECT a, b FROM (SELECT c1.a, c1.b, p.s, row_number() OVER
             |      (PARTITION BY c1.a ORDER BY p.s DESC, c1.b) AS rk
             |    FROM c1 JOIN p ON p.a = c1.a AND p.b = c1.b)
             |  WHERE rk <= 5),
             |c2 AS (SELECT DISTINCT a, b FROM (
             |         SELECT a, b FROM r1
             |         UNION SELECT b AS a, a AS b FROM r1
             |         UNION SELECT g1.a, g2.b FROM r1 g1
             |           JOIN r1 g2 ON g1.b = g2.a
             |         UNION SELECT g1.a, g2.a AS b FROM r1 g1
             |           JOIN r1 g2 ON g1.b = g2.b)
             |       WHERE a <> b),
             |r2 AS MATERIALIZED (
             |  SELECT a, b FROM (SELECT c2.a, c2.b, p.s, row_number() OVER
             |      (PARTITION BY c2.a ORDER BY p.s DESC, c2.b) AS rk
             |    FROM c2 JOIN p ON p.a = c2.a AND p.b = c2.b)
             |  WHERE rk <= 5),
             |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
             |SELECT stage, n_truth, recall FROM (
             |  SELECT '0_seed' AS stage, nt.n_truth,
             |         round((SELECT count(*) FROM seed g JOIN truth t
             |                ON t.a = g.a AND t.b = g.b)
             |               / CAST(nt.n_truth AS DOUBLE), 4) AS recall FROM nt
             |  UNION ALL
             |  SELECT '1_round', nt.n_truth,
             |         round((SELECT count(*) FROM r1 g JOIN truth t
             |                ON t.a = g.a AND t.b = g.b)
             |               / CAST(nt.n_truth AS DOUBLE), 4) FROM nt
             |  UNION ALL
             |  SELECT '2_round', nt.n_truth,
             |         round((SELECT count(*) FROM r2 g JOIN truth t
             |                ON t.a = g.a AND t.b = g.b)
             |               / CAST(nt.n_truth AS DOUBLE), 4) FROM nt)
             |ORDER BY stage""".stripMargin)),

    // Post-filtering recall audit: for label-filtered search, how much
    // of the TRUE filtered top-10 survives the
    // "global top-50 → apply filter → take 10" shortcut every
    // pre-filter-vs-post-filter ANN design debate is about. Exact
    // cosine on both paths (the eval isolates the FILTER strategy,
    // not index approximation); 5 query vectors, scores 6dp-pinned
    // with vec_id tie-breaks, so both engines rank identically.
    "ann_filtered_recall" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("label").as("ql"),
            col("embedding").as("qv"))
        val sc = emb.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("ql"), col("vec_id"), col("label"),
            score(col("embedding"), col("qv")).as("sc"))
          .localCheckpoint(eager = false) // truth ranks + global ranks
        val wq = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
        val truth = sc.filter(col("label") === col("ql"))
          .withColumn("rk", row_number().over(wq))
          .filter(col("rk") <= 10)
          .select(col("qid"), col("vec_id"))
        val post = sc.withColumn("rka", row_number().over(wq))
          .filter(col("rka") <= 50 && col("label") === col("ql"))
          .withColumn("rp", row_number().over(
            Window.partitionBy("qid").orderBy("rka")))
          .filter(col("rp") <= 10)
          .select(col("qid"), col("vec_id").as("pv"))
        truth.join(post,
            truth("qid") === post("qid") && col("vec_id") === col("pv"),
            "left")
          .groupBy(truth("qid").as("qid"))
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("pv").isNotNull, 1L).otherwise(0L)).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_true").cast("double"), 4))
          .orderBy("qid")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |sc AS (
             |  SELECT q.qid, q.ql, e.vec_id, e.label,
             |         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) + 0.0 AS sc
             |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
             |truth AS (
             |  SELECT qid, vec_id FROM (
             |    SELECT qid, vec_id,
             |           row_number() OVER (PARTITION BY qid
             |             ORDER BY sc DESC, vec_id) AS rk
             |    FROM sc WHERE label = ql)
             |  WHERE rk <= 10),
             |ga AS (
             |  SELECT qid, ql, vec_id, label,
             |         row_number() OVER (PARTITION BY qid
             |           ORDER BY sc DESC, vec_id) AS rka
             |  FROM sc),
             |post AS (
             |  SELECT qid, vec_id FROM (
             |    SELECT qid, vec_id,
             |           row_number() OVER (PARTITION BY qid ORDER BY rka) AS rp
             |    FROM ga WHERE rka <= 50 AND label = ql)
             |  WHERE rp <= 10)
             |SELECT t.qid, CAST(count(*) AS BIGINT) AS n_true,
             |       CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_hit,
             |       round(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 4) AS recall
             |FROM truth t LEFT JOIN post p
             |  ON p.qid = t.qid AND p.vec_id = t.vec_id
             |GROUP BY t.qid ORDER BY t.qid""".stripMargin)),

    // IVF cell-balance audit: per-cell population and deviation from
    // the even share under the same deterministic-centroid cosine
    // assignment ann_ivf_probe serves from — a skewed cell is tail
    // latency (every probe touching it scans it all) and the signal
    // to re-train or split. One assignment pass + a tiny rollup.
    "ann_cell_balance" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val emb = Tables.embeddings(s, d)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val w = Window.partitionBy("vec_id")
          .orderBy(col("sc").desc, col("cid"))
        val assigned = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("cid"),
            score(col("embedding"), col("cv")).as("sc"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy("cid").agg(count(lit(1)).as("n_vecs"))
          .localCheckpoint(eager = false) // total + per-cell rows
        val tot = assigned.agg(sum("n_vecs").as("nn"), count(lit(1)).as("nc"))
        assigned.crossJoin(broadcast(tot))
          .select(col("cid"), col("n_vecs"),
            round(col("n_vecs") / col("nn").cast("double"), 4).as("share"),
            round(col("n_vecs").cast("double")
              / (col("nn").cast("double") / col("nc")) - 1.0, 4).as("dev_pct"))
          .orderBy("cid")
      },
      Some("""WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             |               FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT e.vec_id, c.cid,
             |         row_number() OVER (PARTITION BY e.vec_id
             |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) + 0.0 DESC, c.cid) AS rn
             |  FROM embeddings e, cents c),
             |a AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs
             |      FROM scored WHERE rn = 1 GROUP BY cid),
             |t AS (SELECT sum(n_vecs) AS nn, CAST(count(*) AS BIGINT) AS nc FROM a)
             |SELECT cid, n_vecs,
             |       round(n_vecs / CAST(nn AS DOUBLE), 4) AS share,
             |       round(CAST(n_vecs AS DOUBLE)
             |             / (CAST(nn AS DOUBLE) / nc) - 1.0, 4) AS dev_pct
             |FROM a, t ORDER BY cid""".stripMargin)),

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

    // radius-search profile (the range-query semantics beside top-k):
    // how many corpus vectors fall inside cosine ≥ τ balls around a
    // query, for a τ sweep — the capacity-planning readout before
    // choosing a score_threshold (reference search exposes one). ONE
    // scan, conditional sums; self excluded.
    "ann_epsilon_ball" -> Q(
      (s, d) => {
        import graft.functions.VectorFunctions.score
        val q = Tables.embeddings(s, d).filter(col("vec_id") === 42)
          .select(col("embedding").as("q"))
        Tables.embeddings(s, d).filter(col("vec_id") =!= 42)
          .crossJoin(broadcast(q))
          .select(score(col("embedding"), col("q")).as("sc"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("sc") >= 0.3, 1L).otherwise(0L)).as("n_03"),
            sum(when(col("sc") >= 0.5, 1L).otherwise(0L)).as("n_05"),
            sum(when(col("sc") >= 0.7, 1L).otherwise(0L)).as("n_07"),
            round(max("sc"), 6).as("max_sc"),
            round(avg("sc"), 6).as("avg_sc"))
      },
      Some(s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42),
              |sc AS (SELECT ${sqlScore("e.embedding", "q.qv")} AS sc
              |       FROM embeddings e, q WHERE e.vec_id <> 42)
              |SELECT CAST(count(*) AS BIGINT) AS n,
              |       CAST(sum(CASE WHEN sc >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_03,
              |       CAST(sum(CASE WHEN sc >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_05,
              |       CAST(sum(CASE WHEN sc >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_07,
              |       round(max(sc), 6) AS max_sc, round(avg(sc), 6) AS avg_sc
              |FROM sc""".stripMargin)),

    // LSH index-maintenance cost estimator: an upsert batch arrives —
    // how many bucket PARTITIONS of the write-time-partitioned index
    // get rewritten, and what is the write amplification
    // (rows_rewritten / batch rows under dynamic partition overwrite)?
    // The capacity answer that decides micro-batch sizing vs
    // compaction cadence for a served ANN index. Buckets are the
    // map-side bucketCol projection; every aggregate here is ≤2^6
    // rows.
    "ann_upsert_buckets" -> Q(
      (s, d) => {
        val all = graft.ann.Ann.withBucket(Tables.embeddings(s, d), 6, 64)
          .select(col("vec_id"), col("bucket"))
          .localCheckpoint(eager = false) // batch + per-bucket counts
        val batch = all.filter(col("vec_id") % 40 === 0)
        val touched = batch.select("bucket").distinct()
        val bc = all.groupBy("bucket").agg(count(lit(1)).as("cb"))
        val tot = bc.agg(count(lit(1)).as("n_buckets_total"))
        val t = bc.join(broadcast(touched), "bucket")
          .agg(count(lit(1)).as("n_buckets_touched"),
               sum("cb").as("rows_rewritten"))
        batch.agg(count(lit(1)).as("n_batch"))
          .crossJoin(broadcast(t)).crossJoin(broadcast(tot))
          .select(col("n_batch"), col("n_buckets_touched"),
            col("n_buckets_total"), col("rows_rewritten"),
            round(col("n_buckets_touched").cast("double")
              / col("n_buckets_total"), 4).as("touched_frac"),
            round(col("rows_rewritten").cast("double") / col("n_batch"), 4)
              .as("write_amp"))
      },
      Some("""WITH planes AS (
             |  SELECT p, list_transform(generate_series(0, 63), dd ->
             |    (('0x' || substr(md5(concat_ws('_', 'pl', p, dd)), 1, 15))::BIGINT % 2001 - 1000) / 1000.0) AS w
             |  FROM generate_series(0, 5) t(p)),
             |b AS (
             |  SELECT vec_id,
             |         CAST(sum(CASE WHEN list_inner_product(embedding::DOUBLE[], w) > 0
             |                       THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM embeddings, planes GROUP BY vec_id),
             |batch AS (SELECT * FROM b WHERE vec_id % 40 = 0),
             |touched AS (SELECT DISTINCT bucket FROM batch),
             |bc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY bucket),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets_total FROM bc),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets_touched,
             |             CAST(sum(cb) AS BIGINT) AS rows_rewritten
             |      FROM bc JOIN touched USING (bucket)),
             |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_batch FROM batch)
             |SELECT n_batch, n_buckets_touched, n_buckets_total, rows_rewritten,
             |       round(CAST(n_buckets_touched AS DOUBLE) / n_buckets_total, 4) AS touched_frac,
             |       round(CAST(rows_rewritten AS DOUBLE) / n_batch, 4) AS write_amp
             |FROM nb, t, tot""".stripMargin))
  )
}
