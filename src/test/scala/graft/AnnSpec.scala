package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann

class AnnSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)

  test("brute force topk: k rows per query, rank 1 is the max score") {
    val q = emb.filter(col("vec_id") <= 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val res = Ann.bruteForceTopK(emb, q, 5).collect()
    assert(res.length == 15)
    res.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rnk"))
      val scores = byRank.map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sortBy(-_)))
    }
  }

  test("dense kernel topk is row-identical to the BNLJ formulation") {
    // every vector as a query — the kNN-graph shape the kernel exists
    // for; scores must match BIT-forwise (same accumulation order,
    // same round) and ranks must match on ties (same comparator)
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val a = Ann.bruteForceTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val b = Ann.bruteForceTopKDense(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
    // overflow path (tile far below the query count) now routes to the
    // 2D block-matrix kernel — must be row-identical too: blocking is
    // a memory/shuffle shape, not a result
    val c = Ann.denseKernelTopK(emb, q, 5, Ann.cosineRounded6Kernel, tile = 37)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(a.length == c.length)
    a.zip(c).foreach { case (x, y) => assert(x == y, s"tiled: $x != $y") }
    // blocked kernel pinned directly at adversarially small tile AND
    // block sizes (many tiles × many blocks × salted slots): the
    // partial-TopK-on-both-axes merge must still be exact
    val d = Ann.blockedTop(emb, q, 5, Ann.cosineRounded6Kernel,
        tile = 19, blockRows = 23)
      .select(col("qid"), org.apache.spark.sql.functions.posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"),
              (col("pos") + 1).cast("long").as("rnk"))
      .orderBy("qid", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(a.length == d.length)
    a.zip(d).foreach { case (x, y) => assert(x == y, s"blocked: $x != $y") }
  }

  test("unordered dense kernel: same row SET, no final range sort") {
    // r17: edge-list consumers (ann_knn_graph, emb_knn_vote) skip the
    // (qid, rnk) orderBy — the row multiset must be unchanged; only
    // the range-partitioned sort (and its sampling pass) is gone
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val a = Ann.bruteForceTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val u = Ann.bruteForceTopKDenseUnordered(emb, q, 5)
    val b = u.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
    val plan = u.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("fast-path dispatch bound is dim-aware") {
    // the one-broadcast fast path collects the batch to the driver:
    // its bound must shrink with dim so a 1024-d batch can never
    // materialize the raw 2^16 default (512 MB) driver-side.
    // 64 MB of packed doubles: 8192 rows at 1024-d, 131072 at 64-d
    // (the caller tile still wins when smaller).
    assert(Ann.fastPathCap(1024, Ann.defaultKernelTile) == 8192)
    assert(Ann.fastPathCap(64, Ann.defaultKernelTile) == Ann.defaultKernelTile)
    assert(Ann.fastPathCap(1024, 4) == 4)   // explicit spec tiles win
    assert(Ann.fastPathCap(0, 123) == 123)  // empty batch: inert
    // and the capped dispatch stays row-identical: force the cap to
    // bite by setting tile just above the cap at a dim where the cap
    // is tiny relative to the batch
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val a = Ann.bruteForceTopK(emb, q, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val b = Ann.denseKernelTopK(emb, q, 3, Ann.cosineRounded6Kernel, tile = 41)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"capped: $x != $y") }
  }

  test("LSH multiprobe recall vs brute force is meaningful") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val q = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Ann.bruteForceTopK(emb, q, 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val approx = Ann.lshTopK(emb, qids, nPlanes = 4, dim = 64, probeDist = 2, k = 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // random-hyperplane LSH with wide probes on 500 vectors: expect
    // a sizable fraction of true neighbors, far above random chance
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("TopK aggregate matches the window formulation exactly") {
    val q = emb.filter(col("vec_id") <= 7)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val viaAgg = Ann.bruteForceTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val viaWin = Ann.bruteForceTopKWindow(emb, q, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
                 r.getAs[Double]("score"), r.getAs[Long]("rnk")))
    assert(viaAgg.toSeq == viaWin.toSeq)
  }

  test("kmeans refinement reduces IVF assignment cost") {
    import graft.functions.VectorExpressions
    def inertia(cents: org.apache.spark.sql.DataFrame): Double = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("d").asc, col("cid"))
      emb.crossJoin(broadcast(cents))
        .withColumn("d", VectorExpressions.sqNorm(col("embedding")) +
          VectorExpressions.sqNorm(col("cv")) -
          VectorExpressions.dot(col("embedding"), col("cv")) * 2)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .agg(sum("d")).head().getDouble(0)
    }
    val c1 = Ann.kmeansCentroids(emb, 8, 1)
    val c4 = Ann.kmeansCentroids(emb, 8, 4)
    val (i1, i4) = (inertia(c1), inertia(c4))
    assert(i4 <= i1 + 1e-9, s"inertia rose: $i1 -> $i4")
  }

  test("LSH bucket as partition column: probe scans are pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh").toString + "/idx"
    val sig = Ann.signatures(emb, Ann.planes(spark, 4, 64))
    emb.join(sig, "vec_id").write.partitionBy("bucket").mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val probe = idx.filter(col("bucket") === 3)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket pruning in:\n$plan")
  }

  test("map-side bucket column equals the shuffle signature formulation") {
    val viaAgg = Ann.signatures(emb, Ann.planes(spark, 6, 64)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = Ann.withBucket(emb, 6, 64).select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaCol)
  }

  test("ivfProbe matches the window-based reference formulation") {
    import graft.functions.VectorFunctions.score
    import org.apache.spark.sql.expressions.Window
    val cents = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("cs").desc, col("cid"))
    val scored = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
              score(col("embedding"), col("cv")).as("cs"))
      .withColumn("rn", row_number().over(wAssign))
    val assigned = scored.filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
    val probes = scored.filter(col("vec_id") === 42 && col("rn") <= 2)
      .select(col("cid").as("pcid"))
    val q = emb.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
    val wTop = Window.orderBy(col("score").desc, col("vec_id"))
    val ref = assigned.join(broadcast(probes), col("cid") === col("pcid"))
      .filter(col("vec_id") =!= 42)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cid"), score(col("embedding"), col("qv")).as("score"))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val opt = Ann.ivfProbe(emb, nCents = 4, qid = 42L, nprobe = 2, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(opt.toSeq == ref.toSeq)
  }

  test("knn1Lsh: complete, never beats exact, finds planted duplicates") {
    import graft.functions.VectorFunctions.score
    val base = emb.filter(col("vec_id") < 150)
    // plant exact duplicates: identical vectors always share their
    // bucket, so LSH must return them as 1-NN with ns = 0
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"),
              col("label"))
    val e = base.unionByName(planted)
    val lsh = Ann.knn1Lsh(e, nPlanes = 6, dim = 64)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getDouble(4)))).toMap
    // exact reference
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val exact = a.crossJoin(b).filter(col("va") =!= col("vb"))
      .select(col("va"), (lit(1.0) - score(col("ea"), col("eb"))).as("ns"), col("vb"))
      .groupBy("va").agg(min(struct(col("ns"), col("vb"))).as("m"))
      .select(col("va"), col("m.vb"), col("m.ns")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // completeness: one answer per vector (fallback catches the rest)
    assert(lsh.keySet == exact.keySet)
    // the candidate-pruned NN can never be CLOSER than the true NN
    lsh.foreach { case (v, (_, ns)) => assert(ns >= exact(v)._2 - 1e-12, s"v=$v") }
    // every planted duplicate is found exactly (identical bucket)
    (0L until 20L).foreach { v =>
      assert(lsh(v + 10000)._1 == v && lsh(v + 10000)._2 == 0.0, s"planted $v")
      assert(lsh(v)._1 == v + 10000, s"planted reverse $v")
    }
  }

  test("signatures are stable across evaluations") {
    val s1 = Ann.signatures(emb, Ann.planes(spark, 6, 64)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Ann.signatures(emb, Ann.planes(spark, 6, 64)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
  }

  test("MMR matches a reference greedy implementation on real data") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val out = graft.ann.Mmr.rerank(emb.filter(col("vec_id") =!= 0), q, 20, 5, 0.5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq

    // reference: same top-20 pool, same rounding, greedy in plain Scala
    val qv = emb.filter(col("vec_id") === 0).collect().head
      .getSeq[Float](1).map(_.toDouble).toArray
    val pool = emb.filter(col("vec_id") =!= 0).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .map { case (id, v) => (id, round6(cos(v, qv)) + 0.0, v) }
      .sortBy { case (id, s, _) => (-s, id) }.take(20)
    var sel = Vector.empty[(Long, Double, Array[Double])]
    (1 to 5).foreach { _ =>
      val best = pool.filterNot(c => sel.exists(_._1 == c._1))
        .map { c =>
          val div = if (sel.isEmpty) 0.0
            else sel.map(s => round6(cos(c._3, s._3))).max
          (round6(0.5 * c._2 - 0.5 * div), c)
        }
        .minBy { case (m, c) => (-m, c._1) }
      sel = sel :+ best._2
    }
    assert(out == sel.map(_._1), s"spark=$out ref=${sel.map(_._1)}")
    // rank 1 is the plain cosine top-1; the set is diverse (no dup ids)
    assert(out.head == pool.head._1)
    assert(out.distinct.size == 5)
  }

  test("k-center coreset covers the pool no worse than a first-k baseline") {
    import org.apache.spark.sql.functions._
    val pool = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")).cache()
    val centers = graft.ann.Coreset.kCenter(pool, 6)
      .collect().map(_.getLong(1))
    assert(centers.length == 6 && centers.distinct.length == 6)
    assert(centers.head == 0L) // deterministic smallest-id seed
    // covering radius = max over pool of min cosine distance to a center
    def radius(ids: Seq[Long]): Double = {
      val vecs = pool.collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      vecs.map { case (_, v) =>
        ids.map(c => 1.0 - cos(v, vecs(c))).min }.max
    }
    val rGreedy = radius(centers)
    val rNaive = radius((0L until 6L).toSeq)
    // greedy farthest-point is a 2-approx to optimal; at minimum it
    // must not cover WORSE than the arbitrary first-6-ids baseline
    assert(rGreedy <= rNaive + 1e-9, s"greedy $rGreedy vs naive $rNaive")
    pool.unpersist()
  }
}
