package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, Pq}

class PqSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)
  private val cfg = Pq.Config(dim = 64, m = 8, k = 16, iters = 2)

  test("codes are m small integers (the 32x compression claim)") {
    val codebook = Pq.train(emb.limit(200), cfg)
    assert(codebook.count() == cfg.m * cfg.k)
    val encoded = Pq.encode(emb.limit(200), codebook, cfg)
    val row = encoded.head()
    val codes = row.getSeq[Long](1)
    assert(codes.length == cfg.m)
    assert(codes.forall(c => c >= 0 && c < cfg.k))
    assert(encoded.count() == 200)
  }

  test("IVF-PQ: probe-pruned ADC still recovers neighbors") {
    val codebook = Pq.train(emb, cfg)
    val encoded = Pq.encode(emb, codebook, cfg)
    val cents = Ann.kmeansCentroids(emb, 16, 2)
    val cells = Ann.assignCells(emb, cents)
    val qdf = graft.store.VectorStore.queryVecOf(spark, sfDir, 11)
    val pq = Pq.ivfSearch(emb, cells, encoded, codebook, cents, qdf, cfg,
        nprobe = 6, candidates = 50, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val q = emb.filter(col("vec_id") === 11)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Ann.bruteForceTopK(emb, q, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet + 11L
    val recall = (pq intersect exact).size.toDouble / 10
    assert(recall >= 0.3, s"recall=$recall")
    // the probe actually pruned: candidate universe < full collection
    val probedCells = Ann.probeCells(cents, qdf, 6)
    val nCand = cells.join(probedCells, "cid").count()
    assert(nCand < emb.count())
  }

  test("recall-vs-rerank-depth curve: recall grows with candidates and saturates") {
    val codebook = Pq.train(emb, cfg)
    val encoded = Pq.encode(emb, codebook, cfg)
    val qdf = graft.store.VectorStore.queryVecOf(spark, sfDir, 11)
    val q = emb.filter(col("vec_id") === 11)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Ann.bruteForceTopK(emb, q, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet + 11L
    val recalls = Seq(10, 50, 200).map { cand =>
      val got = Pq.search(emb, encoded, codebook, qdf, cfg,
          candidates = cand, k = 10)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      (got intersect exact).size.toDouble / 10
    }
    // deeper re-rank can only help: the candidate set is nested
    assert(recalls(0) <= recalls(1) + 1e-9 && recalls(1) <= recalls(2) + 1e-9,
      s"recalls=$recalls")
    assert(recalls(2) >= 0.5, s"deep re-rank recovers most: $recalls")
  }

  test("ADC + exact re-rank recovers most true neighbors") {
    val codebook = Pq.train(emb, cfg)
    val encoded = Pq.encode(emb, codebook, cfg)
    val qdf = graft.store.VectorStore.queryVecOf(spark, sfDir, 11)
    val pq = Pq.search(emb, encoded, codebook, qdf, cfg, candidates = 50, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val q = emb.filter(col("vec_id") === 11)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Ann.bruteForceTopK(emb, q, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet + 11L // pq search includes the query itself
    val recall = (pq intersect exact).size.toDouble / 10
    assert(recall >= 0.5, s"recall=$recall pq=$pq exact=$exact")
  }
}
