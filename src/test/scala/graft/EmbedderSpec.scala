package graft

import org.apache.spark.sql.functions._
import graft.embed.HashEmbedder
import graft.functions.VectorFunctions

class EmbedderSpec extends SparkSpec {

  test("driver-side embedText matches distributed embedDocs exactly") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 5)
    val sparkSide = HashEmbedder.embedDocs(docs, "doc_id", "text", 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1).toArray).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val local = HashEmbedder.embedText(text, 64)
      val dist = sparkSide(id)
      assert(local.length == dist.length)
      local.zip(dist).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }

  test("embeddings are unit-norm") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val norms = HashEmbedder.embedDocs(docs, "doc_id", "text", 64)
      .select(sqrt(VectorFunctions.sqNorm(col("embedding"))).as("n"))
      .collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9))
  }

  test("embedder seam: chunk→embed→search runs unchanged on both implementations") {
    import graft.embed.{CharFreqEmbedder, Embedder, HashingEmbedder}
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 50)
    // query text = the exact content of doc 3's first chunk: with a
    // correct embedDocs/embedText parity the self-match MUST rank
    // first with score 1.0 — for EVERY implementation of the trait
    val queryText = graft.text.Chunker.chunkDocs(docs, 500, 400)
      .filter(col("doc_id") === 3 && col("chunk_id") === 0)
      .select("chunk").head().getString(0)
    Seq(new HashingEmbedder(), new CharFreqEmbedder()).foreach { e =>
      val top = Embedder.chunkEmbedSearch(docs, e, 500, 400, queryText, 5)
        .collect()
      assert(top.length == 5, e.getClass.getSimpleName)
      assert(top.head.getAs[Long]("ckey") == 3000L, e.getClass.getSimpleName)
      assert(top.head.getAs[Double]("score") == 1.0, e.getClass.getSimpleName)
    }
  }

  test("query-by-text: self-match scores 1.0") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") === 3)
    val text = docs.select("text").head().getString(0)
    val emb = HashEmbedder.embedDocs(Tables.documents(spark, sfDir).limit(20),
      "doc_id", "text", 64)
    val q = typedlit(HashEmbedder.embedText(text, 64).toSeq)
    val top = emb.select(col("doc_id"),
        round(VectorFunctions.cosineSim(col("embedding"), q), 6).as("score"))
      .orderBy(col("score").desc).head()
    assert(top.getAs[Long]("doc_id") == 3L)
    assert(top.getAs[Double]("score") == 1.0)
  }
}
