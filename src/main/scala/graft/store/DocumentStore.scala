package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.embed.HashEmbedder

/** Text-level facade mirroring the reference's DocumentProcessor
  * (reference: app/core/document_ingestor.py:571) — the API a user of
  * the reference service would call, re-expressed over DataFrames:
  *
  *   reference                      graft
  *   ------------------------------ -------------------------------
  *   upsert_string / upsert_str_list  upsertChunks (bulk-first)
  *   update_chunk                      updateChunk
  *   search_query                      searchByText
  *   search_query_on_doc               searchByTextOnDocs
  *   delete_* / scroll_*               VectorStore delegates
  *
  * Embedding happens IN the plan via HashEmbedder (the reference
  * calls an external embedding HTTP service per request — here it is
  * a distributed, codegen'd transform; swap in a real model by
  * replacing the embed step).
  */
object DocumentStore {

  val Dim = 64

  /** Embed and upsert a batch of text chunks.
    * `chunks`: (user_id, doc_id, chunk_id, title, text). Returns the
    * merged collection (last-writer-wins per (user, doc, chunk)).
    */
  def upsertChunks(coll: DataFrame, chunks: DataFrame): DataFrame = {
    val keyed = chunks.withColumn("vector_id",
      xxhash64(col("user_id"), col("doc_id"), col("chunk_id")))
    val embedded = HashEmbedder.embedDocs(
        keyed.withColumn("_k", col("vector_id")), "_k", "text", Dim)
      .join(keyed, col("_k") === keyed("vector_id"))
      .select(col("user_id"), col("vector_id"), col("doc_id"), col("chunk_id"),
              col("title"), col("embedding"))
    VectorStore.upsert(coll, embedded)
  }

  /** Re-embed one chunk's new text and swap the vector in place
    * (reference update_chunk).
    */
  def updateChunk(coll: DataFrame, userId: Any, docId: Long, chunkId: Long,
                  newText: String): DataFrame = {
    val v = HashEmbedder.embedText(newText, Dim)
    VectorStore.updateVector(coll, userId, docId, chunkId,
      typedlit(v.toSeq))
  }

  /** Vectorize the query text driver-side (exact twin of the
    * distributed embedder) and run cosine top-k in the user's
    * collection.
    */
  def searchByText(coll: DataFrame, userId: Any, query: String,
                   limit: Int = 5, scoreThreshold: Double = 0.0): DataFrame =
    searchByTextOnDocs(coll, userId, Nil, query, limit, scoreThreshold)

  /** searchByText restricted to a doc-id set (reference
    * search_query_on_doc; empty set = no restriction).
    */
  def searchByTextOnDocs(coll: DataFrame, userId: Any, docIds: Seq[Long],
                         query: String, limit: Int = 5,
                         scoreThreshold: Double = 0.0): DataFrame = {
    val qv = HashEmbedder.embedText(query, Dim)
    val s = coll.sparkSession
    import s.implicits._
    val qdf = Seq(1).toDF("_one").select(typedlit(qv.toSeq).as("q"))
    VectorStore.search(coll, userId, qdf, limit, scoreThreshold, docIds)
  }
}
