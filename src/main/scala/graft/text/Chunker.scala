package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size / fixed-overlap document chunker — the step upstream of
  * the reference's ingest surface (reference app/core/
  * document_ingestor.py:620 receives pre-chunked text per point and
  * keys it by (DocId, ChunkId)); a user switching to this library
  * needs the chunker itself to produce those ChunkIds.
  *
  * Pure narrow projection (generate starts → substring): chunking 100
  * TB of documents is a zero-shuffle map, and chunk_id is
  * deterministic (start offset / stride), not an ingest-order counter.
  */
object Chunker {

  /** Explode each doc into chunks of `size` chars every `stride` chars
    * (overlap = size - stride). Output: doc_id, chunk_id, chunk.
    */
  def chunkDocs(docs: DataFrame, size: Int, stride: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(stride > 0 && size >= stride, s"need 0 < stride <= size")
    docs.select(col(idCol),
        posexplode(sequence(lit(1), greatest(length(col(textCol)), lit(1)), lit(stride)))
          .as(Seq("chunk_id", "start")),
        col(textCol))
      .select(col(idCol), col("chunk_id").cast("long"),
        expr(s"substring($textCol, start, $size)").as("chunk"))
  }
}
