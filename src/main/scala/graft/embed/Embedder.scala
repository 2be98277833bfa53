package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The embedding seam. The reference calls an external vectorizer
  * service at this point in its pipeline (reference:
  * app/core/document_ingestor.py:605 — POST /vectorizer with a text
  * batch); this trait makes that integration point an explicit
  * one-interface swap. [[HashingEmbedder]] is the deterministic
  * default that keeps every oracle exact; a service-backed
  * implementation would batch rows to the endpoint behind the same
  * signature without touching any pipeline that composes on it.
  *
  * Contract: [[embedDocs]] and [[embedText]] must produce IDENTICAL
  * vectors for identical text (the driver-side query path and the
  * distributed corpus path meet in a cosine — EmbedderSpec pins the
  * parity through the full chunk→embed→search pipeline for every
  * implementation).
  */
trait Embedder {
  def dim: Int

  /** (idCol, embedding array<double>) for each (idCol, textCol) row. */
  def embedDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame

  /** Driver-side twin for embedding a query string. */
  def embedText(text: String): Array[Double]
}

/** Default implementation: deterministic feature hashing
  * ([[HashEmbedder]] — signed md5 bucket histogram, L2-normalized).
  */
final class HashingEmbedder(val dim: Int = HashEmbedder.DefaultDim)
    extends Embedder {
  def embedDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    HashEmbedder.embedDocs(docs, idCol, textCol, dim)
  def embedText(text: String): Array[Double] =
    HashEmbedder.embedText(text, dim)
}

/** Toy second implementation (spec-only by intent): lowercase letter
  * frequencies a–z, L2-normalized. Exists to prove the seam — any
  * pipeline written against [[Embedder]] runs unchanged on it.
  */
final class CharFreqEmbedder extends Embedder {
  val dim = 26

  def embedDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(trim(col(textCol)))
    val counts = array(('a' to 'z').map { c =>
      (length(t) - length(regexp_replace(t, c.toString, ""))).cast("double")
    }: _*)
    val nrm = sqrt(VectorFunctions.sqNorm(counts))
    docs.select(col(idCol),
      when(nrm === 0.0, counts)
        .otherwise(transform(counts, v => v / nrm)).as("embedding"))
  }

  def embedText(text: String): Array[Double] = {
    val t = text.trim.toLowerCase
    val v = ('a' to 'z').map(c => t.count(_ == c).toDouble).toArray
    val nrm = math.sqrt(v.map(x => x * x).sum)
    if (nrm == 0.0) v else v.map(_ / nrm)
  }
}

object Embedder {

  /** The engine-wide default (what a production deployment swaps). */
  val default: Embedder = new HashingEmbedder()

  /** Query-by-text retrieval over chunked documents with ANY
    * embedder: chunk → distributed corpus embedding → driver-embedded
    * query broadcast as a literal → cosine top-k
    * (TakeOrderedAndProject; the scan side never shuffles). The
    * pipeline is embedder-generic — swapping implementations changes
    * no operator.
    */
  def chunkEmbedSearch(docs: DataFrame, embedder: Embedder,
                       chunkSize: Int, stride: Int,
                       queryText: String, k: Int): DataFrame = {
    val chunks = graft.text.Chunker.chunkDocs(docs, chunkSize, stride)
      .select((col("doc_id") * 1000 + col("chunk_id")).as("ckey"), col("chunk"))
    val emb = embedder.embedDocs(chunks, "ckey", "chunk")
    val qv: Column = typedlit(embedder.embedText(queryText).toSeq)
    emb.select(col("ckey"),
        round(VectorFunctions.cosineSim(col("embedding"), qv), 6).as("score"))
      .orderBy(col("score").desc, col("ckey"))
      .limit(k)
  }
}
