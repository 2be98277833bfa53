package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.store.{CollectionStorage, DocumentStore, VectorStore}

/** The README "serve a user query end-to-end" walkthrough, compiled:
  * ensure → upsert → search → diversified (MMR) search → scroll, each
  * call mapping to its reference route (app/api/routes.py):
  *
  *   ensureCollection    create user_<id> collection
  *   upsertChunks        upsert_list_data (embeds in-plan)
  *   searchByText        search_query (limit, score_threshold)
  *   Mmr.rerank          search_query + diversification
  *   scrollDoc           scroll_user_doc
  *
  * Run: sbt "runMain graft.examples.ReadmeExample"
  * This file IS the README example — keep the two in sync; the
  * ReadmeExampleSpec asserts the walkthrough's results.
  */
object ReadmeExample {

  /** Returns (top-2 search hits, MMR picks, doc-1 scroll rows). */
  def run(spark: SparkSession, path: String)
      : (Array[org.apache.spark.sql.Row], Array[org.apache.spark.sql.Row],
         Array[org.apache.spark.sql.Row]) = {
    import spark.implicits._
    CollectionStorage.ensureCollection(spark, path, userId = 7)
    val chunks = Seq(
      (7L, 1L, 0L, "intro", "a spark native vector store"),
      (7L, 1L, 1L, "body", "cosine top k search over chunks"),
      (7L, 2L, 0L, "copy", "a spark native vector store")) // near-copy of doc 1 chunk 0
      .toDF("user_id", "doc_id", "chunk_id", "title", "text")
    CollectionStorage.write(
      DocumentStore.upsertChunks(CollectionStorage.load(spark, path), chunks), path)
    val coll = CollectionStorage.load(spark, path)
    val hits = DocumentStore.searchByText(coll, 7, "vector store", 2).collect()
    val qv = Seq(1).toDF("_o").select(
      typedlit(graft.embed.HashEmbedder.embedText("vector store", DocumentStore.Dim)
        .toSeq).as("qv"))
    val diversified = graft.ann.Mmr.rerank(
      coll.filter(col("user_id") === 7)
        .select(col("vector_id").as("vec_id"), col("embedding")), qv, 3, 2, 0.5)
      .collect()
    val scrolled = VectorStore.scrollDoc(coll, 7, docId = 1, limit = 10).collect()
    (hits, diversified, scrolled)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val (hits, diversified, scrolled) = run(spark, path)
    println("search_query top-2:")
    hits.foreach(r => println(s"  $r"))
    println("search_query + MMR (near-copies diversified away):")
    diversified.foreach(r => println(s"  $r"))
    println("scroll_user_doc(doc 1):")
    scrolled.foreach(r => println(s"  $r"))
    spark.stop()
  }
}
