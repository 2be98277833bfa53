package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.{DocumentStore, VectorStore}

/** Replay of the reference's own test workload (reference:
  * dev.ipynb cells 4–22) — the exact endpoint sequence its author
  * uses to exercise the service, run against the graft operators:
  * upsert single + bulk, delete by doc/title/chunk/vector-id(s),
  * collection wipe, update, search (plain + doc-filtered), all four
  * scrolls, list collections.
  */
class ReferenceWorkloadSpec extends SparkSpec {

  private def emptyColl = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, Long, Long, Long, String, Seq[Double])]
      .toDF("user_id", "vector_id", "doc_id", "chunk_id", "title", "embedding")
  }

  private def chunksDf(rows: Seq[(Long, Long, Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "doc_id", "chunk_id", "title", "text")
  }

  // stand-ins for the notebook's Star-Wars chunks (same doc/chunk ids)
  private val user = 1L
  private val corpus = Seq(
    (user, 2L, 3L, "Death Star Schematics", "the schematics revealed a thermal exhaust port leading to the reactor core"),
    (user, 2L, 4L, "Death Star Schematics", "proton torpedoes in the port could begin a chain reaction"),
    (user, 4L, 1L, "The Rogue One Operation", "the plans were transmitted from the scarif tower to the fleet"),
    (user, 6L, 2L, "Rebel Fleet", "x wing squadrons assembled near yavin for the assault"),
    (user, 9L, 4L, "Alliance Intel", "bothan spies carried fragments of imperial transmissions"),
    (user, 15L, 6L, "Rebel Heroes", "captain cassian andor escorted senator mon mothma to yavin"))

  test("notebook cells 5-6: upsert single then bulk") {
    val coll = DocumentStore.upsertChunks(emptyColl, chunksDf(corpus.take(1)))
    val coll2 = DocumentStore.upsertChunks(coll, chunksDf(corpus.drop(1)))
    assert(coll2.count() == corpus.length)
    // re-upserting the same (doc, chunk) keys replaces, never duplicates
    val coll3 = DocumentStore.upsertChunks(coll2, chunksDf(corpus))
    assert(coll3.count() == corpus.length)
  }

  test("notebook cells 7-13: the delete family") {
    val coll = DocumentStore.upsertChunks(emptyColl, chunksDf(corpus))
    // delete_doc 15
    val d1 = VectorStore.deleteDoc(coll, user, 15L)
    assert(d1.filter(col("doc_id") === 15).count() == 0 && d1.count() == 5)
    // delete_doc_by_title
    val d2 = VectorStore.deleteDocByTitle(d1, user, "The Rogue One Operation")
    assert(d2.count() == 4)
    // delete_chunk (6, 2)
    val d3 = VectorStore.deleteChunk(d2, user, 6L, 2L)
    assert(d3.count() == 3)
    // delete_chunk_by_id / list_by_id via vector ids from a scroll
    val ids = VectorStore.scroll(d3, user, 2).collect().map(_.getAs[Long]("vector_id"))
    val d4 = VectorStore.deleteByIds(d3, user, ids.toSeq)
    assert(d4.count() == 1)
    // delete_user_collection_data: wipes the user, leaves others
    val withOther = d4.unionByName(
      DocumentStore.upsertChunks(emptyColl,
        chunksDf(Seq((99L, 1L, 1L, "other", "unrelated text")))))
    val d5 = VectorStore.deleteCollection(withOther, user)
    assert(d5.count() == 1 &&
      d5.select("user_id").head().getLong(0) == 99L)
  }

  test("notebook cell 14: update_data re-embeds (2,3)") {
    val coll = DocumentStore.upsertChunks(emptyColl, chunksDf(corpus))
    val updated = DocumentStore.updateChunk(coll, user, 2L, 3L,
      corpus(1)._5) // strings[1], like the notebook
    val hit = DocumentStore.searchByText(updated, user, corpus(1)._5, 2).collect()
    // both chunk (2,3) (updated) and chunk (2,4) (original) now score 1.0
    assert(hit.map(_.getAs[Double]("score")).forall(_ == 1.0))
    assert(hit.map(_.getAs[Long]("chunk_id")).toSet == Set(3L, 4L))
  }

  test("notebook cells 16-17: search_query and search_query_on_doc") {
    val coll = DocumentStore.upsertChunks(emptyColl, chunksDf(corpus))
    val q = "what was the thermal exhaust port weakness of the death star"
    val res = DocumentStore.searchByText(coll, user, q, 5).collect()
    assert(res.length == 5)
    assert(res.head.getAs[Long]("doc_id") == 2L) // the Death Star doc
    val onDocs = DocumentStore.searchByTextOnDocs(coll, user, Seq(2L, 4L), q, 5)
      .collect()
    assert(onDocs.map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(2L, 4L)))
  }

  test("notebook cells 18-22: scrolls and list_users_collection") {
    val coll = DocumentStore.upsertChunks(emptyColl, chunksDf(corpus))
    assert(VectorStore.scroll(coll, user, 20).count() == 6)
    assert(VectorStore.scrollDoc(coll, user, 9L, 20).count() == 1)
    assert(VectorStore.scrollChunk(coll, user, 9L, 4L, 20).count() == 1)
    assert(VectorStore.scrollDocs(coll, user, Seq(9L, 15L, 3L, 2L), 20).count() == 4)
    assert(VectorStore.scrollDocs(coll, user, Nil, 20).count() == 6) // empty = all
    val colls = VectorStore.listCollections(coll).collect()
    assert(colls.map(_.getAs[Long]("user_id")).toSeq == Seq(user))
  }
}
