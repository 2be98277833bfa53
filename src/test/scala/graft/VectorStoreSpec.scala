package graft

import org.apache.spark.sql.functions._
import graft.store.VectorStore

class VectorStoreSpec extends SparkSpec {

  private def pts = VectorStore.points(spark, sfDir)

  test("search returns k results ordered by score desc") {
    val res = VectorStore.search(pts, 2, VectorStore.queryVecOf(spark, sfDir, 42), 10)
      .collect()
    assert(res.length == 10)
    val scores = res.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)))
    // vec 42 itself is in user 2's collection and must rank first (cos=1)
    assert(res.head.getAs[Long]("vector_id") == 42L)
    assert(res.head.getAs[Double]("score") == 1.0)
  }

  test("search threshold filters and docIds restrict") {
    val res = VectorStore.search(pts, 2, VectorStore.queryVecOf(spark, sfDir, 42),
      limit = 100, scoreThreshold = 0.9)
    assert(res.count() == 1) // only the identical vector
    val restricted = VectorStore.search(pts, 2, VectorStore.queryVecOf(spark, sfDir, 42),
      limit = 100, docIds = Seq(10L))
    assert(restricted.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(10L))
  }

  test("tenant isolation: no surface ever returns another user's points") {
    // the property the reference's per-user collections exist for
    val q = VectorStore.queryVecOf(spark, sfDir, 42)
    (0L until 8L).foreach { u =>
      val hit = VectorStore.search(pts, u, q, limit = 1000)
        .select("vector_id").collect().map(_.getLong(0))
      assert(hit.nonEmpty && hit.forall(_ % 8 == u), s"user $u leaked")
    }
    val grouped = VectorStore.searchGrouped(pts, 3, q, groups = 100)
      .select("vector_id").collect().map(_.getLong(0))
    assert(grouped.forall(_ % 8 == 3))
    val rec = VectorStore.recommend(pts, 2, Seq(10L, 18L), Seq(34L), 1000)
      .select("vector_id").collect().map(_.getLong(0))
    assert(rec.forall(_ % 8 == 2) && !rec.exists(Set(10L, 18L, 34L)))
  }

  test("edge cases: empty search, nonexistent deletes, scroll past end") {
    val q = VectorStore.queryVecOf(spark, sfDir, 42)
    // user with no points: every read surface returns empty, no error
    assert(VectorStore.search(pts, 999, q, 10).count() == 0)
    assert(VectorStore.scroll(pts, 999, 10).count() == 0)
    // deleting ids that don't exist is a no-op
    val before = pts.count()
    assert(VectorStore.deleteByIds(pts, 2, Seq(99999991L, 99999992L)).count() == before)
    // keyset scroll past the last id is empty
    val maxId = pts.filter(col("user_id") === 2)
      .agg(max("vector_id")).head().getLong(0)
    assert(VectorStore.scrollAfter(pts, 2, maxId, 10).count() == 0)
  }

  test("recommend without negatives equals mean-of-positives search") {
    val rec = VectorStore.recommend(pts, 2, Seq(10L, 18L), Nil, 5).collect()
    assert(rec.length == 5 && !rec.map(_.getAs[Long]("vector_id")).exists(Set(10L, 18L)))
    val scores = rec.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("upsert replaces points with matching key and keeps others") {
    val before = pts.count()
    val batch = pts.filter(col("user_id") === 2 && col("doc_id") === 2)
      .withColumn("vector_id", col("vector_id") + 9000)
    val after = VectorStore.upsert(pts, batch)
    assert(after.count() == before)
    // the replaced keys now carry the batch's vector_ids
    val replaced = after.filter(col("user_id") === 2 && col("doc_id") === 2)
      .select("vector_id").collect().map(_.getLong(0))
    assert(replaced.forall(_ >= 9000))
  }

  test("delete family removes exactly the targeted points") {
    val n = pts.count()
    val nDoc = pts.filter(col("user_id") === 1 && col("doc_id") === 17).count()
    assert(VectorStore.deleteDoc(pts, 1, 17).count() == n - nDoc)
    val nIds = pts.filter(col("user_id") === 5 && col("vector_id").isin(5L, 13L)).count()
    assert(VectorStore.deleteByIds(pts, 5, Seq(5L, 13L)).count() == n - nIds)
    assert(VectorStore.deleteCollection(pts, 3).filter(col("user_id") === 3).count() == 0)
  }

  test("keyset scroll pages the collection without overlap or gaps") {
    val page1 = VectorStore.scrollAfter(pts, 3, -1L, 5).collect()
    assert(page1.length == 5)
    val cursor = page1.last.getAs[Long]("vector_id")
    val page2 = VectorStore.scrollAfter(pts, 3, cursor, 5).collect()
    // pages are disjoint and contiguous in vector_id order
    val ids = (page1 ++ page2).map(_.getAs[Long]("vector_id"))
    assert(ids.distinct.length == 10 && ids.sameElements(ids.sorted))
    val firstTen = VectorStore.scroll(pts, 3, 10).collect()
      .map(_.getAs[Long]("vector_id"))
    assert(ids.sameElements(firstTen))
  }

  test("uuid-style string point ids flow through merge, delete, and scroll") {
    // same collection, ids re-keyed to opaque hex strings — nothing in
    // the store may depend on ids being integers (reference point ids
    // are uuid4, document_ingestor.py:89-144)
    val spts = pts.withColumn("vector_id", md5(concat(lit("id-"), col("vector_id"))))
    val n = spts.count()
    val twoIds = spts.filter(col("user_id") === 5)
      .select("vector_id").limit(2).collect().map(_.getString(0)).toSeq
    assert(VectorStore.deleteByIds(spts, 5, twoIds).count() == n - 2)
    val batch = spts.filter(col("user_id") === 2 && col("doc_id") === 2)
      .withColumn("vector_id", md5(concat(lit("new-"), col("vector_id"))))
    val merged = VectorStore.upsert(spts, batch)
    assert(merged.count() == n) // LWW on (user, doc, chunk): no growth
    val replaced = merged.filter(col("user_id") === 2 && col("doc_id") === 2)
      .select("vector_id").collect().map(_.getString(0))
    val batchIds = batch.select("vector_id").collect().map(_.getString(0)).toSet
    assert(replaced.forall(batchIds.contains))
    // scroll orders lexicographically over string ids — still stable paging
    val page = VectorStore.scroll(spts, 3, 10).collect().map(_.getString(0))
    assert(page.sameElements(page.sorted))
  }

  test("scrollDocs with empty doc set scans the whole collection") {
    val all = VectorStore.scrollDocs(pts, 3, Nil, 1000).count()
    val direct = pts.filter(col("user_id") === 3).count()
    assert(all == direct)
  }

  test("arbitrary payload maps flow through scroll, search, and mutations") {
    val s = spark
    import s.implicits._
    val withPayload = pts.withColumn("payload",
      map(lit("source"), concat(lit("s"), col("doc_id") % 3),
          lit("lang"), lit("en")))
    val scrolled = graft.store.VectorStore.scroll(withPayload, 3, 5).collect()
    assert(scrolled.forall(r =>
      r.getAs[Map[String, String]]("payload").keySet == Set("source", "lang")))
    val found = graft.store.VectorStore.search(withPayload, 2,
      graft.store.VectorStore.queryVecOf(spark, sfDir, 42), 3).collect()
    assert(found.forall(_.getAs[Map[String, String]]("payload")("lang") == "en"))
    // mutations preserve the column
    val afterDelete = graft.store.VectorStore.deleteDoc(withPayload, 1, 17)
    assert(afterDelete.columns.contains("payload"))
    val merged = graft.store.VectorStore.upsert(withPayload,
      withPayload.filter(col("user_id") === 2).limit(2))
    assert(merged.columns.contains("payload"))
  }

  test("retrieve / searchBatch / facetCounts respect tenancy and bounds") {
    // retrieve: only the requested ids, only user 4's points, vectors on
    val got = VectorStore.retrieve(pts, 4, Seq(4L, 12L, 20L, 3L)) // 3 ∉ user 4
      .collect()
    assert(got.map(_.getAs[Long]("vector_id")).toSeq == Seq(4L, 12L, 20L))
    assert(got.forall(_.getAs[Seq[Float]]("embedding").nonEmpty))
    // searchBatch: every query answered, k rows each, ranks 1..k,
    // scores descending, only user 2's points
    val qs = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(5L, 21L, 42L))
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    val sb = VectorStore.searchBatch(pts, 2, qs, 4).collect()
    assert(sb.length == 12)
    sb.foreach(r => assert(r.getAs[Long]("vector_id") % 8 == 2))
    sb.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 4L))
      val sc = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("score"))
      assert(sc.sameElements(sc.sortBy(-_)))
    }
    // facetCounts: counts sum to the user's point count
    val fc = VectorStore.facetCounts(pts, 3, "title", 1000).collect()
    val total = fc.map(_.getAs[Long]("n_points")).sum
    assert(total == pts.filter(col("user_id") === 3).count())
  }

  test("with_vectors surfaces return the STORED vector bit-equal") {
    // reference semantics (document_ingestor.py:338/:414/:429):
    // with_vectors = True returns stored vectors untouched. Join the
    // returned arrays back to the collection by key and demand
    // element-wise float equality — no re-normalization, no rounding.
    // (The ORACLE projection vecQ6 is lossy by design; this pin keeps
    // the raw API honest.)
    def pinsStored(withVec: org.apache.spark.sql.DataFrame): Unit = {
      val stored = pts.select(col("vector_id"), col("embedding").as("stored"))
      val mismatches = withVec.select("vector_id", "embedding")
        .join(stored, "vector_id")
        .filter(not(col("embedding") <=> col("stored")))
        .count()
      assert(mismatches == 0)
    }
    val q = VectorStore.queryVecOf(spark, sfDir, 42)
    val searched = VectorStore.searchWithVectors(pts, 2, q, 5)
    assert(searched.columns.contains("embedding") && searched.count() == 5)
    pinsStored(searched)
    val scrolled = VectorStore.scrollWithVectors(pts, 3, 12)
    assert(scrolled.columns.contains("embedding") && scrolled.count() == 12)
    pinsStored(scrolled)
    // and the scroll page is the same page scroll() returns, plus the
    // vector column
    val plain = VectorStore.scroll(pts, 3, 12).select("vector_id")
      .collect().map(_.getLong(0)).toSeq
    val withV = scrolled.select("vector_id").collect().map(_.getLong(0)).toSeq
    assert(plain == withV)
  }

  test("updateVector changes only the targeted key") {
    val nv = VectorStore.queryVecOf(spark, sfDir, 7)
      .select(transform(col("q"), x => -x).as("newv"))
    val updated = pts.crossJoin(broadcast(nv))
      .withColumn("embedding",
        when(col("user_id") === 2 && col("doc_id") === 42 && col("chunk_id") === 42,
          col("newv")).otherwise(col("embedding")))
    val changed = updated.filter(col("chunk_id") === 42)
      .select(element_at(col("embedding"), 1)).head().getFloat(0)
    val orig7 = pts.filter(col("vector_id") === 7)
      .select(element_at(col("embedding"), 1)).head().getFloat(0)
    assert(changed == -orig7)
  }
}
