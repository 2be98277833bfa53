package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table plumbing: kinds route and decode is deterministic") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sfDir).limit(30))
    val metas = Multimodal.decodeMeta(media).collect()
    assert(metas.length == 30)
    metas.foreach { m =>
      assert(Set("image", "audio", "video").contains(m.kind))
      assert(m.n_bytes > 0)
      assert(m.width >= 1 && m.width <= 1024)
      assert(m.height >= 1 && m.height <= 1024)
      if (m.kind != "video") assert(m.n_frames == 1L)
    }
    // deterministic: re-decode gives identical rows
    val again = Multimodal.decodeMeta(media).collect()
    assert(metas.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }

  test("feature extraction yields unit vectors usable by ANN search") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.asMediaTable(Tables.documents(spark, sfDir).limit(50))
    val feats = Multimodal.extractFeatures(media)
    val norms = feats.select(
      sqrt(graft.functions.VectorFunctions.sqNorm(col("embedding"))).as("n"))
      .collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5))
    // plugs into the ANN operator unchanged
    val withId = feats.withColumnRenamed("doc_id", "vec_id")
    val q = withId.limit(1).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = graft.ann.Ann.bruteForceTopK(withId, q, 3).collect()
    assert(top.length == 3)
  }

  test("resize bounds dimensions; frame sampling fans out videos") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sfDir).limit(60))
    val meta = Multimodal.decodeMeta(media)
    val resized = Multimodal.resizeStub(meta, 256).collect()
    resized.foreach { m =>
      assert(m.width <= 256 && m.height <= 256 && m.width >= 1 && m.height >= 1)
    }
    val frames = Multimodal.sampleFrames(meta, stride = 10)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= 24))
  }
}
