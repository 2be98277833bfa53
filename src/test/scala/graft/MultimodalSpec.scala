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
}
