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

  test("REAL image bytes decode through the same mapPartitions path") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // hand-built PNG + JPEG byte streams with known dims and solid
    // fills — the first ACTUAL codec traffic across the mm_* seam.
    // (doc_id, w, h, r, g, b, format)
    val cases = Seq(
      (1L, 17, 23, 255, 0, 0, "png"),   // red
      (2L, 64, 48, 0, 255, 0, "png"),   // green
      (3L, 33, 33, 0, 0, 255, "jpg"),   // blue
      (4L, 128, 16, 128, 128, 128, "jpg")) // mid gray
    val recs = cases.map { case (id, w, h, r, g, b, fmt) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, fmt, bos)
      Multimodal.MediaRecord(id, "image", bos.toByteArray)
    } :+ Multimodal.MediaRecord(5L, "audio", Array[Byte](1, 2, 3)) // stub fallback
    val s = spark
    import s.implicits._
    val media = s.createDataset(recs).repartition(3)
    // 1) real decode through decodeMeta — the exact code path the
    //    15 mm_* operators consume
    val metas = Multimodal.decodeMeta(media, Multimodal.imageIoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    cases.foreach { case (id, w, h, _, _, _, _) =>
      assert(metas(id).width == w && metas(id).height == h,
        s"doc $id decoded ${metas(id).width}x${metas(id).height}, want ${w}x$h")
      assert(metas(id).n_frames == 1L)
    }
    assert(metas(5L).kind == "audio") // non-image fell back to the stub
    // 2) real pixel statistics: mean BT.601 luma of a solid fill is
    //    the fill's luma (exact for PNG; JPEG is lossy → ±2 levels)
    val luma = Multimodal.imageLumaStats(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_luma")).toMap
    cases.foreach { case (id, _, _, r, g, b, fmt) =>
      val want = 0.299 * r + 0.587 * g + 0.114 * b
      val tol = if (fmt == "png") 1e-9 else 2.0
      assert(math.abs(luma(id) - want) <= tol,
        s"doc $id mean_luma ${luma(id)}, want $want ± $tol")
    }
    assert(!luma.contains(5L)) // undecodable/audio payload quarantined
    // 3) decoded metadata feeds the downstream operators unchanged
    val resized = Multimodal.resizeStub(
      Multimodal.decodeMeta(media, Multimodal.imageIoCodec), 32).collect()
    assert(resized.filter(_.doc_id == 4L).head.width == 32) // 128x16 → 32x4
    assert(resized.filter(_.doc_id == 4L).head.height == 4)
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
