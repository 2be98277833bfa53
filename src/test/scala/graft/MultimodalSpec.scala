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

  test("REAL audio bytes decode through the same mapPartitions path") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // hand-built WAV byte streams with known sample counts and
    // energies — the first ACTUAL audio-codec traffic across the
    // mm_* seam (the JDK ships PCM WAV readers; javax.sound is the
    // audio twin of the javax.imageio path above).
    def wav16(sr: Float, ch: Int, frames: Array[Array[Short]]): Array[Byte] = {
      val fmt = new AudioFormat(sr, 16, ch, true, false) // signed LE
      val data = new Array[Byte](frames.length * ch * 2)
      frames.zipWithIndex.foreach { case (f, i) =>
        (0 until ch).foreach { c =>
          val off = (i * ch + c) * 2
          data(off) = (f(c) & 0xff).toByte
          data(off + 1) = ((f(c) >> 8) & 0xff).toByte
        }
      }
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(data), fmt, frames.length.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def wav8u(sr: Float, samples: Array[Int]): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
        sr, 8, 1, 1, sr, false)
      val data = samples.map(v => (v & 0xff).toByte)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(data), fmt, samples.length.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // clip 1: mono 8 kHz, 800 silent + 800 half-amplitude samples
    //   (16384/32768 = 0.5 exactly — RMS is exact in doubles)
    val clip1 = wav16(8000f, 1,
      (Array.fill(800)(0) ++ Array.fill(800)(16384)).map(v => Array(v.toShort)))
    // clip 2: stereo, L = 0.25, R = 0.75 → channel-averaged 0.5
    val clip2 = wav16(16000f, 2,
      Array.fill(600)(Array(8192.toShort, 24576.toShort)))
    // clip 3: unsigned 8-bit, value 192 → (192 − 128)/128 = 0.5
    val clip3 = wav8u(8000f, Array.fill(300)(192))
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", clip1),
      Multimodal.MediaRecord(2L, "audio", clip2),
      Multimodal.MediaRecord(3L, "audio", clip3),
      Multimodal.MediaRecord(4L, "audio", Array[Byte](9, 9, 9)), // garbage
      Multimodal.MediaRecord(5L, "image", clip1)) // wrong kind → stub
    val s = spark
    import s.implicits._
    val media = s.createDataset(recs).repartition(3)
    // 1) real decode through decodeMeta — the same pluggable-codec
    //    path every mm_* operator consumes (convention: width = Hz,
    //    height = channels, n_frames = PCM sample frames)
    val metas = Multimodal.decodeMeta(media, Multimodal.audioSysCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).width == 8000L && metas(1L).height == 1L &&
      metas(1L).n_frames == 1600L)
    assert(metas(2L).width == 16000L && metas(2L).height == 2L &&
      metas(2L).n_frames == 600L)
    assert(metas(3L).width == 8000L && metas(3L).height == 1L &&
      metas(3L).n_frames == 300L)
    // garbage + non-audio fall back to the deterministic stub
    assert(metas(4L) == Multimodal.decodeOne(recs(3)))
    assert(metas(5L) == Multimodal.decodeOne(recs(4)))
    // 2) real per-window RMS energies: clip 1 at 400-sample windows
    //    is exactly [0, 0, 0.5, 0.5]; stereo averages channels to 0.5;
    //    the tail window of clip 2 is partial (100 samples) yet exact
    val en = Multimodal.audioEnergyWindows(media, 400).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(en((1L, 0L)) == ((0L, 400L, 0.0)))
    assert(en((1L, 1L)) == ((400L, 800L, 0.0)))
    assert(en((1L, 2L)) == ((800L, 1200L, 0.5)))
    assert(en((1L, 3L)) == ((1200L, 1600L, 0.5)))
    assert(en((2L, 0L)) == ((0L, 400L, 0.5)))
    assert(en((2L, 1L)) == ((400L, 600L, 0.5))) // partial tail
    assert(en((3L, 0L)) == ((0L, 300L, 0.5)))
    assert(!en.keySet.exists(_._1 == 4L)) // undecodable quarantined
    assert(!en.keySet.exists(_._1 == 5L)) // non-audio not in the fan-out
    // 3) VAD over real energies: clip 1 crosses 0.25 exactly in
    //    windows 2..3 → one merged segment
    val vad = Multimodal.audioVadSegments(media, 400, 0.25).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(vad.filter(_._1 == 1L).map(_._2).toSeq == Seq((2L, 3L, 2L)))
    assert(vad.filter(_._1 == 2L).map(_._2).toSeq == Seq((0L, 1L, 2L)))
    // 3b) big-endian path: AIFF is PCM_SIGNED big-endian in the JDK
    //     writer — same samples as clip 1's voiced half, so RMS = 0.5
    val fmtBe = new AudioFormat(8000f, 16, 1, true, true)
    val beData = new Array[Byte](400 * 2)
    (0 until 400).foreach { i =>
      beData(i * 2) = ((16384 >> 8) & 0xff).toByte
      beData(i * 2 + 1) = (16384 & 0xff).toByte
    }
    val bosBe = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new ByteArrayInputStream(beData), fmtBe, 400L),
      AudioFileFormat.Type.AIFF, bosBe)
    val aiff = Multimodal.MediaRecord(6L, "audio", bosBe.toByteArray)
    val mBe = Multimodal.decodeMeta(s.createDataset(Seq(aiff)),
      Multimodal.audioSysCodec).collect().head
    assert(mBe.width == 8000L && mBe.height == 1L && mBe.n_frames == 400L)
    val eBe = Multimodal.audioEnergyWindows(s.createDataset(Seq(aiff)), 400)
      .collect().map(r => r.getDouble(4))
    assert(eBe.toSeq == Seq(0.5), s"AIFF big-endian RMS: ${eBe.toSeq}")
    // 4) parity with the mm_audio_windows grid: the fixed-10s window
    //    formula applied to REAL decoded metadata (sr = width,
    //    n_samples = n_frames) matches the engine's fan-out shape
    Seq(1L, 2L, 3L).foreach { id =>
      val m = metas(id)
      val win = m.width * 10
      val nWin = (m.n_frames + win - 1) / win
      val grid = Multimodal.audioEnergyWindows(
        media.filter(_.doc_id == id), win.toInt).collect()
      assert(grid.length.toLong == nWin)
      assert(grid.map(_.getLong(3)).max == m.n_frames)
    }
  }

  test("REAL video frames decode through the MJPEG-AVI container path") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // hand-built AVI byte stream: RIFF('AVI ') { LIST hdrl { avih },
    // LIST movi { 00dc = complete JPEG per frame } } -- the minimal
    // well-formed MJPEG-AVI, assembled from first principles so the
    // parser is tested against the container SPEC, not against its
    // own writer
    def jpegGray(level: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def u32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array[Byte]()
      id.getBytes("US-ASCII") ++ u32(data.length.toLong) ++ data ++ pad
    }
    def list(kind: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ inner)
    def avi(frames: Seq[Array[Byte]], usPerFrame: Long, w: Int, h: Int): Array[Byte] = {
      val avih = u32(usPerFrame) ++ u32(0) ++ u32(0) ++ u32(0) ++
        u32(frames.size.toLong) ++ u32(0) ++ u32(1) ++ u32(0) ++
        u32(w.toLong) ++ u32(h.toLong) ++ Array.fill(16)(0.toByte)
      val hdrl = list("hdrl", chunk("avih", avih))
      val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ u32(body.length.toLong) ++ body
    }
    // 3 dark (luma 20) + 3 bright (luma 200) frames: one hard cut
    val frames = Seq.fill(3)(jpegGray(20, 16, 12)) ++
      Seq.fill(3)(jpegGray(200, 16, 12))
    val clip = avi(frames, 40000L, 16, 12) // 25 fps
    val recs = Seq(
      Multimodal.MediaRecord(1L, "video", clip),
      Multimodal.MediaRecord(2L, "video", Array[Byte](1, 2, 3)), // garbage
      Multimodal.MediaRecord(3L, "audio", clip)) // wrong kind -> stub
    val s = spark
    import s.implicits._
    val media = s.createDataset(recs).repartition(2)
    // 1) container parse + first-frame decode through the codec seam
    val metas = Multimodal.decodeMeta(media, Multimodal.videoAviCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).n_frames == 6L)
    assert(metas(1L).width == 16L && metas(1L).height == 12L)
    assert(metas(2L) == Multimodal.decodeOne(recs(1))) // garbage -> stub
    assert(metas(3L) == Multimodal.decodeOne(recs(2))) // non-video -> stub
    // 2) per-frame REAL lumas: solid gray JPEGs decode within +-2
    val lumas = Multimodal.videoFrameLumas(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(lumas.size == 6)
    (0 until 3).foreach(i => assert(math.abs(lumas((1L, i.toLong)) - 20.0) <= 2.0,
      s"frame $i luma ${lumas((1L, i.toLong))}"))
    (3 until 6).foreach(i => assert(math.abs(lumas((1L, i.toLong)) - 200.0) <= 2.0,
      s"frame $i luma ${lumas((1L, i.toLong))}"))
    // 3) shot-boundary detection over real pixels: exactly one cut
    val shots = Multimodal.videoShotBounds(media, threshold = 60.0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(shots(1L) == ((6L, 1L, 2L)), s"got ${shots.get(1L)}")
    assert(!shots.contains(2L) && !shots.contains(3L))
    // 4) a frame-granular quarantine: corrupt ONE movi frame payload
    //    in place -- the other five still decode, the clip survives
    val corrupt = avi(frames.updated(2, Array[Byte](9, 9, 9, 9)), 40000L, 16, 12)
    val m2 = s.createDataset(Seq(Multimodal.MediaRecord(9L, "video", corrupt)))
    val l2 = Multimodal.videoFrameLumas(m2).collect()
    assert(l2.length == 5, s"expected 5 decodable frames, got ${l2.length}")
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
