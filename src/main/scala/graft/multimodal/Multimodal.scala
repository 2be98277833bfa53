package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.md5Long

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed through a pluggable codec
  * seam. The deterministic stub ([[decodeOne]]) remains the oracle
  * default; REAL zero-dependency codecs run through the SAME
  * mapPartitions path for all three modalities: javax.imageio
  * PNG/JPEG ([[imageIoCodec]]), javax.sound PCM WAV/AIFF
  * ([[audioSysCodec]]), and an MJPEG-in-AVI container walk whose
  * frames decode via ImageIO ([[videoAviCodec]]). Anything the JDK
  * cannot decode falls back to the stub or is quarantined — never a
  * crash. The Spark-side contract — schema, batching via
  * mapPartitions, partition-sized work units — is identical for stub
  * and real codecs, which is the point of the seam.
  */
object Multimodal {

  /** An opaque media payload + routing metadata. */
  final case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte])

  /** Typed metadata extracted by the (stubbed) decoder. */
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
                             width: Long, height: Long, n_frames: Long)

  /** Wrap the documents table as a media table: text bytes stand in
    * for an encoded payload. At scale this is a real binary column
    * read straight from parquet — never materialized on the driver.
    */
  def asMediaTable(docs: DataFrame): Dataset[MediaRecord] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** STUB decoder: deterministic pseudo-metadata from the payload
    * bytes. A real deployment swaps `decodeOne` for an actual codec
    * (e.g. javax.imageio / ffmpeg bindings) — the partition-batched
    * driver loop around it is unchanged.
    */
  def decodeOne(r: MediaRecord): MediaMeta = {
    var h = 1125899906842597L
    var i = 0
    while (i < r.media.length) { h = 31 * h + (r.media(i) & 0xff); i += 1 }
    val hh = h & Long.MaxValue
    MediaMeta(r.doc_id, r.kind, r.media.length.toLong,
      width = hh % 1024 + 1, height = (hh >> 10) % 1024 + 1,
      n_frames = if (r.kind == "video") hh % 240 + 1 else 1L)
  }

  /** Batched decode: one decoder instance per partition (the
    * real-codec pattern — init once, stream records through). The
    * codec is pluggable: [[decodeOne]] (deterministic stub, the
    * oracle default) or [[imageIoCodec]] (REAL JDK image decode) run
    * through the SAME mapPartitions path, so every mm_* operator
    * downstream is codec-agnostic.
    */
  def decodeMeta(media: Dataset[MediaRecord],
                 codec: MediaRecord => MediaMeta = decodeOne): Dataset[MediaMeta] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      // real codecs initialize here, once per partition
      it.map(codec)
    }
  }

  /** REAL image decode: javax.imageio (PNG/JPEG/BMP/GIF readers are
    * bundled with the JDK — no external dependency). Image payloads
    * are decoded for true width/height; non-image kinds and
    * undecodable byte streams fall back to the deterministic stub, so
    * a mixed-modality table still decodes end-to-end. MultimodalSpec
    * routes real PNG/JPEG byte streams through this codec via the
    * same [[decodeMeta]] path the 15 mm_* operators use.
    */
  def imageIoCodec(r: MediaRecord): MediaMeta =
    if (r.kind != "image") decodeOne(r)
    else {
      // NonFatal, not just IOException: ImageIO.read throws unchecked
      // exceptions (NegativeArraySizeException, IllegalArgumentException)
      // on corrupt/crafted headers — a malformed payload must fall back,
      // not crash the job
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.media))
      catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) decodeOne(r)
      else MediaMeta(r.doc_id, r.kind, r.media.length.toLong,
        width = img.getWidth.toLong, height = img.getHeight.toLong,
        n_frames = 1L)
    }

  /** Per-image luma statistics off REAL decoded pixels: mean BT.601
    * luma (0.299R + 0.587G + 0.114B) over all pixels — the
    * brightness/blank-frame filter a real curation pipeline runs
    * right after decode. Undecodable payloads are dropped (a real
    * pipeline quarantines them). Same partition-batched altitude as
    * [[decodeMeta]]: decode never leaves the executor, one codec init
    * per partition.
    */
  def imageLumaStats(media: Dataset[MediaRecord]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          var sum = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                     0.587 * ((rgb >> 8) & 0xff) +
                     0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Some((r.doc_id, img.getWidth.toLong, img.getHeight.toLong,
            sum / (img.getWidth.toLong * img.getHeight)))
        }
      }
    }.toDF("doc_id", "width", "height", "mean_luma")
  }

  /** REAL audio decode: javax.sound.sampled (PCM WAV/AIFF/AU readers
    * ship with the JDK — no external dependency, same zero-dep rule
    * as [[imageIoCodec]]). Audio payloads decode for true sample
    * counts; metadata convention for audio rows: width = sample rate
    * (Hz), height = channels, n_frames = PCM sample frames. Non-audio
    * kinds and byte streams the JDK has no reader for fall back to
    * the deterministic stub, so a mixed-modality table still decodes
    * end-to-end — the exact seam the image path proved swappable.
    */
  def audioSysCodec(r: MediaRecord): MediaMeta =
    if (r.kind != "audio") decodeOne(r)
    else decodeAudioSamples(r.media) match {
      case None => decodeOne(r)
      case Some((sr, ch, samples)) =>
        MediaMeta(r.doc_id, r.kind, r.media.length.toLong,
          width = sr.toLong, height = ch.toLong,
          n_frames = samples.length.toLong)
    }

  /** PCM decode to (sampleRate, channels, per-frame channel-averaged
    * samples normalized to [−1, 1]). None when the JDK has no reader
    * for the byte stream or the encoding isn't integer PCM — callers
    * treat None as quarantine/fallback, never as a crash (NonFatal:
    * crafted headers throw unchecked exceptions, same hazard as
    * ImageIO).
    */
  private[graft] def decodeAudioSamples(
      bytes: Array[Byte]): Option[(Float, Int, Array[Double])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val signed =
          f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned =
          f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = f.getSampleSizeInBits
        if (!(signed || unsigned) || bits % 8 != 0 || bits > 32) None
        else {
          val raw = in.readAllBytes()
          val bps = bits / 8
          val ch = f.getChannels
          val frameBytes = bps * ch
          val n = raw.length / frameBytes
          val full = (1L << (bits - 1)).toDouble
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var c = 0; var acc = 0.0
            while (c < ch) {
              val off = i * frameBytes + c * bps
              var v = 0L
              if (f.isBigEndian) {
                var b = 0
                while (b < bps) { v = (v << 8) | (raw(off + b) & 0xffL); b += 1 }
              } else {
                var b = bps - 1
                while (b >= 0) { v = (v << 8) | (raw(off + b) & 0xffL); b -= 1 }
              }
              val s = if (signed) (v << (64 - bits)) >> (64 - bits)
                      else v - (1L << (bits - 1)) // unsigned PCM recenters
              acc += s / full
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          Some((f.getSampleRate, ch, out))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL per-window audio energy off decoded PCM: RMS over fixed
    * windows of `winSamples` frames (tail window partial) — the
    * energy grid mm_audio_vad's segmenter consumes, computed from
    * actual samples instead of the metadata stub. Undecodable audio
    * payloads are dropped (a real pipeline quarantines them — same
    * policy as [[imageLumaStats]]). Decode never leaves the executor;
    * the window fold keeps one running sum, but decodeAudioSamples
    * materializes the clip's full PCM sample array first, so memory
    * is O(clip length) per row — fine for clip-sized media cells
    * (the MediaRecord contract), not for unbounded streams.
    * Output: doc_id, win_idx, start_sample, end_sample, rms.
    */
  def audioEnergyWindows(media: Dataset[MediaRecord],
                         winSamples: Int): DataFrame = {
    require(winSamples > 0, s"winSamples must be > 0, got $winSamples")
    val s = media.sparkSession
    import s.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { r =>
        decodeAudioSamples(r.media) match {
          case None => Iterator.empty
          case Some((_, _, samples)) =>
            val nWin = (samples.length + winSamples - 1) / winSamples
            (0 until nWin).iterator.map { w =>
              val start = w * winSamples
              val end = math.min(start + winSamples, samples.length)
              var ss = 0.0; var i = start
              while (i < end) { ss += samples(i) * samples(i); i += 1 }
              (r.doc_id, w.toLong, start.toLong, end.toLong,
                math.sqrt(ss / (end - start)))
            }
        }
      }
    }.toDF("doc_id", "win_idx", "start_sample", "end_sample", "rms")
  }

  /** REAL voice-activity segments: windows whose RMS crosses
    * `threshold` merge into maximal runs per clip. The merge is a
    * per-clip linear pass inside the decode partition — bounded by
    * one clip's window count, never the corpus.
    * Output: doc_id, seg_idx, start_win, end_win (inclusive), n_win.
    */
  def audioVadSegments(media: Dataset[MediaRecord], winSamples: Int,
                       threshold: Double): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { r =>
        decodeAudioSamples(r.media) match {
          case None => Iterator.empty
          case Some((_, _, samples)) =>
            val nWin = (samples.length + winSamples - 1) / winSamples
            val segs = scala.collection.mutable.ListBuffer
              .empty[(Long, Long, Long, Long, Long)]
            var segStart = -1L
            var w = 0
            while (w < nWin) {
              val start = w * winSamples
              val end = math.min(start + winSamples, samples.length)
              var ss = 0.0; var i = start
              while (i < end) { ss += samples(i) * samples(i); i += 1 }
              val voiced = math.sqrt(ss / (end - start)) >= threshold
              if (voiced && segStart < 0) segStart = w
              if (!voiced && segStart >= 0) {
                segs += ((r.doc_id, segs.size.toLong, segStart, w - 1L,
                  w - segStart))
                segStart = -1L
              }
              w += 1
            }
            if (segStart >= 0)
              segs += ((r.doc_id, segs.size.toLong, segStart, nWin - 1L,
                nWin - segStart))
            segs.iterator
        }
      }
    }.toDF("doc_id", "seg_idx", "start_win", "end_win", "n_win")
  }

  /** REAL video decode for MJPEG-in-AVI: the AVI container is plain
    * RIFF (fourcc + u32-LE size chunks) and each '00dc'/'00db' movi
    * chunk of an MJPEG stream is a complete JPEG — so a pure-JVM
    * container walk plus [[imageIoCodec]]'s javax.imageio path
    * decodes real video frames with zero new dependencies. Returns
    * (microSecPerFrame from avih, frame payloads) or None when the
    * bytes are not a parseable AVI (callers fall back/quarantine —
    * same policy as the image and audio seams). Bounds: the walk is
    * one linear pass with an explicit heap stack (no recursion — a
    * crafted nest of LIST headers cannot StackOverflow the task);
    * malformed sizes terminate the walk rather than throw.
    */
  private[graft] def aviMjpegFrames(
      bytes: Array[Byte]): Option[(Long, Vector[Array[Byte]])] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") None
    else {
      var usPerFrame = 0L
      val frames = Vector.newBuilder[Array[Byte]]
      var nFrames = 0
      // Iterative walk with an explicit (pos, end) stack: a crafted
      // payload of deeply nested 12-byte LIST headers must not be able
      // to overflow the JVM stack (untrusted media bytes fall back or
      // quarantine, NEVER crash the task). Each LIST pushes one frame
      // of two Ints; depth is bounded by bytes.length/12 heap entries.
      val stack = new java.util.ArrayDeque[(Int, Int)]
      stack.push((12, bytes.length))
      while (!stack.isEmpty) {
        var (p, end) = stack.pop()
        var stop = false
        while (!stop && p + 8 <= end) {
          val id = fcc(p)
          val sz = u32(p + 4)
          val dataStart = p + 8
          if (sz < 0 || sz > Int.MaxValue - dataStart || dataStart + sz > end)
            stop = true // malformed chunk: stop this level, keep what parsed
          else {
            val szI = sz.toInt
            if (id == "LIST" && szI >= 4) {
              // resume this level after the LIST, then descend into it
              stack.push((dataStart + szI + (szI & 1), end))
              p = end // descend now; the pushed frame resumes the rest
              stack.push((dataStart + 4, dataStart + szI))
              stop = true
            } else {
              if (id == "avih" && szI >= 56) usPerFrame = u32(dataStart)
              else if ((id.endsWith("dc") || id.endsWith("db")) && szI > 0) {
                frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + szI)
                nFrames += 1
              }
              p = dataStart + szI + (szI & 1) // chunks pad to even
            }
          }
        }
      }
      val fs = frames.result()
      if (fs.isEmpty) None else Some((usPerFrame, fs))
    }
  }

  /** REAL video metadata off the MJPEG-AVI path: n_frames = actual
    * movi frame count, width/height from the first decodable frame.
    * Non-video kinds and unparseable/undecodable payloads fall back
    * to the deterministic stub — the third modality through the SAME
    * codec seam (image: round 13, audio + video: round 14).
    */
  def videoAviCodec(r: MediaRecord): MediaMeta =
    if (r.kind != "video") decodeOne(r)
    else aviMjpegFrames(r.media) match {
      case None => decodeOne(r)
      case Some((_, frames)) =>
        val first = frames.iterator.map { f =>
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
          catch { case scala.util.control.NonFatal(_) => null }
        }.find(_ != null)
        first match {
          case None => decodeOne(r)
          case Some(img) => MediaMeta(r.doc_id, r.kind, r.media.length.toLong,
            width = img.getWidth.toLong, height = img.getHeight.toLong,
            n_frames = frames.size.toLong)
        }
    }

  /** Per-frame BT.601 mean luma off REAL decoded video frames — the
    * feature the shot-boundary detector consumes, computed from
    * actual pixels (mm_shot_bounds' deterministic stub remains the
    * oracle twin). Undecodable frames are skipped (frame-granular
    * quarantine); clips that don't parse as AVI are dropped whole.
    * Output: doc_id, frame_idx, width, height, mean_luma.
    */
  def videoFrameLumas(media: Dataset[MediaRecord]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        aviMjpegFrames(r.media) match {
          case None => Iterator.empty
          case Some((_, frames)) =>
            frames.iterator.zipWithIndex.flatMap { case (f, i) =>
              val img = try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(f))
              catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) None
              else {
                var sum = 0.0; var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    sum += 0.299 * ((rgb >> 16) & 0xff) +
                           0.587 * ((rgb >> 8) & 0xff) +
                           0.114 * (rgb & 0xff)
                    x += 1
                  }
                  y += 1
                }
                Some((r.doc_id, i.toLong, img.getWidth.toLong,
                  img.getHeight.toLong,
                  sum / (img.getWidth.toLong * img.getHeight)))
              }
            }
        }
      }
    }.toDF("doc_id", "frame_idx", "width", "height", "mean_luma")
  }

  /** REAL shot-boundary detection: a cut is a frame whose mean luma
    * jumps more than `threshold` from its predecessor (the classic
    * luma-delta detector), computed per clip inside the decode
    * partition — state is one previous-luma double, bounded by the
    * clip, never the corpus. Output: doc_id, n_frames, n_cuts,
    * n_shots (mm_shot_bounds' shape, off real pixels).
    */
  def videoShotBounds(media: Dataset[MediaRecord],
                      threshold: Double): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        aviMjpegFrames(r.media) match {
          case None => Iterator.empty
          case Some((_, frames)) =>
            var prev = Double.NaN
            var cuts = 0L
            var n = 0L
            frames.foreach { f =>
              val img = try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(f))
              catch { case scala.util.control.NonFatal(_) => null }
              if (img != null) {
                var sum = 0.0; var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    sum += 0.299 * ((rgb >> 16) & 0xff) +
                           0.587 * ((rgb >> 8) & 0xff) +
                           0.114 * (rgb & 0xff)
                    x += 1
                  }
                  y += 1
                }
                val luma = sum / (img.getWidth.toLong * img.getHeight)
                if (!prev.isNaN && math.abs(luma - prev) > threshold) cuts += 1
                prev = luma
                n += 1
              }
            }
            if (n == 0) None
            else Some((r.doc_id, n, cuts, cuts + 1))
        }
      }
    }.toDF("doc_id", "n_frames", "n_cuts", "n_shots")
  }

  /** STUB feature extractor: binary payload → 64-d float embedding
    * (deterministic from bytes; a real deployment runs a vision/audio
    * model here). Output plugs straight into Ann/VectorStore search.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      // model weights would load here, once per partition
      it.map { r =>
        val v = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < r.media.length) {
          h = 31 * h + (r.media(i) & 0xff)
          v(((h & Long.MaxValue) % dim).toInt) += (if ((h & 64) == 0) 1f else -1f)
          i += 1
        }
        var n = 0.0; var j = 0
        while (j < dim) { n += v(j) * v(j); j += 1 }
        val inv = if (n == 0.0) 0f else (1.0 / math.sqrt(n)).toFloat
        j = 0
        while (j < dim) { v(j) *= inv; j += 1 }
        (r.doc_id, v)
      }
    }.toDF("doc_id", "embedding")
  }

  /** STUB resize: re-derive target-box metadata (a real deployment
    * transcodes the payload; the partition-batched shape is the same).
    */
  def resizeStub(meta: Dataset[MediaMeta], maxSide: Long): Dataset[MediaMeta] = {
    val s = meta.sparkSession
    import s.implicits._
    meta.map { m =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
      m.copy(width = math.max(1L, (m.width * scale).toLong),
             height = math.max(1L, (m.height * scale).toLong))
    }
  }

  /** STUB frame sampler: one row per sampled frame index (every
    * `stride`-th frame), the fan-out shape of real video pipelines.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Long): DataFrame = {
    val s = meta.sparkSession
    import s.implicits._
    meta.filter(_.kind == "video").flatMap { m =>
      (0L until m.n_frames by stride).map(f => (m.doc_id, f))
    }.toDF("doc_id", "frame_idx")
  }

  /** Oracle-able metadata extraction in pure Catalyst expressions
    * (md5-derived fake dimensions — same numbers as the DuckDB twin).
    */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5Long(col("text")).as("hm"))
      .selectExpr("doc_id", "n_bytes",
        "hm % 1024 + 1 AS width", "(hm DIV 1024) % 1024 + 1 AS height")
      .orderBy("doc_id")
}
