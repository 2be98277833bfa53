package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.md5Long

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed with a deterministic
  * STUBBED decoder (image/audio codecs are not available in this
  * container — see the builder brief). The Spark-side contract —
  * schema, batching via mapPartitions, partition-sized work units —
  * is real and spec-tested; only the codec call is faked.
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
    * real-codec pattern — init once, stream records through).
    */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      // real codecs would be initialized here, once per partition
      it.map(decodeOne)
    }
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
