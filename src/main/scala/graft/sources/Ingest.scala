package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions.md5Long
import graft.store.DocumentStore
import graft.text.Chunker

/** File-based ingestion — the Spark-native equivalent of the
  * reference's upload surface (reference app/api/routes.py:103–240:
  * upload file → parse → chunk → embed → upsert). Documents arrive as
  * raw files in a landing-zone directory; each reader below is a
  * declarative scan feeding the existing chunk → embed → upsert plan,
  * so ingesting 100 TB is file-parallel end to end with no driver
  * involvement per document.
  */
object Ingest {

  /** One row per text file: (doc_id, title, text). `wholetext` keeps
    * each file a single row; doc_id is the stable 60-bit hash of the
    * file NAME (not its path), so re-ingesting a moved or re-staged
    * landing zone produces identical ids — and therefore idempotent
    * last-writer-wins upserts, never duplicates.
    */
  def readTextDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("path"), col("value").as("text"))
      .select(
        md5Long(regexp_extract(col("path"), "([^/]+)$", 1)).as("doc_id"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("title"),
        col("text"))

  /** Schema for JSON-lines document batches. `_corrupt` captures
    * malformed lines under PERMISSIVE mode.
    */
  val jsonlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("title", StringType),
    StructField("text", StringType),
    StructField("_corrupt", StringType)))

  /** JSONL ingestion with an EXPLICIT schema (never schema inference —
    * an inference pass over a 100 TB landing zone is a full extra
    * scan) and corrupt-record quarantine: malformed lines surface in
    * `_corrupt` instead of being silently dropped or killing the job.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(jsonlSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** CSV documents, explicit schema + quarantine, same contract as
    * [[readJsonl]].
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(jsonlSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Binary assets for the multimodal path: Spark's `binaryFile`
    * source yields (path, modificationTime, length, content) with the
    * glob pushed into file listing — the scan never opens non-matching
    * files.
    */
  def readBinaryDir(spark: SparkSession, dir: String,
                    glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** End-to-end landing-zone ingest: text files → fixed-overlap chunks
    * → embeddings → last-writer-wins upsert into `userId`'s
    * collection, composed as ONE Catalyst plan. Deterministic keys at
    * every level (doc_id = hash(file name), chunk_id = offset/stride,
    * vector_id = hash(user, doc, chunk)) make re-runs replace rather
    * than append.
    */
  def ingestTextDir(coll: DataFrame, spark: SparkSession, dir: String,
                    userId: Long, size: Int = 400, stride: Int = 300): DataFrame = {
    val docs = readTextDir(spark, dir)
    val chunks = Chunker.chunkDocs(docs, size, stride)
      .join(docs.select("doc_id", "title"), "doc_id")
      .select(lit(userId).as("user_id"), col("doc_id"), col("chunk_id"),
              col("title"), col("chunk").as("text"))
    DocumentStore.upsertChunks(coll, chunks)
  }
}
