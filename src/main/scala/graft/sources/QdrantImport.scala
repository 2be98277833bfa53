package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Migration reader for Qdrant point exports — the one data-plane
  * artifact of the reference stack (docker-compose.yml mounts
  * `qdrant_storage/`) with no engine counterpart until now. Qdrant's
  * own storage is RocksDB segments, so the practical migration dump
  * is its REST surface: `scroll`/snapshot tooling emits point records
  * `{"id": ..., "vector": [...], "payload": {"DocId": ..,
  * "ChunkId": .., "Title": ..}}` (the reference's exact payload keys
  * — document_ingestor.py:161/:209) per collection `user_<id>`
  * (:55–70). One JSONL file per collection, named
  * `user_<id>.jsonl`, is the expected layout.
  *
  * Scale posture mirrors [[Ingest.readJsonl]]: EXPLICIT schema (no
  * inference scan), corrupt-line quarantine, file-parallel — a 1000-
  * collection dump ingests as one scan, then lands in the canonical
  * user-partitioned parquet via CollectionStorage.write.
  */
object QdrantImport {

  /** Point-record schema of a Qdrant scroll/snapshot JSON export.
    * `id` reads as STRING so integer and uuid point ids both load
    * (the canonical collections support either — SURVEY §2 row 102).
    */
  val pointSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("vector", ArrayType(DoubleType)),
    StructField("payload", StructType(Seq(
      StructField("DocId", LongType),
      StructField("ChunkId", LongType),
      StructField("Title", StringType)))),
    StructField("_corrupt", StringType)))

  private def canonical(raw: DataFrame, userCol: org.apache.spark.sql.Column,
                        numericIds: Boolean): DataFrame = {
    val vid =
      if (numericIds) col("id").cast("long").as("vector_id")
      else col("id").as("vector_id")
    raw.filter(col("_corrupt").isNull && col("id").isNotNull)
      .select(userCol.as("user_id"), vid,
        col("payload.DocId").as("doc_id"),
        col("payload.ChunkId").as("chunk_id"),
        col("payload.Title").as("title"),
        col("vector").cast("array<float>").as("embedding"))
  }

  /** Malformed lines of a dump (quarantine audit — count these before
    * promoting an import).
    */
  def corruptRecords(spark: SparkSession, path: String): DataFrame = {
    // a text scan + from_json, NOT the json reader's corrupt column:
    // Spark refuses plans whose pruned scan reads only
    // _corrupt_record (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and an
    // audit is exactly such a query
    // from_json yields an all-null struct for malformed lines, so
    // "corrupt" = no parseable point id (the same rows canonical()
    // drops via its id.isNotNull gate)
    val dataSchema = StructType(pointSchema.dropRight(1))
    spark.read.text(path)
      .filter(from_json(col("value"), dataSchema).getField("id").isNull)
      .select(col("value").as("line"))
  }

  /** One collection's export → canonical points for `userId`. */
  def readPointsJsonl(spark: SparkSession, path: String, userId: Any,
                      numericIds: Boolean = true): DataFrame =
    canonical(
      spark.read.schema(pointSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path),
      lit(userId), numericIds)

  /** A directory of `user_<id>.jsonl` collection dumps → one
    * canonical frame; user_id derives from each FILE name (the
    * reference's collection naming — note its hyphen→underscore
    * normalization is lossy, so re-imported string ids carry
    * underscores).
    */
  def readCollectionDumps(spark: SparkSession, dir: String,
                          numericIds: Boolean = true): DataFrame =
    canonical(
      spark.read.schema(pointSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(s"$dir/*.jsonl")
        .withColumn("_user", regexp_extract(input_file_name(),
          "user_([^/]+)\\.jsonl$", 1)),
      if (numericIds) col("_user").cast("long") else col("_user"),
      numericIds)
}
