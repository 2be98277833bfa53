package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Outbound migration writers — the inverse of [[QdrantImport]]:
  * canonical collections leave the engine in the reference's own
  * point-export format, so a caller can move a collection BACK to a
  * Qdrant tier (or hand it to any tool speaking that JSONL).
  */
object Export {

  /** Write one `user_<id>.jsonl` dump per user collection under
    * `dir`, each line a reference point record
    * `{"id": ..., "vector": [...], "payload": {DocId, ChunkId,
    * Title}}` (the exact shape [[QdrantImport]] reads — round-trip
    * spec-pinned). The frame is hash-repartitioned on user_id so
    * each collection lands as ONE data file (written distributed,
    * renamed per collection with bounded driver-side filesystem
    * metadata ops). Returns the user ids written.
    */
  def writeQdrantPoints(coll: DataFrame, dir: String): Seq[String] = {
    val spark = coll.sparkSession
    val staged = s"$dir/_staged"
    coll.select(col("user_id"),
        to_json(struct(
          col("vector_id").as("id"),
          col("embedding").cast("array<double>").as("vector"),
          struct(col("doc_id").as("DocId"), col("chunk_id").as("ChunkId"),
                 col("title").as("Title")).as("payload"))).as("value"))
      .repartition(col("user_id"))
      .write.partitionBy("user_id").mode("overwrite").text(staged)
    // one part file per user partition (repartition guarantees it);
    // promote each to the reference's flat user_<id>.jsonl name
    val base = new org.apache.hadoop.fs.Path(staged)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val users = fs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("user_id="))
      .map { st =>
        val uid = st.getPath.getName.stripPrefix("user_id=")
        val parts = fs.listStatus(st.getPath)
          .filter(_.getPath.getName.startsWith("part-"))
        require(parts.length == 1,
          s"expected one part file for user $uid, got ${parts.length}")
        fs.rename(parts.head.getPath,
          new org.apache.hadoop.fs.Path(s"$dir/user_$uid.jsonl"))
        uid
      }.toSeq.sorted
    fs.delete(base, true)
    users
  }
}
