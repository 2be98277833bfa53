package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent backing for vector collections: parquet partitioned by
  * `user_id` — the Spark-native equivalent of the reference's
  * per-user Qdrant collections (reference: document_ingestor.py:68).
  *
  * Why this layout at 100 TB:
  * - per-user operators (search/scroll/delete) become partition-pruned
  *   scans — Spark never touches other users' files;
  * - upsert/delete rewrite ONLY the touched user partitions (dynamic
  *   partition overwrite), not the table;
  * - collection listing is a filesystem metadata operation.
  */
object CollectionStorage {

  /** Write a full collection table, partitioned per user. */
  def write(points: DataFrame, path: String): Unit =
    points.write
      .partitionBy("user_id")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Load the collection table (partition pruning applies to any
    * subsequent `user_id` filter — spec-asserted on the plan).
    * Partition-column type inference reads `user_id` as int; cast it
    * back to the canonical long.
    *
    * A store that holds only [[ensureCollection]]-created empty
    * partition dirs has no parquet footer to infer a schema from —
    * that is the reference's create-collection→first-upsert window,
    * so it loads as an EMPTY canonical frame rather than failing.
    * A MISSING path still fails fast: ensureCollection creates the
    * directories, so path-not-found is a caller bug (a typo'd store
    * path must not read as a legitimately empty collection).
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    // match on the stable error condition, not message text (the
    // message wording is Spark-version-fragile; the condition is the
    // documented contract)
    val raw =
      try {
        val df = spark.read.parquet(path)
        // partition-type inference reads numeric user dirs as int —
        // cast those to the canonical long. STRING user ids (the
        // reference's uuid-style `user_id: str`,
        // document_ingestor.py:55–70) are kept as-is: a string-keyed
        // collection stays string-keyed end-to-end.
        df.schema("user_id").dataType match {
          case org.apache.spark.sql.types.StringType => df
          case _ => df.withColumn("user_id", col("user_id").cast("long"))
        }
      }
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(_.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType.fromDDL(
              "user_id BIGINT, vector_id BIGINT, doc_id BIGINT, " +
              "chunk_id BIGINT, title STRING, embedding ARRAY<DOUBLE>"))
      }
    // one canonical column order on BOTH paths: a partitioned read
    // appends user_id after the data columns while the empty fallback
    // declares it first — positional consumers (union-by-position,
    // Row.get(0)) must see the same layout either way
    raw.select("user_id", "vector_id", "doc_id", "chunk_id",
      "title", "embedding")
  }

  /** Overwrite only the user partitions present in `changed` —
    * the scale-safe mutation path for upsert/delete outcomes.
    */
  def overwriteUserPartitions(changed: DataFrame, path: String): Unit = {
    val spark = changed.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      changed.write
        .partitionBy("user_id")
        .mode(SaveMode.Overwrite)
        .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Compact a collection in place: streaming micro-batch ingestion
    * accretes one small file per batch per user; periodic compaction
    * rewrites each user partition into one file. Same
    * dynamic-partition-overwrite path as mutations — only data files
    * move, the table stays readable throughout.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    // hash-repartition on user_id: each user's rows land in exactly
    // one task → one data file per user partition after the write
    val all = load(spark, path).repartition(col("user_id"))
    overwriteUserPartitions(all, path)
  }

  /** Data file count per user partition (compaction observability).
    * Uses the Hadoop FileSystem API, so it works against any
    * configured store (HDFS, s3a, local), not just the local FS.
    */
  def fileCounts(spark: SparkSession, path: String): Map[Long, Int] = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("user_id="))
      .map { st =>
        val uid = st.getPath.getName.stripPrefix("user_id=").toLong
        uid -> fs.listStatus(st.getPath)
          .count(f => f.getPath.getName.endsWith(".parquet"))
      }.toMap
  }

  // ---- snapshot versions ------------------------------------------

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Snapshot versions present under a versioned collection root. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, path)
    if (!fs.exists(base)) Nil
    else fs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted.toSeq
  }

  /** Write the next snapshot version of a collection. Readers of any
    * existing version are untouched (old `v=N` directories are
    * immutable once written) and a version becomes visible only when
    * its directory write completes — the cheap file-layout form of
    * snapshot isolation + time travel, with no transaction log.
    * Dynamic-partition-overwrite mutations stay available WITHIN a
    * version; versioning bounds the blast radius of a bad pipeline
    * run to "roll back = read the previous v".
    */
  def writeSnapshot(points: DataFrame, path: String): Long = {
    val next = versions(points.sparkSession, path).lastOption.getOrElse(-1L) + 1
    write(points, s"$path/v=$next")
    next
  }

  /** Diff two snapshot versions: one full-outer join on the point key
    * (user_id, vector_id) classifying every point as added / removed /
    * updated (same key, different embedding or title) / unchanged —
    * the audit a pipeline runs before promoting a rebuilt collection.
    * Returns (change, n) counts; the join is an equi-join on the key,
    * so it scales with the snapshot size, not its square.
    */
  def diffSnapshots(spark: SparkSession, path: String,
                    vOld: Long, vNew: Long): DataFrame = {
    // 64-bit fingerprint of the serialized array (not 32-bit hash):
    // this diff gates snapshot promotion, so a changed embedding
    // colliding into "unchanged" must be ~2^-64, not ~2^-32
    def keyed(v: Long) = loadSnapshot(spark, path, Some(v))
      .select(col("user_id"), col("vector_id"), col("title"),
        xxhash64(to_json(struct(col("embedding")))).as("eh"))
    val o = keyed(vOld).withColumnRenamed("title", "t_old")
      .withColumnRenamed("eh", "eh_old")
    val n = keyed(vNew).withColumnRenamed("title", "t_new")
      .withColumnRenamed("eh", "eh_new")
    // null-safe title compare (<=>): a NULL→value retitle must read
    // as updated, not fall through a three-valued =!= to unchanged
    o.join(n, Seq("user_id", "vector_id"), "full_outer")
      .select(when(col("eh_old").isNull, lit("added"))
        .when(col("eh_new").isNull, lit("removed"))
        .when(col("eh_old") =!= col("eh_new") ||
              !(col("t_old") <=> col("t_new")), lit("updated"))
        .otherwise(lit("unchanged")).as("change"))
      .groupBy("change").agg(count(lit(1)).as("n"))
      .orderBy("change")
  }

  /** Load a snapshot (default: latest). */
  def loadSnapshot(spark: SparkSession, path: String,
                   version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshots under $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"snapshot v=$v not in $vs")
    load(spark, s"$path/v=$v")
  }

  /** Drop snapshots older than the newest `keep` (retention). */
  def expireSnapshots(spark: SparkSession, path: String, keep: Int): Seq[Long] = {
    val vs = versions(spark, path)
    val drop = vs.dropRight(keep)
    val fs = fsOf(spark, path)
    drop.foreach(v => fs.delete(new org.apache.hadoop.fs.Path(s"$path/v=$v"), true))
    drop
  }

  /** Collection names = partition values — metadata-only at scale. */
  def listUserIds(spark: SparkSession, path: String): Seq[Long] =
    load(spark, path).select("user_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq

  /** Ensure a collection exists before any data arrives (reference
    * ensure_collection, document_ingestor.py:70): an empty user
    * partition is just its directory — a pure filesystem-metadata
    * operation, no Spark job. Idempotent.
    */
  def ensureCollection(spark: SparkSession, path: String, userId: Long): Unit =
    ensureCollection(spark, path, userId.toString)

  /** String-user-id form (the reference's uuid-style ids —
    * document_ingestor.py:55–70 derives `user_<id>` per user; here
    * the user id IS the partition value).
    */
  def ensureCollection(spark: SparkSession, path: String,
                       userId: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/user_id=$userId")
    p.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(p)
    ()
  }

  /** Collection listing from partition DIRECTORIES — unlike
    * [[listUserIds]] this sees empty collections created by
    * [[ensureCollection]], and never runs a job.
    */
  def listCollectionDirs(spark: SparkSession, path: String): Seq[Long] =
    listCollectionNames(spark, path).map(_.toLong).sorted

  /** String form of [[listCollectionDirs]] for uuid-keyed stores. */
  def listCollectionNames(spark: SparkSession, path: String): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("user_id="))
      .map(_.getPath.getName.stripPrefix("user_id="))
      .sorted.toSeq
  }
}
