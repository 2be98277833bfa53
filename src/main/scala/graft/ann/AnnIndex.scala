package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.score

/** Materialized ANN indexes: the LSH bucket / IVF cell is computed
  * map-side ONCE at write time and stored as a parquet PARTITION
  * column; queries route through a broadcast equi-join on that column,
  * so candidate generation is pruned I/O (dynamic partition pruning /
  * PartitionFilters in the measured plans — plan-guarded), not a full
  * scan plus a post-filter. This is the serving posture a production
  * ANN table has: signatures are write-time state, a query reads only
  * its probed partitions, and at 100 TB the unprobed partitions are
  * never opened.
  *
  * Index builds are memoized per (JVM, dir, params) the same way the
  * user-partitioned collection is (store/VectorStore.scala): the
  * one-time write happens on first use; every query measures the
  * pruned read.
  */
object AnnIndex {

  private val built =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def materialize(key: String)(write: String => Unit): String =
    built.getOrElseUpdate(key, {
      val out = java.nio.file.Files.createTempDirectory("graft_ann_").toString
      write(out)
      out
    })

  /** Embeddings with their LSH bucket as the partition column. */
  def lshPartitioned(s: SparkSession, dir: String,
                     nPlanes: Int, dim: Int): DataFrame = {
    val path = materialize(s"lsh|$dir|$nPlanes|$dim") { out =>
      Ann.withBucket(Tables.embeddings(s, dir), nPlanes, dim)
        .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(out)
    }
    s.read.parquet(path)
  }

  /** Multiprobe LSH top-k served from the bucket-partitioned index:
    * the query's hamming ≤ 1 probe neighborhood (own bucket + each
    * 1-bit flip) is a tiny exploded frame, and the candidate join is
    * a broadcast equi-join ON THE PARTITION COLUMN — dynamic partition
    * pruning reads only the probed buckets. Result rows are identical
    * to [[Ann.lshTopK]] at probeDist = 1 (the probe set IS the
    * hamming ≤ 1 ball, and within one query the probe buckets are
    * distinct, so no pair appears twice).
    */
  def lshTopKIndexed(s: SparkSession, dir: String, queryIds: Seq[Long],
                     nPlanes: Int, dim: Int, k: Int): DataFrame = {
    val idx = lshPartitioned(s, dir, nPlanes, dim)
    val q = idx.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
              col("bucket").cast("long").as("qb"))
    val flips = lit(0L) +: (0 until nPlanes).map(p => lit(1L << p))
    val probes = q.select(col("qid"), col("qv"),
        explode(array(flips: _*)).as("flip"), col("qb"))
      // probe key cast to the partition column's inferred type keeps
      // the scan-side join key a bare partition attribute (prunable)
      .select(col("qid"), col("qv"),
              col("qb").bitwiseXOR(col("flip")).cast("int").as("bucket"))
    val agg = graft.ops.TopK.topk(k)
    idx.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), score(col("embedding"), col("qv")).as("score"), col("vec_id"))
      .groupBy("qid")
      .agg(agg(col("score"), col("vec_id")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"),
              (col("pos") + 1).cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  /** Embeddings with their nearest seed-centroid cell (vec_id <
    * nCents, the [[Ann.ivfProbe]] quantizer) as the partition column.
    */
  def ivfPartitioned(s: SparkSession, dir: String, nCents: Int): DataFrame = {
    val path = materialize(s"ivf|$dir|$nCents") { out =>
      val emb = Tables.embeddings(s, dir)
      val centsRow = emb.filter(col("vec_id") < nCents)
        .agg(sort_array(collect_list(
          struct(col("vec_id").as("cid"), col("embedding").as("cv")))).as("cents"))
      val nearest = element_at(array_sort(transform(col("cents"),
        e => struct((lit(1.0) - score(col("embedding"), e.getField("cv"))).as("ns"),
                    e.getField("cid").as("cid")))), 1)
      emb.crossJoin(broadcast(centsRow))
        .select(col("vec_id"), col("embedding"), col("label"),
                nearest.getField("cid").as("cid"))
        .write.partitionBy("cid").mode(SaveMode.Overwrite).parquet(out)
    }
    s.read.parquet(path)
  }

  /** IVF probe served from the cell-partitioned index: the query's
    * nprobe nearest cells are a 1-row broadcast frame exploded to
    * (qv, cid), and the candidate join is a broadcast equi-join ON THE
    * PARTITION COLUMN — unprobed cells are pruned I/O. Result rows are
    * identical to [[Ann.ivfProbe]].
    */
  def ivfProbeIndexed(s: SparkSession, dir: String, nCents: Int, qid: Long,
                      nprobe: Int, k: Int): DataFrame = {
    val idx = ivfPartitioned(s, dir, nCents)
    val emb = Tables.embeddings(s, dir)
    val centsRow = emb.filter(col("vec_id") < nCents)
      .agg(sort_array(collect_list(
        struct(col("vec_id").as("cid"), col("embedding").as("cv")))).as("cents"))
    val probes = emb.filter(col("vec_id") === qid)
      .select(col("embedding").as("qv"))
      .crossJoin(broadcast(centsRow))
      .select(col("qv"), explode(slice(array_sort(transform(col("cents"),
          e => struct((lit(1.0) - score(col("qv"), e.getField("cv"))).as("ns"),
                      e.getField("cid").as("cid")))), 1, nprobe)).as("pc"))
      .select(col("qv"), col("pc").getField("cid").cast("int").as("cid"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("vec_id"))
    idx.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= qid)
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
              score(col("embedding"), col("qv")).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .orderBy("rnk")
  }
}
