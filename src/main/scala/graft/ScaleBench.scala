package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.score

/** Vector-search scale benchmark on SYNTHETIC data (the sf test
  * tables cap at 2000 vectors; this generates millions in-plan, no
  * I/O, to measure the compute path that dominates at 100 TB).
  *
  * Usage: runMain graft.ScaleBench [nVectors] [nQueries]
  * Prints one JSON line with single-query (TakeOrdered) and batched
  * (TopK partial aggregate) top-10 timings.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nq = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def vecs(rows: Long) = spark.range(rows).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => ((pmod(xxhash64(col("id"), d), lit(2001)) - lit(1000)) / 1000.0)
          .cast("float"))
        .as("embedding"))

    // warmup
    vecs(10000).agg(count(lit(1))).collect()

    // materialize the corpus as parquet — the benchmark measures the
    // REAL search path (parquet scan + cosine + top-k), which is what
    // runs at 100 TB; generation cost is excluded
    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString + "/emb"
    vecs(n).write.mode("overwrite").parquet(dir)
    val emb = spark.read.parquet(dir)

    // scan-only baseline: how much of the time is parquet array
    // materialization vs scoring
    val ts = System.nanoTime()
    emb.agg(sum(element_at(col("embedding"), 1))).collect()
    val tScan = (System.nanoTime() - ts) / 1e9
    val q1 = vecs(1).select(col("embedding").as("qv"))
    val t0 = System.nanoTime()
    emb.crossJoin(broadcast(q1))
      .select(col("vec_id"), score(col("embedding"), col("qv")).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(10).collect()
    val tSingle = (System.nanoTime() - t0) / 1e9

    val qs = vecs(nq).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val t1 = System.nanoTime()
    graft.ann.Ann.bruteForceTopK(emb, qs, 10).collect()
    val tBatch = (System.nanoTime() - t1) / 1e9

    val scoresPerSec = (n * nq / tBatch / 1e6)
    println(f"""{"metric":"scale_topk","n":$n,"n_queries":$nq,""" +
      f""""scan_sec":$tScan%.3f,"single_sec":$tSingle%.3f,"batch_sec":$tBatch%.3f,""" +
      f""""mscores_per_sec":$scoresPerSec%.2f}""")
    spark.stop()
  }
}
