package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dimensionality scale probe: does cosine top-k search stay
  * SCAN-BOUND when vectors widen from the test 64-d to the
  * reference's production 1024-d (reference:
  * app/core/document_ingestor.py:86 — 1024-dim COSINE)?
  *
  * Method: hold total embedding BYTES constant (n·dim fixed) and
  * sweep dim ∈ {64, 256, 1024}. If search cost is dominated by
  * parquet scan + array materialization (the at-scale claim), batch
  * top-k time stays ~flat across the sweep; a codegen/JIT cliff in
  * the dot-product loop at wide dims would show as 1024-d diverging.
  *
  * Usage: runMain graft.ScaleDim [bytesBudgetVectors64] [nQueries]
  * (default 2,000,000 64-d-equivalent vectors ≈ 1 GB of doubles).
  * Prints one JSON line per dim.
  */
object ScaleDim {
  def main(args: Array[String]): Unit = {
    val n64 = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nq = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def vecs(rows: Long, dim: Int) = spark.range(rows)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => ((pmod(xxhash64(col("id"), d), lit(2001)) - lit(1000)) / 1000.0)
            .cast("float"))
          .as("embedding"))

    vecs(10000, 64).agg(count(lit(1))).collect() // warmup

    Seq(64, 256, 1024).foreach { dim =>
      val n = n64 * 64 / dim // constant n·dim = constant bytes
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-dim$dim").toString + "/emb"
      vecs(n, dim).write.mode("overwrite").parquet(dir)
      val emb = spark.read.parquet(dir)

      // cold vs warm separated: the first pass right after writing
      // pays page-cache writeback + read-miss, which is an I/O fact
      // about the machine, not about the dot-product loop
      val ts = System.nanoTime()
      emb.agg(sum(element_at(col("embedding"), 1))).collect()
      val tCold = (System.nanoTime() - ts) / 1e9
      val tw = System.nanoTime()
      emb.agg(sum(element_at(col("embedding"), 1))).collect()
      val tWarm = (System.nanoTime() - tw) / 1e9

      val qs = vecs(nq, dim).select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val t1 = System.nanoTime()
      graft.ann.Ann.bruteForceTopK(emb, qs, 10).collect()
      val tBatch = (System.nanoTime() - t1) / 1e9

      // wide-array reader tuning: the default 4096-row columnar batch
      // is 16 MB of float buffer per thread at 1024-d — shrinking it
      // to 512 rows measured ~2× on the pure scan; check the effect
      // on the full search path too
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "512")
      val t2 = System.nanoTime()
      graft.ann.Ann.bruteForceTopK(spark.read.parquet(dir), qs, 10).collect()
      val tBatch512 = (System.nanoTime() - t2) / 1e9
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")

      val gflops = n.toDouble * nq * dim * 3 / tBatch / 1e9 // mul+add+sq-acc
      val gbPerSec = n.toDouble * dim * 4 * nq / tBatch / 1e9
      println(f"""{"metric":"scale_dim","dim":$dim,"n":$n,"n_queries":$nq,""" +
        f""""scan_cold_sec":$tCold%.3f,"scan_warm_sec":$tWarm%.3f,""" +
        f""""batch_sec":$tBatch%.3f,"batch_rb512_sec":$tBatch512%.3f,""" +
        f""""gflops":$gflops%.2f,"scored_gb_per_sec":$gbPerSec%.2f}""")
    }
    spark.stop()
  }
}
