package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale benchmark for the candidate-blocked near-dup operators added
  * after the quadratic oracle formulations: ED-Join-style blocked
  * levenshtein pairs and LSH-pruned leave-one-out 1-NN. Sizes are
  * chosen so the quadratic forms would be 10^8–10^9 comparisons —
  * the point is that the blocked paths finish in seconds with full
  * planted recall.
  *
  * Usage: runMain graft.ScaleNearDup [nDocs] [nVecs]
  * Prints one JSON line with timings and planted-duplicate recall.
  */
object ScaleNearDup {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(20000L)
    val nVecs = args.drop(1).headOption.map(_.toLong).getOrElse(50000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- blocked levenshtein at nDocs ------------------------------
    // ~30 tokens/doc; every 100th doc is its predecessor with the
    // first character flipped (prefix edit distance exactly 1)
    // base-36 tokens ≈ natural-word character entropy (the digit-only
    // variant is a worst case for q-gram selectivity)
    val baseText = concat_ws(" ", (0 until 30).map(t =>
      conv(pmod(xxhash64(col("base_id"), lit(t)), lit(1500000)).cast("string"),
           10, 36)): _*)
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        (col("id") - (col("id") % 100 === 99).cast("long")).as("base_id"))
      .select(col("doc_id"),
        when(col("doc_id") % 100 === 99,
             concat(lit("X"), substring(baseText, 2, 1000000)))
          .otherwise(baseText).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ndup").toString
    docs.write.mode("overwrite").parquet(dir + "/docs")
    val corpus = spark.read.parquet(dir + "/docs")
    corpus.count() // warm

    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.levenshteinPairs(corpus, prefixLen = 40,
      maxDist = 5, q = sys.env.getOrElse("GRAFT_LEV_Q", "4").toInt)
    val nPairs = pairs.count()
    val tLev = (System.nanoTime() - t0) / 1e9
    val levPlanted = pairs
      .filter(col("db") === col("da") + 1 && col("db") % 100 === 99).count()

    // --- LSH-pruned 1-NN at nVecs ----------------------------------
    // 32-dim hash-derived vectors; every 100th is an exact copy of its
    // predecessor, so its true 1-NN is that predecessor at ns = 0
    val dim = 32
    val emb = spark.range(nVecs)
      .select(col("id").as("vec_id"),
        (col("id") - (col("id") % 100 === 99).cast("long")).as("base_id"),
        pmod(col("id"), lit(10)).as("label"))
      .select(col("vec_id"), col("label"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("base_id"), i), lit(1000)) / 500.0 - 1.0)
            .cast("float")).as("embedding"))
    emb.write.mode("overwrite").parquet(dir + "/emb")
    val vecs = spark.read.parquet(dir + "/emb")
    vecs.count() // warm

    val t1 = System.nanoTime()
    val nn = graft.ann.Ann.knn1Lsh(vecs, nPlanes = 12, dim = dim)
    val nAnswered = nn.count()
    val tKnn = (System.nanoTime() - t1) / 1e9
    val knnPlanted = nn
      .filter(col("va") % 100 === 99 && col("vb") === col("va") - 1 &&
              col("ns") <= 1e-9).count()

    println(f"""{"metric":"scale_near_dup","n_docs":$nDocs,""" +
      f""""lev_sec":$tLev%.2f,"lev_pairs":$nPairs,""" +
      f""""lev_planted_recall":${levPlanted.toDouble / (nDocs / 100)}%.3f,""" +
      f""""n_vecs":$nVecs,"knn_sec":$tKnn%.2f,"knn_answered":$nAnswered,""" +
      f""""knn_planted_recall":${knnPlanted.toDouble / (nVecs / 100)}%.3f}""")
    spark.stop()
  }
}
