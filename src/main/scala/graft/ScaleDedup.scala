package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup scale benchmark: synthetic corpus (with planted near-dups) →
  * MinHash signatures → banded LSH candidate pairs.
  *
  * Usage: runMain graft.ScaleDedup [nDocs]
  * Prints one JSON line: signature + LSH timings, docs/sec, and the
  * planted-duplicate recall (every planted pair must surface as an
  * LSH candidate — sanity that speed didn't cost correctness).
  */
object ScaleDedup {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~20 tokens/doc from a 50k vocab; every 100th doc is a copy of
    // its predecessor (planted near-dup)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 20).map(t =>
        concat(lit("w"), pmod(xxhash64(col("id") - (col("id") % 100 === 99).cast("long"), lit(t)), lit(50000)))): _*)
        .as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString + "/docs"
    docs.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    corpus.count() // warm

    val t0 = System.nanoTime()
    val sig = graft.dedup.Dedup.minhashSignaturesTokens(corpus, 2, 8)
    sig.write.mode("overwrite").parquet(dir + "_sig")
    val tSig = (System.nanoTime() - t0) / 1e9

    val sigDf = spark.read.parquet(dir + "_sig")
    val t1 = System.nanoTime()
    val pairs = graft.dedup.Dedup.minhashLshPairs(sigDf, 8, 2)
    val nPairs = pairs.count()
    val tLsh = (System.nanoTime() - t1) / 1e9

    // recall of planted pairs (id 99→98, 199→198, ...)
    val planted = pairs
      .filter(col("db") === col("da") + 1 && col("db") % 100 === 99).count()
    val expected = n / 100

    // canonical-doc assignment over the full dup graph
    val t2 = System.nanoTime()
    val cc = graft.dedup.Dedup.connectedComponents(corpus, pairs)
    val nCanonical = cc.filter(col("doc_id") === col("cluster")).count()
    val tCc = (System.nanoTime() - t2) / 1e9

    println(f"""{"metric":"scale_dedup","n_docs":$n,"sig_sec":$tSig%.2f,""" +
      f""""lsh_sec":$tLsh%.2f,"cc_sec":$tCc%.2f,""" +
      f""""docs_per_sec":${n / (tSig + tLsh + tCc)}%.0f,""" +
      f""""cand_pairs":$nPairs,"n_canonical":$nCanonical,""" +
      f""""planted_recall":${planted.toDouble / expected}%.3f}""")
    spark.stop()
  }
}
