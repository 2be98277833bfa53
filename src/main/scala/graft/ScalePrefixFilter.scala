package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prefix-filter join scale benchmark: synthetic Zipf-ish corpus with
  * planted duplicates → prefixFilterJaccard (exact-recall near-dup
  * join).
  *
  * Usage: runMain graft.ScalePrefixFilter [nDocs]
  *
  * The token distribution is deliberately skewed (tok = ⌊V·u²⌋, so
  * density ∝ 1/√tok: a few hot tokens, a long rare tail) because that
  * is the regime prefix filtering exploits — rarest-first ordering
  * makes the hot tokens suffix-only, so they are never join keys. A
  * UNIFORM vocab is the technique's worst case and a Zipfian one its
  * design point; real corpora are Zipfian (see text_zipf_fit).
  * Vocabulary grows with the corpus (V = max(50k, n), the Heaps-law
  * regime where prefix tokens are genuinely rare — at V = n/5 the
  * rarest tail still carried df ≈ 40 and candidates exploded 20×).
  * Every 100th doc copies its predecessor (J = 1 ≥
  * t), giving a planted-recall check: the lemma says recall is
  * EXACTLY 1, so anything below 1.000 here is a bug, not a tuning
  * issue.
  */
object ScalePrefixFilter {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = math.max(50000L, n)
    // ~20 tokens/doc; u ∈ [0,1) from a per-(doc,slot) hash, tok = ⌊V·u²⌋
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 20).map { t =>
        val src = col("id") - (col("id") % 100 === 99).cast("long")
        val u = pmod(xxhash64(src, lit(t)), lit(1000000L)) / lit(1000000.0)
        concat(lit("w"), floor(u * u * vocab).cast("long"))
      }: _*).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-pf").toString + "/docs"
    docs.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    corpus.count() // warm

    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.prefixFilterJaccard(corpus, 0.8)
    val nPairs = pairs.count()
    val tJoin = (System.nanoTime() - t0) / 1e9

    // planted copies are exact dups (J = 1): recall must be 1.000
    val planted = pairs
      .filter(col("db") === col("da") + 1 && col("db") % 100 === 99).count()
    val expected = n / 100

    println(f"""{"metric":"scale_prefix_filter","n_docs":$n,"vocab":$vocab,""" +
      f""""join_sec":$tJoin%.2f,"docs_per_sec":${n / tJoin}%.0f,""" +
      f""""pairs":$nPairs,""" +
      f""""planted_recall":${planted.toDouble / expected}%.3f}""")
    spark.stop()
  }
}
