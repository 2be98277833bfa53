package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the round-7 pipeline operators on SYNTHETIC
  * data (the sf documents table caps at 5k rows; this generates
  * millions in-plan to measure the compute path):
  * PII scrub, token-budget selection, embedding whitening, MMR.
  *
  * Usage: runMain graft.ScalePipeline [nDocs] [nVecs]
  * Prints one JSON line of per-op wall seconds + rows/s.
  */
object ScalePipeline {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nVecs = if (args.length > 1) args(1).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = array((0 until 100).map(i => lit(s"w$i")): _*)
    // ~300-char docs; every 10th doc leaks an email + phone
    def docs(rows: Long) = spark.range(rows).select(col("id").as("doc_id"),
      concat(
        concat_ws(" ", transform(sequence(lit(0), lit(49)),
          i => element_at(vocab, (pmod(xxhash64(col("id"), i), lit(100)) + 1).cast("int")))),
        when(pmod(col("id"), lit(10)) === 0,
          concat(lit(" u"), col("id").cast("string"),
            lit("@ex.com 555-123-4567"))).otherwise(lit(""))).as("text"))
    def vecs(rows: Long) = spark.range(rows).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => ((pmod(xxhash64(col("id"), d), lit(2001)) - lit(1000)) / 1000.0)
          .cast("float")).as("embedding"))

    val base = java.nio.file.Files.createTempDirectory("graft-scale-pipe").toString
    docs(nDocs).write.mode("overwrite").parquet(s"$base/docs")
    vecs(nVecs).write.mode("overwrite").parquet(s"$base/emb")
    val d = spark.read.parquet(s"$base/docs")
    val e = spark.read.parquet(s"$base/emb")
    d.count(); e.count() // warm file listing + codegen

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val tPii = time {
      graft.text.Pii.redact(d)
        .agg(sum(col("n_email")), sum(length(col("redacted")))).collect()
    }
    val tBudget = time {
      val scored = d.select(col("doc_id"), lit(50L).as("n_tok"),
        (pmod(xxhash64(col("doc_id")), lit(10000)) / 10000.0).as("score"))
      graft.ops.Packing
        .selectByTokenBudget(scored, "doc_id", "n_tok", "score", nDocs * 25L)
        .agg(count(lit(1)), max("cum_tok")).collect()
    }
    val tWhiten = time {
      graft.embed.Whitening.whiten(e)
        .agg(sum(element_at(col("z"), 1))).collect()
    }
    val tMmr = time {
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      graft.ann.Mmr.rerank(e.filter(col("vec_id") =!= 0), q, 50, 10, 0.5).collect()
    }
    // span-ngram exact-substring dedup (the dedup_span_ngrams plan at
    // corpus scale): ~43 8-gram hashes per 50-token doc → one groupBy
    // on the gram hash + one equi-join back, both linear in tokens
    val tSpan = time {
      val t = graft.text.TextPrimitives.tokens(col("text"))
      val grams = d.select(col("doc_id"), t.as("t"))
        .select(col("doc_id"), explode(
          when(size(col("t")) >= 8,
            transform(sequence(lit(1), size(col("t")) - 7),
              i => graft.functions.VectorFunctions.md5Long(
                concat_ws(" ", slice(col("t"), i, lit(8))))))
          .otherwise(array().cast("array<bigint>"))).as("g"))
      val dc = grams.groupBy("g").agg(countDistinct("doc_id").as("ndocs"))
      grams.join(dc, "g").groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
             sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .agg(sum("n_dup"), count(lit(1))).collect()
    }
    // length-bucketed batching on a length-CONCENTRATED corpus (80%
    // of docs share one exact token count — the shape the id-block
    // level exists for; a two-level scan would straggle here)
    val tBatch = time {
      val lens = d.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 8, lit(512L))
          .otherwise(pmod(xxhash64(col("doc_id")), lit(1024)))
          .cast("long").as("n_tok"))
      graft.ops.Packing.bucketedBatches(lens, "doc_id", "n_tok",
        bucketWidth = 64L, nBuckets = 16, batchSize = 32,
        blockSize = 1L << 16).collect()
    }

    // boundedRowNumber vs a plain per-key row_number on a hot-keyed
    // corpus (80% of rows share ONE key): the plain window funnels
    // the hot key into a single sorting task; the id-block scan keeps
    // every partition <= blockSize
    val hotKeyed = spark.range(5L * nDocs).select(
      when(pmod(col("id"), lit(10)) < 8, lit("hot"))
        .otherwise(concat(lit("k"), pmod(col("id"), lit(64)).cast("string"))).as("k"),
      col("id"))
    hotKeyed.count() // materialize plan shape cost out of the timings
    val tBrn = time {
      graft.ops.Packing.boundedRowNumber(hotKeyed, Seq("k"), "id", 1L << 16, "r")
        .agg(max("r"), count(lit(1))).collect()
    }
    val tPlainRn = time {
      hotKeyed.withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("id")))
        .agg(max("r"), count(lit(1))).collect()
    }

    println(f"""{"metric":"scale_pipeline","n_docs":$nDocs,"n_vecs":$nVecs,""" +
      f""""pii_sec":$tPii%.3f,"pii_docs_per_sec":${nDocs / tPii}%.0f,""" +
      f""""budget_sec":$tBudget%.3f,"budget_docs_per_sec":${nDocs / tBudget}%.0f,""" +
      f""""whiten_sec":$tWhiten%.3f,"whiten_vecs_per_sec":${nVecs / tWhiten}%.0f,""" +
      f""""mmr_sec":$tMmr%.3f,"mmr_vecs_per_sec":${nVecs / tMmr}%.0f,""" +
      f""""span_sec":$tSpan%.3f,"span_grams_per_sec":${nDocs * 43 / tSpan}%.0f,""" +
      f""""batch_sec":$tBatch%.3f,"batch_docs_per_sec":${nDocs / tBatch}%.0f,""" +
      f""""brn_sec":$tBrn%.3f,"plain_rn_sec":$tPlainRn%.3f,"brn_rows":${5L * nDocs}}""")
    spark.stop()
  }
}
