package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dirty-input robustness for the DECLARED query surface: every
  * documents-only entry in `SparkEntry.queries` must execute (not
  * necessarily return rows) against (a) a corpus of degenerate docs —
  * null/empty/whitespace/unicode/1-char text, zero n_chars — and (b)
  * an EMPTY corpus. These are the rows a real 100 TB crawl always
  * contains; an operator that throws on them fails the whole job at
  * scale. Complements RobustnessSpec, which pins individual library
  * functions; this spec drives the end-user entry points.
  */
class RobustnessSurfaceSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-robust").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) =>
        org.apache.spark.sql.Row(i, t, if (i % 2 == 0) "en" else "de", "crawl",
          if (t == null) 0L else t.length.toLong)
      }, 2), docSchema)
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val dirtyDir = writeDocs(Seq(
    (0L, "hello world hello again and again hello"),
    (1L, null),
    (2L, ""),
    (3L, "   "),
    (4L, "héllo wörld 你好 мир"),
    (5L, "a"),
    (6L, "the quick brown fox jumps over the lazy dog"),
    (7L, "\n\t\r"),
    (8L, "solo")))
  private lazy val emptyDir = writeDocs(Seq.empty)

  // every SparkEntry query that reads ONLY the documents table
  // (vs_list_collections excluded: it materializes a collection store,
  // covered by StorageSpec/VectorStoreSpec)
  private val docQueries = Seq(
    "dedup_exact", "dedup_incremental",
    "text_token_count", "text_quality", "text_langid", "text_normalize",
    "text_repetition", "text_decontam", "text_fingerprint",
    "text_search_e2e", "text_hybrid_rrf",
    "pipe_e2e_prep", "pipe_pack_sequences",
    "samp_hash_split", "samp_domain_mix", "samp_bottomk", "samp_weighted",
    "text_chunking", "text_bm25", "text_vocab", "text_pmi",
    "text_chunk_search", "text_lm_score", "text_bigram_freq",
    "text_length_stats",
    "emb_norm_invariant",
    "mm_binary_meta", "mm_frame_sample", "mm_resize_box", "mm_audio_windows")

  test("documents-only queries execute on a degenerate corpus") {
    val failures = docQueries.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dirtyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("documents-only queries execute on an EMPTY corpus") {
    val failures = docQueries.flatMap { name =>
      try { SparkEntry.queries(name)(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("BM25 tolerates empty corpus and absent terms") {
    import graft.text.Bm25
    val docs = Tables.documents(spark, dirtyDir)
    assert(Bm25.search(docs, Seq("zzz_not_present"), 5).collect().isEmpty)
    val empty = Tables.documents(spark, emptyDir)
    assert(Bm25.search(empty, Seq("hello"), 5).collect().isEmpty)
  }

  test("decontamination tolerates an empty benchmark set") {
    import graft.text.TextAnalytics
    val docs = Tables.documents(spark, dirtyDir)
    val emptyBench = Tables.documents(spark, emptyDir)
    val out = TextAnalytics.contamination(docs, emptyBench, 3).collect()
    assert(out.forall(_.getAs[Long]("n_hit") == 0L))
  }

  test("as-of and range joins tolerate empty sides") {
    import graft.ops.Joins
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "ts", "v")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "rts", "px")
    val emptyL = left.limit(0)
    val emptyR = right.limit(0)
    // empty right: every left row survives with a null asof struct
    val la = Joins.asofJoin(left, emptyR, Seq("k"), "ts", "rts").collect()
    assert(la.length == 2 && la.forall(_.isNullAt(la.head.fieldIndex("asof"))))
    assert(Joins.asofJoin(emptyL, right, Seq("k"), "ts", "rts").collect().isEmpty)
    val pts = Seq((1L, 7L)).toDF("k", "ts")
    val ivs = Seq((1L, 5L, 9L)).toDF("k", "st", "en")
    assert(Joins.rangeJoinBucketed(pts.limit(0), ivs, Seq("k"), "ts", "st", "en", 4L)
      .collect().isEmpty)
    assert(Joins.rangeJoinBucketed(pts, ivs.limit(0), Seq("k"), "ts", "st", "en", 4L)
      .collect().isEmpty)
  }

  test("PQ handles fewer vectors than centroids and rejects bad configs") {
    import graft.ann.Pq
    val s = spark
    import s.implicits._
    // dim not divisible by m is a CONTRACT violation -> fail fast
    intercept[IllegalArgumentException] { Pq.Config(dim = 6, m = 4, k = 4) }
    val cfg = Pq.Config(dim = 4, m = 2, k = 4, iters = 1)
    // 2 vectors < k=4 centroids: train/encode/search must still run
    val emb = Seq(
      (1L, Array(1.0, 0.0, 0.0, 1.0)),
      (2L, Array(0.0, 1.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val cb = Pq.train(emb, cfg)
    assert(cb.count() > 0)
    val enc = Pq.encode(emb, cb, cfg)
    assert(enc.count() == 2)
    val qdf = Seq(Tuple1(Array(1.0, 0.0, 0.0, 1.0))).toDF("q")
    val res = Pq.search(emb, enc, cb, qdf, cfg, 2, 1)
    assert(res.collect().length == 1)
  }
}
