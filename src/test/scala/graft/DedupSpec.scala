package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  test("exact dedup groups identical texts") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val res = Dedup.exact(docs).collect()
    assert(res.length == 2)
    val dup = res.find(_.getAs[Long]("n_dups") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("identical docs have identical minhash signatures and jaccard 1") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "spark scale vector engine test"),
                   (2L, "spark scale vector engine test"),
                   (3L, "completely different content here")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, 5, 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)).toSeq).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    val j = Dedup.ngramJaccard(docs, 5, 0.5).collect()
    assert(j.exists(r => r.getAs[Long]("da") == 1L && r.getAs[Long]("db") == 2L &&
      r.getAs[Double]("jaccard") == 1.0))
  }

  test("lsh pairs contain the identical pair") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "spark scale vector engine test"),
                   (2L, "spark scale vector engine test"),
                   (3L, "completely different content here")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(Dedup.minhashSignatures(docs, 5, 8), 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("simhash distance 0 for identical docs") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"),
                   (2L, "alpha beta gamma delta"),
                   (3L, "zz yy xx ww vv uu tt")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, 0).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getAs[Long]("dist") == 0L))
  }

  test("token w-shingles and token minhash behave like the char variant") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"),
                   (2L, "alpha beta gamma delta"),
                   (3L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val sh = graft.text.TextPrimitives.tokenShingles(docs, "doc_id", "text", 2)
      .filter(col("doc_id") === 1).collect().map(_.getString(1)).toSet
    assert(sh == Set("alpha beta", "beta gamma", "gamma delta"))
    val sig = Dedup.minhashSignaturesTokens(docs, 2, 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("connected components resolve transitive duplicate chains") {
    val s = spark
    import s.implicits._
    val docs = (1L to 7L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("da", "db")
    val cc = Dedup.connectedComponents(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
                     5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("LSH embedding near-dup: finds all planted duplicates, no false positives") {
    val base = Tables.embeddings(spark, sfDir).limit(200)
    // plant exact duplicates with shifted ids
    val dups = base.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 10000)
    val corpus = base.unionByName(dups.select(base.columns.map(col): _*))
    val found = Dedup.embeddingNearDupLsh(corpus, 0.999, nPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair surfaces (identical vectors share their bucket)
    (0L until 20L).foreach(i => assert(found.contains((i, i + 10000)), s"missing $i"))
    // precision 1.0: the exact rescoring admits nothing below threshold
    val scores = Dedup.embeddingNearDupLsh(corpus, 0.999, 8, 64)
      .collect().map(_.getAs[Double]("score"))
    assert(scores.forall(_ >= 0.999))
  }

  test("incremental LSH pairs equal the cross-subset of full-corpus pairs") {
    val all = Tables.documents(spark, sfDir).filter(col("doc_id") < 250)
    val full = Dedup.minhashLshPairs(Dedup.minhashSignatures(all, 5, 8), 8, 2)
      .filter(col("da") < 150 && col("db") >= 150)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = Dedup.minhashLshPairsIncremental(
      Dedup.minhashSignatures(all.filter(col("doc_id") < 150), 5, 8),
      Dedup.minhashSignatures(all.filter(col("doc_id") >= 150), 5, 8), 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full)
    assert(inc.nonEmpty) // testdata plants near-dups across the split
  }

  test("map-side minhash signature is bit-equal to the shuffle formulation") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
    val a = Dedup.minhashSignatures(docs, 5, 8).collect().map(_.toSeq)
    val b = Dedup.minhashSignaturesMapSide(docs, 5, 8)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("blocked levenshtein pairs equal the quadratic formulation") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 120)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // q=1 gram path active (prefix 40 > q*t+q-1 = 25)
    assert(asSet(Dedup.levenshteinPairs(docs, 40, 25, q = 1)) ==
           asSet(Dedup.levenshteinPairsQuadratic(docs, 40, 25)))
    // tight threshold, q=2 gram path with real pruning
    assert(asSet(Dedup.levenshteinPairs(docs, 40, 15, q = 2)) ==
           asSet(Dedup.levenshteinPairsQuadratic(docs, 40, 15)))
    // q=2 at t=25: every doc is below the vacuity bound → broadcast
    // short-path fallback must still reproduce the exact answer
    assert(asSet(Dedup.levenshteinPairs(docs, 40, 25, q = 2)) ==
           asSet(Dedup.levenshteinPairsQuadratic(docs, 40, 25)))
  }

  test("banded simhash pairs equal the quadratic formulation") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 150)
    val banded = Dedup.simhashPairs(docs, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val quad = Dedup.simhashPairsQuadratic(docs, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == quad)
    assert(banded.nonEmpty)
  }

  test("prefix-filtered Jaccard join equals brute force (exact recall)") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 150)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pf = asSet(Dedup.prefixFilterJaccard(docs, 0.6))
    val bf = asSet(Dedup.tokenJaccardQuadratic(docs, 0.6))
    assert(pf == bf)
    assert(pf.nonEmpty)
    // a tighter threshold shrinks both prefix length and output,
    // still losslessly
    assert(asSet(Dedup.prefixFilterJaccard(docs, 0.8)) ==
           asSet(Dedup.tokenJaccardQuadratic(docs, 0.8)))
  }

  test("embedding near-dup finds self-similar clusters") {
    val res = Dedup.embeddingNearDup(Tables.embeddings(spark, sfDir), 0.4)
    assert(res.count() > 0)
    assert(res.filter(col("score") < 0.4).count() == 0)
  }

  test("adversarial identical-doc corpus: over-cap buckets are skipped and reported") {
    val s = spark
    import s.implicits._
    // 60 IDENTICAL docs (every band collides in one bucket) plus a
    // small honest near-dup pair — the degenerate corpus that used
    // to put an unbounded member list on one task and emit N² pairs
    val docs = ((0L until 60L).map(i => (i, "the same boilerplate text body"))
      ++ Seq((100L, "unique alpha beta gamma delta text"),
             (101L, "unique alpha beta gamma delta texts"))).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, 5, 8)
    val capped = Dedup.minhashLshPairs(sig, 8, 2, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the boilerplate bucket (60 > cap) emits NOTHING; the honest
    // pair survives — bounded output, no N² blow-up
    assert(!capped.exists { case (a, b) => a < 60 && b < 60 }, capped.take(5))
    assert(capped.contains((100L, 101L)))
    // ...and the overflow audit reports the skipped bucket with size
    val over = Dedup.lshOverflow(sig, 8, 2, maxBucket = 10).collect()
    assert(over.nonEmpty && over.forall(_.getAs[Long]("n_docs") == 60L),
      over.mkString(","))
    // with the cap above the corpus size the same call is uncapped
    val uncapped = Dedup.minhashLshPairs(sig, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.exists { case (a, b) => a < 60 && b < 60 })
    assert(Dedup.lshOverflow(sig, 8, 2).collect().isEmpty)
  }

  test("adversarial incremental LSH: hot buckets excluded on either side") {
    val s = spark
    import s.implicits._
    val corpus = ((0L until 40L).map(i => (i, "the same boilerplate text body"))
      :+ (90L, "unique alpha beta gamma delta text")).toDF("doc_id", "text")
    val batch = ((200L until 240L).map(i => (i, "the same boilerplate text body"))
      :+ (290L, "unique alpha beta gamma delta texts")).toDF("doc_id", "text")
    val inc = Dedup.minhashLshPairsIncremental(
      Dedup.minhashSignatures(corpus, 5, 8),
      Dedup.minhashSignatures(batch, 5, 8), 8, 2, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 40×40 boilerplate fan-out is gone; the honest cross pair stays
    assert(!inc.exists { case (a, b) => a < 40 && b >= 200 && b < 240 },
      inc.take(5))
    assert(inc.contains((90L, 290L)))
  }

  test("adversarial simhash corpus: capped buckets stay bounded, honest pairs survive") {
    val s = spark
    import s.implicits._
    val docs = ((0L until 50L).map(i => (i, "identical words all over again"))
      ++ Seq((100L, "some very different payload here"),
             (101L, "some very different payload here"))).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(docs, 2, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a < 50 && b < 50 })
    assert(capped.contains((100L, 101L)))
  }

  test("shared dupEdges: memoized per (session, dir), content ≡ fresh ngramJaccard") {
    // r17: fifteen queries read the canonical near-dup edge table via
    // QDsl.dupEdges instead of rebuilding the shingle join each —
    // pin (a) the memoization (same frame back on a second call) and
    // (b) that the shared frame's rows are EXACTLY a fresh build's
    val dir = "/root/testdata/sf0.001"
    val shared = QDsl.dupEdges(spark, dir)
    assert(QDsl.dupEdges(spark, dir) eq shared)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val fresh = Dedup.ngramJaccard(
      QDsl.docsUnder(spark, dir, 120), 5, 0.25)
    assert(rows(shared) == rows(fresh))
  }
}
