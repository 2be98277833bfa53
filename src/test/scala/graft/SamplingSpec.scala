package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
  private def emb = Tables.embeddings(spark, sfDir)

  test("hash split is stable under repartitioning and covers all rows") {
    val a = Sampling.hashSplit(docs, "doc_id", 80, 10)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs.repartition(17), "doc_id", 80, 10)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.size == docs.count())
    // proportions roughly honored
    val train = a.values.count(_ == "train").toDouble / a.size
    assert(train > 0.7 && train < 0.9, s"train frac $train")
  }

  test("per-group bottom-k equals the window formulation and is layout-stable") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.md5Long
    val got = Sampling.bottomKPerGroup(docs, "source", "doc_id", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // reference: row_number over the same hash (fine at test scale,
    // the skew-window shape the aggregate formulation avoids)
    val h = md5Long(concat(lit("gs:"), col("doc_id").cast("string"))) % 1000000000L
    val w = Window.partitionBy("source").orderBy("h", "doc_id")
    val ref = docs.select(col("source"), col("doc_id"), h.as("h"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
    // every group contributes exactly min(k, |group|) rows
    val sizes = Sampling.bottomKPerGroup(docs, "source", "doc_id", 3)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ == 3))
    // physical layout does not change the winners
    val re = Sampling.bottomKPerGroup(docs.repartition(17), "source", "doc_id", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == got)
  }

  test("token-budget selection takes best-scored docs first, overflow on last") {
    val sp = spark; import sp.implicits._
    val d = Seq(
      (1L, 40L, 0.9), (2L, 40L, 0.8), (3L, 40L, 0.7), (4L, 40L, 0.7),
      (5L, 40L, 0.1)).toDF("doc_id", "n_tok", "score")
    // budget 100: doc1 (cum 40), doc2 (cum 80), doc3 starts at 80 < 100
    // -> kept (cum 120, overflows), doc4 starts at 120 -> dropped
    val kept = graft.ops.Packing
      .selectByTokenBudget(d, "doc_id", "n_tok", "score", 100L)
      .orderBy("cum_tok").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(kept.last.getLong(3) == 120L)
    // invariant under physical layout
    val kept2 = graft.ops.Packing
      .selectByTokenBudget(d.repartition(7), "doc_id", "n_tok", "score", 100L)
      .orderBy("cum_tok").collect().map(_.getLong(0)).toSeq
    assert(kept2 == Seq(1L, 2L, 3L))
    // budget 50: doc2 starts at 40 < 50 -> kept (overflows), doc3
    // starts at 80 -> dropped
    assert(graft.ops.Packing.selectByTokenBudget(d, "doc_id", "n_tok", "score", 50L)
      .orderBy("cum_tok").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("bucketed batching is invariant to block size and physical layout") {
    val sp = spark; import sp.implicits._
    // length-concentrated corpus: 40 of 50 docs share ONE exact token
    // count — the shape that would funnel a (bucket, tok) row_number
    // into a single partition without the id-block level
    val rows = (0L until 50L).map { i =>
      val tok = if (i < 40) 17L else 3L + (i % 7)
      (i, tok)
    }
    val d = rows.toDF("doc_id", "n_tok")
    def run(blockSize: Long, part: Int) = graft.ops.Packing
      .bucketedBatches(d.repartition(part), "doc_id", "n_tok",
        bucketWidth = 8L, nBuckets = 4, batchSize = 8, blockSize = blockSize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val single = run(1L << 20, 3) // one block: the pre-split reference
    assert(run(4L, 3) == single)  // 13 blocks over the hot token count
    assert(run(4L, 11) == single) // and invariant under layout
    assert(run(1L, 5) == single)  // degenerate 1-row blocks
  }

  test("boundedRowNumber equals a plain per-key row_number at any block size") {
    val sp = spark; import sp.implicits._
    // hot key: 45 of 60 rows share one key
    val rows = (0L until 60L).map(i => (if (i < 45) "hot" else s"k${i % 5}", i))
    val d = rows.toDF("k", "id")
    val expected = d.withColumn("r",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("id")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    for (bs <- Seq(1L, 4L, 1L << 20); parts <- Seq(3, 11)) {
      val got = graft.ops.Packing
        .boundedRowNumber(d.repartition(parts), Seq("k"), "id", bs, "r")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected, s"blockSize=$bs parts=$parts")
    }
  }

  test("temperature rebalance keeps the smallest source fully, squashes large ones") {
    val out = Sampling.temperatureRebalance(docs, "lang", "doc_id")
      .groupBy("lang").agg(max("n_orig").as("n_orig"),
        max("thr").as("thr"), count(lit(1)).as("n_kept"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val minLang = out.minBy(_._2._1)._1
    assert(out(minLang)._2 == 1000000L) // keep-all threshold
    // kept/orig ratio decreases as source size grows (alpha < 1)
    val bySize = out.values.toSeq.sortBy(_._1)
    bySize.sliding(2).foreach { case Seq((n1, t1, _), (n2, t2, _)) =>
      assert(t1 >= t2, s"thresholds must fall with size: $out")
    }
    // kept counts land near n_orig * thr / 1e6 (hash uniformity)
    out.values.foreach { case (n, t, k) =>
      val exp = n * t / 1000000.0
      assert(math.abs(k - exp) <= math.max(10.0, 0.35 * exp), s"$out")
    }
  }

  test("token dropout is deterministic and drops ~1/10") {
    val sp = spark; import sp.implicits._
    val doc = Seq((7L, (1 to 200).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r1 = graft.text.TextAnalytics.tokenDropout(doc, 10).collect().head
    val r2 = graft.text.TextAnalytics.tokenDropout(doc.repartition(5), 10)
      .collect().head
    assert(r1.getLong(1) == 200L)
    assert(r1.getLong(2) == r2.getLong(2) && r1.getLong(3) == r2.getLong(3))
    val kept = r1.getLong(2)
    assert(kept > 150 && kept < 200, s"kept $kept of 200")
  }

  test("stratified sample caps every group and is deterministic") {
    val s1 = Sampling.stratified(emb, "label", "vec_id", 20)
    val byLabel = s1.groupBy("label").agg(count(lit(1)).as("n")).collect()
    byLabel.foreach(r => assert(r.getAs[Long]("n") <= 20))
    val ids1 = s1.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.stratified(emb.repartition(13), "label", "vec_id", 20)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }
}
