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
