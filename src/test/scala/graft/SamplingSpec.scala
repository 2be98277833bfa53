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
