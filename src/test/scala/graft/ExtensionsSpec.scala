package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions installs without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("capped ngram jaccard matches uncapped when no shingle is hot") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 40)
    val total = docs.count().toInt
    val capped = graft.dedup.Dedup.ngramJaccardCapped(docs, 5, 0.25, maxDf = total)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = graft.dedup.Dedup.ngramJaccard(docs, 5, 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == plain)
  }

  test("capped ngram jaccard drops hot-shingle fan-out") {
    val s = spark
    import s.implicits._
    // 'aaaaa' appears in every doc (a stop-shingle); distinct tails
    // (letter suffixes — numeric ones overlap: "tail1" ⊂ "tail10")
    val docs = (0L until 20L).map { i =>
      val c = ('a' + i).toChar
      (i, s"aaaaaa tail$c$c uniq$c$c")
    }.toDF("doc_id", "text")
    val res = graft.dedup.Dedup.ngramJaccardCapped(docs, 5, 0.01, maxDf = 5)
    // with the universal shingle dropped, the docs share nothing
    assert(res.count() == 0)
  }
}
