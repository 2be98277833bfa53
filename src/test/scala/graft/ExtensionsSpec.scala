package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions installs without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("extension-injected md5_long60 and topk work from pure SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ColumnBridge.installFunctions(ext, spark)
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("docs_ext")

    // md5_long60 == the conv(substring(md5)) formulation
    val diffs = spark.sql(
      """SELECT count(*) AS n FROM docs_ext
        |WHERE md5_long60(text) <>
        |      cast(conv(substring(md5(text), 1, 15), 16, 10) AS bigint)""".stripMargin)
      .head().getLong(0)
    assert(diffs == 0)

    // topk(score, id, k) == ORDER BY score DESC, id LIMIT k
    val viaAgg = spark.sql(
      """SELECT inline(topk(cast(doc_id AS double) % 97, doc_id, 5))
        |FROM docs_ext""".stripMargin)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val viaSort = spark.sql(
      """SELECT cast(doc_id AS double) % 97 AS score, doc_id FROM docs_ext
        |ORDER BY score DESC, doc_id LIMIT 5""".stripMargin)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(viaAgg == viaSort)

    // k must be a literal
    intercept[Exception] {
      spark.sql("SELECT topk(1.0, doc_id, doc_id) FROM docs_ext").collect()
    }
  }

  test("extension-injected bloom_filter_agg/might_contain prune from pure SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ColumnBridge.installFunctions(ext, spark)
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("ord_bf")
    spark.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("li_bf")
    val exact = spark.sql(
      """SELECT count(*) FROM li_bf WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM ord_bf WHERE o_totalprice > 400000)""".stripMargin)
      .head().getLong(0)
    val viaBloom = spark.sql(
      """SELECT count(*) FROM li_bf
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(o_orderkey), 10000L, 80000L)
        |   FROM ord_bf WHERE o_totalprice > 400000),
        |  xxhash64(l_orderkey))
        |  AND l_orderkey IN (SELECT o_orderkey FROM ord_bf WHERE o_totalprice > 400000)""".stripMargin)
      .head().getLong(0)
    // the bloom pre-filter must not lose any matching row
    assert(viaBloom == exact && exact > 0)
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
