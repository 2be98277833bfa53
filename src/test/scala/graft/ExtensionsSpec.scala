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

  test("extension-injected heavy_hitters and approx_quantiles work from pure SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ColumnBridge.installFunctions(ext, spark)
    Tables.events(spark, sfDir).createOrReplaceTempView("ev_ext")

    // m = 8 exceeds the 5-type domain → the sketch is exact, err = 0
    val viaSketch = spark.sql(
      """SELECT inline(heavy_hitters(event_type, 8)) FROM ev_ext""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = spark.sql(
      """SELECT event_type, count(*) AS c FROM ev_ext
        |GROUP BY event_type ORDER BY c DESC, event_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), 0L))
    assert(viaSketch.toSeq == exact.toSeq)

    // k = 4096 exceeds the bounded subset → exact median under the
    // quantile_disc rank rule (r-th smallest, r = max(ceil(p·n), 1))
    val med = spark.sql(
      """SELECT element_at(approx_quantiles(value, 4096, 0.5), 1)
        |FROM ev_ext WHERE user_id < 10""".stripMargin).head().getDouble(0)
    val vals = spark.sql("SELECT value FROM ev_ext WHERE user_id < 10")
      .collect().map(_.getDouble(0)).sorted
    assert(med == vals(math.ceil(0.5 * vals.length).toInt - 1))
  }

  test("extension-injected asof_join / range_join / minhash_sigs TVFs match the Column API") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ColumnBridge.installFunctions(ext, spark)
    val ev = Tables.events(spark, sfDir).filter(col("user_id") < 20)
    ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id").createOrReplaceTempView("tvf_l")
    ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("rv"))
      .createOrReplaceTempView("tvf_r")

    val viaSql = spark.sql(
      """SELECT user_id, event_id, asof.rv AS rv
        |FROM asof_join('tvf_l', 'tvf_r', 'user_id', 'ts', 'ts')""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    val viaApi = graft.ops.Joins.asofJoin(
        spark.table("tvf_l"), spark.table("tvf_r"), Seq("user_id"), "ts", "ts")
      .select(col("user_id"), col("event_id"), col("asof.rv").as("rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)

    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("ts") - 3600000000000L).as("st"),
              col("ts").as("en"), col("event_id").as("iid"))
      .createOrReplaceTempView("tvf_iv")
    val rjSql = spark.sql(
      """SELECT user_id, event_id, iid
        |FROM range_join('tvf_l', 'tvf_iv', 'user_id', 'ts', 'st', 'en',
        |                600000000000)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rjApi = graft.ops.Joins.rangeJoinBucketed(
        spark.table("tvf_l"), spark.table("tvf_iv"),
        Seq("user_id"), "ts", "st", "en", 600000000000L)
      .select("user_id", "event_id", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rjSql == rjApi && rjSql.nonEmpty)

    Tables.documents(spark, sfDir).filter(col("doc_id") < 50)
      .createOrReplaceTempView("tvf_docs")
    val mhSql = spark.sql(
      "SELECT * FROM minhash_sigs('tvf_docs', 'doc_id', 'text', 5, 8)")
      .collect().map(_.toSeq).toSet
    val mhApi = graft.dedup.Dedup.minhashSignatures(
        spark.table("tvf_docs"), 5, 8)
      .collect().map(_.toSeq).toSet
    assert(mhSql == mhApi && mhSql.size == 50)
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
