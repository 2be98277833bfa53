package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$k: exact=$n approx=$a")
    }
  }

  test("text operators survive edge-case inputs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "héllo wörld ünïcode"),
      (4L, "日本語のテキストです"), (5L, "a"), (6L, "x\ty\nz"))
      .toDF("doc_id", "text")
    val tok = graft.text.TextAnalytics.tokenCounts(docs).collect()
    assert(tok.length == 6)
    tok.foreach(r => assert(r.getAs[Long]("n_ws") >= 0))
    val q = graft.text.TextAnalytics.qualityScores(docs).collect()
    q.foreach { r =>
      val score = r.getAs[Double]("quality")
      assert(!score.isNaN && score >= 0.0 && score <= 1.0, s"quality=$score")
    }
    val lid = graft.text.TextAnalytics.languageId(docs).collect()
    assert(lid.length == 6)
    // embedder parity holds on unicode too
    val emb = graft.embed.HashEmbedder.embedDocs(docs.filter(col("doc_id") === 3),
      "doc_id", "text", 64).head().getSeq[Double](1)
    val local = graft.embed.HashEmbedder.embedText("héllo wörld ünïcode", 64)
    emb.zip(local).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("semi/anti counts partition the customer table") {
    val r = SparkEntry.queries("q_semi_anti")(spark, sfDir).head()
    val total = Tables.customer(spark, sfDir).count()
    assert(r.getAs[Long]("n_with") + r.getAs[Long]("n_without") == total)
  }
}
