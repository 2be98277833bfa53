package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ranking

class RankingSpec extends SparkSpec {

  test("withGlobalRank equals row_number over the same total order") {
    val cust = Tables.customer(spark, sfDir).select("c_acctbal", "c_custkey")
    val viaRdd = Ranking
      .withGlobalRank(cust, "rank", col("c_acctbal").desc, col("c_custkey"))
      .select(col("c_custkey"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaWindow = cust
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("c_acctbal").desc, col("c_custkey"))).cast("long"))
      .select(col("c_custkey"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaRdd == viaWindow)
  }

  test("ntileFromRank equals SQL ntile for every remainder class") {
    val s = spark
    import s.implicits._
    // n = 9..12 covers n % 4 = 1, 2, 3, 0
    for (n <- 9L to 12L) {
      val df = spark.range(1, n + 1).toDF("rank")
      val mine = df.select(col("rank"), Ranking.ntileFromRank("rank", n, 4).as("q"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val ref = df.select(col("rank"),
          ntile(4).over(Window.orderBy("rank")).cast("long").as("q"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(mine == ref, s"n=$n")
    }
    // degenerate n < k: every row its own bucket, no division by zero
    val tiny = spark.range(1, 3).toDF("rank")
      .select(Ranking.ntileFromRank("rank", 2, 4).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(tiny == Seq(1L, 2L))
  }
}
