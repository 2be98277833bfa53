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

  test("semi/anti counts partition the customer table") {
    val r = SparkEntry.queries("q_semi_anti")(spark, sfDir).head()
    val total = Tables.customer(spark, sfDir).count()
    assert(r.getAs[Long]("n_with") + r.getAs[Long]("n_without") == total)
  }
}
