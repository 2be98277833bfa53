package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale evidence for the round-12 work (SURVEY §6):
  * - samp_matched_pairs' rank step uses Packing.boundedRowNumber, so
  *   pairing must stay ~linear when users double even though a plain
  *   per-(band, arm) row_number would funnel a quarter of all users
  *   through one window task — probed at 2M and 4M users;
  * - stat_conformal's order statistic reads the DISTINCT-cents
  *   histogram (values, never rows): doubling facts must not grow the
  *   window input — probed at 10M and 20M orders with the histogram
  *   row count printed alongside the time;
  * - pipe_padding_waste's global ranks come from the distributed
  *   range-sort + zipWithIndex (Ranking.withGlobalRank): doubling docs
  *   must stay ~linear with no single-partition stage — probed at 2M
  *   and 4M docs.
  *
  * runMain graft.ScaleRound12Ops [nUsers] [nOrders] [nDocs]
  */
object ScaleRound12Ops {
  def main(args: Array[String]): Unit = {
    val nUsers = if (args.length > 0) args(0).toLong else 2000000L
    val nOrders = if (args.length > 1) args(1).toLong else 10000000L
    val nDocs = if (args.length > 2) args(2).toLong else 2000000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scale12] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // --- matched-pairs rank via boundedRowNumber at N and 2N --------
    for (m <- Seq(1L, 2L)) {
      val n = nUsers * m
      val users = spark.range(n).select(col("id").as("user_id"),
        (col("id") % 4).as("band"), (col("id") % 2).as("arm"),
        (col("id") % 1000).cast("double").as("spend"))
      time(s"matched-pairs rank+join N=$n") {
        val r = graft.ops.Packing.boundedRowNumber(
          users, Seq("band", "arm"), "user_id", 1L << 20, "rn")
        val t = r.filter(col("arm") === 1).select(col("band"), col("rn"), col("spend").as("st"))
        val c = r.filter(col("arm") === 0).select(col("band"), col("rn"), col("spend").as("sc"))
        t.join(c, Seq("band", "rn")).groupBy("band")
          .agg(count(lit(1)), sum(col("st") - col("sc"))).collect()
      }
    }

    // --- conformal order statistic off the value histogram ----------
    for (m <- Seq(1L, 2L)) {
      val n = nOrders * m
      // cents domain bounded at 5e6 distinct values — the histogram,
      // not the fact count, is what the window walks
      val o = spark.range(n).select((col("id") % 5000000L).as("c"),
        (col("id") % 2).as("h"))
      time(s"conformal histogram quantile N=$n") {
        val calib = o.filter(col("h") === 0)
        val hist = calib.groupBy("c").agg(count(lit(1)).as("cnt"))
        val nh = hist.count()
        val w = org.apache.spark.sql.expressions.Window.orderBy("c")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val q = hist.withColumn("cum", sum("cnt").over(w))
          .filter(col("cum") >= lit((n / 2 * 9) / 10))
          .orderBy("c").limit(1).collect()
        println(s"[scale12]   histogram rows=$nh qhat=${q.headOption.map(_.getLong(0))}")
      }
    }

    // --- padding-waste global ranks via range-sort + zipWithIndex ---
    for (m <- Seq(1L, 2L)) {
      val n = nDocs * m
      val docs = spark.range(n).select(col("id").as("doc_id"),
        pmod(col("id") * 2654435761L, lit(2048L)).as("nt"))
      time(s"padding-waste dual global rank N=$n") {
        Seq(Seq(col("doc_id")), Seq(col("nt"), col("doc_id"))).foreach { ord =>
          graft.ops.Ranking.withGlobalRank(docs, "r", ord: _*)
            .withColumn("b", expr("(r - 1) DIV 8"))
            .groupBy("b").agg(sum("nt").as("st"), max("nt").as("mx"))
            .agg(count(lit(1)), sum("st"), sum("mx")).collect()
        }
      }
    }

    spark.stop()
  }
}
