package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the temporal joins (SURVEY §6): synthesize a
  * large event log in /tmp, then measure asofJoin and
  * rangeJoinBucketed end-to-end. Both must stay equi-join/window
  * shaped — linear shuffles, no nested loops — so throughput here
  * extrapolates to cluster scale.
  *
  * runMain graft.ScaleJoins [nRows] [nUsers]
  */
object ScaleJoins {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val users = if (args.length > 1) args(1).toLong else 100000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-scalejoins").toString

    // deterministic synthetic log: ~n events over ~n seconds, 3 types
    spark.range(n).select(
        col("id").as("event_id"),
        pmod(col("id") * 2654435761L, lit(users)).as("user_id"),
        (col("id") * 1000000L + pmod(col("id") * 40503L, lit(999983L))).as("ts"),
        element_at(array(lit("click"), lit("view"), lit("purchase")),
          (pmod(col("id") * 97L, lit(3L)) + 1).cast("int")).as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events")
    val ev = spark.read.parquet(s"$dir/events")

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scalejoins] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
              (col("ts") - 600000000000L).as("st"), col("ts").as("en"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      .withColumnRenamed("ts", "bts")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"))

    time("asofJoin: views x clicks") {
      val matched = graft.ops.Joins.asofJoin(views, clicks, Seq("user_id"), "ts", "bts")
        .filter(col("asof.bts").isNotNull).count()
      println(s"[scalejoins] asof matched=$matched")
    }
    time(s"rangeJoinBucketed: clicks in 10-min pre-purchase windows") {
      val pairs = graft.ops.Joins.rangeJoinBucketed(
        ev.filter(col("event_type") === "click").select(col("user_id"), col("ts")),
        purchases, Seq("user_id"), "ts", "st", "en", 600000000000L).count()
      println(s"[scalejoins] range pairs=$pairs")
    }
    println(s"[scalejoins] rows=$n users=$users dir=$dir")
    spark.stop()
  }
}
