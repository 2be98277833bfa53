package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale evidence for the round-9 growth/decomposition/Simpson
  * operators (SURVEY §6): synthesize a large event log, then measure
  * the ev_growth_accounting, ts_decompose and ev_simpson plan shapes
  * end-to-end. All three collapse the fact stream in ONE scan (a
  * distinct + per-user lag for growth, a |days| rollup for the
  * decomposition, a |types| stratum agg for Simpson); every
  * subsequent join/window runs on rollup frames of at most |weeks| ×
  * |users-active| rows — so throughput here extrapolates with
  * cluster width.
  *
  * runMain graft.ScaleGrowthOps [nEvents]
  */
object ScaleGrowthOps {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 40000000L
    val users = 100000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-scalegrow").toString

    // ~10 weeks of nanos-timestamped events over 100k users, with a
    // value column for the Simpson success predicate
    spark.range(n).select(
        col("id").as("event_id"),
        pmod(col("id") * 2654435761L, lit(users)).as("user_id"),
        (pmod(col("id") * 40503L, lit(6048000L)) * 1000000000L
          + pmod(col("id"), lit(999983L))).as("ts"),
        element_at(array(lit("click"), lit("view"), lit("purchase"),
            lit("signup"), lit("error")),
          (pmod(col("id") * 97L, lit(5L)) + 1).cast("int")).as("event_type"),
        (pmod(col("id") * 7919L, lit(10000L)) / 100.0).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events")
    val ev = spark.read.parquet(s"$dir/events")
    ev.count() // warm page cache

    // min over in-JVM repeats: single cold passes measured up to 3×
    // run-to-run noise (JIT + shuffle-file cache), which swamps the
    // doubling factor this probe exists to report
    var out = Map.empty[String, Double]
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      out += what -> math.min(out.getOrElse(what, Double.MaxValue), sec)
      println(f"[scalegrow] $what: $sec%.2f s (result=$r)")
    }

    for (_ <- 1 to 2) {
      // ev_growth_accounting shape: DISTINCT (user, week) then ONE
      // per-user lag; churn math on the |weeks| rollup self-join
      time("growth") {
        val wkAct = ev
          .select(col("user_id"), expr("ts DIV 86400000000000 DIV 7").as("wk"))
          .distinct()
        val wU = Window.partitionBy("user_id").orderBy("wk")
        val classified = wkAct
          .withColumn("pw", lag("wk", 1).over(wU))
          .groupBy("wk").agg(
            count(lit(1)).as("n_active"),
            sum(when(col("pw").isNull, 1L).otherwise(0L)).as("n_new"),
            sum(when(col("pw") === col("wk") - 1, 1L).otherwise(0L))
              .as("n_retained"))
          .localCheckpoint(eager = false)
        val prev = classified
          .select((col("wk") + 1).as("wk"), col("n_active").as("prev_active"))
        classified.join(prev, Seq("wk"), "left").count()
      }

      // ts_decompose shape: |days| rollup in one scan; MA window,
      // seasonal agg and broadcast join-back all on that tiny frame
      time("decompose") {
        val daily = ev
          .select(expr("ts DIV 86400000000000").as("day"))
          .groupBy("day").agg(count(lit(1)).cast("double").as("y"))
        val wT = Window.orderBy("day").rangeBetween(-3, 3)
        val trended = daily
          .withColumn("n_win", count(lit(1)).over(wT))
          .withColumn("trend", round(avg("y").over(wT), 6))
          .filter(col("n_win") === 7)
          .withColumn("dow", col("day") % 7)
          .withColumn("det_l",
            round((col("y") - col("trend")) * 1e6, 0).cast("long"))
          .localCheckpoint(eager = false)
        val seas = trended.groupBy("dow").agg(
          round(sum("det_l").cast("double") / count(lit(1)) / 1e6, 6)
            .as("s_raw"))
        trended.join(broadcast(seas), "dow").count()
      }

      // ev_simpson shape: ONE grouped pass to the |types| stratum
      // frame; pooled + stratified summaries are rollups of it
      time("simpson") {
        val strata = ev
          .select(col("event_type"),
            when(col("user_id") % 2 === 0, 1).otherwise(0).as("grp_a"),
            when(col("value") > 50.0, 1L).otherwise(0L).as("succ"))
          .groupBy("event_type").agg(
            sum(when(col("grp_a") === 1, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("grp_a") === 1, col("succ")).otherwise(0L)).as("s_a"),
            sum(when(col("grp_a") === 0, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("grp_a") === 0, col("succ")).otherwise(0L)).as("s_b"))
          .localCheckpoint(eager = false)
        val pooled = strata.agg(sum("n_a").as("n_a"), sum("s_a").as("s_a"))
        strata.select(col("event_type"), col("n_a")).count() +
          pooled.count()
      }
    }

    println(f"""{"metric":"scale_growth_ops","n_events":$n,""" +
      out.toSeq.sortBy(_._1).map { case (k, v) => f""""${k}_sec":$v%.2f""" }
        .mkString(",") + "}")
    spark.stop()
  }
}
