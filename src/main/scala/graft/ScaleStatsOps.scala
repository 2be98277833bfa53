package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale evidence for the round-9 statistics/experimentation operators
  * (SURVEY §6): synthesize a large event log, then measure the
  * ev_survival, ev_ab_test + ev_lift_gain, ts_cusum + ts_backtest and
  * ev_stationary plan shapes end-to-end. Every shape must collapse
  * the fact stream in one or two scans and do all subsequent work on
  * per-user or per-day rollups — no window or join ever touches raw
  * events except the single lead() pass in the stationary transition
  * count — so throughput here extrapolates with cluster width.
  *
  * runMain graft.ScaleStatsOps [nEvents]
  */
object ScaleStatsOps {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 40000000L
    val users = 100000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.md5Long
    val dir = java.nio.file.Files.createTempDirectory("graft-scalestat").toString

    // ~30 days of nanos-timestamped events over 100k users
    spark.range(n).select(
        col("id").as("event_id"),
        pmod(col("id") * 2654435761L, lit(users)).as("user_id"),
        (pmod(col("id") * 40503L, lit(2592000L)) * 1000000000L
          + pmod(col("id"), lit(999983L))).as("ts"),
        element_at(array(lit("click"), lit("view"), lit("purchase"),
            lit("signup"), lit("error")),
          (pmod(col("id") * 97L, lit(5L)) + 1).cast("int")).as("event_type"))
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
      println(f"[scalestat] $what: $sec%.2f s (result=$r)")
    }

    for (rep <- 1 to 2) {
      // ev_survival shape: two filtered per-user aggs, one user-keyed
      // join, then KM windows on the |days|-row life table
      time("survival") {
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("su"))
          .localCheckpoint(eager = false)
        val pu = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts").join(su, "user_id")
          .filter(col("ts") >= col("su"))
          .groupBy("user_id").agg(min("ts").as("pu"))
        val end = ev.agg(max("ts").as("te"))
        val life = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(end))
          .select(expr("(coalesce(pu, te) - su) div 86400000000000").as("day"),
                  when(col("pu").isNotNull, 1L).otherwise(0L).as("e"))
          .groupBy("day")
          .agg(sum("e").as("d"), sum(lit(1L) - col("e")).as("c"))
        val wRisk = Window.orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        life.withColumn("n_risk", sum(col("d") + col("c")).over(wRisk)).count()
      }

      // ev_ab_test + ev_lift_gain shape: ONE per-user agg feeding both
      // the 2-row arm rollup and the broadcast-cutoff decile table
      time("ab_lift") {
        val u = ev.groupBy("user_id")
          .agg(count(lit(1)).as("nn"),
            (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              >= 14).cast("long").as("conv"))
          .withColumn("arm",
            md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .localCheckpoint(eager = false)
        val arms = u.agg(
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x_t")).count()
        val cuts = u.agg(expr(
          "transform(percentile(nn, array(0.1D,0.3D,0.5D,0.7D,0.9D)), x -> round(x, 6))")
          .as("bs"))
        u.crossJoin(broadcast(cuts))
          .withColumn("decile", expr(
            "aggregate(bs, 0, (acc, b) -> acc + CASE WHEN nn > b THEN 1 ELSE 0 END)"))
          .groupBy("decile").agg(sum("conv")).count() + arms
      }

      // ts_cusum + ts_backtest shape: one stream collapse, then every
      // window on the checkpointed |types|×|days| daily frame
      time("cusum_backtest") {
        val daily = ev
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false)
        val mu = daily.groupBy("event_type")
          .agg(round(avg("cnt"), 6).as("mu"))
        val wc = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val c = daily.join(broadcast(mu), "event_type")
          .withColumn("cusum", sum(col("cnt") - col("mu")).over(wc)).count()
        val wF = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        daily.withColumn("f", round(avg("cnt").over(wF), 6)).count() + c
      }

      // ev_stationary shape: one lead() pass collapses the stream to
      // |types|² cells; 12 broadcast-vector iterations are O(1)
      time("stationary") {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val pairs = ev
          .withColumn("to_type", lead("event_type", 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = pairs.groupBy("from_type").agg(sum("n").as("tt"))
        val cells = pairs.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"),
                  round(col("n") / col("tt"), 6).as("p"))
          .localCheckpoint(eager = false)
        val states = cells.select("from_type").distinct()
        var v = states.crossJoin(broadcast(states.agg(count(lit(1)).as("k"))))
          .select(col("from_type").as("state"), round(lit(1.0) / col("k"), 7).as("v"))
        for (_ <- 1 to 12)
          v = cells.join(broadcast(v), cells("from_type") === v("state"))
            .groupBy("to_type")
            .agg(round(sum(col("p") * col("v")), 7).as("v"))
            .withColumnRenamed("to_type", "state")
        v.count()
      }

    }

    println(f"""{"metric":"scale_stats_ops","n_events":$n,""" +
      out.toSeq.sortBy(_._1).map { case (k, v) => f""""${k}_sec":$v%.2f""" }
        .mkString(",") + "}")
    spark.stop()
  }
}
