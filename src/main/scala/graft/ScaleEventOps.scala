package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale evidence for the round-9 event operators (SURVEY §6):
  * synthesize a large event log, then measure the ev_scd2, ev_debounce
  * and ts_acf plan shapes end-to-end. All three must stay
  * one-fact-scan shaped — per-user windows or tiny-rollup equi-joins,
  * no self-join of the fact table — so throughput here extrapolates.
  * The docs half measures pipe_epoch_mix's broadcast-explode at 2M
  * docs.
  *
  * runMain graft.ScaleEventOps [nEvents] [nDocs]
  */
object ScaleEventOps {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 40000000L
    val nDocs = if (args.length > 1) args(1).toLong else 2000000L
    val users = 100000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleev").toString

    spark.range(n).select(
        col("id").as("event_id"),
        pmod(col("id") * 2654435761L, lit(users)).as("user_id"),
        (col("id") * 1000000L + pmod(col("id") * 40503L, lit(999983L))).as("ts"),
        element_at(array(lit("click"), lit("view"), lit("purchase")),
          (pmod(col("id") * 97L, lit(3L)) + 1).cast("int")).as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events")
    val ev = spark.read.parquet(s"$dir/events")
    ev.count() // warm page cache

    var out = Map.empty[String, Double]
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      out += what -> sec
      println(f"[scaleev] $what: $sec%.2f s (result=$r)")
    }

    // ev_scd2 shape: lag-filter-lead, two per-user windows, one scan
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    time("scd2") {
      ev.withColumn("pt", lag(col("event_type"), 1).over(w))
        .filter(col("pt").isNull || !(col("pt") <=> col("event_type")))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .count()
    }

    // ev_debounce shape: one per-(user,type) lag window
    time("debounce") {
      val wd = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      ev.withColumn("prev", lag(col("ts"), 1).over(wd))
        .filter(col("prev").isNull || col("ts") - col("prev") > lit(5000000000L))
        .count()
    }

    // ts_acf shape: hourly rollup once, lag alignment as equi-join
    time("acf") {
      val hourly = ev
        .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("h"))
        .agg(count(lit(1)).cast("double").as("c"))
        .localCheckpoint(eager = false)
      val a = hourly.withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
      val b = hourly.select(col("event_type").as("et2"),
        col("h").as("hb"), col("c").as("cb"))
      a.join(b, col("event_type") === col("et2") &&
          col("hb") === col("h") + col("k"))
        .groupBy("event_type", "k")
        .agg(corr("c", "cb").as("acf"))
        .count()
    }

    // pipe_epoch_mix shape at nDocs: broadcast factors + explode
    spark.range(nDocs).select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id") * 37L, lit(40L))).as("source"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    docs.count()
    time("epoch_mix") {
      import graft.functions.VectorFunctions.md5Long
      val per = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
        .localCheckpoint(eager = false)
      val eps = per.crossJoin(broadcast(per.agg(max("n_s").as("mx"))))
        .withColumn("ep", sqrt(col("mx").cast("double") / col("n_s")))
      docs.join(broadcast(eps), "source")
        .withColumn("n_copies", floor(col("ep")) +
          when(pmod(md5Long(concat(col("doc_id").cast("string"), lit("#mix"))),
              lit(10000L))
            < ((col("ep") - floor(col("ep"))) * 10000).cast("long"), 1L)
            .otherwise(0L))
        .select(explode(sequence(lit(1L), col("n_copies"))).as("copy"))
        .count()
    }

    println(f"""{"metric":"scale_event_ops","n_events":$n,"n_docs":$nDocs,""" +
      out.toSeq.sortBy(_._1).map { case (k, v) => f""""${k}_sec":$v%.2f""" }
        .mkString(",") + "}")
    spark.stop()
  }
}
