package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale evidence for the round-10 third-wave operators (SURVEY §6):
  * - ev_markov2's trigram build is ONE two-lead window pass over the
  *   facts (the only per-row window in the wave) collapsing to
  *   |types|³ cells — the doubling factor shows the n log n sort, not
  *   a blowup;
  * - stat_group_seq fans the scan ×4 map-side (broadcast look table,
  *   conditional Welch sums — no window, no second scan);
  * - ev_srm_daily is one DISTINCT (day,user) pass;
  * - ts_hurst reduces facts to a daily rollup before any block math
  *   (everything after is calendar-bounded);
  * - dedup_cdc_chunks fans ≤len gram rows per doc map-side and the
  *   boundary window is per-doc — throughput is the docs/s number a
  *   100 TB crawl would see per node.
  *
  * runMain graft.ScaleRound10cOps [nRows] [nDocs]
  */
object ScaleRound10cOps {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 40000000L
    val nDocs = if (args.length > 1) args(1).toLong else 1000000L
    val users = 100000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-scale10c").toString

    // event facts: monotone ts, hashed user, 12-type domain, value
    spark.range(n).select(
        col("id").as("ts"),
        pmod(col("id") * 7919L, lit(users)).as("user_id"),
        concat(lit("t"), pmod(col("id") * 104729L, lit(12L))).as("event_type"),
        (pmod(col("id") * 2654435761L, lit(10001L)) / 100.0).as("value"))
      .write.mode("overwrite").parquet(s"$dir/facts")
    val f = spark.read.parquet(s"$dir/facts")
    f.count() // warm

    // synthetic docs for the CDC probe: ~192 chars of id-derived text
    spark.range(nDocs).select(col("id").as("doc_id"),
        concat(md5(col("id").cast("string")).cast("string"),
               md5((col("id") * 31L).cast("string")),
               md5((col("id") * 131L).cast("string")),
               md5((col("id") % 1000L).cast("string")),  // shared tail block
               md5((col("id") % 1000L + 7L).cast("string")),
               md5((col("id") * 17L).cast("string"))).as("text"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    docs.count() // warm

    var out = Map.empty[String, Double]
    def time(what: String)(body: => Long): Unit = {
      // min over 2 in-JVM repeats (JIT/cache noise swamps 2× factors)
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val r = body
        val s = (System.nanoTime() - t0) / 1e9
        require(r >= 0); s
      }
      out += what -> secs.min
    }

    // ev_markov2 shape: two leads in ONE window pass -> |types|^3 cells
    time("markov2_cells") {
      val w = Window.partitionBy("user_id").orderBy("ts")
      f.select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("t1", lead("event_type", 1).over(w))
        .withColumn("t2", lead("event_type", 2).over(w))
        .filter(col("t1").isNotNull && col("t2").isNotNull)
        .groupBy(col("event_type"), col("t1"), col("t2"))
        .agg(count(lit(1))).count()
    }

    // stat_group_seq shape: broadcast look table, x4 map-side fan-out,
    // conditional Welch sums per look — no window
    time("groupseq_looks") {
      import graft.functions.VectorFunctions.md5Long
      val ev = f.withColumn("day", expr("ts div 1000000"))
        .withColumn("arm",
          md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
      val looks = ev.agg(min("day").as("mn"), max("day").as("mx"))
        .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L), lit(4L))))
        .select(col("k"),
          (col("mn") - 1 + expr("((mx - mn + 1) * k) div 4")).as("cut"))
      ev.crossJoin(broadcast(looks)).filter(col("day") <= col("cut"))
        .groupBy("k")
        .agg(avg(when(col("arm") === 1, col("value"))),
             var_samp(when(col("arm") === 1, col("value"))),
             avg(when(col("arm") === 0, col("value"))),
             var_samp(when(col("arm") === 0, col("value"))))
        .count()
    }

    // ev_srm_daily shape: one DISTINCT (day,user) pass -> |days| rows
    time("srm_daily_distinct") {
      import graft.functions.VectorFunctions.md5Long
      f.select(expr("ts div 1000000").as("day"), col("user_id")).distinct()
        .withColumn("arm",
          md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
        .groupBy("day")
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)),
             sum(when(col("arm") === 0, 1L).otherwise(0L)))
        .count()
    }

    // ts_hurst shape: the fact rollup dominates; block math is bounded
    time("hurst_rollup") {
      val dc = f.groupBy(col("event_type"), expr("ts div 1000000").as("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("day")).cast("long") - 1)
      val ws = spark.createDataFrame(Seq(Tuple1(4L), Tuple1(8L), Tuple1(16L)))
        .toDF("w")
      dc.crossJoin(broadcast(ws)).withColumn("blk", expr("rn div w"))
        .groupBy("event_type", "w", "blk")
        .agg(count(lit(1)), avg("cnt"), var_pop("cnt")).count()
    }

    // dedup_cdc_chunks shape: gram fan-out map-side, per-doc window
    time("cdc_chunks") {
      import graft.functions.VectorFunctions.md5Long
      val dd = docs.select(col("doc_id"), col("text"),
        length(col("text")).as("len"))
      val cuts = dd
        .select(col("doc_id"), col("text"), col("len"),
          explode(sequence(lit(1), col("len") - 7)).as("i"))
        .filter(md5Long(expr("substring(text, i, 8)")) % 32 === 0)
        .select(col("doc_id"), col("text"), col("len"), col("i"))
        .union(dd.select(col("doc_id"), col("text"), col("len"), lit(1).as("i")))
        .distinct()
      val wch = Window.partitionBy("doc_id").orderBy("i")
      cuts
        .withColumn("nxt", coalesce(lead("i", 1).over(wch), col("len") + 1))
        .withColumn("chunk", expr("substring(text, i, nxt - i)"))
        .agg(count(lit(1)), countDistinct(md5(col("chunk").cast("binary"))))
        .count()
    }

    val js = out.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"metric":"scale_round10c","n":$n,"n_docs":$nDocs,$js}""")
    spark.stop()
  }
}
