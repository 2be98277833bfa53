package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale evidence for the round-10 fourth-wave operators (SURVEY §6):
  * - the Granger / Durbin-Watson / Theil-U2 / runs-test / PACF family
  *   all collapse the facts to ONE daily (or hourly) rollup first —
  *   the probes time that rollup plus the O(|types|·|days|) window
  *   math that follows, so the doubling factor isolates the only
  *   fact-scale stage;
  * - dedup_bloom_incremental's filter is a DISTINCT bit-position
  *   table bounded by m=2^16 regardless of corpus size (broadcast on
  *   the probe side) — build and probe are timed separately, the way
  *   a daily increment would run them;
  * - samp_ess re-reads the token table three times (source counts,
  *   target counts, per-doc weights) — the probe measures the full
  *   three-scan pipeline at 1M docs;
  * - emb_top_eigen / emb_participation_ratio fan each vector into
  *   64×64 cross-moment cells consumed by a map-side-combinable hash
  *   aggregate in the SAME stage — per-vector cost must stay flat.
  *
  * runMain graft.ScaleRound10dOps [nRows] [nDocs] [nVecs]
  */
object ScaleRound10dOps {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 40000000L
    val nDocs = if (args.length > 1) args(1).toLong else 1000000L
    val nVecs = if (args.length > 2) args(2).toLong else 100000L
    val users = 100000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-scale10d").toString

    spark.range(n).select(
        col("id").as("ts"),
        pmod(col("id") * 7919L, lit(users)).as("user_id"),
        concat(lit("t"), pmod(col("id") * 104729L, lit(12L))).as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/facts")
    val f = spark.read.parquet(s"$dir/facts")
    f.count() // warm

    // docs with REAL whitespace tokens (8 hash words) for the token
    // explode in the ESS probe; ~1% of the corpus shares text so the
    // bloom probe sees true duplicates
    spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ",
          md5(pmod(col("id"), lit(50000L)).cast("string")),
          md5((pmod(col("id"), lit(50000L)) * 31L).cast("string")),
          md5((col("id") % 997L).cast("string")),
          md5((col("id") % 89L).cast("string")),
          md5((pmod(col("id"), lit(50000L)) * 131L).cast("string")),
          md5((col("id") % 7L).cast("string")),
          md5((pmod(col("id"), lit(50000L)) * 17L).cast("string")),
          md5((col("id") % 3L).cast("string"))).as("text"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    docs.count() // warm

    spark.range(nVecs).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> " +
          "((id * 2654435761 + j * 40503) % 1000) / 1000.0)").as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/vecs")
    val vecs = spark.read.parquet(s"$dir/vecs")
    vecs.count() // warm

    var out = Map.empty[String, Double]
    def time(what: String)(body: => Long): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val r = body
        val s = (System.nanoTime() - t0) / 1e9
        require(r >= 0); s
      }
      out += what -> secs.min
    }

    // Theil-U2 / Durbin-Watson shape: ONE rollup then two windows
    // over the |types|x|days| frame
    time("daily_stat_windows") {
      val daily = f.groupBy(col("event_type"), expr("ts div 1000000").as("day"))
        .agg(count(lit(1)).cast("double").as("y"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val wf = w.rowsBetween(-7, -1)
      daily
        .withColumn("fc", when(count(lit(1)).over(wf) === 7, avg("y").over(wf)))
        .withColumn("yl", lag("y", 1).over(w))
        .filter(col("fc").isNotNull && col("yl").isNotNull)
        .groupBy("event_type")
        .agg(sum(pow(col("fc") - col("y"), 2)),
             sum(pow(col("yl") - col("y"), 2)))
        .count()
    }

    // Granger shape: conditional daily rollup + day-1 alignment join
    // + one 10-sum aggregate (all O(|days|) after the rollup)
    time("granger_align") {
      val daily = f.groupBy(expr("ts div 1000000").as("day"))
        .agg(sum(when(col("event_type") === "t1", 1L).otherwise(0L))
               .cast("double").as("y"),
             sum(when(col("event_type") === "t2", 1L).otherwise(0L))
               .cast("double").as("x"))
        .localCheckpoint(eager = false)
      val prev = daily.select(col("day").as("dp"),
        col("y").as("yl"), col("x").as("xl"))
      daily.join(prev, col("dp") === col("day") - 1)
        .agg(count(lit(1)), sum("y"), sum("yl"), sum("xl"),
             sum(col("y") * col("y")), sum(col("yl") * col("yl")),
             sum(col("xl") * col("xl")), sum(col("y") * col("yl")),
             sum(col("y") * col("xl")), sum(col("yl") * col("xl")))
        .count()
    }

    // bloom build: corpus -> DISTINCT bit positions (<= 2^16 rows)
    import graft.functions.VectorFunctions.md5Long
    val ks = array(lit(0), lit(1), lit(2))
    val bloom = docs
      .withColumn("h", md5(col("text")))
      .select(explode(ks).as("k"), col("h"))
      .select(pmod(md5Long(concat(col("h"), lit(":"), col("k").cast("string"))),
        lit(65536)).as("pos"))
      .distinct()
    time("bloom_build") { bloom.count() }
    val bloomM = bloom.localCheckpoint()

    // bloom probe: a 10%-of-corpus batch screened against the filter
    time("bloom_probe") {
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("h", md5(col("text")))
      batch.select(col("doc_id"), col("h"), explode(ks).as("k"))
        .withColumn("pos",
          pmod(md5Long(concat(col("h"), lit(":"), col("k").cast("string"))),
            lit(65536)))
        .join(broadcast(bloomM), Seq("pos"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("np"))
        .filter(col("np") === 3)
        .count()
    }

    // ESS shape: token explode x3 scans (source, target, doc weights)
    time("ess_weights") {
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("b", md5Long(col("tok")) % 64)
      val src = tok.groupBy("b").agg(count(lit(1)).as("cs"))
      val tgt = tok.filter(col("doc_id") % 3 === 0)
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val probs = src.join(tgt, Seq("b"), "left").na.fill(0L, Seq("ct"))
        .select(col("b"), (log(col("ct") + 1.0) - log(col("cs") + 1.0)).as("llr"))
      tok.join(broadcast(probs), "b")
        .groupBy("doc_id").agg(round(sum("llr"), 4).as("lw"))
        .count()
    }

    // covariance cell build: 64x64 cross-moments per vector consumed
    // by a map-side-combinable hash aggregate in the same stage
    time("cov_cells") {
      vecs.filter(col("embedding").isNotNull)
        .select(col("embedding"), posexplode(col("embedding")).as(Seq("a", "xa")))
        .select(col("a"), col("xa"), posexplode(col("embedding")).as(Seq("b", "xb")))
        .groupBy("a", "b")
        .agg(count(lit(1)), sum(col("xa") * col("xb")), sum("xa"), sum("xb"))
        .count()
    }

    val js = out.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"metric":"scale_round10d","n":$n,"n_docs":$nDocs,"n_vecs":$nVecs,$js}""")
    spark.stop()
  }
}
