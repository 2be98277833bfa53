package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale evidence for the round-11 work (SURVEY §6):
  * - the Gramian treeAggregate kernel that replaced the eigen
  *   family's N·d² row fan-out: per-vector cost is one fused
  *   multiply-add loop and per-task state is d² doubles, so time
  *   must be linear in N and ~quadratic in d with NO shuffle growth —
  *   probed at d ∈ {64, 256} and N× doubling;
  * - the capped minhash-LSH candidate join on an adversarial corpus
  *   (10% of docs share one text): the capped form must stay flat
  *   where the uncapped pair explode would be quadratic in the hot
  *   bucket — probed by timing pairs WITH the cap at two corpus
  *   sizes (the uncapped form at these sizes would materialize
  *   ~(N/10)² pairs and is deliberately not run);
  * - stat_bootstrap's ×32 Poisson-weight fan-out is map-side into
  *   one hash aggregate — doubling facts must stay ~linear.
  *
  * runMain graft.ScaleRound11Ops [nVecs] [nDocs] [nRows]
  */
object ScaleRound11Ops {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toLong else 200000L
    val nDocs = if (args.length > 1) args(1).toLong else 500000L
    val n = if (args.length > 2) args(2).toLong else 20000000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-scale11").toString

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scale11] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // --- Gramian kernel: N vectors at d=64 and d=256 ---------------
    for (d <- Seq(64, 256)) {
      spark.range(nVecs).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(d - 1)),
            i => (pmod(col("id") * (i + lit(13L)), lit(1000L)).cast("double")
              / 500.0 - 1.0).cast("float")).as("embedding"))
        .write.mode("overwrite").parquet(s"$dir/emb_$d")
      val emb = spark.read.parquet(s"$dir/emb_$d")
      emb.count() // warm page cache
      time(s"gramian d=$d N=$nVecs") {
        graft.embed.CovMoments.moments(emb)
      }
      time(s"gramian d=$d N=$nVecs (2nd)") {
        graft.embed.CovMoments.moments(emb)
      }
    }

    // --- capped LSH on an adversarial corpus ------------------------
    // 10% of docs are ONE identical text → one bucket holds N/10 docs;
    // the cap must keep candidate generation flat
    spark.range(nDocs).select(col("id").as("doc_id"),
        when(col("id") % 10 === 0, lit("the same boilerplate body of text"))
          .otherwise(concat_ws(" ",
            md5(col("id").cast("string")),
            md5((col("id") * 31L).cast("string")),
            md5((col("id") * 131L).cast("string")))).as("text"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    docs.count()
    import graft.dedup.Dedup
    time(s"capped lsh pairs N=$nDocs") {
      Dedup.minhashLshPairs(
        Dedup.minhashSignaturesMapSide(docs, 5, 8), 8, 2).count()
    }
    time(s"lsh overflow audit N=$nDocs") {
      Dedup.lshOverflow(
        Dedup.minhashSignaturesMapSide(docs, 5, 8), 8, 2).count()
    }

    // --- Poisson-bootstrap fan-out ----------------------------------
    spark.range(n).select(col("id").as("event_id"),
        (pmod(col("id") * 7919L, lit(1000L)).cast("double") / 100.0)
          .as("value"))
      .write.mode("overwrite").parquet(s"$dir/vals")
    val vals = spark.read.parquet(s"$dir/vals")
    vals.count()
    time(s"poisson bootstrap x32 N=$n") {
      import graft.functions.VectorFunctions.md5Long
      val u = (pmod(md5Long(concat(lit("bs:"),
          col("event_id").cast("string"), lit(":"), col("b").cast("string"))),
          lit(1000000)).cast("double") + 0.5) / 1000000.0
      val w = when(u < 0.367879, 0).when(u < 0.735759, 1)
        .when(u < 0.919699, 2).when(u < 0.981012, 3)
        .when(u < 0.996340, 4).when(u < 0.999406, 5).otherwise(6)
      vals.withColumn("b", explode(sequence(lit(0L), lit(31L))))
        .withColumn("w", w.cast("double"))
        .groupBy("b")
        .agg(sum(col("w") * col("value")).as("sv"), sum("w").as("sw"))
        .count()
    }

    spark.stop()
  }
}
