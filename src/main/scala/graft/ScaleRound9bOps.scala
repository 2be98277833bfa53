package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale probes for the round-9 second-wave operators: the shapes whose
  * 100 TB posture isn't obvious from the plan alone. Synthetic inputs
  * generated with spark.range (deterministic arithmetic, no RNG state),
  * written to parquet first so every probe pays a real scan. Run:
  *   sbt "runMain graft.ScaleRound9bOps [nVec] [nDoc]"
  * Reports min-over-2-reps wall seconds (single cold passes measured up
  * to 3x run-to-run noise; min isolates the doubling factor).
  */
object ScaleRound9bOps {
  def main(args: Array[String]): Unit = {
    val nVec = if (args.length > 0) args(0).toLong else 10000000L
    val nDoc = if (args.length > 1) args(1).toLong else 2000000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.{l2Norm, md5Long}
    val dir = java.nio.file.Files.createTempDirectory("graft-scale9b").toString

    // nVec 64-d vectors: deterministic per-(id,dim) pseudo-noise
    spark.range(nVec).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> " +
          "cast(pmod(id * 40503 + j * 2654435761, 1000) as float) / 1000.0F - 0.5F)")
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/emb")
    val emb = spark.read.parquet(s"$dir/emb")
    emb.count()

    // nDoc docs, ~30 tokens each from a Zipf-ish vocab (hash mod rank)
    spark.range(nDoc).select(col("id").as("doc_id"),
        array_join(expr("transform(sequence(0, 29), j -> " +
          "concat('w', pmod(cast(pow(pmod(id * 31 + j * 97, 9973), 1.7) as long), 20000)))"),
          " ").as("text"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    docs.count()

    var out = Map.empty[String, Double]
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      out += what -> math.min(out.getOrElse(what, Double.MaxValue), sec)
      println(f"[scale9b] $what: $sec%.2f s (result=$r)")
    }

    for (_ <- 1 to 2) {
      // emb_anisotropy shape: two linear passes, no pair join — the
      // probe proves the O(n²)-avoidance identity holds its linearity
      time("anisotropy") {
        val f = emb.filter(col("embedding").isNotNull)
          .select(col("embedding"), l2Norm(col("embedding")).as("nrm"))
          .filter(col("nrm") > 0)
        val dims = f.select(col("nrm"), posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy("i")
          .agg(sum(col("x").cast("double")).as("sx"),
               sum(col("x").cast("double") / col("nrm")).as("su"))
        val nRow = f.agg(count(lit(1)).as("n"), avg("nrm").as("mean_norm"))
        dims.crossJoin(broadcast(nRow))
          .agg(max(col("n")), sum(col("su") * col("su"))).count()
      }

      // ann_jl_recall's projection stage: literal sign matrix → pure
      // codegen map. (The explode→groupBy formulation this replaced
      // measured 34.5 s at 5M vectors — 64·16 rows per vector through
      // a hash and a shuffle; this is scan-bound.)
      time("jl_project") {
        val sgn = (0 until 16).map { j =>
          (0 until 64).map { i =>
            if (graft.functions.Md5Hash.hash60(
              org.apache.spark.unsafe.types.UTF8String
                .fromString(s"jl:$i:$j")) % 2 == 0) 1.0 else -1.0
          }
        }
        val sgnLit = array(sgn.map(row => array(row.map(lit): _*)): _*)
        // sum over a projected coordinate so column pruning can't skip
        // the projection work (count() alone would)
        emb.select(col("vec_id"),
          transform(sequence(lit(0), lit(15)), j =>
            aggregate(
              zip_with(col("embedding"), element_at(sgnLit, j + lit(1)),
                (x, sg) => x.cast("double") * sg),
              lit(0.0), (acc, v) => acc + v)).as("p"))
          .agg(sum(aggregate(col("p"), lit(0.0), (a, v) => a + v))).count()
      }

      // text_heaps_fit shape: term-keyed min-agg + ≤101-row windows;
      // the probe proves the window input stays bounded as docs grow
      time("heaps_fit") {
        val toks = docs.select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        val mx = docs.agg(max("doc_id").as("mx"))
        val blocked = toks.crossJoin(broadcast(mx))
          .withColumn("blk", expr("doc_id DIV greatest(1, (mx DIV 100) + 1)"))
        val perBlk = blocked.groupBy("blk").agg(count(lit(1)).as("nt"))
        val firstBlk = blocked.groupBy("w").agg(min("blk").as("fb"))
          .groupBy(col("fb").as("blk")).agg(count(lit(1)).as("nv"))
        val wc = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, 0)
        perBlk.join(firstBlk, Seq("blk"), "left").na.fill(0L, Seq("nv"))
          .withColumn("cn", sum("nt").over(wc))
          .withColumn("cv", sum("nv").over(wc))
          .count()
      }

      // priv_k_anonymity + samp_horvitz_thompson shapes at full doc
      // count: two/one reduce passes, no windows — linearity check
      time("kanon_ht") {
        val k = docs.select(col("doc_id"),
            pmod(col("doc_id") * 97L, lit(5L)).as("lang"),
            pmod(col("doc_id") * 31L, lit(20L)).as("source"),
            (length(col("text")) % 2000L).as("n_chars"))
        val ka = k.groupBy(col("lang"), col("source"), expr("n_chars DIV 200"))
          .agg(count(lit(1)).as("cs"))
          .groupBy("cs").agg(count(lit(1))).count()
        val ht = k.withColumn("in_s",
            (md5Long(concat(lit("ht:"), col("doc_id").cast("string"))) % 1000L)
              < when(col("n_chars") >= 500, 500L).otherwise(100L))
          .groupBy("source")
          .agg(sum(when(col("in_s"), col("n_chars")).otherwise(0L))).count()
        ka + ht
      }
    }

    val json = out.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${f"$v%.2f"}""" }.mkString("{", ",", "}")
    println(s"""{"probe":"scale9b","n_vec":$nVec,"n_doc":$nDoc,"sec":$json}""")
    spark.stop()
  }
}
