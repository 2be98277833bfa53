package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale evidence for the round-10 evaluation/monitoring operators
  * (SURVEY §6): the AUC/Wasserstein/Cliff's-delta family must reduce
  * the fact stream to a DISTINCT-value histogram in one grouped scan
  * (windows only ever touch the bounded value grid), the PSI spine is
  * constant-10-row, the count-min build is one map-side-combinable
  * aggregate into ≤256 cells, and the qini curve collapses users in
  * one pass before a ≤10-row window. If any of those shapes leaked a
  * per-row window or join, the doubling factor here would expose it.
  *
  * runMain graft.ScaleRound10Ops [nRows]
  */
object ScaleRound10Ops {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 40000000L
    val users = 100000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-scale10").toString

    // (score 4dp ∈ [0,1], binary label, user, type) fact table
    spark.range(n).select(
        col("id"),
        (pmod(col("id") * 2654435761L, lit(10001L)) / 10000.0).as("x0"),
        (pmod(col("id") * 97L, lit(3L)) === 0L).cast("long").as("g"),
        pmod(col("id") * 7919L, lit(users)).as("user_id"),
        pmod(col("id") * 104729L, lit(1000L)).as("key"))
      .withColumn("x", round(col("x0"), 4)).drop("x0")
      .write.mode("overwrite").parquet(s"$dir/facts")
    val f = spark.read.parquet(s"$dir/facts")
    f.count() // warm

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

    // AUC + Cliff's delta shape: grouped scan -> value-grid window
    time("auc_grid") {
      val h = f.groupBy("x").agg(sum("g").as("n1x"), count(lit(1)).as("nx"))
      val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("below", coalesce(sum("nx").over(w), lit(0L)))
        .withColumn("midrank", col("below").cast("double") + (col("nx") + 1) / 2.0)
        .agg(sum("n1x").as("n1"), sum(col("nx") - col("n1x")).as("n2"),
             sum(col("n1x") * col("midrank")).as("r1"))
        .count()
    }

    // Wasserstein shape: same grid, dual ECDF + lead
    time("wasserstein") {
      val h = f.groupBy("x").agg(sum("g").as("na"), sum(lit(1L) - col("g")).as("nb"))
      val wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
      val tot = h.agg(sum("na").as("ta"), sum("nb").as("tb"))
      h.crossJoin(broadcast(tot))
        .withColumn("fa", sum("na").over(wc) / col("ta").cast("double"))
        .withColumn("fb", sum("nb").over(wc) / col("tb").cast("double"))
        .withColumn("gap", lead("x", 1).over(Window.orderBy("x")) - col("x"))
        .filter(col("gap").isNotNull)
        .agg(sum(abs(col("fa") - col("fb")) * col("gap"))).count()
    }

    // count-min build over the 1000-key stream: ONE wide agg into
    // 4×64 cells (mergeable across shards by cell-wise addition)
    time("countmin_build") {
      import graft.functions.VectorFunctions.md5Long
      f.select(col("key"), explode(sequence(lit(0), lit(3))).as("d"))
        .withColumn("cell", pmod(md5Long(concat(lit("cm"), col("d").cast("string"),
          lit(":"), col("key").cast("string"))), lit(64)))
        .groupBy("d", "cell").agg(count(lit(1))).count()
    }

    // qini shape: users collapse in one grouped pass; only the
    // ≤10-row decile window follows
    time("qini") {
      import graft.functions.VectorFunctions.md5Long
      val u = f.groupBy("user_id")
        .agg(count(lit(1)).as("score"), max("g").as("resp"))
        .withColumn("arm", md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
        .localCheckpoint(eager = false)
      val cuts = u.agg(expr(
        "transform(percentile(score, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)), " +
        "x -> round(x, 6))").as("bs"))
      u.crossJoin(broadcast(cuts))
        .withColumn("decile", lit(10) - expr(
          "aggregate(bs, 0, (acc, b) -> acc + CASE WHEN score > b THEN 1 ELSE 0 END)"))
        .groupBy("decile")
        .agg(sum(when(col("arm") === 1, col("resp")).otherwise(0L)),
             sum(when(col("arm") === 0, col("resp")).otherwise(0L)))
        .count()
    }

    val js = out.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"metric":"scale_round10","n":$n,$js}""")
    spark.stop()
  }
}
