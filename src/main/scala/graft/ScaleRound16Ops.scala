package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Round-16 component diagnostic for the blocked kernel's constant
  * factor at 1024-d (r15 ask 1: 3.4× broadcast at nTiles=1). Times
  * each pipeline piece in ISOLATION, which falsified the serde
  * hypothesis and located the real cause (measured, local[16]):
  *
  *  - packed-primitive 32 MB × 16 rows through a repartition shuffle:
  *    1.24 s; the r15 nested Array[(Long, Array[Double])] shape:
  *    1.01 s — SERDE WAS NEVER THE BOTTLENECK (half a GB of tile
  *    replicas shuffles in ~1 s either way).
  *  - kernel FLOPs alone (4096q × 20000 corpus × 1024-d exact
  *    cosine): 9.67 s — i.e. the broadcast path (11.2 s total) is
  *    nearly pure kernel.
  *  - the blocked path's extra ~22 s was CELL-PLACEMENT SKEW: with
  *    nCells == #cell-keys, Murmur3 collisions pile 2–3 cells onto
  *    one reducer while others sit empty, and wall-clock is
  *    max-cells-per-task × per-cell kernel time. Fixed in
  *    Ann.blockedTop by searching, per logical cell, a key whose
  *    Murmur3-pmod lands in its OWN partition (perfect
  *    1-cell-per-task placement through the stock shuffle).
  *
  * After the fix (ScaleRound15Ops A/B, same corpus): 4096q blocked
  * 16.0 s vs broadcast 11.2 s = 1.43× (from 3.4×); 2048q blocked
  * 9.7 s vs 12.9 s (blocked FASTER); 8192q nSlots=16 29.6 s (from
  * 43.8); dispatched 10240q 38.5 s (from 51.3). Corpus scans ≡ 1
  * throughout.
  */
object ScaleRound16Ops {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 1024; val nq = 4096; val nRep = 16
    def timed(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $l: ${(System.nanoTime - t0) / 1e9}%.2f s ($r)")
    }

    // 0: JVM warmup
    timed("warmup")(spark.range(1000000).count())

    // 1: 16 packed 32 MB primitive-tuple rows through a repartition
    // shuffle (the tile replication's shape after the r16 packing)
    def packedRows(n: Int) = spark.range(n).map { i =>
      (i, new Array[Long](nq), new Array[Int](nq),
        Array.tabulate(nq * dim)(j => ((j + i) % 101 - 50) / 50.0))
    }
    timed(s"packed 32MB x$nRep build only")(
      packedRows(nRep).map(_._4.length.toLong).reduce(_ + _) / (nq * dim))
    timed(s"packed 32MB x$nRep build+shuffle")(
      packedRows(nRep).repartition(nRep, col("_1"))
        .map(_._4.length.toLong).reduce(_ + _) / (nq * dim))

    // 2: same bytes as Array[(Long, Array[Double])] (the r15 shape)
    def nestedRows(n: Int) = spark.range(n).map { i =>
      (i, Array.tabulate(nq)(q => (q.toLong,
        Array.tabulate(dim)(d => ((q + d + i) % 101 - 50) / 50.0))))
    }
    timed(s"nested 32MB x$nRep build only")(
      nestedRows(nRep).map(_._2.length.toLong).reduce(_ + _) / nq)
    timed(s"nested 32MB x$nRep build+shuffle")(
      nestedRows(nRep).repartition(nRep, col("_1"))
        .map(_._2.length.toLong).reduce(_ + _) / nq)

    // 3: query-side generation cost (transform(sequence(...)) is a
    // non-codegen higher-order function — how much per evaluation?)
    def vecs(n: Long) = spark.range(n)
      .select((col("id") + (1L << 32)).as("qid"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => ((col("id") * 31 + d * 17) % 101 - lit(50)) / 50.0).as("qv"))
    timed("vecs(4096) agg count+maxdim")(
      vecs(nq).agg(count(lit(1)), max(size(col("qv")))).head.getLong(0))
    timed("vecs(4096) as[(Long,Array[Double])] count") {
      vecs(nq).select(col("qid").as("_1"), col("qv").cast("array<double>").as("_2"))
        .as[(Long, Array[Double])].map(_._2.length.toLong).reduce(_ + _) / dim
    }

    // 4: the corpus side: gen + pack into 2048-row blocks, no shuffle
    val nCorpus = 20000L
    val corpus = spark.range(0, nCorpus, 1, 16).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, Array.tabulate(dim)(d => ((id * 31 + d * 17) % 101 - 50) / 50.0))
        }
      }
    timed("corpus gen only")(corpus.map(_._2.length.toLong).reduce(_ + _) / dim)

    // 5: kernel FLOPs only: score 4096 queries x 20000 corpus rows
    // with the exact cosine kernel, no shuffle (broadcast-like)
    val qArr = Array.tabulate(nq)(q => (q.toLong,
      Array.tabulate(dim)(d => ((q * 31 + d * 17) % 101 - 50) / 50.0)))
    val bq = spark.sparkContext.broadcast(qArr)
    timed("kernel only 4096x20000") {
      corpus.mapPartitions { it =>
        val qs = bq.value
        var acc = 0L
        val kern = graft.ann.Ann.cosineRounded6Kernel
        it.foreach { case (_, v) =>
          var qi = 0
          while (qi < qs.length) { if (kern(v, qs(qi)._2) > 2.0) acc += 1; qi += 1 }
        }
        Iterator.single(acc)
      }.reduce(_ + _)
    }
    spark.stop()
  }
}
