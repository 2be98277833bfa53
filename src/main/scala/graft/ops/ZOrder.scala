package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of two
  * dimension columns so that range-partitioning on the single z key
  * co-locates rows that are close in BOTH dimensions. A multi-dim
  * range query then touches only the partitions whose z range
  * intersects the query box — the layout trick behind multi-column
  * data skipping (Delta/Iceberg OPTIMIZE ZORDER) — where sorting by
  * (a, b) lexicographically clusters only the leading column.
  *
  * The interleave is pure Column arithmetic (shift/mask magic
  * numbers), so it stays inside whole-stage codegen: no UDF, no
  * per-row boxing. At 100 TB the write is one range shuffle (Spark
  * samples split points; no global sort, no single reducer), and the
  * read-side benefit is file-level min/max pruning on BOTH
  * dimensions — measured in ZOrderSpec as partitions-touched, which
  * is exactly what parquet row-group pruning sees at scale.
  */
object ZOrder {

  /** Spread the low 21 bits of `x` to even bit positions (the classic
    * interleave-by-two mask cascade, as codegen'd column ops).
    */
  private def spread(x: Column): Column = {
    val m0 = lit(0x1FFFFFL)           // clamp to 21 bits
    val s0 = x.cast("long").bitwiseAND(m0)
    val s1 = s0.bitwiseOR(shiftleft(s0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x3333333333333333L))
    s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton code of two non-negative dimension columns (each
    * truncated to its low 21 bits; callers with wider domains should
    * first rank/bucket the dimension — the curve needs bounded
    * coordinates, not raw values). `a` occupies even bits, `b` odd.
    */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Cluster `df` into `numFiles` write partitions along the Z curve
    * of (a, b). Range-repartition on z (sampled split points — scales
    * like totallyOrdered, no global sort) then sort within each
    * partition so parquet row groups inherit the clustering too.
    */
  def clusterBy(df: DataFrame, numFiles: Int, a: Column, b: Column): DataFrame =
    df.withColumn("_z", zValue(a, b))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** Pruning proxy the spec measures: how many of the current
    * partitions hold at least one row matching `pred`. At scale this
    * is the number of files a min/max-pruned scan must open.
    */
  def partitionsTouched(df: DataFrame, pred: Column): Long =
    df.filter(pred)
      .select(spark_partition_id().as("pid"))
      .distinct()
      .count()
}
