package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits (a even, b odd) and matches a reference impl") {
    val s = spark
    import s.implicits._
    // reference Morton interleave on the driver
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 21) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (3L, 2L), (1L, 0L), (0L, 1L),
      (0x1FFFFFL, 0L), (0L, 0x1FFFFFL), (12345L, 54321L), (0xABCDEL, 0xF0F0FL))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b), s"zValue($a, $b)")
    }
    // hand-checked: a=3 -> 0101, b=2 -> spread 0100 shifted = 1000; z = 1101
    assert(got((3L, 2L)) == 13L)
  }

  test("z-order clustering prunes range queries on BOTH dimensions") {
    val s = spark
    import s.implicits._
    // 64x64 grid of points, 16 write partitions
    val grid = s.range(64L * 64)
      .select((col("id") % 64).as("a"), (col("id") / 64).as("b"))
    val z = ZOrder.clusterBy(grid, 16, col("a"), col("b")).cache()
    val linear = grid.repartitionByRange(16, col("a"), col("b")).cache()
    z.count(); linear.count()

    // a box query selective in the SECOND dimension: lexicographic
    // (a, b) layout can't prune it (every a-range file has all b's),
    // the z layout can
    val boxB = col("b") >= 8 && col("b") <= 15
    val zTouched = ZOrder.partitionsTouched(z, boxB)
    val linTouched = ZOrder.partitionsTouched(linear, boxB)
    assert(zTouched < linTouched,
      s"z-order should touch fewer partitions: z=$zTouched linear=$linTouched")
    assert(linTouched == 16, s"lexicographic layout reads everything: $linTouched")
    assert(zTouched <= 8, s"z layout should localize the b-band: $zTouched")

    // and a box tight in BOTH dims stays tightly localized under z
    val boxAB = col("a") >= 8 && col("a") <= 15 && boxB
    assert(ZOrder.partitionsTouched(z, boxAB) <= 2)

    // clustering must not lose or duplicate rows
    assert(z.count() == 64L * 64)
    z.unpersist(); linear.unpersist()
  }
}
