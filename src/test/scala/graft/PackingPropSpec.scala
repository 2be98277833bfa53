package graft

import scala.util.Random
import org.apache.spark.sql.functions.{col, row_number}
import org.apache.spark.sql.expressions.Window

/** Property-style trials for Packing.boundedRowNumber: for ANY key
  * distribution (including all-one-key), ANY block size, and ANY
  * physical layout, the result must equal a plain
  * `row_number() OVER (PARTITION BY k ORDER BY id)`.
  */
class PackingPropSpec extends SparkSpec {

  test("boundedRowNumber == plain row_number over 12 random trials") {
    val sp = spark; import sp.implicits._
    val rnd = new Random(11)
    (1 to 12).foreach { trial =>
      val n = 20 + rnd.nextInt(120)
      val nKeys = 1 + rnd.nextInt(6) // 1 key = maximal skew
      // non-contiguous ids with gaps (real corpora are never dense)
      val ids = rnd.shuffle((0L until n * 3L).toList).take(n)
      val rows = ids.map(id => (s"k${rnd.nextInt(nKeys)}", id))
      val d = rows.toDF("k", "id").repartition(1 + rnd.nextInt(7))
      val expected = d.withColumn("r",
          row_number().over(Window.partitionBy("k").orderBy("id")))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong)
        .toMap
      val blockSize = 1L << rnd.nextInt(8) // 1 … 128
      val got = graft.ops.Packing
        .boundedRowNumber(d, Seq("k"), "id", blockSize, "r")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected, s"trial=$trial blockSize=$blockSize n=$n keys=$nKeys")
    }
  }
}
