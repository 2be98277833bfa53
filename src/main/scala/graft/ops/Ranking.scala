package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global ranking without a single-partition sort.
  *
  * `Window.orderBy(...)` with no partition moves the ENTIRE table
  * through one task — the classic 100 TB OOM. `df.orderBy` instead
  * plans a range-partitioned distributed sort (sampled bounds, every
  * partition sorted, partitions themselves ordered), and
  * `zipWithIndex` turns that into exact 1-based global ranks with one
  * extra lightweight job (per-partition counts → offsets). Both jobs
  * run against the same RDD instance, so the sampled range bounds are
  * computed once and the shuffle files are reused — ranks are
  * consistent and deterministic for a total ordering.
  *
  * This is the standard scalable replacement for global
  * row_number/ntile: O(rows/partitions) memory per task instead of
  * O(rows) on one task.
  */
object Ranking {

  /** Appends `rankCol` = 1-based global rank under `order` (which
    * must be a total order — include a unique tiebreak key).
    */
  def withGlobalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    sorted.sparkSession.createDataFrame(ranked, schema)
  }

  /** ntile(k)-equivalent bucket (1..k) from a 1-based global rank
    * over n total rows: the first n % k buckets get ⌈n/k⌉ rows, the
    * rest ⌊n/k⌋ — identical to SQL ntile over the same total order.
    * Integral DIV arithmetic stays exact past 2^53 (doubles don't).
    */
  def ntileFromRank(rankCol: String, n: Long, k: Int): Column = {
    val base = n / k
    val rem = n % k
    val big = base + 1
    val cut = rem * big
    val safeBase = math.max(base, 1L) // else-branch unreachable when base == 0
    expr(
      s"""CAST(CASE WHEN $rankCol <= $cut THEN ($rankCol - 1) DIV $big
         |     ELSE $rem + ($rankCol - 1 - $cut) DIV $safeBase END + 1 AS BIGINT)""".stripMargin)
  }
}
