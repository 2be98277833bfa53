package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, built as
  * shuffle-bounded compositions (no per-row inequality joins, which
  * plan as nested-loop cross products and die at scale).
  */
object Joins {

  /** As-of join: for every left row, the single most recent right row
    * with the same `keys` and right.`rts` <= left.`lts`.
    *
    * Implemented as union + one ordered window pass: both sides
    * shuffle ONCE on `keys`, are sorted by (ts, side) within the
    * partition, and a running `last(right_struct, ignoreNulls)` carries
    * the latest right row forward — the sort-merge as-of plan. No
    * range explosion, no nested-loop join; cost is one shuffle of
    * left+right, the same as a plain equi-join.
    *
    * `right` must be unique per (keys, rts) — pre-aggregate duplicates
    * (the match at equal timestamps would otherwise be ambiguous in
    * ANY engine). Output: left columns + `asof` struct of the right
    * row's non-key columns (null when no prior right row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               lts: String, rts: String): DataFrame = {
    val lPayload = left.columns.filterNot(keys.contains)
    val rPayload = right.columns.filterNot(keys.contains)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(lts).as("_ats"), lit(1).as("_side"),
        struct(lPayload.map(col): _*).as("_l"),
        lit(null).cast(right.select(rPayload.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
          .as("_r")): _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(rts).as("_ats"), lit(0).as("_side"),
        lit(null).cast(left.select(lPayload.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
          .as("_l"),
        struct(rPayload.map(col): _*).as("_r")): _*)
    // right sorts before left at equal ts => the <= (inclusive) match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(keys.map(col) ++ lPayload.map(c => col(s"_l.$c").as(c)) :+ col("asof"): _*)
  }

  /** Interval-containment join via fixed-width bucketing: each
    * interval [start, end] is exploded to the buckets it covers and
    * each point keyed by its single bucket, turning the inequality
    * join into an EQUI-join on (keys, bucket) plus an exact residual
    * filter. Fan-out per interval is bounded by
    * (end-start)/bucketWidth + 1, so the shuffle is linear in input —
    * the 100 TB-safe range join (a raw `BETWEEN` join plans as a
    * nested-loop cross product per key).
    *
    * `ts`, `start`, `end` are integral (e.g. epoch nanos). Each
    * qualifying (point, interval) pair appears exactly once.
    */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
                        keys: Seq[String], ts: String, start: String,
                        end: String, bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("_b",
      explode(sequence(expr(s"$start DIV $bucketWidth"),
                       expr(s"$end DIV $bucketWidth"))))
    val pt = points.withColumn("_b", expr(s"$ts DIV $bucketWidth"))
    pt.join(iv, (keys :+ "_b").toSeq)
      .filter(col(ts).between(col(start), col(end)))
      .drop("_b")
  }
}
