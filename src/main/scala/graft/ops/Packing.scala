package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: documents are laid out
  * consecutively in a token stream (id order) and each one is
  * assigned the context window its first token lands in —
  * pack_id = exclusive-prefix-sum(tokens) DIV capacity, the
  * concat-then-chunk packing GPT-style pipelines use.
  *
  * The global prefix sum is the textbook two-level scan, not a global
  * window: a bounded per-block running sum (block = id DIV blockSize,
  * keyed window) plus a cumulative offset over the per-block totals —
  * a frame already reduced by a factor of blockSize. At 100 TB the
  * reduced frame is rows/blockSize (one more level of the same scan
  * if even that is large); nothing ever moves the full data to one
  * partition.
  */
object Packing {

  /** (idCol, tok, pack_id) for every row; `tokCol` must be a
    * non-negative integral token count.
    */
  def packSequences(docs: DataFrame, idCol: String, tokCol: String,
                    capacity: Long, blockSize: Long): DataFrame = {
    val withBlk = docs.select(col(idCol),
      col(tokCol).cast("long").as("tok"),
      expr(s"$idCol DIV $blockSize").as("_blk"))
    val wIn = Window.partitionBy("_blk").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-block totals: rows/blockSize rows — the reduced second level
    val offsets = withBlk.groupBy("_blk").agg(sum("tok").as("_bt"))
      .withColumn("_boff", coalesce(sum("_bt").over(wBlk), lit(0L)))
      .select("_blk", "_boff")
    withBlk.withColumn("_cum", sum("tok").over(wIn))
      .join(broadcast(offsets), "_blk")
      .select(col(idCol), col("tok"),
        expr(s"(_boff + _cum - tok) DIV $capacity").as("pack_id"))
  }

  /** Greedy token-budget corpus selection (the data-mixing step of a
    * pretraining build): take documents in (score desc, id) order
    * until `budget` tokens are admitted; a doc is kept iff the budget
    * is not yet exhausted when its first token arrives (same
    * convention as [[packSequences]]' window assignment, so the last
    * admitted doc may overflow the budget).
    *
    * Same two-level scan as packing, with the block key derived from
    * the SCORE instead of the id: block = floor(score·buckets) (capped
    * to [0, buckets-1]), so (block desc, score desc, id) is exactly
    * the global selection order. The within-block running sum is a
    * keyed window; the cross-block offset is a window over ≤`buckets`
    * rows — constant at any corpus size. `scoreCol` must be rounded
    * before the call (engines must agree on order, and a raw double's
    * last ulp may differ).
    *
    * Output: (idCol, scoreCol, tok, cum_tok) for kept docs, cum_tok =
    * inclusive running total in selection order (strictly increasing,
    * so it is a unique sort key when tok > 0).
    */
  def selectByTokenBudget(docs: DataFrame, idCol: String, tokCol: String,
                          scoreCol: String, budget: Long,
                          buckets: Int = 100): DataFrame = {
    val blk = greatest(least(floor(col(scoreCol) * buckets),
      lit(buckets - 1)), lit(0)).cast("long")
    val d = docs.select(col(idCol), col(tokCol).cast("long").as("tok"),
      col(scoreCol), blk.as("_blk"))
    val wIn = Window.partitionBy("_blk")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.orderBy(col("_blk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy("_blk").agg(sum("tok").as("_bt"))
      .withColumn("_boff", coalesce(sum("_bt").over(wBlk), lit(0L)))
      .select("_blk", "_boff")
    d.withColumn("_cum", sum("tok").over(wIn))
      .join(broadcast(offsets), "_blk")
      .withColumn("cum_tok", col("_boff") + col("_cum"))
      .filter(col("cum_tok") - col("tok") < budget)
      .select(col(idCol), col(scoreCol), col("tok"), col("cum_tok"))
  }

  /** Length-bucketed batch shaping (the padding-waste killer for
    * variable-length training batches): bucket sequences by token-
    * length band, order each bucket by (tok, id), and cut batches of
    * `batchSize` sequences. Batch position is again a two-level scan —
    * a row_number inside the (bucket, tok) partition plus an offset
    * window over the distinct (bucket, tok) count rows, a frame of at
    * most bucketWidth rows per bucket — so no window ever sees more
    * than a token-band's worth of rows regardless of corpus size.
    *
    * Returns per-bucket batching stats: (bucket, n_batches, n_docs,
    * pad_tokens, pad_frac) where padding assumes each batch pads to
    * its own max length.
    */
  def bucketedBatches(docs: DataFrame, idCol: String, tokCol: String,
                      bucketWidth: Long, nBuckets: Int,
                      batchSize: Int): DataFrame = {
    val d = docs.select(col(idCol).as("id"), col(tokCol).cast("long").as("tok"))
      .withColumn("_bkt", least(expr(s"tok DIV $bucketWidth"), lit(nBuckets - 1L)))
    val wIn = Window.partitionBy("_bkt", "tok").orderBy("id")
    val wOff = Window.partitionBy("_bkt").orderBy("tok")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy("_bkt", "tok").agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum("_c").over(wOff), lit(0L)))
      .select("_bkt", "tok", "_off")
    d.withColumn("_rin", row_number().over(wIn))
      .join(broadcast(offsets), Seq("_bkt", "tok"))
      .withColumn("batch_idx", expr(s"(_off + _rin - 1) DIV $batchSize"))
      .groupBy("_bkt", "batch_idx")
      .agg(count(lit(1)).as("bn"), max("tok").as("mx"), sum("tok").as("st"))
      .groupBy(col("_bkt").as("bucket"))
      .agg(count(lit(1)).as("n_batches"), sum("bn").as("n_docs"),
           sum(col("bn") * col("mx") - col("st")).as("pad_tokens"),
           round(sum(col("bn") * col("mx") - col("st")) /
                 sum(col("bn") * col("mx")), 4).as("pad_frac"))
      .orderBy("bucket")
  }
}
