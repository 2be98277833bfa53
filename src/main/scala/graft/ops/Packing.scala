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
    // r17: the slim (id, tok, score, blk) projection is read by BOTH
    // the per-bucket cumsum and the offset aggregate — checkpoint it
    // so the (possibly expensive) upstream subtree runs once, not
    // twice (guide §1.2: don't recompute what you already computed)
    val d = docs.select(col(idCol), col(tokCol).cast("long").as("tok"),
      col(scoreCol), blk.as("_blk"))
      .localCheckpoint(eager = false)
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

  /** `row_number() OVER (PARTITION BY partCols ORDER BY idCol)` with
    * every window partition BOUNDED — the reusable form of the
    * two-level scan the packing/batching operators use. Level 1 ranks
    * inside (partCols, idCol DIV blockSize) — ≤ blockSize rows when
    * ids are unique; level 2 is a running offset over the per-key
    * block totals, a frame already reduced by a factor of blockSize.
    * Use wherever a plain per-key row_number would straggle on a hot
    * key (curriculum interleave, export numbering, dedup tie-breaks).
    * `idCol` must be unique and integral.
    */
  def boundedRowNumber(df: DataFrame, partCols: Seq[String], idCol: String,
                       blockSize: Long, out: String): DataFrame = {
    val keyed = df.withColumn("_brn_blk", expr(s"$idCol DIV $blockSize"))
    val blkKey = partCols :+ "_brn_blk"
    val wIn = Window.partitionBy(blkKey.map(col): _*).orderBy(idCol)
    val wBlk = Window.partitionBy(partCols.map(col): _*).orderBy("_brn_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(blkKey.map(col): _*)
      .agg(count(lit(1)).as("_brn_c"))
      .withColumn("_brn_off", coalesce(sum("_brn_c").over(wBlk), lit(0L)))
      .select((blkKey :+ "_brn_off").map(col): _*)
    keyed.withColumn("_brn_rin", row_number().over(wIn))
      .join(offs, blkKey)
      .withColumn(out, col("_brn_off") + col("_brn_rin"))
      .drop("_brn_blk", "_brn_rin", "_brn_off")
  }

  /** Inclusive global prefix sum of `valCol` in `idCol` order —
    * the same two-level scan as [[packSequences]] (per-block running
    * sum inside id DIV blockSize, plus a running offset over the
    * per-block totals), exposed as a column instead of a pack
    * assignment. `idCol` must be unique and integral, `valCol`
    * non-negative integral; the sum is exact Long arithmetic.
    */
  def boundedCumSum(df: DataFrame, idCol: String, valCol: String,
                    blockSize: Long, out: String): DataFrame = {
    val keyed = df.withColumn("_bcs_v", col(valCol).cast("long"))
      .withColumn("_bcs_blk", expr(s"$idCol DIV $blockSize"))
    val wIn = Window.partitionBy("_bcs_blk").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.orderBy("_bcs_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-block totals: rows/blockSize rows — the reduced second level
    val offs = keyed.groupBy("_bcs_blk").agg(sum("_bcs_v").as("_bcs_t"))
      .withColumn("_bcs_off", coalesce(sum("_bcs_t").over(wBlk), lit(0L)))
      .select("_bcs_blk", "_bcs_off")
    keyed.withColumn("_bcs_c", sum("_bcs_v").over(wIn))
      .join(broadcast(offs), "_bcs_blk")
      .withColumn(out, col("_bcs_off") + col("_bcs_c"))
      .drop("_bcs_blk", "_bcs_v", "_bcs_c", "_bcs_off")
  }

  /** Length-bucketed batch shaping (the padding-waste killer for
    * variable-length training batches): bucket sequences by token-
    * length band, order each bucket by (tok, id), and cut batches of
    * `batchSize` sequences. Batch position is a THREE-level scan, so
    * every window partition is bounded at any length distribution
    * (a length-concentrated corpus — tweets, titles — can put most of
    * the corpus on one exact token count, so a plain row_number over
    * (bucket, tok) would funnel it into one task):
    *
    *  1. row_number inside (_bkt, tok, id DIV blockSize) — ids are
    *     unique, so ≤ blockSize rows per partition;
    *  2. a running offset over the per-(bkt, tok) BLOCK totals —
    *     a frame already reduced by a factor of blockSize (one more
    *     level of the same scan if even that is large);
    *  3. a running offset over the per-bucket distinct-tok totals —
    *     ≤ bucketWidth rows per frame for every band but the last.
    *
    * Last-band story (deliberate): `least(tok DIV width, nBuckets-1)`
    * lumps every sequence ≥ width·(nBuckets-1) tokens into the final
    * band, so level 3's frame there is bounded by the number of
    * DISTINCT lengths in the tail, not by bucketWidth. Training
    * corpora are truncated to a max sequence length, so callers should
    * size nBuckets = ceil(max_len / bucketWidth), which restores the
    * width bound everywhere; even untruncated, the frame is distinct
    * lengths (≤ max observed length), never row count.
    *
    * Returns per-bucket batching stats: (bucket, n_batches, n_docs,
    * pad_tokens, pad_frac) where padding assumes each batch pads to
    * its own max length.
    */
  def bucketedBatches(docs: DataFrame, idCol: String, tokCol: String,
                      bucketWidth: Long, nBuckets: Int,
                      batchSize: Int, blockSize: Long = 1L << 20): DataFrame = {
    val d = docs.select(col(idCol).as("id"), col(tokCol).cast("long").as("tok"))
      .withColumn("_bkt", least(expr(s"tok DIV $bucketWidth"), lit(nBuckets - 1L)))
      .withColumn("_blk", expr(s"id DIV $blockSize"))
    // level 1: bounded by blockSize (ids unique within a block)
    val wIn = Window.partitionBy("_bkt", "tok", "_blk").orderBy("id")
    // level 2: frame = blocks touching this (bkt, tok) — rows/blockSize
    val wBlk = Window.partitionBy("_bkt", "tok").orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    // level 3: frame = distinct toks in the band — ≤ bucketWidth (see
    // last-band note above)
    val wOff = Window.partitionBy("_bkt").orderBy("tok")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkCounts = d.groupBy("_bkt", "tok", "_blk").agg(count(lit(1)).as("_c"))
    val blkOffsets = blkCounts
      .withColumn("_boff", coalesce(sum("_c").over(wBlk), lit(0L)))
      .select("_bkt", "tok", "_blk", "_boff")
    val offsets = blkCounts.groupBy("_bkt", "tok").agg(sum("_c").as("_tc"))
      .withColumn("_off", coalesce(sum("_tc").over(wOff), lit(0L)))
      .select("_bkt", "tok", "_off")
    // blkOffsets is rows/blockSize — a shuffle equi-join, NOT a
    // broadcast; offsets is one row per distinct (band, length),
    // bounded by the length range — broadcast
    d.withColumn("_rin", row_number().over(wIn))
      .join(blkOffsets, Seq("_bkt", "tok", "_blk"))
      .join(broadcast(offsets), Seq("_bkt", "tok"))
      .withColumn("batch_idx", expr(s"(_off + _boff + _rin - 1) DIV $batchSize"))
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
