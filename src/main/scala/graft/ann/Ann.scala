package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{md5Long, score}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers:
  * - [[bruteForceTopK]]: exact cosine top-k for a query batch — the
  *   correctness baseline. Scan-side never shuffles (queries are
  *   broadcast); ranking shuffles only candidate rows per query.
  * - [[lshTopK]]: random-hyperplane LSH signatures + multiprobe
  *   (hamming ≤ 1) candidate pruning. At scale the signature is a
  *   write-time cluster column, so candidate scans are pruned I/O.
  * - IVF (see SparkEntry `ann_ivf_probe`): coarse-quantizer cells +
  *   nprobe cell search.
  *
  * Plane weights derive from md5 so the DuckDB oracle reproduces the
  * exact same signatures.
  */
object Ann {

  /** Exact cosine top-k for each query vector in `queries`
    * (qid, qv). Output: qid, vec_id, score, rnk.
    *
    * Uses the TopK partial aggregate: each map task keeps only k
    * candidates per query, so the shuffle is k rows per partition per
    * query — no global sort, no full candidate shuffle (see
    * graft.ops.TopK).
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val agg = graft.ops.TopK.topk(k)
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), score(col("embedding"), col("qv")).as("score"), col("vec_id"))
      .groupBy("qid")
      .agg(agg(col("score"), col("vec_id")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"),
              (col("pos") + 1).cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  /** Window-function formulation of [[bruteForceTopK]] — shuffles all
    * candidates; kept as the semantic reference (spec cross-checked).
    */
  def bruteForceTopKWindow(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), score(col("embedding"), col("qv")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("qid", "rnk")
  }

  /** Dense brute-force top-k for the MANY-query case (kNN graph,
    * all-pairs self-join): the query matrix broadcasts as primitive
    * arrays and each partition runs a tight cosine kernel with a
    * per-query bounded buffer, emitting ≤k partial candidates per
    * (partition, query) that the TopK aggregate then merges. Output
    * and semantics are IDENTICAL to [[bruteForceTopK]] — same cosine
    * accumulation order as the CosineSimilarity codegen (left-assoc
    * i=0..n−1 over double-promoted elements), same Spark `round(_,6)`
    * (BigDecimal.valueOf HALF_UP), same (score desc, id asc)
    * tie-break — spec-asserted row-equal. The win is constant-factor:
    * the BroadcastNestedLoopJoin materializes a row per PAIR, this
    * kernel touches primitive arrays only (measured ~10× on the
    * 2000-query oracle corpus). Same shuffle shape: k rows per
    * partition per query.
    */
  def bruteForceTopKDense(emb: DataFrame, queries: DataFrame, k: Int): DataFrame =
    denseKernelTopK(emb, queries, k, Ann.cosineRounded6)

  /** [[bruteForceTopKDense]] without the final (qid, rnk) global sort
    * — for callers that consume the edge LIST (joins/aggregates where
    * row order is irrelevant): the orderBy cost a range exchange plus
    * its sampling pass before ann_knn_graph's checkpoint (r17).
    */
  def bruteForceTopKDenseUnordered(emb: DataFrame, queries: DataFrame,
      k: Int): DataFrame =
    denseKernelTopK(emb, queries, k, Ann.cosineRounded6, ordered = false)

  /** k smallest ROUNDED-6dp euclidean distances per vector against the
    * whole table (self excluded) — the two-NN intrinsic-dimension
    * input. Same dense kernel; TopK merges on the NEGATED distance so
    * (score desc, id asc) ≡ (dist asc, id asc), matching the oracle's
    * `ORDER BY dist, ib` exactly. Output: vec_id, rnk, dist.
    */
  def nearestDistancesDense(emb: DataFrame, k: Int): DataFrame =
    denseKernelTopK(emb,
      emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), k,
      Ann.negEuclidRounded6)
      .select(col("qid").as("vec_id"), col("rnk"), (-col("score")).as("dist"))

  /** Spark `round(x, 6)` twin (BigDecimal.valueOf, HALF_UP); `+ 0.0`
    * normalizes −0.0 the way the Column form does.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  /** Exact CosineSimilarity-expression arithmetic: left-assoc i=0..n−1
    * over double-promoted elements, then Spark round to 6dp.
    */
  /** Test access to the exact kernel score fn (tiled-equality spec). */
  private[graft] def cosineRounded6Kernel: (Array[Double], Array[Double]) => Double =
    cosineRounded6

  private val cosineRounded6: (Array[Double], Array[Double]) => Double = (v, qv) => {
    val n = math.min(v.length, qv.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = v(i); val y = qv(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    round6(if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb))
  }

  /** −round(√Σ(xᵢ−yᵢ)², 6): higher = nearer, so the shared (score
    * desc, id asc) top-k comparator ranks by ascending distance.
    */
  private val negEuclidRounded6: (Array[Double], Array[Double]) => Double = (v, qv) => {
    val n = math.min(v.length, qv.length)
    var s = 0.0; var i = 0
    while (i < n) { val d = v(i) - qv(i); s += d * d; i += 1 }
    -round6(math.sqrt(s))
  }

  /** Queries per kernel tile. The query side is collected and
    * broadcast ONE TILE at a time, so driver and executor memory stay
    * flat no matter how many queries the batch ships (the r12 caveat:
    * an unbounded collect of the query side capped the kernel at
    * driver-memory-many queries). 2^16 queries × 64-d doubles ≈ 34 MB
    * per broadcast — comfortably under executor headroom while big
    * enough that every oracle corpus stays on the one-collect path.
    */
  private[graft] lazy val defaultKernelTile: Int =
    sys.env.get("SPARK_GRAFT_KERNEL_TILE") match {
      // lazy + explicit validation: a bad env value must surface as
      // this message, not as an opaque ExceptionInInitializerError
      // from the enclosing object's static init; tile <= 0 would
      // corrupt the head(tile+1) probe and the per-tile hash math
      case Some(v) =>
        val t = try v.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"SPARK_GRAFT_KERNEL_TILE must be a positive integer, got '$v'")
        }
        require(t > 0, s"SPARK_GRAFT_KERNEL_TILE must be > 0, got $t")
        t
      case None => 1 << 16
    }

  /** (id, vector) rows → (ids, end-offsets, flat values): the packed
    * shape tiles and blocks take through the shuffle. Three primitive
    * arrays serialize/deserialize as UnsafeArrayData memcpys; the
    * equivalent Array[(Long, Array[Double])] pays an element-wise
    * InternalRow walk on both sides (measured as most of the blocked
    * kernel's constant factor, r15 probe). End-offsets rather than a
    * single dim keep ragged batches exact.
    */
  private def packRows(rows: Array[(Long, Array[Double])])
      : (Array[Long], Array[Int], Array[Double]) = {
    val n = rows.length
    val ids = new Array[Long](n); val ends = new Array[Int](n)
    var total = 0; var i = 0
    while (i < n) { ids(i) = rows(i)._1; total += rows(i)._2.length; ends(i) = total; i += 1 }
    val flat = new Array[Double](total)
    i = 0; var off = 0
    while (i < n) {
      val v = rows(i)._2
      System.arraycopy(v, 0, flat, off, v.length); off += v.length; i += 1
    }
    (ids, ends, flat)
  }

  /** Inverse of [[packRows]]'s vector part: one slice per vector. */
  private def unpackVecs(ends: Array[Int], flat: Array[Double]): Array[Array[Double]] = {
    val out = new Array[Array[Double]](ends.length)
    var i = 0; var start = 0
    while (i < ends.length) {
      out(i) = java.util.Arrays.copyOfRange(flat, start, ends(i))
      start = ends(i); i += 1
    }
    out
  }

  /** Exact max vector length over a column — the ONE dim probe the
    * kernels share. A distributed agg rather than head(1): the r15
    * ADVICE case (a dim-0 first row on a batch whose later rows are
    * wide) would make a head-row probe understate the dim and
    * reinstate the unbounded driver collect the cap exists to stop.
    */
  private def maxDim(df: DataFrame, c: String): Int =
    df.filter(col(c).isNotNull)
      .agg(coalesce(max(size(col(c))), lit(0))).head.getInt(0)

  private[graft] def denseKernelTopK(emb: DataFrame, queries: DataFrame, k: Int,
      scoreFn: (Array[Double], Array[Double]) => Double,
      tile: Int = defaultKernelTile,
      dimHint: Option[Int] = None,
      ordered: Boolean = true): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // null vectors (failed embed jobs leave them behind) can't rank —
    // drop them on both sides, as the BNLJ's null-propagating cosine
    // effectively does
    val qDs = queries.filter(col("qv").isNotNull)
      .select(col("qid").cast("long").as("_1"),
              col("qv").cast("array<double>").as("_2"))
      .as[(Long, Array[Double])]
    val embP = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long").as("_1"),
              col("embedding").cast("array<double>").as("_2"))
      // the oracle corpora arrive as a single parquet split — spread
      // the kernel across cores (kernel output is partition-invariant)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Double])]
    val agg = graft.ops.TopK.topk(k)
    // one tile's kernel pass: broadcast its query block, emit ≤k
    // partial candidates per (partition, query), merge with TopK
    def tileTop(q: Array[(Long, Array[Double])])
        : (DataFrame, org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Double])]]) = {
      val bq = spark.sparkContext.broadcast(q)
      val partials = embP.mapPartitions { rows =>
        val qs = bq.value
        val nq = qs.length
        val bufS = Array.fill(nq)(new Array[Double](k))
        val bufI = Array.fill(nq)(new Array[Long](k))
        val bufN = new Array[Int](nq)
        def insert(qi: Int, s: Double, id: Long): Unit = {
          val n = bufN(qi); val ss = bufS(qi); val ii = bufI(qi)
          var pos = 0
          while (pos < n && (ss(pos) > s || (ss(pos) == s && ii(pos) < id))) pos += 1
          if (pos >= k) return
          val m = math.min(n + 1, k)
          var j = m - 1
          while (j > pos) { ss(j) = ss(j - 1); ii(j) = ii(j - 1); j -= 1 }
          ss(pos) = s; ii(pos) = id; bufN(qi) = m
        }
        rows.foreach { case (vid, v) =>
          var qi = 0
          while (qi < nq) {
            val (qid, qv) = qs(qi)
            if (qid != vid) insert(qi, scoreFn(v, qv), vid)
            qi += 1
          }
        }
        (0 until nq).iterator.flatMap { qi =>
          (0 until bufN(qi)).iterator.map(j => (qs(qi)._1, bufS(qi)(j), bufI(qi)(j)))
        }
      }.toDF("qid", "score", "vec_id")
      (partials.groupBy("qid").agg(agg(col("score"), col("vec_id")).as("top")), bq)
    }
    // fast path: the whole batch fits one tile (every oracle corpus
    // does) — head(cap+1) both fetches it and detects overflow. One
    // broadcast, ONE corpus scan — optimal for bounded query batches.
    // The bound is DIM-AWARE (fastPathCap): the raw tile default
    // (2^16) sized the driver collect for ~64-d queries; at the
    // reference's 1024-d it would materialize 512 MB on the driver
    // and broadcast it. ScaleRound15Ops measured the capped
    // dispatch: a 32 MB broadcast tile is the fastest path at
    // 1024-d, so the 64 MB cap keeps the fast path wherever it wins
    // while bounding driver memory. The dim comes from `dimHint`
    // when the caller already knows it (streaming serve probes the
    // collection ONCE at stream start instead of twice per
    // micro-batch — r15 ADVICE) and from one exact [[maxDim]] job
    // otherwise.
    // a caller's dimHint is a claim, not a measurement (streaming
    // serve probes the COLLECTION at stream start, not this batch) —
    // validate it against a small pilot before sizing the fastCap
    // collect by it, else an understated hint inflates the 64 MB
    // driver cap by trueDim/hintDim during the head(cap+1) fetch
    // itself (r16 ADVICE). The pilot is a bounded 64-row fetch; the
    // post-collect obsDim re-check below stays as the final guard.
    val qDim = dimHint match {
      case Some(h) =>
        val pilot = qDs.head(64)
        val pd = if (pilot.isEmpty) 0 else pilot.iterator.map(_._2.length).max
        math.max(h, pd)
      case None => maxDim(queries, "qv")
    }
    val fastCap = fastPathCap(qDim, tile)
    val first = qDs.head(fastCap + 1)
    // belt-and-braces against an understated dimHint: if the fetched
    // rows carry vectors wider than declared, re-derive the cap from
    // what was actually seen so routing (and blockedTop's packing
    // caps) reflect the real row size
    val obsDim = if (first.isEmpty) 0 else first.iterator.map(_._2.length).max
    val effCap = if (obsDim > qDim) fastPathCap(obsDim, tile) else fastCap
    val topPerQid: DataFrame =
      if (first.length <= effCap) tileTop(first.sortBy(_._1))._1
      else
        // many-query batch: the 2D block-matrix kernel — one corpus
        // scan regardless of tile count (the r13 tiled loop re-scanned
        // the corpus once per query tile). The head() probe above is
        // the only extra query-side pass the overflow case pays.
        blockedTop(emb, queries, k, scoreFn, tile,
          dimHint = Some(math.max(qDim, obsDim)))
    val out = topPerQid
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"),
              (col("pos") + 1).cast("long").as("rnk"))
    if (ordered) out.orderBy("qid", "rnk") else out
  }

  /** Corpus rows per kernel block on the blocked path: one block is
    * one side of a block×tile kernel cell, held as primitive arrays
    * in a single task (8192 rows × 64-d doubles ≈ 4 MB).
    */
  private[graft] val defaultKernelBlockRows: Int = 1 << 13

  /** Dim-aware packing bounds for the blocked kernel: one tile row
    * materializes tile×dim doubles in a single shuffle row / task,
    * one block row blockRows×dim. The defaults are sized for ~64-d
    * embeddings; at 1024-d they would make half-GB rows, so cap a
    * tile row at ~32 MB and a block row at ~16 MB regardless of what
    * the caller (or the env default) asks for. At the reference's
    * 1024-d this engages as (tileEff=4096, blockRowsEff=2048) —
    * measured by ScaleRound15Ops (scan count stays ≡1, wall-clock
    * linear in total scores; see SURVEY §6).
    */
  /** Dim-aware bound on the one-broadcast fast path: the whole query
    * batch is collected to the driver and broadcast, so the bound
    * caps DRIVER memory (and broadcast size) at ~64 MB of packed
    * query doubles — 2× the 32 MB tile measured fastest at 1024-d
    * (ScaleRound15Ops), 8192 queries at the reference dim. An
    * explicitly smaller caller tile always wins (specs force
    * multi-tile with tile=4).
    */
  /** Fast-path driver-memory bound in MB (default 64). Deployment
    * knob for the dispatch-crossover tradeoff (SURVEY §5 round-17):
    * on a big-driver cluster, raising this moves the bounded ~1.3×
    * blocked-penalty region out of reach of realistic batches; the
    * 64 MB default is the conservative local[32] floor.
    */
  private[graft] lazy val fastPathMb: Long =
    sys.env.get("SPARK_GRAFT_FASTPATH_MB") match {
      case Some(v) =>
        val m = try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"SPARK_GRAFT_FASTPATH_MB must be a positive integer, got '$v'")
        }
        require(m > 0, s"SPARK_GRAFT_FASTPATH_MB must be > 0, got $m")
        m
      case None => 64L
    }

  private[graft] def fastPathCap(dim: Int, tile: Int): Int =
    if (dim <= 0) tile
    else math.max(1,
      math.min(tile.toLong, (fastPathMb << 20) / (dim * 8)).toInt)

  private[graft] def kernelPackingCaps(dim: Int, tile: Int,
      blockRows: Int): (Int, Int) = {
    val tileEff =
      if (dim <= 0) tile
      else math.max(1, math.min(tile, (32 << 20) / (dim * 8)))
    val blockRowsEff =
      if (dim <= 0) blockRows
      else math.max(1, math.min(blockRows, (16 << 20) / (dim * 8)))
    (tileEff, blockRowsEff)
  }

  /** [[bruteForceTopK]] through the 2D BLOCK-MATRIX kernel — exact
    * cosine top-k whose corpus scan count is independent of the
    * query-batch size (the huge-batch × huge-corpus path). Output and
    * semantics identical to [[bruteForceTopK]]: same per-score
    * rounding, same (score desc, id asc) tie-break — which is what
    * lets the DuckDB oracle adjudicate this kernel directly
    * (`ann_blocked_topk` forces multiple tiles AND blocks).
    */
  def bruteForceTopKBlocked(emb: DataFrame, queries: DataFrame, k: Int,
      tile: Int = defaultKernelTile,
      blockRows: Int = defaultKernelBlockRows): DataFrame =
    blockedTop(emb, queries, k, cosineRounded6, tile, blockRows)
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"),
              (col("pos") + 1).cast("long").as("rnk"))
      .orderBy("qid", "rnk")

  /** 2D block-matrix dense kernel (SUMMA-style): the huge-query-batch
    * × huge-corpus case where neither side fits one broadcast.
    *
    * - The CORPUS is scanned ONCE: each partition is chunked into
    *   blocks of ≤`blockRows` rows; blocks replicate to the query
    *   tiles through the SHUFFLE, never by re-reading the source (the
    *   r13 tiled loop paid query_tiles × corpus scans — at 100 TB
    *   that multiplier is the whole job).
    * - The QUERY side never touches the driver: rows hash into
    *   ⌈nq/tile⌉ tiles with a distributed groupByKey (the r13 loop
    *   collected each tile to the driver, which also made the result
    *   sensitive to a non-deterministic query input; here each qid
    *   lands in exactly one tile by hash, deterministically).
    * - Work spreads over a 2D grid: the cell key is (tile, slot)
    *   where slot spreads a tile's blocks over `nSlots` reducers —
    *   without the salt every block for a tile would land on ONE
    *   reducer and serialize the kernel. Tiles replicate nSlots ways,
    *   blocks nTiles ways: the classic 2D-matmul replication, volume
    *   corpus×nTiles + queries×nSlots, moved once through the shuffle.
    * - The kernel is a CO-PARTITIONED ZIP, not a join (r15 ask 1):
    *   both sides hash-repartition on the cell key with the same
    *   explicit cell count, and one function per partition
    *   deserializes each tile replica ONCE, then STREAMS that cell's
    *   blocks through it. The r14 joinWith formulation re-materialized
    *   the packed tile row (32 MB at 1024-d) for EVERY joined
    *   block×tile pair — at nTiles=1 that re-deserialization was a
    *   measured 3.4× constant factor over the broadcast path on
    *   identical FLOPs. A runtime alignment assert (Spark's own
    *   Murmur3 long hash pmod nCells vs the task's partition id, both
    *   sides) turns any future co-partitioning drift into a loud
    *   failure instead of silently dropped candidates.
    * - Partial-TopK on BOTH axes: each CELL emits ≤k candidates per
    *   query — merged across all of the cell's blocks in-task, so the
    *   final shuffle carries nSlots×k rows per query instead of the
    *   r14 nBlocks×k; the TopK aggregate merges cells per qid. The
    *   union of per-cell top-k always contains the global top-k and
    *   the merge is order-invariant with the shared (score desc, id
    *   asc) tie-break, so output is row-equal to the one-broadcast
    *   path — spec-pinned at adversarially small tile/block sizes
    *   (AnnSpec).
    *
    * This is the exact-scoring fallback; the LSH/IVF partition-pruned
    * paths remain the first choice at corpus scale.
    */
  private[graft] def blockedTop(emb: DataFrame, queries: DataFrame, k: Int,
      scoreFn: (Array[Double], Array[Double]) => Double,
      tile: Int = defaultKernelTile,
      blockRows: Int = defaultKernelBlockRows,
      nSlotsOverride: Option[Int] = None,
      dimHint: Option[Int] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qDs = queries.filter(col("qv").isNotNull)
      .select(col("qid").cast("long").as("_1"),
              col("qv").cast("array<double>").as("_2"))
      .as[(Long, Array[Double])]
    // ONE query-side probe job: count (for nTiles) and exact max dim
    // (for the packing caps) from the same agg — a head-row dim probe
    // would understate it on a batch whose first row is narrow (r15
    // ADVICE). A caller's dimHint can only widen the bound.
    val probe = queries.filter(col("qv").isNotNull)
      .agg(count(lit(1)), coalesce(max(size(col("qv"))), lit(0))).head
    val nq = probe.getLong(0)
    val dim = math.max(dimHint.getOrElse(0), probe.getInt(1))
    val (tileEff, blockRowsEff) = kernelPackingCaps(dim, tile, blockRows)
    val nTiles = math.max(1L, (nq + tileEff - 1) / tileEff)
    // nSlots sets the grid's second axis — the SUMMA replication
    // volume is corpus×nTiles + queries×nSlots, so more slots buy
    // kernel parallelism with query-side (small side) replication.
    // Default: one slot per core. Overridable for the nSlots
    // sensitivity probe (ScaleRound15Ops) and for clusters where the
    // query batch is so wide that queries×nSlots dominates (the §7
    // p^1/2-grid note).
    val nSlots = nSlotsOverride
      .getOrElse(math.max(1, spark.sparkContext.defaultParallelism)).toLong
    // EXACTLY one kernel task per block×tile cell, FORCED by an
    // explicit-N hash repartition of both kernel inputs on the cell
    // key. The explicit N defeats two strandings: (a) the tile table
    // has only nTiles non-empty partitions after groupByKey (the
    // slot fan-out is map-side, so it never re-spreads), and AQE
    // coalesces by shuffled BYTES — a few MB of packed tiles that
    // carry minutes of per-cell compute read as "one partition" to
    // it (REPARTITION_BY_NUM is the one shuffle origin AQE never
    // coalesces); (b) with nCells == #keys, RANDOM key hashing piles
    // 2–3 cells onto one reducer while others sit empty, and the
    // kernel's wall-clock is max-cells-per-task × per-cell time (the
    // r16 probe measured this collision skew as the whole remaining
    // blocked-vs-broadcast constant factor at nTiles=1 — serde and
    // FLOPs were already at parity). So each logical cell gets a
    // SEARCHED key that Spark's own Murmur3-pmod places in its own
    // dedicated partition: perfect 1-cell-per-task placement through
    // the stock Tungsten shuffle.
    // practical ceiling 2^20 (not the 2^24 the key search could
    // cover): the key table is 8 bytes/cell and rides a BROADCAST to
    // every kernel task, and >1M cells means >1M tasks of a kernel
    // whose whole point is minutes-per-cell compute — a grid that
    // size is a mis-parameterization, not a workload (r16 ADVICE)
    require(nTiles * nSlots <= (1L << 20),
      s"blocked kernel grid $nTiles tiles x $nSlots slots exceeds 2^20 cells — " +
        "pass a smaller nSlotsOverride (the SUMMA p^1/2-grid note, SURVEY §7)")
    val nCells = (nTiles * nSlots).toInt
    // cellKeys(c) = a long whose Murmur3(seed 42) pmod nCells == c;
    // coupon-collector search, ~nCells·ln(nCells) cheap hashes
    val cellKeys: Array[Long] = {
      val out = new Array[Long](nCells)
      val seen = new Array[Boolean](nCells)
      var found = 0; var cand = 0L
      val bound = math.max(1L << 20, nCells.toLong * 1000L)
      while (found < nCells && cand < bound) {
        val p = Math.floorMod(
          org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(cand, 42), nCells)
        if (!seen(p)) { seen(p) = true; out(p) = cand; found += 1 }
        cand += 1
      }
      require(found == nCells,
        s"cell-key search did not cover $nCells partitions within $bound candidates")
      out
    }
    // ship the key table as a broadcast, not a closure capture: both
    // flatMaps below reference it, and a captured Array[Long] would
    // ride inside each serialized task binary (8 MB at the 2^20
    // ceiling, once per task) instead of once per executor (r16
    // ADVICE)
    val bcCellKeys = spark.sparkContext.broadcast(cellKeys)
    // Tiles and blocks ship through the shuffle as PACKED PRIMITIVE
    // ARRAYS (ids, end-offsets, flat values) rather than
    // Array[(Long, Array[Double])]: the nested-tuple encoder walks
    // every element through an InternalRow (the r15 probe measured
    // that serde, not the kernel, as most of the blocked path's
    // 3.4× constant factor at nTiles=1 — a 32 MB tile replica ×
    // nSlots is half a GB of element-wise encoding), while primitive
    // arrays take UnsafeArrayData's fromPrimitiveArray memcpy on
    // both serialize and deserialize.
    // (tile, slot) -> packed query tile, replicated across the slots
    val qTiles = qDs
      .groupByKey { case (qid, _) =>
        Math.floorMod(scala.util.hashing.byteswap64(qid), nTiles) }
      .mapGroups { (t, it) =>
        val (ids, ends, flat) = packRows(it.toArray.sortBy(_._1))
        (t, ids, ends, flat)
      }
      .flatMap { case (t, ids, ends, flat) =>
        (0L until nSlots).iterator.map(sl =>
          (bcCellKeys.value((t * nSlots + sl).toInt), ids, ends, flat)) }
      .repartition(nCells, col("_1"))
    // (tile, slot) -> corpus block: ONE pass over the corpus; the
    // slot comes from the task partition id so a partition's blocks
    // spread deterministically without a second hash of the data
    val blocks = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long").as("_1"),
              col("embedding").cast("array<double>").as("_2"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val sl = org.apache.spark.TaskContext.getPartitionId().toLong % nSlots
        it.grouped(blockRowsEff).zipWithIndex.map { case (b, i) =>
          val (ids, ends, flat) = packRows(b.toArray)
          ((i.toLong + sl) % nSlots, ids, ends, flat)
        }
      }
      .flatMap { case (sl, ids, ends, flat) =>
        (0L until nTiles).iterator.map(t =>
          (bcCellKeys.value((t * nSlots + sl).toInt), ids, ends, flat)) }
      .repartition(nCells, col("_1"))
    // Both sides carry the SAME HashPartitioning (cell key, nCells) —
    // partition i of qTiles and partition i of blocks hold exactly
    // the same cell keys, so the kernel is a partition ZIP: per
    // partition, deserialize each tile replica once into primitive
    // arrays, then stream the blocks through it. No join, no
    // sort-merge of 32 MB rows, no per-pair tile re-deserialization.
    val partials = qTiles.rdd.zipPartitions(blocks.rdd) { (tileIt, blockIt) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      def assertAligned(cell: Long, side: String): Unit = {
        // Spark routes a bigint repartition column through
        // Murmur3Hash(seed 42) pmod numPartitions; recompute it here
        // so a co-partitioning drift (a future Spark changing the
        // hash, an AQE rewrite of the exchange) fails loudly instead
        // of silently dropping candidates.
        val expect = Math.floorMod(
          org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(cell, 42), nCells)
        require(expect == pid,
          s"blocked kernel $side cell $cell landed in partition $pid, " +
            s"expected $expect of $nCells — co-partitioning broke")
      }
      // one bounded top-k state per cell in this partition (≈1 by
      // construction: nCells ≥ nTiles×nSlots hash-spread)
      val cells = new scala.collection.mutable.LongMap[
        (Array[Long], Array[Array[Double]], Array[Array[Double]],
         Array[Array[Long]], Array[Int])]()
      tileIt.foreach { case (cell, qids, ends, flat) =>
        assertAligned(cell, "tile")
        cells.update(cell, (qids, unpackVecs(ends, flat),
          Array.fill(qids.length)(new Array[Double](k)),
          Array.fill(qids.length)(new Array[Long](k)),
          new Array[Int](qids.length)))
      }
      blockIt.foreach { case (cell, vids, ends, flat) =>
        assertAligned(cell, "block")
        // a cell with no tile state is an EMPTY tile bucket (blocks
        // replicate to every tile index; a small batch can leave some
        // hash buckets without queries) — nothing to score
        cells.get(cell).foreach { case (qids, qvs, bufS, bufI, bufN) =>
          val nqT = qids.length
          def insert(qi: Int, s: Double, id: Long): Unit = {
            val n = bufN(qi); val ss = bufS(qi); val ii = bufI(qi)
            var pos = 0
            while (pos < n && (ss(pos) > s || (ss(pos) == s && ii(pos) < id))) pos += 1
            if (pos >= k) return
            val m = math.min(n + 1, k)
            var j = m - 1
            while (j > pos) { ss(j) = ss(j - 1); ii(j) = ii(j - 1); j -= 1 }
            ss(pos) = s; ii(pos) = id; bufN(qi) = m
          }
          var r = 0; var start = 0
          while (r < vids.length) {
            val end = ends(r); val vid = vids(r)
            val v = java.util.Arrays.copyOfRange(flat, start, end)
            var qi = 0
            while (qi < nqT) {
              if (qids(qi) != vid) insert(qi, scoreFn(v, qvs(qi)), vid)
              qi += 1
            }
            start = end; r += 1
          }
        }
      }
      cells.iterator.flatMap { case (_, (qids, _, bufS, bufI, bufN)) =>
        qids.indices.iterator.flatMap { qi =>
          (0 until bufN(qi)).iterator.map(j => (qids(qi), bufS(qi)(j), bufI(qi)(j)))
        }
      }
    }
    partials
      .toDF("qid", "score", "vec_id")
      .groupBy("qid")
      .agg(graft.ops.TopK.topk(k)(col("score"), col("vec_id")).as("top"))
  }

  /** nPlanes deterministic random hyperplanes: (p, w: array<double>),
    * w[d] = (md5Long("pl_p_d") mod 2001 − 1000)/1000 ∈ [−1, 1].
    */
  def planes(s: SparkSession, nPlanes: Int, dim: Int): DataFrame =
    s.range(0, nPlanes).select(col("id").as("p"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => (md5Long(concat_ws("_", lit("pl"), col("id"), d)) % 2001 - lit(1000)) / 1000.0)
        .as("w"))

  /** LSH signature per vector: bit p of `bucket` = sign of the
    * projection onto plane p. One broadcast-join + one groupBy.
    */
  def signatures(emb: DataFrame, planesDf: DataFrame): DataFrame = {
    val proj = aggregate(
      zip_with(col("embedding"), col("w"), (x, y) => x.cast("double") * y),
      lit(0.0), (a, v) => a + v)
    emb.crossJoin(broadcast(planesDf))
      .select(col("vec_id"), col("p"), proj.as("proj"))
      .groupBy("vec_id")
      .agg(sum(when(col("proj") > 0, pow(lit(2.0), col("p"))).otherwise(0.0))
        .cast("long").as("bucket"))
  }

  /** The same md5-derived plane weights as [[planes]], computed on the
    * driver (they are constants — nPlanes×dim doubles, independent of
    * the data), so the signature can be a map-side column.
    */
  def planeWeights(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    def md5Long60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    Array.tabulate(nPlanes)(p => Array.tabulate(dim)(d =>
      (md5Long60(s"pl_${p}_$d") % 2001 - 1000) / 1000.0))
  }

  /** Map-side formulation of [[signatures]]: the bucket is a pure
    * projection (one codegen'd dot product per plane against a literal
    * weight array) — zero shuffles, zero joins, and no per-vector
    * signature table to equi-join back. Identical values
    * (spec-asserted): both accumulate the projection in double,
    * left-to-right.
    */
  def bucketCol(emb: Column, nPlanes: Int, dim: Int): Column =
    planeWeights(nPlanes, dim).zipWithIndex.map { case (w, p) =>
      when(graft.functions.VectorExpressions.dot(emb, typedLit(w.toSeq)) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** emb plus its `bucket` column, computed map-side. */
  def withBucket(emb: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    emb.withColumn("bucket", bucketCol(col("embedding"), nPlanes, dim))

  /** Deterministic Lloyd's k-means over the embedding column — the
    * real coarse quantizer behind IVF (ann_ivf_probe uses fixed seed
    * vectors; this refines them). Classic Spark pattern: broadcast
    * centroids, one groupBy per iteration, k×dim doubles of driver
    * state (like MLlib's implementation).
    * Returns (cid, cv: array<double>).
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val s = emb.sparkSession
    var cents = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        val arr = r.getSeq[Any](1).map {
          case f: java.lang.Float  => f.toDouble
          case d: java.lang.Double => d.doubleValue
        }.toArray
        (i.toLong, arr)
      }
    val dim = cents.head._2.length
    (0 until iters).foreach { _ =>
      import s.implicits._
      val cdf = broadcast(cents.toSeq.toDF("cid", "cv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("d").asc, col("cid"))
      val sums = (0 until dim).map(i =>
        sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i"))
      val agg = emb.crossJoin(cdf)
        .withColumn("d", graft.functions.VectorExpressions.sqNorm(col("embedding")) +
          graft.functions.VectorExpressions.sqNorm(col("cv")) -
          graft.functions.VectorExpressions.dot(col("embedding"), col("cv")) * 2)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      cents = agg.map { r =>
        val n = r.getAs[Long]("n").toDouble
        val cid = r.getAs[Long]("cid")
        (cid, (0 until dim).map(i => r.getAs[Double](s"s$i") / n).toArray)
      }.sortBy(_._1)
    }
    import s.implicits._
    cents.toSeq.toDF("cid", "cv")
  }

  /** Assign each vector to its nearest centroid: (vec_id, cid).
    * Broadcast centroids + windowed argmin — one narrow pass.
    */
  def assignCells(emb: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("d").asc, col("cid"))
    emb.crossJoin(broadcast(cents))
      .withColumn("d",
        graft.functions.VectorExpressions.sqNorm(col("embedding")) +
          graft.functions.VectorExpressions.sqNorm(col("cv")) -
          graft.functions.VectorExpressions.dot(col("embedding"), col("cv")) * 2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
  }

  /** The query's `nprobe` nearest cells: (cid). */
  def probeCells(cents: DataFrame, qdf: DataFrame, nprobe: Int): DataFrame =
    cents.crossJoin(broadcast(qdf))
      .withColumn("d",
        graft.functions.VectorExpressions.sqNorm(col("q")) +
          graft.functions.VectorExpressions.sqNorm(col("cv")) -
          graft.functions.VectorExpressions.dot(col("q"), col("cv")) * 2)
      .orderBy(col("d").asc, col("cid")).limit(nprobe)
      .select(col("cid"))

  /** Multiprobe LSH top-k: candidates share a signature bucket with
    * the query up to hamming distance `probeDist`; exact cosine
    * rescoring of candidates only.
    */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], nPlanes: Int, dim: Int,
              probeDist: Int, k: Int): DataFrame = {
    // buckets are a map-side projection (bucketCol) and ranking is the
    // map-side partial TopK aggregate, so the only shuffles are the
    // tiny query broadcast and k rows per partition per query.
    val withSig = withBucket(emb, nPlanes, dim)
    val q = withSig.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
              col("bucket").as("qb"))
    val agg = graft.ops.TopK.topk(k)
    withSig.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid") &&
              expr("bit_count(bucket ^ qb)") <= probeDist)
      .select(col("qid"), score(col("embedding"), col("qv")).as("score"), col("vec_id"))
      .groupBy("qid")
      .agg(agg(col("score"), col("vec_id")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.score").as("score"),
              (col("pos") + 1).cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  /** Leave-one-out 1-NN for EVERY vector via LSH candidate pruning:
    * multiprobe (hamming ≤ 1) bucket equi-join generates candidates,
    * exact cosine rescoring picks the nearest, and vectors whose probe
    * neighborhood is empty fall back to an exact broadcast pass — so
    * every vector gets an answer. Compute is O(Σ bucket-pair sizes),
    * not n²: the all-queries variant of the sampled
    * [[graft.SparkEntry emb_knn_accuracy]] shape. Approximate by
    * design (the true NN can hash > 1 bit away); agreement with the
    * exact answer is spec-measured on the test corpus.
    * Returns (va, la, vb, lb, ns) — query, its label, nearest
    * neighbour, its label, 1 − cosine.
    */
  def knn1Lsh(emb: DataFrame, nPlanes: Int, dim: Int): DataFrame = {
    val withSig = withBucket(emb, nPlanes, dim)
    val flips = lit(0L) +: (0 until nPlanes).map(p => lit(1L << p))
    val probes = withSig.select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("label").as("la"), col("bucket"),
        explode(array(flips: _*)).as("flip"))
      .select(col("va"), col("ea"), col("la"),
              col("bucket").bitwiseXOR(col("flip")).as("pb"))
    val targets = withSig.select(col("vec_id").as("vb"),
      col("embedding").as("eb"), col("label").as("lb"), col("bucket").as("pb"))
    val nn = probes.join(targets, Seq("pb"))
      .filter(col("va") =!= col("vb"))
      .select(col("va"), col("la"),
        (lit(1.0) - score(col("ea"), col("eb"))).as("ns"), col("vb"), col("lb"))
      .groupBy("va", "la")
      .agg(min(struct(col("ns"), col("vb"), col("lb"))).as("m"))
    // exact fallback for vectors alone in their whole probe set
    val missed = emb.join(nn.select(col("va").as("vec_id")), Seq("vec_id"), "left_anti")
      .select(col("vec_id").as("va"), col("embedding").as("ea"),
              col("label").as("la"))
    val corpus = emb.select(col("vec_id").as("vb"),
      col("embedding").as("eb"), col("label").as("lb"))
    val rescue = corpus.crossJoin(broadcast(missed))
      .filter(col("va") =!= col("vb"))
      .select(col("va"), col("la"),
        (lit(1.0) - score(col("ea"), col("eb"))).as("ns"), col("vb"), col("lb"))
      .groupBy("va", "la")
      .agg(min(struct(col("ns"), col("vb"), col("lb"))).as("m"))
    nn.unionByName(rescue)
      .select(col("va"), col("la"), col("m.vb").as("vb"),
              col("m.lb").as("lb"), col("m.ns").as("ns"))
      .orderBy("va")
  }

  /** IVF probe, map-side: seed centroids (vec_id < nCents) are folded
    * into ONE broadcast row holding the centroid array; nearest-cell
    * assignment is then a per-row array_sort over that array — no
    * per-vector window shuffle, no row_number over the full collection.
    * The sort key (1−score, cid) reproduces `ORDER BY score DESC, cid`
    * exactly (score ∈ [−1,1] rounded, so 1−score is monotone and never
    * −0.0). Final top-k is TakeOrderedAndProject.
    */
  def ivfProbe(emb: DataFrame, nCents: Int, qid: Long, nprobe: Int,
               k: Int): DataFrame = {
    def nearestKey(v: Column) = element_at(array_sort(transform(col("cents"),
      e => struct((lit(1.0) - score(v, e.getField("cv"))).as("ns"),
                  e.getField("cid").as("cid")))), 1)
    val centsRow = emb.filter(col("vec_id") < nCents)
      .agg(sort_array(collect_list(
        struct(col("vec_id").as("cid"), col("embedding").as("cv")))).as("cents"))
    // the query's nprobe nearest cells, as one broadcast row
    val q = emb.filter(col("vec_id") === qid)
      .select(col("embedding").as("qv"))
      .crossJoin(broadcast(centsRow))
      .select(col("qv"), transform(
        slice(array_sort(transform(col("cents"),
          e => struct((lit(1.0) - score(col("qv"), e.getField("cv"))).as("ns"),
                      e.getField("cid").as("cid")))), 1, nprobe),
        x => x.getField("cid")).as("pcids"))
    val w = Window.orderBy(col("score").desc, col("vec_id"))
    emb.filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(centsRow))
      .select(col("vec_id"), col("embedding"),
              nearestKey(col("embedding")).getField("cid").as("cid"))
      .crossJoin(broadcast(q))
      .filter(array_contains(col("pcids"), col("cid")))
      .select(col("vec_id"), col("cid"), score(col("embedding"), col("qv")).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .orderBy("rnk")
  }
}
