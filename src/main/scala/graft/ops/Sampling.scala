package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.md5Long

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Both operators key on a content-stable hash (md5 of the id), NOT
  * on rand(): re-running the pipeline, adding executors, or
  * reordering input files never moves a row between splits — the
  * property a 100 TB train/val/test split must have. Pure map-side
  * except the bounded per-group window in [[stratified]].
  */
object Sampling {

  /** Split bucket in [0, 100) for an id column — stable across runs. */
  def splitBucket(id: Column): Column = md5Long(id.cast("string")) % 100

  /** Assign train/val/test by hash bucket: [0,pTrain) train,
    * [pTrain,pTrain+pVal) val, rest test.
    */
  def hashSplit(df: DataFrame, idCol: String, pTrain: Int, pVal: Int): DataFrame =
    df.withColumn("split",
      when(splitBucket(col(idCol)) < pTrain, "train")
        .when(splitBucket(col(idCol)) < pTrain + pVal, "val")
        .otherwise("test"))

  /** Domain-mix reweighting: keep each row with probability
    * `rate(group)` using a salted content-stable hash as the
    * acceptance draw — the deterministic form of temperature/mixture
    * resampling over data sources when shaping a training mix.
    * Pure map-side filter (the rate is a column expression, no join,
    * no shuffle); re-runs and repartitioning keep exactly the same
    * rows.
    */
  def domainWeighted(idCol: Column, rateBp: Column): Column = {
    // md5Long is a non-negative 60-bit value, so plain % stays in
    // [0, 10000); rateBp is the keep rate in basis points of 10000
    val draw = md5Long(concat(lit("mix:"), idCol.cast("string"))) % 10000
    draw < rateBp
  }

  /** Global uniform m-sample as a mergeable bottom-k: the m rows with
    * the smallest content-stable hash win. Plans as
    * TakeOrderedAndProject — each map task keeps an m-heap and the
    * heaps merge, so the shuffle is m rows per partition: the
    * distributed equivalent of reservoir sampling, but deterministic
    * under re-runs, repartitioning, and incremental appends (a
    * rand()-based reservoir is none of those).
    */
  def bottomK(df: DataFrame, idCol: String, m: Int): DataFrame =
    df.withColumn("h", md5Long(col(idCol).cast("string")))
      .orderBy(col("h"), col(idCol))
      .limit(m)

  /** Per-group deterministic bottom-k: the k rows with the smallest
    * content-stable hash WITHIN each group — a per-stratum reservoir
    * that stays mergeable. Executes as the bounded TopK partial
    * aggregate (negated hash as score), so every map task contributes
    * at most k candidates per group and no window ever sorts a whole
    * group — the per-group twin of [[bottomK]] without the
    * row_number-over-hot-group skew shape. The hash is reduced mod
    * 1e9 so it is exactly representable in the aggregator's double
    * score; ties break on ascending id in both engines.
    */
  def bottomKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                      k: Int): DataFrame = {
    val h = md5Long(concat(lit("gs:"), col(idCol).cast("string"))) % 1000000000L
    df.select(col(groupCol), col(idCol), h.as("h"))
      .groupBy(groupCol)
      .agg(graft.ops.TopK.topk(k)(-col("h").cast("double"), col(idCol)).as("tk"))
      .select(col(groupCol), explode(col("tk")).as("e"))
      .select(col(groupCol), col("e.id").as(idCol),
        (-col("e.score")).cast("long").as("h"))
  }

  /** Deterministic weighted sample without replacement (the
    * exponential-clocks scheme, a.k.a. A-ES — Efraimidis & Spirakis,
    * IPL 2006): each row draws u ∈ (0,1] from its content-stable hash
    * and receives clock −ln(u)/w; the m smallest clocks win, giving
    * inclusion probability proportional to w without any global
    * weight total. Same mergeable bottom-k execution as [[bottomK]].
    * The clock is rounded to 6 decimals BEFORE selection (id
    * tiebreak), so the winner set is bit-identical across engines.
    * Rows with w <= 0 (or null) have zero inclusion probability in
    * A-ES and are excluded up front — also keeps the clock division
    * from tripping ANSI divide-by-zero on degenerate rows.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     m: Int): DataFrame = {
    val u = (md5Long(concat(lit("ws:"), col(idCol).cast("string"))) % 1000000L
      + 1L) / lit(1000000.0)
    df.filter(weight > lit(0))
      .withColumn("clock", round(-log(u) / weight, 6))
      .orderBy(col("clock"), col(idCol))
      .limit(m)
  }

  /** Temperature-based source rebalancing at α = 0.5 (the
    * multilingual "alpha sampling" of multilingual-pretraining
    * pipelines): downsample each source so kept counts are
    * proportional to sqrt(original counts) — the smallest source is
    * kept fully, dominant sources are squashed. α is fixed at 0.5
    * because sqrt is IEEE-correctly-rounded (bit-identical across
    * engines) where pow(x, 1/T) is not — the keep thresholds are
    * therefore exactly reproducible. Per-row decision is a
    * content-stable hash against the per-source integer threshold;
    * the threshold table is tiny and broadcasts.
    * Output: all input columns + n_orig (source size) + thr.
    */
  def temperatureRebalance(df: DataFrame, srcCol: String,
                           idCol: String): DataFrame = {
    val counts = df.groupBy(srcCol).agg(count(lit(1)).as("n_orig"))
    val minN = counts.agg(min("n_orig").as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("thr",
        floor(round(sqrt(col("n_min").cast("double") / col("n_orig")), 6)
          * 1000000).cast("long"))
      .select(col(srcCol), col("n_orig"), col("thr"))
    df.join(broadcast(rates), srcCol)
      .filter(pmod(md5Long(concat(lit("ts:"), col(idCol).cast("string"))),
        lit(1000000L)) < col("thr"))
  }

  /** At most `perGroup` rows per group, chosen by hash order (a
    * deterministic uniform draw within each group). The shuffle
    * carries only group partitions; at scale swap the window for the
    * TopK bounded aggregate if groups are huge.
    */
  def stratified(df: DataFrame, groupCol: String, idCol: String,
                 perGroup: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(md5Long(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= perGroup)
      .drop("_rn")
  }
}
