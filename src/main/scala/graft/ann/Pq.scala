package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Product Quantization: the memory-compression path for billion-
  * vector collections. A dim-d float vector (256 B at d=64) becomes
  * `m` sub-codes of log2(k) bits (8 B at m=8, k=16) — a 32× shrink —
  * and queries run Asymmetric Distance Computation (ADC): per-query
  * lookup tables over the codebook, then a sum of `m` table hits per
  * candidate, with exact re-ranking of the survivors.
  *
  * Everything is declarative: training reuses [[Ann.kmeansCentroids]]
  * per subspace, encoding is a broadcast-join + windowed argmin, ADC
  * is a broadcast-join + partial-agg sum. At 100 TB the encoded table
  * is what scans; full vectors are only fetched for the re-rank set.
  */
object Pq {

  final case class Config(dim: Int = 64, m: Int = 8, k: Int = 16, iters: Int = 2) {
    require(dim % m == 0, "dim must divide into m subspaces")
    val sub: Int = dim / m
  }

  /** (vec_id, m, sub array<double>) — the subspace slices. */
  private def slices(emb: DataFrame, cfg: Config): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(cfg.m - 1))).as("m"))
      .select(col("vec_id"), col("m"),
        transform(slice(col("embedding"), col("m") * cfg.sub + 1, lit(cfg.sub)),
          x => x.cast("double")).as("sub"))

  /** Train per-subspace codebooks: (m, cid, cv array<double>). */
  def train(emb: DataFrame, cfg: Config): DataFrame =
    (0 until cfg.m).map { mi =>
      val subEmb = slices(emb, cfg).filter(col("m") === mi)
        .select(col("vec_id"), col("sub").as("embedding"))
      Ann.kmeansCentroids(subEmb, cfg.k, cfg.iters).withColumn("m", lit(mi))
    }.reduce(_ unionByName _)

  /** Encode every vector to its m nearest sub-centroids:
    * (vec_id, codes array<bigint>).
    */
  def encode(emb: DataFrame, codebook: DataFrame, cfg: Config): DataFrame = {
    val w = Window.partitionBy("vec_id", "m").orderBy(col("d").asc, col("cid"))
    slices(emb, cfg)
      .join(broadcast(codebook), "m")
      .withColumn("d",
        VectorExpressions.sqNorm(col("sub")) + VectorExpressions.sqNorm(col("cv")) -
          VectorExpressions.dot(col("sub"), col("cv")) * 2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("vec_id")
      .agg(transform(sort_array(collect_list(struct(col("m"), col("cid")))),
        e => e.getField("cid")).as("codes"))
  }

  /** ADC search: approximate top-`candidates` by code-table lookups,
    * then exact re-rank to top-`k` against the full vectors.
    * `qdf` is a 1-row frame with the query vector in column `q`.
    */
  def search(emb: DataFrame, encoded: DataFrame, codebook: DataFrame,
             qdf: DataFrame, cfg: Config, candidates: Int, k: Int): DataFrame = {
    // per-query lookup table: (m, cid, part = dot(q_m, centroid))
    val table = codebook.crossJoin(broadcast(qdf))
      .select(col("m").as("tm"), col("cid").as("tc"),
        VectorExpressions.dot(
          transform(slice(col("q"), col("m") * cfg.sub + 1, lit(cfg.sub)),
            x => x.cast("double")),
          col("cv")).as("part"))
    // approx score = sum of m table hits per candidate
    val approx = encoded
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(table), col("m") === col("tm") && col("code") === col("tc"))
      .groupBy("vec_id").agg(sum("part").as("approx"))
      .orderBy(col("approx").desc, col("vec_id")).limit(candidates)
    // exact re-rank of the survivors
    rerank(approx.select("vec_id"), emb, qdf, k)
  }

  /** IVF-PQ: the FAISS-style composition — coarse k-means cells prune
    * the candidate set to `nprobe` cells, PQ/ADC ranks inside them,
    * exact re-rank finishes. At scale `cells.cid` is a partition
    * column, so the probe reads only nprobe/ncells of the index.
    */
  def ivfSearch(emb: DataFrame, cells: DataFrame, encoded: DataFrame,
                codebook: DataFrame, cents: DataFrame, qdf: DataFrame,
                cfg: Config, nprobe: Int, candidates: Int, k: Int): DataFrame = {
    val probed = encoded
      .join(cells, "vec_id")
      .join(broadcast(Ann.probeCells(cents, qdf, nprobe)), "cid")
    search(emb, probed.drop("cid"), codebook, qdf, cfg, candidates, k)
  }

  private def rerank(ids: DataFrame, emb: DataFrame, qdf: DataFrame,
                     k: Int): DataFrame = {
    import graft.functions.VectorFunctions.score
    ids.join(emb, "vec_id").crossJoin(broadcast(qdf))
      .select(col("vec_id"), score(col("embedding"), col("q")).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(k)
  }
}
