package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of the embedding column: per-dimension
  * min/max over the collection define a linear code, compressing
  * 4-byte floats to 1-byte codes (4× less scan I/O for ANN candidate
  * generation — the cheap sibling of product quantization, see Pq).
  *
  * The params fold into ONE broadcast row (arrays of per-dim min/max),
  * so encoding is a map-side projection; the only shuffle is the tiny
  * per-dimension min/max aggregate.
  */
object Quant {

  /** Per-dimension (mn, mx) packed as one single-row DataFrame holding
    * an index-ordered array — broadcastable next to any scan.
    */
  def params(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .agg(transform(
        sort_array(collect_list(struct(col("i"), col("mn"), col("mx")))),
        e => struct(e.getField("mn").as("mn"), e.getField("mx").as("mx"))).as("pp"))

  /** emb plus `codes: array<bigint>` of 0..255 quantization codes.
    * code = round((x - mn_i) / (mx_i - mn_i) * 255); constant
    * dimensions (mx = mn) code to 0.
    */
  def encode(emb: DataFrame): DataFrame =
    emb.crossJoin(broadcast(params(emb)))
      .withColumn("codes", transform(col("embedding"), (x, i) => {
        val p = element_at(col("pp"), i + lit(1))
        val mn = p.getField("mn"); val mx = p.getField("mx")
        when(mx === mn, lit(0L))
          .otherwise(round((x.cast("double") - mn) / (mx - mn) * 255.0, 0).cast("long"))
      }))
      .drop("pp")

  /** Residual (two-stage) quantization fidelity: subtract a coarse
    * per-`groupCol` centroid, int8-code the RESIDUAL with per-dim
    * min/max, reconstruct ĉ + r̂, and score cosine(x, reconstruction)
    * per vector. Residual ranges are much tighter than raw ranges, so
    * the same 8 bits buy finer resolution — the IVF-PQ idea applied
    * to scalar codes. Both the centroid table (|groups|·dim) and the
    * range row fold into broadcasts; encoding stays map-side.
    */
  def residualFidelity(emb: DataFrame, groupCol: String): DataFrame = {
    import graft.functions.VectorFunctions.score
    val cent = emb.select(col(groupCol), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col(groupCol), col("i")).agg(avg(col("x").cast("double")).as("m"))
      .groupBy(groupCol)
      .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
        e => e.getField("m")).as("cent"))
    val withRes = emb.join(broadcast(cent), groupCol)
      .withColumn("res", expr(
        "transform(embedding, (x, i) -> CAST(x AS DOUBLE) - element_at(cent, i + 1))"))
    val p = withRes.select(posexplode(col("res")).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("mn"), col("mx")))),
        e => struct(e.getField("mn").as("mn"), e.getField("mx").as("mx"))).as("pp"))
    withRes.crossJoin(broadcast(p))
      .withColumn("rhat", transform(col("res"), (r, i) => {
        val pe = element_at(col("pp"), i + lit(1))
        val mn = pe.getField("mn"); val mx = pe.getField("mx")
        when(mx === mn, r)
          .otherwise(mn + round((r - mn) / (mx - mn) * 255.0, 0) * (mx - mn) / 255.0)
      }))
      .withColumn("rec", expr("zip_with(cent, rhat, (c, r) -> c + r)"))
      .select(col("vec_id"), score(col("embedding"), col("rec")).as("fid"))
  }

  /** Reconstruct approximate vectors from codes (for re-rank /
    * error-bound specs): x̂ = mn_i + code * (mx_i - mn_i) / 255.
    */
  def decode(encoded: DataFrame): DataFrame =
    encoded.crossJoin(broadcast(params(encoded)))
      .withColumn("dequant", transform(col("codes"), (c, i) => {
        val p = element_at(col("pp"), i + lit(1))
        val mn = p.getField("mn"); val mx = p.getField("mx")
        when(mx === mn, mn).otherwise(mn + c.cast("double") * (mx - mn) / 255.0)
      }))
      .drop("pp")
}
