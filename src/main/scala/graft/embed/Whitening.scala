package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension embedding whitening (z-score normalization): the
  * drift-correction step before indexing or contrastive training when
  * embedding batches come from different model snapshots — without
  * it, per-dim offset drift dominates cosine.
  *
  * Scale shape: one aggregate pass builds the 64-row per-dim
  * mean/sd table, which is collapsed into a SINGLE broadcast array
  * row; the whitening itself is then a pure per-row `transform` HOF
  * over the embedding — the 100 TB corpus is scanned once and never
  * exploded or shuffled (an explode-join-regroup plan would move
  * dim× the data through a shuffle for the same answer).
  *
  * Determinism: mean/sd are ROUNDED (6dp) before use so both engines
  * whiten with bit-identical statistics; per-element z is rounded
  * again. sd = 0 dims (constant columns) whiten to 0.
  */
object Whitening {

  /** (vec_id, z = whitened array<double>) for every input row. */
  def whiten(emb: DataFrame): DataFrame = {
    val stats = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(round(avg(col("x").cast("double")), 6).as("mean"),
           round(coalesce(stddev(col("x").cast("double")), lit(0.0)), 6).as("sd"))
    // two PLAIN double arrays (not an array of structs): the per-row
    // hot loop then does two flat element_at reads per dim instead of
    // a struct field extraction — measurably cheaper at 64×N elements
    val statsArr = stats
      .agg(array_sort(collect_list(struct(col("i"), col("mean"), col("sd"))))
        .as("st"))
      .select(transform(col("st"), s => s("mean")).as("means"),
              transform(col("st"), s => s("sd")).as("sds"))
    emb.crossJoin(broadcast(statsArr))
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val sd = get(col("sds"), i)
          when(sd === 0.0, lit(0.0))
            .otherwise(round((x.cast("double") - get(col("means"), i)) / sd, 6))
        }).as("z"))
  }
}
