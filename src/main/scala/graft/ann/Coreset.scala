package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Greedy k-center coreset selection (farthest-point traversal,
  * Gonzalez 1985): start from the smallest id, then repeatedly add
  * the point whose MINIMUM cosine distance to the already-selected
  * set is LARGEST — the classic 2-approximation to the k-center
  * cover, and the standard "pick a diverse subset" primitive for
  * training-data curation (diverse few-shot pools, eval-set seeding,
  * dedup-aware subsampling).
  *
  * Spark-first shape (the Mmr playbook): the candidate pool arrives
  * already bounded (TakeOrdered / filter upstream — only that scan
  * grows with data), packs into ONE array, and the greedy loop is a
  * pure Catalyst higher-order-function expression — no driver loop,
  * no UDF, no per-step job; O(k·C·dim) on one row.
  *
  * Determinism: distances are rounded to 6 decimals BEFORE compares
  * and the argmax tie-breaks on vec_id, so selection is engine-exact
  * (the oracle unrolls the same greedy as chained CTEs).
  */
object Coreset {

  private val candType = "array<struct<vec_id:bigint,emb:array<double>>>"
  private val bestType =
    "struct<d:double,cd:struct<vec_id:bigint,emb:array<double>>>"

  /** Select `k` centers from the (vec_id, embedding) pool `emb`.
    * Output: (rank, vec_id), rank 1..k in selection order.
    */
  def kCenter(emb: DataFrame, k: Int): DataFrame = {
    val packed = emb
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .agg(collect_list(struct(col("vec_id"), col("emb"))).as("cs"))
      .select(array_sort(col("cs"), (l, r) =>
        when(l("vec_id") < r("vec_id"), -1)
          .when(l("vec_id") > r("vec_id"), 1).otherwise(0)).as("cand"))

    def dist(a: Column, b: Column): Column =
      round(lit(1.0) - VectorFunctions.cosineSimHof(a("emb"), b("emb")), 6)

    val selected = aggregate(
      sequence(lit(1), lit(k)),
      expr(s"CAST(array() AS $candType)"),
      (sel, _) => {
        val selIds = transform(sel, s => s("vec_id"))
        val rem = filter(col("cand"), cd => !array_contains(selIds, cd("vec_id")))
        // first pick: empty selection scores every point 0.0, so the
        // vec_id tie-break selects the smallest id — same as the
        // oracle's ORDER BY vec_id LIMIT 1 seed
        val scored = transform(rem, cd => struct(
          when(size(sel) === 0, lit(0.0))
            .otherwise(array_min(transform(sel, s => dist(cd, s)))).as("d"),
          cd.as("cd")))
        val best = aggregate(scored, expr(s"CAST(null AS $bestType)"),
          (acc, x) => when(acc.isNull
              .or(x("d") > acc("d"))
              .or(x("d") === acc("d") && x("cd")("vec_id") < acc("cd")("vec_id")),
            x).otherwise(acc))
        when(best.isNull, sel).otherwise(concat(sel, array(best("cd"))))
      })

    packed.select(posexplode(selected))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.vec_id").as("vec_id"))
  }
}
