package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR 1998): pick k results that are RELEVANT to the query but
  * DIVERSE among themselves — greedily add the candidate maximizing
  * λ·sim(query, c) − (1−λ)·max over selected s of sim(c, s). The
  * de-facto answer to "my top-10 vector hits are ten near-copies",
  * which a dedup-free collection (reference stores every chunk
  * verbatim) produces constantly.
  *
  * Spark-first shape: the candidate pool is a bounded top-C
  * (TakeOrderedAndProject — map-side heaps, no global sort), packed
  * into ONE ≤C-element array; the greedy loop is a pure Catalyst
  * higher-order-function expression over that array (aggregate over
  * sequence(1,k), argmax by aggregate inside) — no driver loop, no
  * UDF, no per-step job. At 100 TB only the top-C scan scales with
  * data; the MMR step is O(k·C·dim) on one row.
  *
  * Determinism: query sims and pairwise sims are rounded to 6
  * decimals BEFORE comparisons and the argmax tie-breaks on vec_id,
  * so the selected set is engine-exact (oracle-determinism playbook).
  */
object Mmr {

  private val candType =
    "array<struct<vec_id:bigint,sim:double,emb:array<double>>>"
  private val bestType =
    "struct<mmr:double,cd:struct<vec_id:bigint,sim:double,emb:array<double>>>"

  /** Re-rank `emb` (vec_id, embedding) against the 1-row `q` frame
    * (column `qv`): top-`c` by cosine, then `k` MMR selections.
    * Output: (rank, vec_id, sim), rank 1..k in selection order.
    */
  def rerank(emb: DataFrame, q: DataFrame, c: Int, k: Int,
             lambda: Double): DataFrame = {
    require(k <= c, s"k=$k must be <= candidate pool c=$c")
    val cands = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"),
        VectorFunctions.score(col("embedding"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(c)

    // one ≤C-element array, sorted (sim desc, vec_id) so the HOF input
    // order is deterministic regardless of task scheduling
    val packed = cands
      .agg(collect_list(struct(col("vec_id"), col("sim"), col("emb"))).as("cs"))
      .select(array_sort(col("cs"), (l, r) =>
        when(l("sim") > r("sim"), -1).when(l("sim") < r("sim"), 1)
          .when(l("vec_id") < r("vec_id"), -1).when(l("vec_id") > r("vec_id"), 1)
          .otherwise(0)).as("cand"))

    def pairSim(a: Column, b: Column): Column =
      round(VectorFunctions.cosineSimHof(a("emb"), b("emb")), 6)

    val selected = aggregate(
      sequence(lit(1), lit(k)),
      expr(s"CAST(array() AS $candType)"),
      (sel, _) => {
        val selIds = transform(sel, s => s("vec_id"))
        val rem = filter(col("cand"), cd => !array_contains(selIds, cd("vec_id")))
        val scored = transform(rem, cd => struct(
          round(lit(lambda) * cd("sim") - lit(1.0 - lambda) *
            coalesce(array_max(transform(sel, s => pairSim(cd, s))), lit(0.0)),
            6).as("mmr"),
          cd.as("cd")))
        val best = aggregate(scored, expr(s"CAST(null AS $bestType)"),
          (acc, x) => when(acc.isNull
              .or(x("mmr") > acc("mmr"))
              .or(x("mmr") === acc("mmr") && x("cd")("vec_id") < acc("cd")("vec_id")),
            x).otherwise(acc))
        when(best.isNull, sel).otherwise(concat(sel, array(best("cd"))))
      })

    packed.select(posexplode(selected))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.vec_id").as("vec_id"), col("col.sim").as("sim"))
  }
}
