package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR
  * 2009) of a lexical and a vector ranking — the standard way a
  * vector DB combines BM25 with embedding search without score
  * calibration.
  *
  * Both inputs are already bounded top-k lists (tens of rows), so the
  * global rank windows here run over bounded frames — the
  * TakeOrdered-then-window pattern, never a full-corpus sort.
  */
object Hybrid {

  /** Fuse two bounded ranked lists on `idCol`; ranks are assigned by
    * (scoreCol desc, idCol) within each list, fused as
    * Σ 1/(k + rank), missing-list entries contribute 0.
    */
  def rrf(lex: DataFrame, vec: DataFrame, idCol: String,
          lexScore: String, vecScore: String, k: Int, topK: Int): DataFrame = {
    def ranked(df: DataFrame, scoreCol: String, as: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol), row_number().over(w).as(as))
    }
    val lr = ranked(lex, lexScore, "lr")
    val vr = ranked(vec, vecScore, "vr")
    lr.join(vr, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(
          coalesce(lit(1.0) / (lit(k) + col("lr")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("vr")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
