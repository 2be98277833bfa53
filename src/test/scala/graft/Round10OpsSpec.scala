package graft

import org.apache.spark.sql.Row

/** Invariants of the round-10 evaluation/monitoring operators that the
  * DuckDB oracle can't express (bounds and one-sidedness guarantees).
  */
class Round10OpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("count-min estimates are one-sided and within the eps*N bound") {
    val rows = run("ev_countmin")
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("exact")).sum
    // CMS guarantee: est <= exact + e/w * N with prob 1 - e^-d; with
    // d=4 rows over a 5-key domain the bound holds deterministically
    val eps = math.E / 64.0
    rows.foreach { r =>
      val over = r.getAs[Long]("overest")
      assert(over >= 0L, s"one-sided: ${r.mkString(",")}")
      assert(over <= (eps * n).ceil.toLong, s"eps bound: ${r.mkString(",")}")
    }
  }

  test("ROC AUC is a proper probability and the score is informative") {
    val Row(nPos: Long, nNeg: Long, auc: Double) = run("stat_roc_auc").head
    assert(nPos > 0 && nNeg > 0)
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("PSI contributions are non-negative and sum to the reported total") {
    val rows = run("stat_psi")
    assert(rows.length == 10, "full 10-bin spine, empty bins included")
    val total = rows.head.getAs[Double]("psi_total")
    rows.foreach { r =>
      assert(r.getAs[Double]("contrib") >= 0.0, "each (p-q)ln(p/q) term is >= 0")
      assert(r.getAs[Double]("psi_total") == total)
    }
    assert(math.abs(rows.map(_.getAs[Double]("contrib")).sum - total) < 1e-4)
  }

  test("Wasserstein distance is bounded by the score range") {
    val Row(nEn: Long, nOther: Long, w1: Double) = run("stat_wasserstein").head
    assert(nEn > 0 && nOther > 0)
    assert(w1 >= 0.0 && w1 <= 1.0, "quality lives in [0,1] so W1 must too")
  }

  test("NDCG is in [0,1] and relevant-in-top-10 never exceeds 10") {
    val rows = run("text_ndcg")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"row ${r.mkString(",")}")
      assert(r.getAs[Long]("n_rel_top10") <= 10L)
    }
  }

  test("TOST standard error is positive and z bounds are ordered") {
    val r = run("stat_tost").head
    assert(r.getAs[Double]("se") > 0.0)
    assert(r.getAs[Double]("z_lower") > r.getAs[Double]("z_upper"),
      "z_lower tests diff > -delta, z_upper tests diff < +delta")
  }
}
