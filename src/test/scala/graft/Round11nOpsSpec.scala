package graft

/** Invariants of the round-11n additions the DuckDB oracle can't
  * express (Parseval-style energy bounds, ANCOVA nesting, Welch df
  * bounds, DP selection-probability normalization).
  */
class Round11nOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("periodogram powers are non-negative over all 14 harmonics") {
    val rows = run("ts_periodogram")
    assert(rows.length === 14)
    rows.foreach { r =>
      assert(r.getAs[Double]("power") >= 0.0, r.mkString(","))
      assert(r.getAs[Double]("period_days") > 0.0)
    }
  }

  test("ANCOVA adjusted F is non-negative and the slope is positive") {
    val r = run("stat_ancova").head
    assert(r.getAs[Long]("k_groups") >= 2)
    // more chars => more tokens, so the pooled slope must be positive
    assert(r.getAs[Double]("common_slope") > 0.0)
    assert(r.getAs[Double]("f_adj") >= 0.0)
  }

  test("Welch ANOVA agrees with classic ANOVA's group structure") {
    val r = run("stat_welch_anova").head
    assert(r.getAs[Double]("f_star") >= 0.0)
    assert(r.getAs[Long]("df1") === r.getAs[Long]("k_groups") - 1)
    val df2 = r.getAs[Double]("df2")
    // Welch df2 is bounded by the total residual df
    assert(df2 > 0.0 && df2 <= (r.getAs[Long]("n_total")
      - r.getAs[Long]("k_groups")).toDouble, df2.toString)
  }

  test("exponential mechanism releases exactly one source, probs sum to 1") {
    val rows = run("priv_exp_mech")
    assert(rows.map(_.getAs[Long]("is_released")).sum === 1L)
    val ps = rows.map(_.getAs[Double]("select_prob"))
    ps.foreach(p => assert(p > 0.0 && p <= 1.0))
    assert(math.abs(ps.sum - 1.0) < 1e-3, ps.sum.toString)
    // utility monotonicity: the biggest source has the biggest prob
    val byN = rows.maxBy(_.getAs[Long]("n"))
    assert(byN.getAs[Double]("select_prob") === ps.max)
  }
}
