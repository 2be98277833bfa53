package graft

/** Invariants of the round-11r logistic-IRLS fit the DuckDB oracle
  * can't express (Newton-step behavior, probability bounds).
  */
class Round11rOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("IRLS moves off the zero init and fits a valid base rate") {
    val r = run("stat_logistic_irls").head
    assert(r.getAs[Long]("n_docs") > 0)
    val b = Seq("beta0", "beta_len", "beta_efrac").map(r.getAs[Double](_))
    // the corpus has real length/letter-frequency signal, so three
    // Newton steps cannot leave every coefficient at the 0 init
    assert(b.exists(math.abs(_) > 1e-6), b.mkString(","))
    val fr = r.getAs[Double]("fitted_rate")
    assert(fr > 0.0 && fr < 1.0, fr.toString)
    // IRLS preserves sum(p) ~ base rate drift bounded: after 3 steps
    // the fitted rate sits between the 0.5 init and the true rate
    assert(fr <= 0.5 + 1e-6, fr.toString)
  }

  test("IRLS is reproducible run-to-run (pinned trajectory)") {
    val a = run("stat_logistic_irls").head
    val b = run("stat_logistic_irls").head
    Seq("beta0", "beta_len", "beta_efrac", "fitted_rate").foreach { c =>
      assert(a.getAs[Double](c) === b.getAs[Double](c), c)
    }
  }
}
