package graft

/** Invariants of the round-11o additions the DuckDB oracle can't
  * express (exact-test tail bounds, ridge shrinkage geometry, MoM
  * identity, MLE/SE consistency).
  */
class Round11oOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("exact binomial p is a probability and covers the observed term") {
    val r = run("stat_binom_test").head
    val n = r.getAs[Long]("n_users")
    val k = r.getAs[Long]("k_arm1")
    assert(n > 0 && k >= 0 && k <= n)
    val p = r.getAs[Double]("p_two_sided")
    // the two-sided sum always includes P(X = k) itself, so p > 0;
    // and it is a probability
    assert(p > 0.0 && p <= 1.0, p.toString)
    assert(math.abs(r.getAs[Double]("p_hat") - k.toDouble / n) < 1e-3)
  }

  test("Cochran's Q is non-negative with a valid survival p") {
    val r = run("stat_cochran_q").head
    val n = r.getAs[Long]("n_users")
    Seq("n_view", "n_click", "n_purchase").foreach { c =>
      val v = r.getAs[Long](c)
      assert(v >= 0 && v <= n, s"$c=$v outside [0,$n]")
    }
    assert(r.getAs[Double]("q_stat") >= 0.0)
    val p = r.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
  }

  test("Lin's CCC is bounded by Pearson r in magnitude") {
    val r = run("stat_lin_ccc").head
    val ccc = r.getAs[Double]("lin_ccc")
    val pr = r.getAs[Double]("pearson_r")
    assert(math.abs(pr) <= 1.0 + 1e-9)
    // |CCC| <= |r|: the location/scale penalty only shrinks agreement
    // (equality iff the two items share mean and variance); rounding
    // of both at 4dp can perturb the inequality by at most 2e-4
    assert(math.abs(ccc) <= math.abs(pr) + 2e-4, s"ccc=$ccc r=$pr")
  }

  test("ridge coefficients never have a larger l2 norm than OLS") {
    val rows = run("stat_ridge_fit")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val oc = Option(r.getAs[java.lang.Double]("ols_chars"))
      val op = Option(r.getAs[java.lang.Double]("ols_vocab"))
      val rc = Option(r.getAs[java.lang.Double]("ridge_chars"))
      val rp = Option(r.getAs[java.lang.Double]("ridge_vocab"))
      for (a <- oc; b <- op; c <- rc; d <- rp) {
        val nOls = math.sqrt(a * a + b * b)
        val nRidge = math.sqrt(c * c + d * d)
        // (G+λI)^-1 shrinks every eigendirection of the PSD Gram, so
        // the coefficient norm can only go down (rounding slack 1e-4)
        assert(nRidge <= nOls + 1e-4, s"${r.getString(0)}: $nRidge > $nOls")
      }
    }
  }

  test("Gamma MoM fit satisfies mean = shape * scale") {
    val rows = run("stat_gamma_fit")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_gap_s")
      val k = r.getAs[Double]("shape_k")
      val th = r.getAs[Double]("scale_theta_s")
      assert(k > 0 && th > 0, r.mkString(","))
      // k*theta reconstructs the mean up to the 4dp/2dp rounding
      assert(math.abs(k * th - mean) / mean < 0.01,
        s"${r.getString(0)}: k*th=${k * th} mean=$mean")
    }
  }

  test("power-law alpha exceeds 1 and SE matches (alpha-1)/sqrt(n)") {
    val r = run("stat_powerlaw_alpha").head
    val n = r.getAs[Long]("n_tail")
    assert(n > 0)
    val a = r.getAs[Double]("alpha")
    val se = r.getAs[Double]("alpha_se")
    assert(a > 1.0, a.toString)
    assert(math.abs(se - (a - 1.0) / math.sqrt(n.toDouble)) < 1e-3)
  }

  test("vs-control screen covers every non-control language once") {
    val rows = run("stat_vs_control")
    val langs = rows.map(_.getString(0))
    assert(!langs.contains("en"))
    assert(langs.distinct.length === langs.length)
    rows.foreach { r =>
      val z = r.getAs[Double]("welch_z")
      val p = r.getAs[Double]("p_bonf")
      assert(p > 0.0 && p <= 1.0)
      // Bonferroni keeps direction: the mean diff and z agree in sign
      assert(r.getAs[Double]("mean_diff") * z >= 0.0, r.mkString(","))
    }
  }
}
