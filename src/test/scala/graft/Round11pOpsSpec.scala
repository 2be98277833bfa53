package graft

/** Invariants of the round-11p additions the DuckDB oracle can't
  * express (Parseval-style energy accounting, the GPD MoM identity,
  * cosine bounds, NN-descent convergence).
  */
class Round11pOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("Haar energies are non-negative and shares sum to 1") {
    val rows = run("ts_haar_energy")
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("energy") >= 0.0)
      assert(r.getAs[Long]("n_blocks") > 0)
    }
    val shares = rows.map(_.getAs[Double]("energy_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-3, shares.mkString(","))
    // block count halves (ceil) as the scale doubles
    val nb = rows.sortBy(_.getAs[Long]("level")).map(_.getAs[Long]("n_blocks"))
    assert(nb(0) >= nb(1) && nb(1) >= nb(2), nb.mkString(","))
  }

  test("GPD MoM fit satisfies mean_excess = sigma / (1 - xi)") {
    val r = run("stat_gpd_tail").head
    assert(r.getAs[Long]("n_exceed") > 0)
    val m = r.getAs[Double]("mean_excess")
    val xi = r.getAs[Double]("xi")
    val sg = r.getAs[Double]("sigma")
    assert(xi < 1.0, xi.toString)
    assert(sg > 0.0, sg.toString)
    // the MoM construction pins sigma = 0.5 m (1+R), xi = 0.5(1-R)
    // with R = m^2/s^2, so sigma/(1-xi) = m up to 4dp rounding
    assert(math.abs(sg / (1.0 - xi) - m) / m < 0.01,
      s"sigma/(1-xi)=${sg / (1.0 - xi)} mean=$m")
  }

  test("user-similarity cosines are valid, sorted, and de-duplicated") {
    val rows = run("ev_user_similarity")
    assert(rows.nonEmpty && rows.length <= 10)
    val sims = rows.map(_.getAs[Double]("cosine"))
    sims.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    assert(sims.sameElements(sims.sortBy(-_)), "not sorted desc")
    rows.foreach(r => assert(r.getAs[Long]("ua") < r.getAs[Long]("ub")))
    val pairs = rows.map(r => (r.getAs[Long]("ua"), r.getAs[Long]("ub")))
    assert(pairs.distinct.length === pairs.length)
  }

  test("NN-descent recall improves monotonically from the ring seed") {
    val rows = run("ann_nn_descent").sortBy(_.getString(0))
    assert(rows.length === 3)
    val rec = rows.map(_.getAs[Double]("recall"))
    rec.foreach(r => assert(r >= 0.0 && r <= 1.0))
    // each refinement round only ever replaces a neighbor with a
    // strictly closer one, so recall against the exact graph cannot
    // drop; on sf0.001 it strictly improves
    assert(rec(0) <= rec(1) && rec(1) <= rec(2), rec.mkString(","))
    assert(rec(2) > rec(0), "two rounds did not improve over the seed")
    val nt = rows.map(_.getAs[Long]("n_truth")).distinct
    assert(nt.length === 1 && nt.head > 0)
  }
}
