package graft

/** Invariants of the round-11s sequential-recursion additions (Kalman
  * variance contraction, HMM posterior validity) that the DuckDB
  * RECURSIVE-CTE oracle can't express.
  */
class Round11sOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("Kalman gain decays monotonically to its steady state") {
    val rows = run("ts_kalman_level").sortBy(_.getAs[Long]("t"))
    assert(rows.length >= 3)
    assert(rows.head.isNullAt(rows.head.fieldIndex("gain")))
    val gains = rows.tail.map(_.getAs[Double]("gain"))
    gains.foreach(g => assert(g > 0.0 && g < 1.0))
    // P is monotonically decreasing from the diffuse init, so the
    // gain sequence is non-increasing toward the steady-state value
    gains.sliding(2).foreach(w => assert(w(1) <= w(0) + 1e-9))
    // steady-state gain for Q=25, R=100: k* = (sqrt(Q^2+4QR)-Q)/ (that
    // +2R)... just pin the observed fixed point loosely
    assert(gains.last > 0.3 && gains.last < 0.5, gains.last.toString)
    // the filtered level stays inside the running observation range
    val obs = rows.map(_.getAs[Double]("obs"))
    rows.foreach { r =>
      assert(r.getAs[Double]("level") >= obs.min - 1 &&
        r.getAs[Double]("level") <= obs.max + 1)
    }
  }

  test("HMM forward posterior is a probability responding to the data") {
    val rows = run("ts_hmm_forward").sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val lo = rows.head.getAs[Double]("lam_lo")
    val hi = rows.head.getAs[Double]("lam_hi")
    assert(lo < hi)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_high")
      assert(p > 0.0 && p < 1.0, p.toString)
    }
    // days well above lam_hi should lean high, days below lam_lo low
    val above = rows.filter(_.getAs[Long]("x") > hi)
    val below = rows.filter(_.getAs[Long]("x") < lo)
    if (above.nonEmpty && below.nonEmpty) {
      val pa = above.map(_.getAs[Double]("p_high")).sum / above.length
      val pb = below.map(_.getAs[Double]("p_high")).sum / below.length
      assert(pa > pb, s"avg p_high above=$pa below=$pb")
    }
  }
}
