package graft

/** Invariants of the round-11i additions the DuckDB oracle can't
  * express (path algebra, survival physics, PMI symmetry, Lorenz
  * convexity, peak definition).
  */
class Round11iOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("mediation paths decompose: total = direct + indirect") {
    val r = run("stat_mediation").head
    assert(r.getAs[Long]("n_users") > 3)
    val total = r.getAs[Double]("c_total")
    val direct = r.getAs[Double]("c_direct")
    val indirect = r.getAs[Double]("ab_indirect")
    // the Baron–Kenny identity c = c' + a·b holds exactly for OLS
    // fits on the same sample (up to the 6dp report rounds)
    assert(math.abs(total - (direct + indirect)) < 1e-4,
      s"c=$total c'=$direct ab=$indirect")
  }

  test("log-rank variance is positive and chi2 consistent with O-E") {
    val r = run("stat_logrank").head
    val o = r.getAs[Long]("o0").toDouble
    val e = r.getAs[Double]("e0")
    val v = r.getAs[Double]("v")
    val chi2 = r.getAs[Double]("chi2")
    assert(v > 0.0)
    assert(chi2 >= 0.0)
    assert(math.abs(chi2 - (o - e) * (o - e) / v) < 1e-2,
      s"chi2=$chi2 vs ${(o - e) * (o - e) / v}")
  }

  test("windowed co-occurrence pairs are canonical and PMI-bounded") {
    val rows = run("text_cooc_window")
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[String]("w1") <= r.getAs[String]("w2"))
      assert(r.getAs[Long]("n_pair") > 0)
      // ln(4T·c/(c1·c2)) with c ≤ min(c1,c2) ≤ √(c1·c2) and c1,c2 ≤ 2T
      // keeps PMI ≤ ln(4T) — sanity ceiling, not tight
      assert(r.getAs[Double]("pmi") < 30.0, r.mkString(","))
    }
  }

  test("conductance lives in [0,1] with cut <= vol") {
    val rows = run("graph_conductance")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vol = r.getAs[Long]("vol"); val cut = r.getAs[Long]("cut")
      assert(cut >= 0 && cut <= vol, r.mkString(","))
      Option(r.getAs[java.lang.Double]("phi")).foreach { p =>
        assert(p >= 0.0 && p <= 1.0 + 1e-9, r.mkString(","))
      }
    }
  }

  test("Lorenz deciles: shares sum to 1, cumulative share is convex-ordered") {
    val rows = run("ev_lorenz_deciles").sortBy(_.getAs[Int]("decile"))
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-2, s"sum=${shares.sum}")
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(math.abs(cums.last - 1.0) < 1e-9)
    // deciles are ordered least-active first → PER-CAPITA share is
    // non-decreasing (raw shares need not be: ties skew bucket sizes)
    val perCap = rows.map(r =>
      r.getAs[Long]("n_events").toDouble / r.getAs[Long]("n_users"))
    assert(perCap.zip(perCap.tail).forall { case (a, b) => b >= a - 1e-9 },
      perCap.mkString(","))
  }

  test("every reported peak beats a 1.2x neighborhood prominence gate") {
    val rows = run("ts_peak_detect")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("prominence") >= 1.2 - 1e-9, r.mkString(","))
      assert(r.getAs[Long]("n_events") > 0)
    }
  }
}
