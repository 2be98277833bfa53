package graft

/** Invariants of the round-11u additions (Holm dominance over BH,
  * meta-analysis pooling geometry, the Brier identity).
  */
class Round11uOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("Holm adjusted p dominates raw p and is monotone in rank") {
    val rows = run("stat_holm").sortBy(_.getAs[Long]("rank"))
    assert(rows.nonEmpty)
    var prev = 0.0
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      val ph = r.getAs[Double]("p_holm")
      assert(ph >= p - 1e-9, s"p_holm=$ph < p=$p")
      assert(ph >= prev - 1e-9, "cummax violated")
      assert(ph <= 1.0 + 1e-9)
      prev = ph
    }
    // Holm rejections are a subset of BH rejections on the same family
    val holmRej = rows.filter(_.getAs[Long]("reject") == 1L)
      .map(_.getString(0)).toSet
    val bhRej = run("stat_fdr").filter(_.getAs[Long]("reject") == 1L)
      .map(_.getString(0)).toSet
    assert(holmRej.subsetOf(bhRej), s"holm=$holmRej bh=$bhRej")
  }

  test("meta-analysis pooled effect lies within the effect range") {
    val r = run("stat_meta_analysis").head
    assert(r.getAs[Long]("k_studies") >= 2)
    assert(r.getAs[Double]("pooled_se") > 0.0)
    val i2 = Option(r.getAs[java.lang.Double]("i2")).map(_.doubleValue)
    i2.foreach(v => assert(v >= 0.0 && v < 1.0, v.toString))
    // the inverse-variance pool is a convex combination, so it sits
    // inside the per-locale effect range reported by stat_vs_control
    val effs = run("stat_vs_control").map(_.getAs[Double]("mean_diff"))
    val p = r.getAs[Double]("pooled_diff")
    assert(p >= effs.min - 1e-6 && p <= effs.max + 1e-6,
      s"pooled=$p range=[${effs.min},${effs.max}]")
  }

  test("Brier equals reliability - resolution + uncertainty") {
    val r = run("stat_brier_decomp").head
    assert(r.getAs[Long]("n_test") > 0)
    val b = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    assert(rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25 + 1e-9)
    assert(math.abs(b - (rel - res + unc)) < 1e-4,
      s"$b != $rel - $res + $unc")
  }
}
