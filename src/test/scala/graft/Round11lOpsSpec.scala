package graft

/** Invariants of the round-11l additions the DuckDB oracle can't
  * express (K² validity, episode-mining bounds, schedule convergence,
  * KN probability-mass sanity).
  */
class Round11lOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("D'Agostino K2 is a valid omnibus statistic") {
    val r = run("stat_dagostino").head
    assert(r.getAs[Long]("n_total") > 20)
    val k2 = r.getAs[Double]("k2_stat")
    assert(k2 >= 0.0, k2.toString)
    val z1 = r.getAs[Double]("z_skew")
    val z2 = r.getAs[Double]("z_kurt")
    assert(math.abs(k2 - (z1 * z1 + z2 * z2)) < 1e-2)
  }

  test("episode mining yields valid confidences and symmetric-free pairs") {
    val rows = run("ev_episode_mining")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0.0 && conf <= 1.0, r.mkString(","))
      assert(r.getAs[Double]("lift") > 0.0)
      assert(r.getAs[Long]("n_users") >= 1)
    }
  }

  test("mixture schedule anneals from proportional to uniform") {
    val rows = run("pipe_mixture_schedule")
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    val nSources = bySrc.size
    // epoch 4 is uniform: every weight == 1/nSources up to the 4dp round
    rows.filter(_.getAs[Long]("epoch") == 4L).foreach { r =>
      assert(math.abs(r.getAs[Double]("mix_weight") - 1.0 / nSources) < 2e-4,
        r.mkString(","))
    }
    // per epoch the weights sum to ~1
    rows.groupBy(_.getAs[Long]("epoch")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Double]("mix_weight")).sum
      assert(math.abs(s - 1.0) < 1e-2, s.toString)
    }
    // epoch 0 is proportional: the biggest source carries the biggest weight
    val e0 = rows.filter(_.getAs[Long]("epoch") == 0L)
    val maxByDocs = e0.maxBy(_.getAs[Long]("n_docs"))
    assert(maxByDocs.getAs[Double]("mix_weight") ===
      e0.map(_.getAs[Double]("mix_weight")).max)
  }

  test("KN perplexity is finite and above the unigram floor of 1") {
    val r = run("text_kn_perplexity").head
    assert(r.getAs[Long]("n_bigrams") > r.getAs[Long]("n_bigram_types"))
    val pp = r.getAs[Double]("perplexity")
    assert(pp > 1.0 && !pp.isInfinite, pp.toString)
    assert(math.abs(math.exp(r.getAs[Double]("cross_entropy")) - pp) < pp * 1e-2)
  }
}
