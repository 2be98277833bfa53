package graft

/** Invariants of the round-11q additions the DuckDB oracle can't
  * express (mixture geometry, perceptual-hash symmetry, walk-corpus
  * structure).
  */
class Round11qOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("mixture EM returns ordered components that bracket the data") {
    val r = run("stat_mixture_em").head
    assert(r.getAs[Long]("n_docs") > 0)
    val w1 = r.getAs[Double]("w1")
    assert(w1 > 0.0 && w1 < 1.0, w1.toString)
    val mu1 = r.getAs[Double]("mu1")
    val mu2 = r.getAs[Double]("mu2")
    // initialized at p25/p75 and EM preserves the ordering on this
    // corpus; separation is consistent with the component params
    assert(mu1 < mu2, s"$mu1 !< $mu2")
    val s1 = r.getAs[Double]("sigma1")
    val s2 = r.getAs[Double]("sigma2")
    assert(s1 > 0 && s2 > 0)
    val sep = r.getAs[Double]("separation")
    val expect = (mu2 - mu1) / math.sqrt((s1 * s1 + s2 * s2) / 2)
    assert(math.abs(sep - expect) < 0.05, s"sep=$sep expect=$expect")
  }

  test("pHash nearest neighbors have hamming within [0, 63]") {
    val rows = run("mm_image_phash")
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === ids.length)
    rows.foreach { r =>
      val h = r.getAs[Long]("nn_hamming")
      // 63 AC bits; exactly one coefficient EQUALS the median (it is
      // a member), so its bit is 0 -- hamming stays below 63
      assert(h >= 0 && h < 63, h.toString)
      assert(r.getAs[Long]("doc_id") !== r.getAs[Long]("nn_doc"))
    }
  }

  test("node2vec co-visit pairs are canonical, positive, and sorted") {
    val rows = run("graph_node2vec")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("co_visits") > 0)
    }
    val cnts = rows.map(_.getAs[Long]("co_visits"))
    assert(cnts.sameElements(cnts.sortBy(-_)), "not sorted desc")
    // a 4-step walk from every node emits 7 window pairs; co-visits
    // of any single pair can't exceed the total walk count
    val walks = run("graph_node2vec").length // bounded sanity only
    assert(cnts.head <= 7L * 200, cnts.head.toString)
  }
}
