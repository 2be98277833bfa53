package graft

/** Invariants of the round-11k additions the DuckDB oracle can't
  * express (community partition totals, trend-test bounds, ICC range,
  * systematic-sample point count).
  */
class Round11kOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("label propagation is a partition of the dup-graph nodes") {
    import org.apache.spark.sql.functions._
    val rows = run("graph_label_prop")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("size") >= 1))
    val e0 = graft.dedup.Dedup.ngramJaccard(
        Tables.documents(spark, sfDir).filter(col("doc_id") < 120), 5, 0.25)
      .select(col("da"), col("db"))
    val nNodes = e0.select(col("da").as("v"))
      .union(e0.select(col("db").as("v"))).distinct().count()
    assert(rows.map(_.getAs[Long]("size")).sum === nNodes)
  }

  test("Cochran-Armitage trend chi2 is valid on quartile doses") {
    val r = run("stat_cochran_armitage").head
    assert(r.getAs[Long]("n_groups") >= 2 && r.getAs[Long]("n_groups") <= 4)
    assert(r.getAs[Double]("chi2_trend") >= 0.0)
    assert(Set(-1.0, 0.0, 1.0).contains(r.getAs[Double]("trend_sign")))
  }

  test("ICC(1,1) lands in its algebraic range") {
    val r = run("stat_icc").head
    assert(r.getAs[Long]("k_groups") >= 2)
    assert(r.getAs[Double]("ms_between") > 0.0)
    assert(r.getAs[Double]("ms_within") > 0.0)
    val icc = r.getAs[Double]("icc1")
    // ICC(1) is bounded below by -1/(k0-1) >= -1 and above by 1
    assert(icc >= -1.0 && icc <= 1.0, icc.toString)
  }

  test("systematic PPS places exactly 50 points with multiplicity") {
    val rows = run("samp_pps_systematic")
    assert(rows.map(_.getAs[Long]("n_hits")).sum === 50L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") >= 1)
      val pi = r.getAs[Double]("pi")
      assert(pi > 0.0 && pi <= 1.0, r.mkString(","))
    }
  }
}
