package graft

/** Invariants of the round-11j additions the DuckDB oracle can't
  * express (margin-box roots, raking convergence, shard balance,
  * Jaccard symmetry bounds).
  */
class Round11jOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("Breslow-Day statistic is non-negative with a positive common OR") {
    val r = run("stat_breslow_day").head
    assert(r.getAs[Long]("n_strata") >= 2)
    assert(r.getAs[Double]("or_mh") >= 0.0) // degenerate corpora can zero a cell product
    assert(r.getAs[Double]("bd_chi2") >= 0.0, r.mkString(","))
  }

  test("raking moves both margins toward uniform") {
    import org.apache.spark.sql.functions._
    val rows = run("samp_raking")
    assert(rows.nonEmpty)
    val cells = rows.map(r => (r.getAs[String]("source"),
      r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
      r.getAs[Double]("rake_weight")))
    cells.foreach { case (_, _, n, w) => assert(w > 0.0 && n > 0) }
    val total = cells.map(_._3).sum.toDouble
    def spread(margin: Map[String, Double], target: Double) =
      margin.values.map(v => math.abs(v - target)).max
    // weighted source margins land closer to uniform than raw counts
    val srcTarget = total / cells.map(_._1).distinct.length
    val rawSrc = cells.groupBy(_._1).map { case (k, g) =>
      k -> g.map(_._3.toDouble).sum }
    val rakedSrc = cells.groupBy(_._1).map { case (k, g) =>
      k -> g.map(c => c._3 * c._4).sum }
    // allow the 4dp weight round: on an already-uniform corpus raking
    // cannot beat raw, only stay within rounding slack of it
    assert(spread(rakedSrc, srcTarget) <= spread(rawSrc, srcTarget) + total * 0.01,
      s"raked=${spread(rakedSrc, srcTarget)} raw=${spread(rawSrc, srcTarget)}")
    // the last scaling pass was over langs → lang margins are exact
    // up to the 4dp weight round
    val langTarget = total / cells.map(_._2).distinct.length
    val rakedLang = cells.groupBy(_._2).map { case (k, g) =>
      k -> g.map(c => c._3 * c._4).sum }
    assert(spread(rakedLang, langTarget) < total * 0.01,
      s"lang spread ${spread(rakedLang, langTarget)}")
  }

  test("stratified shards are balanced and fully mixed") {
    val rows = run("pipe_stratified_shards")
    assert(rows.length === 8)
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.sum === Tables.documents(spark, sfDir).count())
    val nStrata = Tables.documents(spark, sfDir)
      .select("source", "lang").distinct().count()
    // round-robin: shard sizes differ by at most one per stratum
    assert(counts.max - counts.min <= nStrata,
      s"spread ${counts.max - counts.min} > $nStrata")
  }

  test("type-overlap Jaccard is a valid similarity on canonical pairs") {
    val rows = run("ev_type_overlap")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0, r.mkString(","))
      assert(r.getAs[Long]("n_both") >= 1)
    }
  }
}
