package graft

/** Invariants of the round-11m additions the DuckDB oracle can't
  * express (fold correctness against a reference implementation,
  * rank-test bounds, segment coverage, chi² validity).
  */
class Round11mOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("Holt fold matches an in-test reference on the same series") {
    import org.apache.spark.sql.functions._
    val r = run("ts_holt_linear").head
    val series = Tables.events(spark, sfDir)
      .groupBy(expr("ts DIV 86400000000000").as("day"))
      .agg(count(lit(1)).as("v")).orderBy("day").collect()
      .map(_.getLong(1).toDouble)
    assert(r.getAs[Long]("n_days") === series.length)
    // un-pinned reference fold: must agree with the 7dp-pinned one
    // to well inside the output round
    var l = series.head; var b = 0.0
    series.tail.foreach { x =>
      val ln = 0.3 * x + 0.7 * (l + b); b = 0.1 * (ln - l) + 0.9 * b; l = ln
    }
    assert(math.abs(r.getAs[Double]("level") - l) < 1e-3)
    assert(math.abs(r.getAs[Double]("trend") - b) < 1e-3)
    assert(math.abs(r.getAs[Double]("forecast_7d") - (l + 7 * b)) < 1e-2)
    assert(r.getAs[Double]("rmse_1step") >= 0.0)
  }

  test("Brunner-Munzel estimate is a probability with positive df") {
    val r = run("stat_brunner_munzel").head
    val p = r.getAs[Double]("p_hat")
    assert(p >= 0.0 && p <= 1.0, p.toString)
    assert(r.getAs[Double]("df") > 0.0)
    assert(r.getAs[Long]("n_en") + r.getAs[Long]("n_other") ===
      Tables.documents(spark, sfDir).count())
  }

  test("segmented trend covers every day exactly once") {
    val rows = run("ts_segmented_trend")
    assert(rows.length === 2)
    assert(rows.map(_.getAs[String]("seg")).toSet === Set("pre", "post"))
    val nDays = Tables.events(spark, sfDir)
      .selectExpr("ts DIV 86400000000000 AS day").distinct().count()
    assert(rows.map(_.getAs[Long]("n_days")).sum === nDays)
    assert(rows.map(_.getAs[Long]("cp_day")).distinct.length === 1)
  }

  test("Mood median chi2 is non-negative with df = k-1") {
    val r = run("stat_mood_median").head
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("df") === r.getAs[Long]("k_groups") - 1)
  }
}
