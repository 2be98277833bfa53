package graft

/** Invariants of the round-11h additions the DuckDB oracle can't
  * express (bounds, symmetry, ledger physics).
  */
class Round11hOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("Tukey HSD emits every unordered pair once with q >= 0") {
    val rows = run("stat_tukey_hsd")
    val k = Tables.documents(spark, sfDir)
      .select("lang").distinct().count()
    assert(rows.length === (k * (k - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getAs[String]("lang_a") < r.getAs[String]("lang_b"))
      assert(r.getAs[Double]("q_stat") >= 0.0, r.mkString(","))
    }
  }

  test("Cramer-von Mises statistic is non-negative and counts both samples") {
    val r = run("stat_cvm").head
    assert(r.getAs[Long]("n_en") > 0 && r.getAs[Long]("n_de") > 0)
    assert(r.getAs[Double]("cvm_t") >= 0.0, r.mkString(","))
  }

  test("reciprocity ratios live in [0,1] and weighted <= unweighted") {
    val r = run("graph_reciprocity").head
    val wr = r.getAs[Double]("w_reciprocity")
    val er = r.getAs[Double]("e_reciprocity")
    assert(wr >= 0.0 && wr <= 1.0, s"w=$wr")
    assert(er >= 0.0 && er <= 1.0, s"e=$er")
    // a fully reciprocal edge set bounds the weighted form from above
    assert(wr <= er + 1e-9, s"w=$wr > e=$er")
    assert(r.getAs[Long]("n_edges") > 0)
  }

  test("WOE terms sum consistently: IV is non-negative") {
    val rows = run("feat_woe")
    assert(rows.nonEmpty)
    // each IV contribution (p-q)*ln(p/q) is non-negative by sign
    rows.foreach { r =>
      assert(r.getAs[Double]("iv_term") >= -1e-9, r.mkString(","))
      assert(r.getAs[Long]("n_en") + r.getAs[Long]("n_other") > 0)
    }
  }

  test("shard diff flags exactly the shards holding a doc_id % 97 == 0 doc") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.md5Long
    val rows = run("pipe_incremental_shards")
    assert(rows.length === 16)
    val expected = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 97 === 0)
      .select((md5Long(concat(lit("shard:"), col("doc_id").cast("string")))
        % 16).as("shard"))
      .distinct().collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val changed = r.getAs[Long]("changed") == 1L
      assert(changed === expected.contains(r.getAs[Long]("shard")),
        s"shard ${r.getAs[Long]("shard")}")
      assert(r.getAs[Long]("n_now") >= r.getAs[Long]("n_prev"))
    }
  }

  test("dow-hour peaks are valid calendar cells with sane entropy") {
    val rows = run("ev_dow_hour")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dow = r.getAs[Long]("peak_dow"); val hr = r.getAs[Long]("peak_hour")
      assert(dow >= 0 && dow <= 6, s"dow=$dow")
      assert(hr >= 0 && hr <= 23, s"hour=$hr")
      val share = r.getAs[Double]("peak_share")
      assert(share > 0.0 && share <= 1.0)
      val h = r.getAs[Double]("h_cells")
      assert(h >= -1e-9 && h <= math.log(168.0) + 1e-4, s"H=$h")
    }
  }
}
