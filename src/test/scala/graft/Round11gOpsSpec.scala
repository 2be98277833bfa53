package graft

/** Invariants of the round-11g additions that the DuckDB oracle can't
  * express (probability bounds, entropy bounds, pair-count physics,
  * alphabet closure).
  */
class Round11gOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("Friedman statistic is non-negative with a valid closed-form p") {
    val r = run("stat_friedman").head
    val q = r.getAs[Double]("q_stat")
    val p = r.getAs[Double]("p_value")
    assert(r.getAs[Long]("n_blocks") > 0)
    assert(q >= 0.0, s"Q=$q")
    assert(p >= 0.0 && p <= 1.0, s"p=$p")
    // df=2 survival is exactly exp(-Q/2) of the rounded statistic
    assert(math.abs(p - math.exp(-q / 2)) < 1e-4, s"p=$p Q=$q")
  }

  test("Bartlett statistic is non-negative and the pooled variance positive") {
    val r = run("stat_bartlett").head
    assert(r.getAs[Long]("k_groups") >= 2)
    assert(r.getAs[Long]("n_total") > r.getAs[Long]("k_groups"))
    assert(r.getAs[Double]("pooled_var") > 0.0)
    // T >= 0 up to the 4dp report round (Jensen: ln of the pooled
    // variance dominates the weighted mean of the group-variance lns)
    assert(r.getAs[Double]("t_stat") >= -1e-4, r.mkString(","))
  }

  test("Hodges-Lehmann shift is bracketed and counts every pair") {
    import org.apache.spark.sql.functions._
    val r = run("stat_hodges_lehmann").head
    val docs = Tables.documents(spark, sfDir)
    val en = docs.filter(col("lang") === "en").agg(
      count(lit(1)), min("n_chars"), max("n_chars")).head
    val de = docs.filter(col("lang") === "de").agg(
      count(lit(1)), min("n_chars"), max("n_chars")).head
    assert(r.getAs[Long]("n_pairs") === en.getLong(0) * de.getLong(0))
    val hl = r.getAs[Long]("hl_shift")
    assert(hl >= en.getLong(1) - de.getLong(2), s"hl=$hl below min diff")
    assert(hl <= en.getLong(2) - de.getLong(1), s"hl=$hl above max diff")
  }

  test("SAX words stay inside the 4-symbol alphabet and 6-slot day") {
    val rows = run("ts_sax")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      assert(w.nonEmpty && w.length <= 6, s"word=$w")
      assert(w.forall(c => c >= 'a' && c <= 'd'), s"word=$w")
      assert(r.getAs[Long]("n_days") > 0)
    }
    // at most 3 motif words reported per type
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, g) =>
      assert(g.length <= 3, s"$t has ${g.length} words")
    }
  }

  test("successor entropy obeys 0 <= H <= ln(branching factor)") {
    val rows = run("text_successor_entropy")
    assert(rows.length === 20)
    rows.foreach { r =>
      val h = r.getAs[Double]("h_next")
      val nNext = r.getAs[Long]("n_next")
      assert(r.getAs[Long]("total") >= nNext)
      assert(h >= -1e-9, r.mkString(","))
      assert(h <= math.log(nNext.toDouble) + 1e-4, r.mkString(","))
    }
  }

  test("dHash nearest neighbors have hamming in [0, 64] on the declared subset") {
    val rows = run("mm_image_dhash")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hm = r.getAs[Long]("nn_hamming")
      assert(hm >= 0 && hm <= 64, r.mkString(","))
      val id = r.getAs[Long]("doc_id")
      assert(id % 3 == 1 && id < 120, s"doc_id=$id outside subset")
      assert(id != r.getAs[Long]("nn_doc"))
    }
  }
}
