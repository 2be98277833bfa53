package graft

import org.apache.spark.sql.Row

/** Invariants of the round-10 evaluation/monitoring operators that the
  * DuckDB oracle can't express (bounds and one-sidedness guarantees).
  */
class Round10OpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("count-min estimates are one-sided and within the eps*N bound") {
    val rows = run("ev_countmin")
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("exact")).sum
    // CMS guarantee: est <= exact + e/w * N with prob 1 - e^-d; with
    // d=4 rows over a 5-key domain the bound holds deterministically
    val eps = math.E / 64.0
    rows.foreach { r =>
      val over = r.getAs[Long]("overest")
      assert(over >= 0L, s"one-sided: ${r.mkString(",")}")
      assert(over <= (eps * n).ceil.toLong, s"eps bound: ${r.mkString(",")}")
    }
  }

  test("ROC AUC is a proper probability and the score is informative") {
    val Row(nPos: Long, nNeg: Long, auc: Double) = run("stat_roc_auc").head
    assert(nPos > 0 && nNeg > 0)
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("PSI contributions are non-negative and sum to the reported total") {
    val rows = run("stat_psi")
    assert(rows.length == 10, "full 10-bin spine, empty bins included")
    val total = rows.head.getAs[Double]("psi_total")
    rows.foreach { r =>
      assert(r.getAs[Double]("contrib") >= 0.0, "each (p-q)ln(p/q) term is >= 0")
      assert(r.getAs[Double]("psi_total") == total)
    }
    assert(math.abs(rows.map(_.getAs[Double]("contrib")).sum - total) < 1e-4)
  }

  test("Wasserstein distance is bounded by the score range") {
    val Row(nEn: Long, nOther: Long, w1: Double) = run("stat_wasserstein").head
    assert(nEn > 0 && nOther > 0)
    assert(w1 >= 0.0 && w1 <= 1.0, "quality lives in [0,1] so W1 must too")
  }

  test("NDCG is in [0,1] and relevant-in-top-10 never exceeds 10") {
    val rows = run("text_ndcg")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"row ${r.mkString(",")}")
      assert(r.getAs[Long]("n_rel_top10") <= 10L)
    }
  }

  test("TOST standard error is positive and z bounds are ordered") {
    val r = run("stat_tost").head
    assert(r.getAs[Double]("se") > 0.0)
    assert(r.getAs[Double]("z_lower") > r.getAs[Double]("z_upper"),
      "z_lower tests diff > -delta, z_upper tests diff < +delta")
  }

  test("Jarque-Bera statistic is non-negative with p in [0,1]") {
    val rows = run("stat_jarque_bera")
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getAs[Double]("jb") >= 0.0, s"row ${r.mkString(",")}")
      val p = r.getAs[Double]("p_normal")
      assert(p >= 0.0 && p <= 1.0, s"row ${r.mkString(",")}")
    }
  }

  test("Cohen's d magnitude label matches the conventional cutoffs") {
    val r = run("stat_cohens_d").head
    val d = math.abs(r.getAs[Double]("cohens_d"))
    val expected =
      if (d < 0.2) "negligible" else if (d < 0.5) "small"
      else if (d < 0.8) "medium" else "large"
    assert(r.getAs[String]("magnitude") == expected)
    // |g| < |d| always (shrinkage correction), same sign
    val g = r.getAs[Double]("hedges_g")
    assert(math.abs(g) <= d && g * r.getAs[Double]("cohens_d") >= 0.0)
  }

  test("McNemar cells partition the user base and p is a probability") {
    val r = run("stat_mcnemar").head
    val n = r.getAs[Long]("n_users")
    val cells = r.getAs[Long]("n_both") + r.getAs[Long]("n_pre_only") +
      r.getAs[Long]("n_post_only")
    assert(cells <= n, "both+discordant cells can never exceed the user count")
    if (!r.isNullAt(r.fieldIndex("chi2"))) {
      assert(r.getAs[Double]("chi2") >= 0.0)
      val p = r.getAs[Double]("p_value")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("Yule's K is non-negative (repeat mass can't be below uniform)") {
    val rows = run("text_yule_k")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("yule_k") >= 0.0, s"row ${r.mkString(",")}")
      assert(r.getAs[Long]("v_types") <= r.getAs[Long]("n_tok"))
    }
  }

  test("MAP and MRR are probabilities and RR bounds AP from above at k=1") {
    val rows = run("text_map_mrr")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rr = r.getAs[Double]("rr")
      assert(rr >= 0.0 && rr <= 1.0, s"row ${r.mkString(",")}")
      if (!r.isNullAt(r.fieldIndex("ap10"))) {
        val ap = r.getAs[Double]("ap10")
        assert(ap >= 0.0 && ap <= 1.0 + 1e-9, s"row ${r.mkString(",")}")
        // the first relevant hit contributes rr to the AP numerator,
        // so a query with any relevant hit has ap > 0 iff rr > 0
        assert((ap > 0.0) == (rr > 0.0), s"row ${r.mkString(",")}")
      }
    }
  }

  test("rich-club density is a fraction of possible edges") {
    val rows = run("graph_rich_club")
    assert(rows.length == 3)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val nk = r.getAs[Long]("n_k")
      assert(r.getAs[Double]("phi") >= 0.0 && r.getAs[Double]("phi") <= 1.0)
      assert(r.getAs[Long]("e_k") <= nk * (nk - 1) / 2, s"row ${r.mkString(",")}")
    }
  }

  test("Hurst fit only reports with >= 2 scales") {
    val rows = run("ts_hurst")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_scales") <= 3)
      if (!r.isNullAt(r.fieldIndex("hurst")))
        assert(r.getAs[Long]("n_scales") >= 2)
    }
  }

  test("randomized-response debiasing lands near the true rate") {
    val r = run("priv_rand_response").head
    assert(r.getAs[Long]("n_users") > 0)
    // SE of the debiased estimator at p=.75 is ~sqrt(.25^2.../n)/.5;
    // 0.2 is > 4 SE at the sf0.001 user count — failure means the
    // debiasing arithmetic broke, not an unlucky draw
    assert(r.getAs[Double]("abs_err") < 0.2, r.mkString(","))
  }

  test("aHash nearest neighbor is one row per image with Hamming in [0,64]") {
    val rows = run("mm_image_ahash")
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.foreach { r =>
      val h = r.getAs[Long]("nn_hamming")
      assert(h >= 0L && h <= 64L)
      assert(r.getAs[Long]("nn_doc") != r.getAs[Long]("doc_id"))
    }
  }

  test("participation ratio lies in [1, dim]") {
    val r = run("emb_participation_ratio").head
    val pr = r.getAs[Double]("pr_dim")
    assert(pr >= 1.0 - 1e-9 && pr <= r.getAs[Long]("dim").toDouble + 1e-9,
      r.mkString(","))
  }

  test("OBF boundaries shrink and sample sizes accumulate across looks") {
    val rows = run("stat_group_seq").sortBy(_.getAs[Long]("k"))
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("z_boundary") > b.getAs[Double]("z_boundary"))
      assert(a.getAs[Long]("n_t") <= b.getAs[Long]("n_t"))
      assert(a.getAs[Long]("n_c") <= b.getAs[Long]("n_c"))
    }
  }

  test("eigenvector centralities are a positive sub-distribution") {
    val rows = run("graph_eigencentrality")
    assert(rows.nonEmpty && rows.length <= 10)
    val cs = rows.map(_.getAs[Double]("centrality"))
    assert(cs.forall(c => c > 0.0 && c <= 1.0))
    assert(cs.sum <= 1.0 + 1e-6, "top-10 slice of an L1-normalized vector")
  }

  test("second-order Markov accuracies are probabilities") {
    val rows = run("ev_markov2")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a2 = r.getAs[Double]("acc2")
      assert(a2 > 0.0 && a2 <= 1.0)
      assert(r.getAs[Double]("acc1") > 0.0 && r.getAs[Double]("acc1") <= 1.0)
      assert(r.getAs[Long]("n_best") <= r.getAs[Long]("n_total"))
    }
  }

  test("CKA of the Matryoshka prefix is in (0, 1]") {
    val r = run("emb_cka").head
    val cka = r.getAs[Double]("cka")
    // Cauchy-Schwarz bounds ||Cxy||F^2 by ||Cxx||F*||Cyy||F
    assert(cka > 0.0 && cka <= 1.0 + 1e-9, r.mkString(","))
  }

  test("trend/seasonal strengths and spectral entropy are unit-interval") {
    val st = run("ts_strength").head
    Seq("strength_trend", "strength_seasonal").foreach { c =>
      val v = st.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c=$v")
    }
    val se = run("ts_spectral_entropy").head
    val h = se.getAs[Double]("spectral_entropy_norm")
    assert(h >= 0.0 && h <= 1.0 + 1e-9)
    val shares = Seq(2, 3, 7, 14).map(p => se.getAs[Double](s"share_$p"))
    assert(math.abs(shares.sum - 1.0) < 1e-4, "shares are a distribution")
  }

  test("retention fit decays and CDC chunk stats are consistent") {
    val rf = run("ev_retention_fit").head
    if (!rf.isNullAt(rf.fieldIndex("decay_exp"))) {
      // synthetic users are uniformly active so retention is near
      // flat: the fit must not report GROWTH, and the fitted week-1
      // retention must be a positive rate
      assert(rf.getAs[Double]("decay_exp") <= 1e-9, "retention cannot grow with age")
      assert(rf.getAs[Double]("ret_w1_fit") > 0.0)
      assert(rf.getAs[Double]("r2") >= 0.0 && rf.getAs[Double]("r2") <= 1.0 + 1e-9)
    }
    val cdc = run("dedup_cdc_chunks").head
    assert(cdc.getAs[Long]("n_unique") <= cdc.getAs[Long]("n_chunks"))
    val ratio = cdc.getAs[Double]("dedup_ratio")
    assert(ratio >= 0.0 && ratio < 1.0)
    // expected cut rate is 1/32 per position, so chunks average ~32
    // chars; anything near 1 means the cut predicate degenerated
    assert(cdc.getAs[Double]("mean_len") > 4.0, cdc.mkString(","))
  }

  test("AD statistic is non-negative and the threshold curve is monotone") {
    val ad = run("stat_ad_test").head
    assert(ad.getAs[Double]("a2") >= 0.0)
    val curve = run("dedup_threshold_curve").sortBy(_.getAs[Double]("thr"))
    assert(curve.length == 5)
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs"),
        "raising the bar can only shrink the pair set")
    }
  }

  test("daily SRM counts are balanced on hash arms and kNN vote accuracy is a rate") {
    val srm = run("ev_srm_daily")
    assert(srm.nonEmpty)
    assert(srm.count(r => !r.isNullAt(r.fieldIndex("srm_flag")) &&
      r.getAs[Boolean]("srm_flag")) * 10 <= srm.length,
      "md5 arms are balanced: at most a stray day should flag at the 0.001 bar")
    val votes = run("emb_knn_vote")
    assert(votes.length == 3)
    votes.foreach { r =>
      val acc = r.getAs[Double]("acc")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_queries"))
    }
  }

  test("IVF recall curve is monotone in nprobe and hits bound candidates") {
    val rows = run("ann_ivf_recall_curve")
    assert(rows.length == 9, "3 queries x 3 probe depths")
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, qr) =>
      val byNp = qr.sortBy(_.getAs[Long]("nprobe"))
      byNp.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo.getAs[Long]("n_cand") <= hi.getAs[Long]("n_cand"),
          "more probes scan at least as many candidates")
        assert(lo.getAs[Double]("recall_at_10") <= hi.getAs[Double]("recall_at_10") + 1e-9,
          "recall is monotone in probes")
      }
      // probing ALL 4 cells is brute force: recall must be exact
      assert(byNp.last.getAs[Double]("recall_at_10") == 1.0)
    }
  }

  test("target encoding shrinks toward the prior and split/abandonment audits are consistent") {
    run("feat_target_encode").foreach { r =>
      val raw = r.getAs[Double]("raw_rate"); val sm = r.getAs[Double]("te_smooth")
      val prior = r.getAs[Double]("prior")
      assert((sm - prior) * (raw - prior) >= -1e-9 &&
        math.abs(sm - prior) <= math.abs(raw - prior) + 1e-9,
        s"smooth lies between raw and prior: ${r.mkString(",")}")
    }
    val ts = run("samp_time_split").head
    assert(ts.getAs[Long]("n_seen_users") <= ts.getAs[Long]("n_test_users"))
    val ab = run("ev_abandonment")
    ab.foreach { r =>
      val rate = r.getAs[Double]("abandon_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    val hb = run("feat_hash_buckets").head
    assert(hb.getAs[Long]("n_buckets_used") <= 1024L)
    assert(hb.getAs[Long]("n_collided") ==
      hb.getAs[Long]("n_tokens") - hb.getAs[Long]("n_buckets_used"))
  }

  test("VAD segments are well-formed runs") {
    val rows = run("mm_audio_vad")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sw = r.getAs[Long]("start_win"); val ew = r.getAs[Long]("end_win")
      assert(sw <= ew)
      assert(r.getAs[Long]("n_windows") == ew - sw + 1, "maximal runs are gapless")
      assert(r.getAs[Long]("start_sample") < r.getAs[Long]("end_sample"))
    }
  }
}
