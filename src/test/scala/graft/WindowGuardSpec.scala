package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Pins the exact set of queries allowed to carry a GLOBAL
  * (unpartitioned) window. Every allowlisted site is bounded by
  * construction — a rank over an already-limited frame or over ≤20-row
  * retrieval lists — so the single-partition exchange moves a constant
  * number of rows at any scale. Because this spec fails on any NEW
  * global window, the bench can silence the per-row WindowExec WARN
  * without losing the regression signal the warning used to provide:
  * an unbounded window introduced anywhere in the inventory fails here
  * instead of scrolling past in a log tail.
  */
class WindowGuardSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a bounded global window:
    * - rank-after-limit over a TakeOrdered result (Ann.scala,
    *   SparkEntry text_vocab / PQ block)
    * - RRF rank fusion over two ≤20-row retrieval lists (Hybrid.scala)
    */
  private val allowed = Set(
    "ann_ivf_probe", "text_vocab", "vec_pq_adc", "text_hybrid_rrf",
    // rank-after-limit over the TakeOrdered top-100 vocab (Zipf fit)
    "text_zipf_fit",
    // second level of the two-level prefix-sum scan: its input is the
    // per-block total table, already reduced by blockSize (Packing)
    "pipe_pack_sequences",
    // same scan with score-derived blocks: the global window runs
    // over the ≤100-row bucket-total table (Packing.selectByTokenBudget)
    "samp_token_budget",
    // second level of Packing.boundedCumSum's two-level prefix-sum
    // scan: the global window runs over per-block totals, already
    // reduced by blockSize
    "samp_pps_systematic",
    // composes selectByTokenBudget — same ≤100-row bucket-total window
    "pipe_curate",
    // source-index rank over the grouped distinct-source table
    // (≤|sources| rows; the per-source doc rank is boundedRowNumber)
    "pipe_interleave",
    // ecdf running sums over DISTINCT token-length values (the
    // stat_gini bound: values, never rows)
    "samp_ks_test",
    // midrank cumulative sum over the DISTINCT token-count histogram
    // (same values-never-rows bound as samp_ks_test / stat_gini)
    "stat_mwu",
    // NOTE stat_brunner_munzel carries the same values-never-rows
    // global midrank cumsum, but its plan truncates at a lazy
    // localCheckpoint so the guard cannot see the WindowExec —
    // documented here instead of allowlisted.
    // NOTE stat_youden likewise: the stat_roc_auc-bound cumulative
    // sums over the DISTINCT 4dp-quality grid sit above a lazy
    // localCheckpoint, invisible to the guard — documented, not
    // allowlisted.
    // weighted-median cumsum over the DISTINCT pairwise-difference
    // grid of two n_chars histograms (|values|², never rows²)
    "stat_hodges_lehmann",
    // dual-ECDF cumsums over the DISTINCT n_chars histogram (the
    // stat_mwu values-never-rows bound; CvM integral off the grid)
    "stat_cvm",
    // per-arm risk-set suffix sums over the calendar-bounded
    // lifetime-day grid (the ev_survival bound)
    "stat_logrank",
    // cumulative share over the fixed ≤10-row decile frame (the
    // ev_qini / stat_psi constant-rows bound)
    "ev_lorenz_deciles",
    // midrank cumulative sum over the DISTINCT 4dp-quality histogram
    // (values, never rows — AUC via the rank-sum identity)
    "stat_roc_auc",
    // dual-ECDF running sums + lead() gap over the same DISTINCT
    // 4dp-quality grid (W1 = integral of |F1-F2| between value steps)
    "stat_wasserstein",
    // psi_total = sum over the fixed 10-bin spine (constant 10 rows)
    "stat_psi",
    // midrank cumulative sum over the DISTINCT token-count histogram
    // (identical bound to stat_mwu — delta is 2·AUC−1 off the same grid)
    "stat_cliffs_delta",
    // cumulative treatment/control counts over the ≤10 decile rows
    // (ev_lift_gain's bound)
    "ev_qini",
    // ECDF running sum over the DISTINCT gap-seconds histogram
    // (samp_ks_test's bound: values, never rows)
    "ev_interarrival",
    // global-ecdf running sum over the DISTINCT value histogram (the
    // quantile-normalization map; values, never rows)
    "samp_quantile_norm",
    // VALUE-level cumulative rank maps (distinct x / distinct y
    // histograms — the stat_gini bound: values, never rows)
    "stat_spearman",
    // sweep-line running sum over the per-TIMESTAMP delta rollup
    // (distinct event times, never raw events)
    "ev_concurrency",
    // KM at-risk/survival windows over the |distinct day|-row life
    // table (users collapse in the per-user aggs first)
    "ev_survival",
    // cumulative gain over the ≤10 decile rows
    "ev_lift_gain",
    // staircase running max over DISTINCT prices (bounded by the
    // price-grid domain — cents, never part rows)
    "q_skyline",
    // largest-remainder top-up rank over the |langs|-row stats frame
    "samp_strat_alloc",
    // rank-after-limit over the TakeOrdered top-10k vocab
    "text_vocab_coverage",
    // rank-after-limit over the TakeOrdered top-20k train-half vocab
    "text_oov_rate",
    // opened/fulfilled running sums over the |months|-row rollup
    "q_order_backlog",
    // BH rank over per-event_type p-values — |event types| rows,
    // bounded by the type domain, never raw events
    "stat_fdr",
    // U_t cumsum + argmax over the daily purchase rollup — bounded by
    // the calendar (|days| rows), facts collapsed first
    "ts_pettitt",
    // PH cumsum + running min over the daily rollup in integer
    // micro-units (the ts_pettitt bound: |days| rows, facts
    // collapsed first)
    "stat_page_hinkley",
    // order-statistic cumsum over the DISTINCT residual-cents
    // histogram (the samp_ks_test bound: values, never rows)
    "stat_conformal",
    // BY step-up rank + bottom-up running min over per-event_type
    // p-values (the stat_fdr bound: |types| rows, never events)
    "stat_fdr_by",
    // running max over the daily rollup (the ts_pettitt bound:
    // |days| rows, facts collapsed first)
    "ts_drawdown",
    // trailing 7-row band sums over the daily rollup (same bound)
    "ts_bollinger",
    // probe rank over the ≤|cells| centroid frame (8 rows by
    // construction — the deterministic-centroid bound)
    "ann_scan_fraction",
    // lag + q-period rolling sums over the daily rollup (the
    // ts_pettitt bound: |days| rows, facts collapsed first)
    "ts_variance_ratio",
    // the same Pettitt U_t cumsum feeding the per-segment OLS —
    // calendar-bounded day frame
    "ts_segmented_trend",
    // cumulative token/vocab sums over the ≤101-row block-checkpoint
    // frame (block width = maxId/100 — the window input is bounded by
    // construction at any corpus size)
    "text_heaps_fit",
    // midrank cumulative sums over the DISTINCT token-count histogram
    // (the samp_ks_test bound: values, never rows — AD is the
    // tail-weighted companion off the same grid)
    "stat_ad_test",
    // exponential-mechanism cumulative weights over the DISTINCT
    // token-count grid (the stat_gini bound: values, never rows)
    "priv_dp_quantile",
    // LLR accumulation over the calendar-bounded daily rollup (the
    // ts_pettitt bound: |days| rows, facts collapsed first)
    "stat_sprt",
    // ECDF running sum over the DISTINCT daily-count value grid
    // (the samp_ks_test bound: values, never rows)
    "stat_lilliefors",
    // released/true argmax ranks over the |event types|-row rollup
    "priv_noisy_max",
    // Gumbel-max rank over the |sources| candidate table — bounded by
    // the source domain, never rows (same bound as priv_noisy_max)
    "priv_exp_mech",
    // inverse-CDF percentile walk over the DISTINCT value-cents
    // histogram (the stat_mwu bound: values, never rows)
    "stat_gpd_tail",
    // Holm step-down rank/cummax over the |event types|-row p-value
    // rollup (stat_fdr's bound)
    "stat_holm")

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case other => other +: other.children.flatMap(walk)
  }

  // ---- hot-partition windows (the r12 text_ndcg finding) -----------
  //
  // A PARTITIONED window slips the global-window guard, but when its
  // partition key has a small constant domain (qid ∈ 1..5, arm ∈
  // {0,1}, lang over a fixed lexicon) while its input is corpus-sized,
  // the plan is the same scale bug in disguise: |domain| reducers each
  // sort a corpus-sized slice while the rest of the cluster idles.
  // Static analysis cannot know a column's cardinality, so the guard
  // is structural: a window whose partition keys reference NONE of the
  // data model's scaling identifiers (user_id, doc_id, order keys, …)
  // AND whose input subtree reaches a fact-table scan with no
  // cardinality-collapsing node (aggregate / limit / TakeOrdered) in
  // between must carry an allowlist entry arguing why the key's
  // domain grows with the data — new qid-shaped windows fail here.

  /** Identifiers whose distinct count scales with the corpus: a window
    * partitioned by any of these spreads over the whole cluster.
    */
  private val scalingKeys = Set(
    "user_id", "doc_id", "vec_id", "vector_id", "chunk_id",
    "o_orderkey", "l_orderkey", "o_custkey", "c_custkey", "s_suppkey",
    "p_partkey", "l_partkey", "l_suppkey", "event_id", "session_id",
    "pack_id", "id")

  /** A key name counts as domain-scaling if it is one of the data
    * model's identifiers or a boundedRowNumber block id (`*_blk` —
    * domain = n/blockSize, partitions ≤ blockSize rows by
    * construction, Packing.boundedRowNumber).
    */
  private def scalesWithData(ref: String): Boolean =
    scalingKeys.exists(k => ref.startsWith(k)) || ref.endsWith("_blk")

  /** Partitioned windows allowed over corpus-sized input — each with
    * the domain-growth argument.
    */
  private val allowedPartitioned = Set(
    // keep-first dedup gate partitioned by md5(text): the key IS a
    // content hash, domain = |distinct documents| — scales 1:1 with
    // the corpus, partitions are dup-cluster-sized
    "pipe_filter_attrition",
    // OHLC bars partitioned by (event_type, 1h bucket): the bucket
    // domain grows with the data's time span, so reducers multiply as
    // history accumulates; per-partition size is one hour of one type
    "ts_ohlc")

  private def isCollapse(p: SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    n.contains("Aggregate") || n.contains("Limit") ||
      n.contains("TakeOrdered")
  }

  /** Does this subtree reach a fact-table parquet scan without
    * crossing a cardinality-collapsing node? Broadcast subtrees are
    * skipped (the streamed side determines join output cardinality);
    * RDD scans (localCheckpoint cuts) are treated as collapsed — every
    * checkpointed frame in the inventory is an aggregated rollup.
    */
  private def corpusSized(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => corpusSized(a.executedPlan)
    case _ if isCollapse(p) => false
    case _ if p.getClass.getSimpleName.startsWith("Broadcast") &&
              p.getClass.getSimpleName.contains("Exchange") => false
    case s: org.apache.spark.sql.execution.FileSourceScanExec =>
      val paths = s.relation.location.rootPaths.mkString(",")
      !(paths.contains("region") || paths.contains("nation"))
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      corpusSized(q.plan)
    case other => other.children.exists(corpusSized)
  }

  private def hotPartitionedWindows(df: DataFrame): Seq[String] =
    walk(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.nonEmpty =>
        val refs = w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
          .map(_.replaceAll("#\\d+$", ""))
        if (refs.exists(scalesWithData) || !corpusSized(w.child)) None
        else Some(refs.distinct.mkString("|"))
    }.flatten

  test("no partitioned window keys a bounded domain over corpus-sized input") {
    // track queries that fail to PLAN separately: swallowing them as
    // "no offender" would let the guard pass vacuously if query
    // construction started failing broadly (e.g. missing test data)
    val buildFailures = scala.collection.mutable.ListBuffer[String]()
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val hot =
        try hotPartitionedWindows(SparkEntry.queries(name)(spark, sfDir))
        catch { case scala.util.control.NonFatal(_) => buildFailures += name; Nil }
      if (hot.nonEmpty) Some(s"$name[${hot.mkString(";")}]") else None
    }
    // a handful of queries legitimately cannot plan in this harness
    // context (e.g. ones needing pre-materialized partitioned state);
    // more than 5% failing to plan means the guard is blind, not busy
    assert(buildFailures.size <= SparkEntry.queries.size / 20,
      s"hot-partition guard could not plan ${buildFailures.size}/" +
        s"${SparkEntry.queries.size} queries — the guard is running " +
        s"vacuously; first failures: ${buildFailures.take(10).mkString(", ")}")
    val unexpected = offenders.filterNot(o =>
      allowedPartitioned(o.takeWhile(_ != '[')))
    assert(unexpected.isEmpty,
      s"partitioned windows whose key domain does not scale with the " +
        s"corpus while their input does (the text_ndcg-r12 shape) — " +
        s"rewrite on the TopK aggregate, collapse the input first, or " +
        s"allowlist with a domain-growth argument: $unexpected")
  }

  private def hasGlobalWindow(df: DataFrame): Boolean =
    walk(df.queryExecution.executedPlan).exists {
      case w: WindowExec => w.partitionSpec.isEmpty
      case _ => false
    }

  test("only the documented bounded queries carry a global window") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val global =
        try hasGlobalWindow(SparkEntry.queries(name)(spark, sfDir))
        catch { case _: Throwable => false } // non-planning failures covered elsewhere
      if (global) Some(name) else None
    }
    val unexpected = offenders.filterNot(allowed)
    assert(unexpected.isEmpty,
      s"NEW global (unpartitioned) windows — bound them or extend the " +
        s"allowlist with a boundedness argument: $unexpected")
    val stale = allowed -- offenders.toSet
    assert(stale.isEmpty,
      s"allowlist entries whose plans no longer have a global window " +
        s"(clean them up): $stale")
  }
}
