package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** One-pass d×d covariance cross-moments for the eigen family
  * (emb_top_eigen / emb_deflated_eigen / emb_abtt /
  * emb_participation_ratio / emb_cka).
  *
  * The double-posexplode formulation generates d² shuffle ROWS per
  * input vector (4,096 at d=64; ~1M at the reference's d=1024 —
  * document_ingestor.py:72) and then iterates with one cluster job
  * per power step. Here the corpus is scanned ONCE with the standard
  * Gramian treeAggregate kernel (the public Spark MLlib
  * RowMatrix.computeGramianMatrix pattern): each task accumulates
  * (n, Σx, Σx·xᵀ) in primitive arrays — d² doubles of state per
  * task, 8 MB even at d=1024 — and partials merge in a 2-level tree,
  * so nothing d²-sized is ever shuffled per row. (A udaf/Aggregator
  * form was measured 100× slower here: ScalaAggregator pays per-row
  * encoder work on the d²-length array; the kernel pays one fused
  * multiply-add loop.) The ≤d² resulting cells are BOUNDED, so the
  * power iterations run driver-side on them — the documented
  * graph_pagerank bounded-collect altitude (SURVEY §5) — turning 16
  * scheduled jobs into a microsecond loop.
  */
object CovMoments {

  final case class Moments(n: Long, dim: Int,
                           sx: Array[Double], sxx: Array[Double])

  /** Spark HALF_UP double rounding, bit-identical to `round(col, s)`. */
  def r(x: Double, s: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Embedding column as a typed primitive-array Dataset (UnsafeArray
    * → double[] is an intrinsic copy, no per-element boxing).
    */
  def vectors(emb: DataFrame)
      : org.apache.spark.sql.Dataset[Array[Double]] =
    emb.filter(col("embedding").isNotNull)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[Array[Double]](ExpressionEncoder[Array[Double]]())

  /** ONE pass over the embeddings scan: n, per-dim sums, flattened
    * row-major d×d cross-product sums. With `center` set, each vector
    * is shifted by the broadcast per-dim means before the products
    * (the emb_abtt centered pass — same addends as the oracle's
    * join form, no raw-sum cancellation).
    */
  def moments(emb: DataFrame,
              center: Option[Array[Double]] = None): Moments = {
    type Acc = (Long, Array[Double], Array[Double])
    val zero: Acc = (0L, null, null)
    val (n, sx, sxx) = vectors(emb).rdd.treeAggregate(zero)(
      seqOp = { case ((n0, sx0, sxx0), x0) =>
        val x = center match {
          case Some(m) =>
            val c = new Array[Double](x0.length)
            var i = 0
            while (i < x0.length) { c(i) = x0(i) - m(i); i += 1 }
            c
          case None => x0
        }
        val d = x.length
        val sx = if (sx0 == null) new Array[Double](d) else sx0
        val sxx = if (sxx0 == null) new Array[Double](d * d) else sxx0
        var a = 0
        while (a < d) {
          val xa = x(a); val off = a * d
          sx(a) += xa
          var b = 0
          while (b < d) { sxx(off + b) += xa * x(b); b += 1 }
          a += 1
        }
        (n0 + 1, sx, sxx)
      },
      combOp = { case ((n1, sx1, sxx1), (n2, sx2, sxx2)) =>
        if (sx1 == null) (n2, sx2, sxx2)
        else if (sx2 == null) (n1, sx1, sxx1)
        else {
          var i = 0
          while (i < sx1.length) { sx1(i) += sx2(i); i += 1 }
          i = 0
          while (i < sxx1.length) { sxx1(i) += sxx2(i); i += 1 }
          (n1 + n2, sx1, sxx1)
        }
      })
    Moments(n, if (sx == null) 0 else sx.length,
            if (sx == null) Array.empty else sx,
            if (sxx == null) Array.empty else sxx)
  }

  /** Covariance cells cv(a)(b) = round(Sxy/n − (Sx/n)(Sy/n), scale) —
    * the exact arithmetic of the oracle's grouped form.
    */
  def covCells(m: Moments, scale: Int = 7): Array[Array[Double]] = {
    val nd = m.n.toDouble
    Array.tabulate(m.dim, m.dim) { (a, b) =>
      r(m.sxx(a * m.dim + b) / nd - (m.sx(a) / nd) * (m.sx(b) / nd), scale)
    }
  }

  /** Central-moment cells cv(a)(b) = round(Sxy/n, scale) for a pass
    * that was already centered (emb_abtt).
    */
  def centeredCells(m: Moments, scale: Int = 7): Array[Array[Double]] = {
    val nd = m.n.toDouble
    Array.tabulate(m.dim, m.dim)((a, b) => r(m.sxx(a * m.dim + b) / nd, scale))
  }

  /** Power iteration mirroring covPowIterSql: start x=1, per step
    * raw_i = Σ_b cv(i)(b)·x_b, L1-normalize, round each entry to 7.
    * Returns null when a step's norm collapses to 0 (the oracle's
    * nullif branch).
    */
  def powerIterate(cv: Array[Array[Double]], iters: Int): Array[Double] = {
    val d = cv.length
    var x = Array.fill(d)(1.0)
    var k = 0
    while (k < iters) {
      if (x == null) return null
      val raw = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0; var b = 0
        while (b < d) { s += cv(i)(b) * x(b); b += 1 }
        raw(i) = s; i += 1
      }
      var nm = 0.0
      raw.foreach(v => nm += math.abs(v))
      x = if (nm == 0) null else raw.map(v => r(v / nm, 7))
      k += 1
    }
    x
  }

  /** RAW Rayleigh quotient Σ cv·v_a·v_b / Σ v² (callers round — the
    * oracle rounds λ at 6 but reuses the raw ratio in share columns);
    * None when the vector collapsed or the denominator is ≤ 0.
    */
  def rayleigh(cv: Array[Array[Double]], v: Array[Double]): Option[Double] = {
    if (v == null) return None
    val d = cv.length
    var num = 0.0; var den = 0.0
    var a = 0
    while (a < d) {
      den += v(a) * v(a)
      var b = 0
      while (b < d) { num += cv(a)(b) * v(a) * v(b); b += 1 }
      a += 1
    }
    if (den > 0) Some(num / den) else None
  }
}
