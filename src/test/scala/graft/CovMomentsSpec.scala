package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.embed.CovMoments

/** The Gramian-kernel cross-moment pass that replaced the N·d²
  * double-posexplode in the eigen family (emb_top_eigen /
  * emb_deflated_eigen / emb_abtt / emb_participation_ratio /
  * emb_cka): one treeAggregate over the scan, bounded d² cells,
  * driver-side power iteration.
  */
class CovMomentsSpec extends SparkSpec {

  private def embDf(rows: Seq[(Long, Array[Float])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, v) => Row(i, v) }, 3), schema)
  }

  private val rows: Seq[(Long, Array[Float])] = (0L until 20L).map { i =>
    (i, Array.tabulate(5)(j => (math.sin(i * 5 + j) * 2).toFloat))
  }

  test("moments equal the brute-force sums (single pass, any partitioning)") {
    val m = CovMoments.moments(embDf(rows))
    assert(m.n == 20 && m.dim == 5)
    val xs = rows.map(_._2.map(_.toDouble))
    for (a <- 0 until 5) {
      assert(math.abs(m.sx(a) - xs.map(_(a)).sum) < 1e-9)
      for (b <- 0 until 5)
        assert(math.abs(m.sxx(a * 5 + b) - xs.map(x => x(a) * x(b)).sum) < 1e-9,
          s"cell ($a,$b)")
    }
  }

  test("covCells match the naive covariance; centered pass matches too") {
    val m = CovMoments.moments(embDf(rows))
    val cv = CovMoments.covCells(m)
    val xs = rows.map(_._2.map(_.toDouble))
    val mu = (0 until 5).map(a => xs.map(_(a)).sum / 20)
    for (a <- 0 until 5; b <- 0 until 5) {
      val naive = xs.map(x => (x(a) - mu(a)) * (x(b) - mu(b))).sum / 20
      assert(math.abs(cv(a)(b) - naive) < 1e-5, s"cov ($a,$b)")
    }
    // centered pass: same covariance through the other arithmetic path
    val muR = m.sx.map(x => CovMoments.r(x / m.n, 7))
    val cc = CovMoments.centeredCells(
      CovMoments.moments(embDf(rows), center = Some(muR)))
    for (a <- 0 until 5; b <- 0 until 5)
      assert(math.abs(cc(a)(b) - cv(a)(b)) < 1e-5, s"centered ($a,$b)")
  }

  test("power iteration finds the dominant eigenvalue of a known matrix") {
    // diag(3, 1, 0.5) rotated is overkill — diagonal is enough to pin
    // the iteration + Rayleigh arithmetic
    val cv = Array(
      Array(3.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 0.5))
    val v = CovMoments.powerIterate(cv, 8)
    val lam = CovMoments.rayleigh(cv, v).map(x => CovMoments.r(x, 6))
    assert(lam.isDefined && math.abs(lam.get - 3.0) < 1e-2, s"lam=$lam")
    // the L1-normalized vector concentrates on the first axis
    assert(math.abs(v(0)) > 0.99 && math.abs(v(1)) < 0.01)
  }

  test("degenerate inputs: zero matrix collapses to null, empty scan to n=0") {
    assert(CovMoments.powerIterate(Array.fill(3, 3)(0.0), 8) == null)
    assert(CovMoments.rayleigh(Array.fill(3, 3)(0.0), null).isEmpty)
    val m0 = CovMoments.moments(embDf(Nil))
    assert(m0.n == 0 && m0.dim == 0 && m0.sx.isEmpty)
  }

  test("null embeddings are filtered before the kernel") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.take(3).map { case (i, v) => Row(i, v) } :+ Row(99L, null), 2),
      schema)
    assert(CovMoments.moments(withNull).n == 3)
  }
}
