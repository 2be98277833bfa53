package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.ops.QuantileSketch.QuantileAggregator

/** Property-style tests (seeded random trials) for the mergeable
  * quantile sketch: Spark chooses partition splits and merge order
  * arbitrarily at scale, so the guarantees must hold for every split
  * and every merge order.
  */
class QuantileSketchPropSpec extends AnyFunSuite {

  private val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** DuckDB quantile_disc: the r-th smallest, r = max(ceil(p·n), 1). */
  private def exactQuantiles(xs: Seq[Double]): Seq[Double] = {
    val sorted = xs.sorted
    probs.map { p =>
      val r = math.max(math.ceil(p * sorted.size).toLong, 1L)
      sorted((r - 1).toInt)
    }
  }

  private def rankOf(sorted: Seq[Double], v: Double): Int =
    sorted.count(_ <= v)

  private def sketchOf(agg: QuantileAggregator, xs: Seq[Double],
                       nSplits: Int, rnd: Random) = {
    val parts = xs.grouped(math.max(1, xs.size / nSplits)).toList
    val sketches = rnd.shuffle(
      parts.map(p => p.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))))
    sketches.foldLeft(agg.zero)((a, b) => agg.merge(a, b))
  }

  test("no compaction (n <= k): exact under every split and merge order") {
    val rnd = new Random(7)
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val xs = Seq.fill(n)(math.floor(rnd.nextDouble() * 1000) / 10)
      val agg = new QuantileAggregator(256, probs)
      val out = agg.finish(sketchOf(agg, xs, 1 + rnd.nextInt(8), rnd))
      assert(out == exactQuantiles(xs), s"n=$n")
    }
  }

  test("under compaction: rank error bounded for every split and merge order") {
    val rnd = new Random(19)
    (1 to 30).foreach { _ =>
      val n = 2000 + rnd.nextInt(8000)
      val k = 64
      val xs = Seq.fill(n)(rnd.nextDouble() * 1e6)
      val sorted = xs.sorted
      val agg = new QuantileAggregator(k, probs)
      val out = agg.finish(sketchOf(agg, xs, 1 + rnd.nextInt(10), rnd))
      // deterministic compactors drop ≤ half a level-buffer's weight
      // per compaction; the practical envelope for k=64 at n≤10k is
      // well under 4·n/k of rank — assert that with measured headroom
      val bound = 4.0 * n / k
      probs.zip(out).foreach { case (p, v) =>
        val target = math.max(math.ceil(p * n), 1.0)
        val err = math.abs(rankOf(sorted, v) - target)
        assert(err <= bound, s"p=$p err=$err bound=$bound n=$n")
      }
    }
  }

  test("total weight is preserved through compaction and merge") {
    val rnd = new Random(31)
    (1 to 50).foreach { _ =>
      val n = 100 + rnd.nextInt(5000)
      val xs = Seq.fill(n)(rnd.nextDouble())
      val agg = new QuantileAggregator(32, probs)
      val sk = sketchOf(agg, xs, 1 + rnd.nextInt(6), rnd)
      val w = sk.levels.zipWithIndex
        .map { case (lvl, i) => lvl.size.toLong << i }.sum
      assert(w == n, s"weight $w != n $n")
    }
  }

  test("merge with empty sketch is identity; empty sketch yields NaN") {
    val agg = new QuantileAggregator(16, probs)
    val xs = Seq(3.0, 1.0, 2.0)
    val sk = xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    assert(agg.finish(agg.merge(sk, agg.zero)) == agg.finish(sk))
    assert(agg.finish(agg.merge(agg.zero, sk)) == agg.finish(sk))
    assert(agg.finish(agg.zero).forall(_.isNaN))
  }
}
