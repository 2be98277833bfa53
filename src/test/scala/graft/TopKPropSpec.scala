package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.ops.TopK.{ScoredId, TopKAggregator}

/** Property-style tests (seeded random trials) for the TopK
  * aggregator's merge lattice: any insertion order and any partition
  * split must equal sorting the whole input by (score desc, id asc)
  * and taking k.
  */
class TopKPropSpec extends AnyFunSuite {

  private def expected(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(e => (-e.score, e.id)).take(k)

  private def randomInput(rnd: Random): Seq[ScoredId] = {
    val n = rnd.nextInt(60)
    // unique ids (as in real grouped data); duplicated scores common
    rnd.shuffle((0L until n.toLong).toList)
      .map(id => ScoredId(math.round(rnd.nextGaussian() * 4) / 8.0, id))
  }

  test("reduce-only equals sort-take over 200 random trials") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val xs = randomInput(rnd)
      val k = 1 + rnd.nextInt(10)
      val agg = new TopKAggregator(k)
      val out = xs.foldLeft(agg.zero)((b, e) => agg.reduce(b, e))
      assert(agg.finish(out) == expected(xs, k), s"k=$k xs=$xs")
    }
  }

  test("arbitrary partition splits + merge equal sort-take") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val xs = randomInput(rnd)
      val k = 1 + rnd.nextInt(8)
      val nSplits = 1 + rnd.nextInt(5)
      val agg = new TopKAggregator(k)
      val parts = xs.grouped(math.max(1, xs.length / nSplits + 1)).toSeq
      val bufs = parts.map(p => p.foldLeft(agg.zero)((b, e) => agg.reduce(b, e)))
      val merged = rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expected(xs, k), s"k=$k splits=$nSplits xs=$xs")
    }
  }

  test("buffer never exceeds k") {
    val rnd = new Random(11)
    (1 to 100).foreach { _ =>
      val xs = randomInput(rnd)
      val k = 1 + rnd.nextInt(4)
      val agg = new TopKAggregator(k)
      val out = xs.foldLeft(agg.zero)((b, e) => agg.reduce(b, e))
      assert(out.scores.length <= k)
    }
  }
}
