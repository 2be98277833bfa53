package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.ops.HeavyHitters.{HeavyHittersAggregator, Sketch}

/** Property-style tests (seeded random trials) for the Space-Saving
  * sketch: the ICDT-2005 guarantees must hold for EVERY insertion
  * order and EVERY partition split + merge order, because Spark
  * chooses both arbitrarily at scale.
  */
class HeavyHittersPropSpec extends AnyFunSuite {

  private def randomStream(rnd: Random): Seq[String] = {
    val n = 20 + rnd.nextInt(400)
    // zipfian-ish: key j drawn with weight ~ 1/(j+1)
    val domain = 2 + rnd.nextInt(40)
    val weights = (0 until domain).map(j => 1.0 / (j + 1))
    val total = weights.sum
    (0 until n).map { _ =>
      var u = rnd.nextDouble() * total
      var j = 0
      while (u > weights(j) && j < domain - 1) { u -= weights(j); j += 1 }
      s"k$j"
    }
  }

  private def checkGuarantees(stream: Seq[String], m: Int,
                              out: Seq[(String, Long, Long)]): Unit = {
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size.toLong
    // 1: every key with true count > N/m is present
    val reported = out.map(_._1).toSet
    truth.filter(_._2 > n / m).keys.foreach { k =>
      assert(reported.contains(k), s"frequent '$k' missing (m=$m, n=$n)")
    }
    // 2: true <= reported <= true + err, and err < N/min(m, distinct)
    out.foreach { case (k, c, e) =>
      val t = truth.getOrElse(k, 0L)
      assert(c >= t && c - e <= t, s"'$k': rep=$c err=$e true=$t")
    }
    // 3: guaranteed-true mass (count − err) never exceeds the stream
    assert(out.map(c => c._2 - c._3).sum <= n)
  }

  test("reduce-only: guarantees hold over 150 random streams") {
    val rnd = new Random(11)
    (1 to 150).foreach { _ =>
      val stream = randomStream(rnd)
      val m = 2 + rnd.nextInt(12)
      val agg = new HeavyHittersAggregator(m)
      val sk = stream.foldLeft(agg.zero)((b, k) => agg.reduce(b, k))
      val out = agg.finish(sk).map(i => (i.key, i.count, i.err))
      checkGuarantees(stream, m, out)
    }
  }

  test("arbitrary partition splits + merge order: guarantees still hold") {
    val rnd = new Random(23)
    (1 to 150).foreach { _ =>
      val stream = randomStream(rnd)
      val m = 2 + rnd.nextInt(12)
      val agg = new HeavyHittersAggregator(m)
      val nSplits = 1 + rnd.nextInt(6)
      val parts: Seq[Seq[String]] =
        stream.grouped(math.max(1, stream.size / nSplits)).toSeq
      val sketches = rnd.shuffle(
        parts.map(p => p.foldLeft(agg.zero)((b, k) => agg.reduce(b, k))).toList)
      val merged = sketches.foldLeft(agg.zero)((a, b) => agg.merge(a, b))
      val out = agg.finish(merged).map(i => (i.key, i.count, i.err))
      checkGuarantees(stream, m, out)
    }
  }

  test("merge with empty sketch is identity") {
    val agg = new HeavyHittersAggregator(4)
    val sk = Seq("a", "b", "a").foldLeft(agg.zero)((b, k) => agg.reduce(b, k))
    assert(agg.finish(agg.merge(sk, agg.zero)) == agg.finish(sk))
    assert(agg.finish(agg.merge(agg.zero, sk)) == agg.finish(sk))
  }
}
