package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable approximate-quantile sketch (the deterministic
  * fixed-capacity variant of the KLL/MRL compactor family — Karnin,
  * Lang, Liberty, FOCS 2016; Manku, Rajagopalan, Lindsay, SIGMOD 1998).
  *
  * Exact per-group percentiles over 100 TB sort every group; this
  * sketch keeps ≤ k values per compactor level per map task and
  * shuffles O(k · log(n/k)) values per partition. Level i holds items
  * of weight 2^i; an overfull level sorts its buffer and promotes the
  * odd-indexed half to level i+1 (weight doubles, total weight is
  * preserved; an odd buffer leaves its smallest element behind).
  * Compaction is DETERMINISTIC — no random offset — so the sketch is a
  * pure function of the input multiset and the partition boundaries,
  * and the property spec can pin merge-order invariance exactly.
  *
  * Quantile rule matches DuckDB's `quantile_disc`: the answer for
  * probability p is the smallest value whose cumulative weight reaches
  * rank max(ceil(p·N), 1). When n ≤ k nothing ever compacts and the
  * result is EXACT under any partitioning — the property the DuckDB
  * oracle checks on a bounded subset (the ev_heavy_hitters pattern).
  * Under compaction the rank error is bounded by the dropped half-
  * weights: Σ_levels 2^(i-1) · (#compactions at i) ≤ O(n·log(n/k)/k).
  */
object QuantileSketch {

  final case class Sketch(levels: Seq[Seq[Double]])

  class QuantileAggregator(k: Int, probs: Seq[Double])
      extends Aggregator[Double, Sketch, Seq[Double]] {
    require(k >= 2 && probs.nonEmpty)

    override def zero: Sketch = Sketch(Seq(Vector.empty))

    /** Cascade bottom-up: each overfull level promotes its odd-indexed
      * half one level up. A promotion may overflow the next level; the
      * single pass handles it because it visits levels in order.
      */
    private def compact(levels: Seq[Seq[Double]]): Sketch = {
      val out = scala.collection.mutable.ArrayBuffer(
        levels.map(_.toVector): _*)
      var i = 0
      while (i < out.length) {
        if (out(i).size > k) {
          val sorted = out(i).sorted
          val leftover = sorted.size % 2 // odd buffer: smallest stays
          val promoted = (leftover + 1 until sorted.size by 2).map(sorted)
          out(i) = sorted.take(leftover)
          if (i + 1 >= out.length) out += Vector.empty
          out(i + 1) = out(i + 1) ++ promoted
        }
        i += 1
      }
      Sketch(out.toSeq)
    }

    override def reduce(s: Sketch, v: Double): Sketch = {
      val l0 = s.levels.head :+ v
      if (l0.size <= k) Sketch(l0 +: s.levels.tail)
      else compact(l0 +: s.levels.tail)
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      val n = math.max(a.levels.size, b.levels.size)
      val zipped = (0 until n).map { i =>
        (if (i < a.levels.size) a.levels(i) else Vector.empty) ++
          (if (i < b.levels.size) b.levels(i) else Vector.empty)
      }
      compact(zipped)
    }

    override def finish(s: Sketch): Seq[Double] = {
      val weighted = s.levels.zipWithIndex
        .flatMap { case (lvl, i) => lvl.map(v => (v, 1L << i)) }
        .sortBy(_._1)
      val n = weighted.iterator.map(_._2).sum
      if (n == 0) return probs.map(_ => Double.NaN)
      probs.map { p =>
        val r = math.max(math.ceil(p * n).toLong, 1L)
        var cum = 0L
        var j = 0
        while (j < weighted.size - 1 && cum + weighted(j)._2 < r) {
          cum += weighted(j)._2
          j += 1
        }
        weighted(j)._1
      }
    }

    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column aggregate: `approxQuantiles(k, probs)(valueCol)` →
    * array<double>, one entry per requested probability.
    */
  def approxQuantiles(k: Int, probs: Seq[Double]): Column => Column = {
    val u = udaf(new QuantileAggregator(k, probs), Encoders.scalaDouble)
    v => u(v)
  }
}
