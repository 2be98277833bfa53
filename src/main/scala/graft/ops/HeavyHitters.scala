package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Space-Saving heavy hitters (Metwally et al., ICDT 2005) as a
  * mergeable Spark Aggregator.
  *
  * Exact token frequencies over 100 TB shuffle every distinct token;
  * this sketch keeps a bounded m-counter summary per map task and
  * shuffles m rows per partition. Guarantees: every item with true
  * count > N/m is present in the summary, and each reported `count`
  * overestimates the true count by at most its `err` field. Summaries
  * merge by count-wise union then trim-to-m (the mergeable-summaries
  * construction, Agarwal et al., PODS 2012); when m exceeds the true
  * distinct count the result is EXACT with err = 0 — the property the
  * DuckDB oracle checks on a bounded domain.
  */
object HeavyHitters {

  final case class Item(key: String, count: Long, err: Long)
  final case class Sketch(keys: Array[String], counts: Array[Long],
                          errs: Array[Long])

  private def indexOf(s: Sketch, key: String): Int = {
    var i = 0
    while (i < s.keys.length) {
      if (s.keys(i) == key) return i
      i += 1
    }
    -1
  }

  private def minIndex(s: Sketch): Int = {
    var m = 0
    var i = 1
    while (i < s.counts.length) {
      if (s.counts(i) < s.counts(m)) m = i
      i += 1
    }
    m
  }

  class HeavyHittersAggregator(m: Int)
      extends Aggregator[String, Sketch, Seq[Item]] {

    override def zero: Sketch =
      Sketch(Array.empty, Array.empty, Array.empty)

    override def reduce(s: Sketch, key: String): Sketch = {
      // SQL aggregate semantics: null inputs don't contribute (and a
      // null key would NPE the (count desc, key) orderings below)
      if (key == null) return s
      val i = indexOf(s, key)
      if (i >= 0) { s.counts(i) += 1; s }
      else if (s.keys.length < m)
        Sketch(s.keys :+ key, s.counts :+ 1L, s.errs :+ 0L)
      else {
        // evict the min counter: the newcomer inherits its count as
        // overestimate (count = min+1, err = min)
        val j = minIndex(s)
        val floor = s.counts(j)
        s.keys(j) = key; s.counts(j) = floor + 1; s.errs(j) = floor
        s
      }
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      if (a.keys.isEmpty) return b
      if (b.keys.isEmpty) return a
      // A key absent from a FULL sketch may have been evicted holding
      // up to that sketch's minimum counter — the absent side must
      // contribute its min as (count=min, err=min), not 0, or merged
      // counts undercount the truth (the mergeable-summaries
      // construction; caught by HeavyHittersPropSpec). A non-full
      // sketch never evicted, so absence there is a true zero.
      val minA = if (a.keys.length >= m) a.counts.min else 0L
      val minB = if (b.keys.length >= m) b.counts.min else 0L
      val inA = a.keys.zipWithIndex.toMap
      val inB = b.keys.zipWithIndex.toMap
      val acc = (a.keys ++ b.keys).distinct.map { k =>
        val (ca, ea) = inA.get(k)
          .map(i => (a.counts(i), a.errs(i))).getOrElse((minA, minA))
        val (cb, eb) = inB.get(k)
          .map(i => (b.counts(i), b.errs(i))).getOrElse((minB, minB))
        (k, (ca + cb, ea + eb))
      }
      val kept = acc.sortBy { case (k, (c, _)) => (-c, k) }.take(m)
      Sketch(kept.map(_._1).toArray, kept.map(_._2._1).toArray,
             kept.map(_._2._2).toArray)
    }

    override def finish(s: Sketch): Seq[Item] =
      s.keys.indices
        .map(i => Item(s.keys(i), s.counts(i), s.errs(i)))
        .sortBy(it => (-it.count, it.key))

    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Seq[Item]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Item]]()
  }

  /** Column aggregate: `heavyHitters(m)(keyCol)` → array<struct<key,
    * count, err>> ordered by (count desc, key asc).
    */
  def heavyHitters(m: Int): Column => Column = {
    val u = udaf(new HeavyHittersAggregator(m), Encoders.STRING)
    key => u(key)
  }
}
