package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate with map-side partial aggregation.
  *
  * The window-function formulation (row_number over a per-group sort)
  * shuffles EVERY candidate row to the group's reducer; this
  * Aggregator keeps at most k entries per group per map task, so the
  * shuffle carries k rows per partition per group — the difference
  * between shuffling 100 TB of scored candidates and a few KB, and
  * the piece that makes brute-force vector search viable at scale.
  *
  * Ordering: score descending, id ascending on ties — identical to
  * `ORDER BY score DESC, id` (spec-asserted against the window
  * formulation).
  */
object TopK {

  final case class ScoredId(score: Double, id: Long)

  /** Sorted (desc score, asc id) bounded buffer. Arrays keep the
    * serialized form compact for shuffle.
    */
  final case class Buf(scores: Array[Double], ids: Array[Long])

  private def insert(buf: Buf, k: Int, score: Double, id: Long): Buf = {
    val n = buf.scores.length
    // find insertion point: before the first entry that ranks after us
    var pos = 0
    while (pos < n && (buf.scores(pos) > score ||
           (buf.scores(pos) == score && buf.ids(pos) < id))) pos += 1
    if (pos >= k) return buf
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m)
    val ni = new Array[Long](m)
    System.arraycopy(buf.scores, 0, ns, 0, pos)
    System.arraycopy(buf.ids, 0, ni, 0, pos)
    ns(pos) = score; ni(pos) = id
    val tail = m - pos - 1
    if (tail > 0) {
      System.arraycopy(buf.scores, pos, ns, pos + 1, tail)
      System.arraycopy(buf.ids, pos, ni, pos + 1, tail)
    }
    Buf(ns, ni)
  }

  class TopKAggregator(k: Int) extends Aggregator[ScoredId, Buf, Seq[ScoredId]] {
    override def zero: Buf = Buf(Array.empty, Array.empty)

    override def reduce(b: Buf, a: ScoredId): Buf = insert(b, k, a.score, a.id)

    override def merge(b1: Buf, b2: Buf): Buf = {
      var acc = b1
      var i = 0
      while (i < b2.scores.length) {
        acc = insert(acc, k, b2.scores(i), b2.ids(i))
        i += 1
      }
      acc
    }

    override def finish(b: Buf): Seq[ScoredId] =
      b.scores.indices.map(i => ScoredId(b.scores(i), b.ids(i)))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Column aggregate: `topk(k)(scoreCol, idCol)` → array<struct<
    * score, id>> ordered by (score desc, id asc).
    */
  def topk(k: Int): (Column, Column) => Column = {
    val u = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    (score, id) => u(score, id)
  }
}
