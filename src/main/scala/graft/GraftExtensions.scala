package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.VectorExpressions.{CosineSimilarity, DotProduct, Md5Long60, SqNorm}

/** SparkSessionExtensions entry point: makes the native vector
  * functions available to pure-SQL users of any session configured
  * with `spark.sql.extensions=graft.GraftExtensions`.
  *
  * spark.sql("SELECT cosine_similarity(a.embedding, q.v) ...")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo(classOf[GraftExtensions].getName, name)

    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("sq_norm"),
      info("sq_norm"),
      (es: Seq[Expression]) => SqNorm(es.head)))
    ext.injectFunction((FunctionIdentifier("md5_long60"),
      info("md5_long60"),
      (es: Seq[Expression]) => Md5Long60(es.head)))
    // bloom_filter_agg / might_contain: Spark ships these for its
    // internal runtime-filter rewrite but does not register them for
    // SQL users; injecting them lets a pure-SQL pipeline build a
    // bloom filter on a dimension's keys and prune a fact scan
    // before the join (see ops/Skew.bloomPrune for the Column form).
    // Usage: might_contain((SELECT bloom_filter_agg(xxhash64(k), n, bits)
    //        FROM dim), xxhash64(k))
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg"),
      (es: Seq[Expression]) => es.length match {
        case 1 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es.head)
        case 2 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es.head, es(1))
        case _ => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es.head, es(1), es(2))
      }))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain"),
      (es: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es.head, es(1))))

    // heavy_hitters(key, m): the Space-Saving mergeable sketch as a
    // SQL aggregate (ops/HeavyHitters.scala) — returns array<struct<
    // key, count, err>> ordered by (count desc, key).
    ext.injectFunction((FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters"),
      (es: Seq[Expression]) => {
        val m = es(1) match {
          case Literal(v: Number, _) => v.intValue()
          case other => throw new IllegalArgumentException(
            s"heavy_hitters(key, m): m must be an integer literal, got $other")
        }
        ColumnBridge.aggregatorExpression(
          new graft.ops.HeavyHitters.HeavyHittersAggregator(m),
          org.apache.spark.sql.Encoders.STRING, Seq(es.head))
      }))

    // approx_quantiles(value, k, p1, p2, ...): the mergeable KLL/MRL
    // quantile sketch as a SQL aggregate (ops/QuantileSketch.scala) —
    // returns array<double>, one entry per requested probability.
    ext.injectFunction((FunctionIdentifier("approx_quantiles"),
      info("approx_quantiles"),
      (es: Seq[Expression]) => {
        def num(e: Expression, what: String): Double = e match {
          case Literal(v: Number, _) => v.doubleValue()
          // fractional SQL literals (0.5) parse as DecimalType
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"approx_quantiles: $what must be a numeric literal, got $other")
        }
        val k = num(es(1), "k").toInt
        val probs = es.drop(2).map(num(_, "probability"))
        ColumnBridge.aggregatorExpression(
          new graft.ops.QuantileSketch.QuantileAggregator(k, probs),
          org.apache.spark.sql.Encoders.scalaDouble, Seq(es.head))
      }))

    // ---- table-valued surface: whole-operator semantics that are
    // Column-API compositions become SQL TVFs — the builder resolves
    // table-name literals through the active session's catalog and
    // returns the SAME logical plan the Column API produces, so the
    // pure-SQL user gets the identical shuffle-bounded shape.
    def strArg(fn: String)(e: Expression): String = e match {
      case Literal(v, _) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: expected a string literal, got $other")
    }
    def numArg(fn: String)(e: Expression): Long = e match {
      case Literal(v: Number, _) => v.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: expected a numeric literal, got $other")
    }

    // asof_join('left', 'right', 'k1[,k2,...]', 'lts', 'rts'):
    // sort-merge as-of (ops/Joins.asofJoin) — one shuffle on the keys,
    // never a nested-loop join.
    ext.injectTableFunction((FunctionIdentifier("asof_join"),
      info("asof_join"),
      (es: Seq[Expression]) => {
        val a = strArg("asof_join") _
        val s = org.apache.spark.sql.SparkSession.active
        graft.ops.Joins.asofJoin(s.table(a(es(0))), s.table(a(es(1))),
            a(es(2)).split(",").map(_.trim).toSeq, a(es(3)), a(es(4)))
          .queryExecution.logical
      }))

    // range_join('points', 'intervals', 'k1[,k2,...]', 'ts', 'start',
    // 'end', bucketWidth): bucketed interval-containment equi-join
    // (ops/Joins.rangeJoinBucketed) — linear shuffle, exact residual.
    ext.injectTableFunction((FunctionIdentifier("range_join"),
      info("range_join"),
      (es: Seq[Expression]) => {
        val a = strArg("range_join") _
        val s = org.apache.spark.sql.SparkSession.active
        graft.ops.Joins.rangeJoinBucketed(s.table(a(es(0))), s.table(a(es(1))),
            a(es(2)).split(",").map(_.trim).toSeq, a(es(3)), a(es(4)), a(es(5)),
            numArg("range_join")(es(6)))
          .queryExecution.logical
      }))

    // minhash_sigs('table', 'idCol', 'textCol', n, k): map-side
    // MinHash signatures (dedup/Dedup.minhashSignaturesMapSide — no
    // explode, no shuffle; bit-equal to the groupBy form per spec).
    ext.injectTableFunction((FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs"),
      (es: Seq[Expression]) => {
        val a = strArg("minhash_sigs") _
        val n = numArg("minhash_sigs") _
        val s = org.apache.spark.sql.SparkSession.active
        val docs = s.table(a(es(0))).select(
          org.apache.spark.sql.functions.col(a(es(1))).as("doc_id"),
          org.apache.spark.sql.functions.col(a(es(2))).as("text"))
        graft.dedup.Dedup
          .minhashSignaturesMapSide(docs, n(es(3)).toInt, n(es(4)).toInt)
          .queryExecution.logical
      }))

    // topk(score, id, k): bounded map-side partial top-k aggregate —
    // the same hot path the Column API uses (ops/TopK.scala). k must
    // be a literal (it sizes the aggregation buffer at plan time).
    ext.injectFunction((FunctionIdentifier("topk"),
      info("topk"),
      (es: Seq[Expression]) => {
        val k = es(2) match {
          case Literal(v: Number, _) => v.intValue()
          case other => throw new IllegalArgumentException(
            s"topk(score, id, k): k must be an integer literal, got $other")
        }
        ColumnBridge.aggregatorExpression(
          new graft.ops.TopK.TopKAggregator(k),
          org.apache.spark.sql.Encoders.product[graft.ops.TopK.ScoredId],
          Seq(es(0), es(1)))
      }))
  }
}
