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
