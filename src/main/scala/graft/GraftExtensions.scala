package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorExpressions.{CosineSimilarity, DotProduct, SqNorm}

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
  }
}
