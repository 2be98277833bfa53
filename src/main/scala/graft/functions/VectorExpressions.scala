package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Thread-local MD5 used by [[VectorExpressions.Md5Long60]]
  * (MessageDigest is not thread-safe; one instance per executor
  * thread, reused).
  *
  * Top-level object on purpose: generated code calls
  * `graft.functions.Md5Hash.hash60(...)` and only top-level objects
  * get static forwarders Janino can resolve — a nested object
  * compiles to `Outer$Inner$` with no forwarder and the whole stage
  * silently falls back to interpreted execution.
  */
object Md5Hash {
  private val tl = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits (= top 60 bits) of md5 as a non-negative
    * Long — bit-identical to `conv(substring(md5(x),1,15),16,10)`
    * without the hex-string round-trip.
    */
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = tl.get(); d.reset()
    val b = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
    (h << 4) | ((b(7) & 0xf0L) >> 4)
  }
}

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function formulation (VectorFunctions.cosineSim)
  * allocates a lambda frame per element; these expressions compile to
  * a tight primitive loop inside whole-stage codegen — the difference
  * between 107 s and ~2 s on the 2M-pair near-dup join at sf0.1.
  *
  * Accumulation is double, left-to-right, identical to both the HOF
  * versions and DuckDB's `list_cosine_similarity(::DOUBLE[])`, so
  * swapping them in changes nothing oracle-visible (spec-asserted).
  *
  * Accepts array<float> and array<double> on either side.
  */
object VectorExpressions {

  private[functions] def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  private def getter(arr: String, dt: DataType, i: String): String =
    if (dt == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  private def get(a: ArrayData, dt: DataType, i: Int): Double =
    if (dt == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  abstract class BinaryVectorExpression extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** cosine(a, b) with 0.0 for zero vectors. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryVectorExpression {
    override def prettyName: String = "cosine_similarity"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = get(a, lt, i); val y = get(b, rt, i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
        val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
          ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
        val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = ${getter(a, lt, i)};
           |  double $y = ${getter(b, rt, i)};
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Σ aᵢ·bᵢ */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryVectorExpression {
    override def prettyName: String = "dot_product"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += get(a, lt, i) * get(b, rt, i); i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
        val (n, dot, i) = (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += ${getter(a, lt, i)} * ${getter(b, rt, i)};
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Σ aᵢ² */
  case class SqNorm(child: Expression) extends UnaryExpression {
    override def prettyName: String = "sq_norm"
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemType(child.dataType).isDefined) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> input, got ${child.dataType.sql}")

    override def nullSafeEval(c: Any): Any = {
      val a = c.asInstanceOf[ArrayData]
      val t = elemType(child.dataType).get
      var s = 0.0; var i = 0
      val n = a.numElements()
      while (i < n) { val x = get(a, t, i); s += x * x; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val t = elemType(child.dataType).get
        val (n, acc, i, x) = (ctx.freshName("n"), ctx.freshName("acc"),
          ctx.freshName("i"), ctx.freshName("x"))
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = ${getter(a, t, i)};
           |  $acc += $x * $x;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Codegen'd 60-bit md5 hash of a string — the hash family basis
    * (MinHash/SimHash/fingerprints/splits). Skips the md5-hex →
    * substring → conv(16,10) chain (two string allocs + a radix parse
    * per row) while producing the same value, so every oracle keeps
    * matching (spec-asserted against the conv formulation).
    */
  case class Md5Long60(child: Expression) extends UnaryExpression {
    override def prettyName: String = "md5_long60"
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(c: Any): Any =
      Md5Hash.hash60(c.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Md5Hash.hash60($c)")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  // ---- Column API -------------------------------------------------

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sqNorm(a: Column): Column =
    ColumnBridge.column(SqNorm(ColumnBridge.expression(a)))

  def md5Long60(a: Column): Column =
    ColumnBridge.column(Md5Long60(ColumnBridge.expression(a)))

  /** Register as SQL functions (cosine_similarity, dot_product,
    * sq_norm) on a session.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => CosineSimilarity(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sq_norm",
      es => SqNorm(es.head), "scala_udf")
  }
}
