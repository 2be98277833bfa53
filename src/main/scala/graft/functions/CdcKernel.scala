package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking kernel (the FastCDC/rsync family) for
  * dedup_cdc_chunks. One compiled call per DOCUMENT does the whole
  * gram scan + chunk hashing, so neither the text nor any per-gram
  * row ever leaves the expression:
  *
  *   - r16 shape: explode every gram position → codegen'd md5 filter
  *     → distinct() + per-doc Window — the full document text rode
  *     TWO shuffles (~2·Σlen²/32 bytes at corpus scale).
  *   - HOF shape (filter(sequence) + zip_with, the Chunker.scala:12
  *     idiom): zero-shuffle, but higher-order functions are
  *     interpreted (CodegenFallback) — the md5-per-gram lambda walked
  *     the expression tree per gram and measured ~2.1 s vs the
  *     shuffle shape's 1.75 s floor at sf0.1. A posexplode variant
  *     re-introduced the quadratic as intra-task Generate copies
  *     (text retained per cut row): 3.7 s.
  *   - this kernel: the loop lives in compiled Scala, called once per
  *     row from whole-stage codegen; output is array<struct<h,clen>>
  *     (16-byte md5 + chunk char length) — the explode downstream
  *     fans out ~len/mod SMALL rows and only (doc_id, h, clen)
  *     reaches the final distinct-count aggregate.
  *
  * Semantics are pinned to the DuckDB oracle: cut wherever the top 60
  * bits of md5(substring(text, i, gram)) ≡ 0 (mod `mod`) for 1-based
  * char position i in [1, len-gram+1], position 1 always a cut; chunk
  * j spans [cut_j, cut_{j+1}) with the last chunk running to len;
  * h = md5 of the chunk's UTF-8 bytes, clen = chunk CHAR length.
  * Char→byte offsets are precomputed in one pass so each gram is a
  * (offset, len) digest update — no per-gram UTF8String allocation
  * and no O(len²) re-scan from repeated substringSQL calls.
  *
  * Top-level object on purpose: generated code calls
  * `graft.functions.CdcKernel.chunks(...)` and only top-level objects
  * get static forwarders Janino can resolve (see Md5Hash's note).
  */
object CdcKernel {
  private val tl = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of the digest as a non-negative Long — bit-identical
    * to Md5Hash.hash60 / conv(substring(md5(x),1,15),16,10).
    */
  private def top60(b: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
    (h << 4) | ((b(7) & 0xf0L) >> 4)
  }

  def chunks(text: UTF8String, gram: Int, mod: Int): ArrayData = {
    val bytes = text.getBytes
    val n = text.numChars()
    // char i (0-based) starts at byte offsets(i); offsets(n) = end
    val offsets = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (ci < n) {
      offsets(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offsets(n) = bytes.length
    val d = tl.get()
    // 0-based cut positions, ascending; 0 is always a cut
    var cuts = new Array[Int](math.max(4, n / mod + 2))
    cuts(0) = 0
    var nc = 1
    var i = 1 // 0 already recorded — skip its gram test's duplicate
    val lastStart = n - gram
    while (i <= lastStart) {
      d.reset()
      d.update(bytes, offsets(i), offsets(i + gram) - offsets(i))
      if (top60(d.digest()) % mod == 0) {
        if (nc == cuts.length) cuts = java.util.Arrays.copyOf(cuts, nc * 2)
        cuts(nc) = i
        nc += 1
      }
      i += 1
    }
    // and position 1's own gram (i = 0) — already a cut, nothing to add
    val out = new Array[Any](nc)
    var j = 0
    while (j < nc) {
      val st = cuts(j)
      val en = if (j + 1 < nc) cuts(j + 1) else n
      d.reset()
      d.update(bytes, offsets(st), offsets(en) - offsets(st))
      out(j) = new GenericInternalRow(Array[Any](d.digest(), en - st))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `cdc_chunks(text)` → array<struct<h: binary, clen: int>> — one
  * struct per content-defined chunk (md5 of the chunk bytes + chunk
  * char length). See [[CdcKernel]] for semantics and the measured
  * history of the three plan shapes.
  */
case class CdcChunks(child: Expression, gram: Int, mod: Int)
    extends UnaryExpression {
  require(gram > 0 && mod > 0, s"need gram > 0 and mod > 0")
  override def prettyName: String = "cdc_chunks"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", BinaryType, nullable = false),
      StructField("clen", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    CdcKernel.chunks(t.asInstanceOf[UTF8String], gram, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcKernel.chunks($c, $gram, $mod)")

  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

object CdcChunks {
  def apply(text: Column, gram: Int, mod: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), gram, mod))
}
