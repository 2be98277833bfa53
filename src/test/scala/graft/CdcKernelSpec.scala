package graft

import org.apache.spark.sql.functions._
import graft.functions.{CdcChunks, VectorFunctions}

/** CdcChunks (the compiled per-row CDC kernel behind
  * dedup_cdc_chunks) must be bit-equivalent to the all-builtin
  * higher-order-function formulation — cut positions from
  * filter(sequence) over md5Long-per-gram, chunk bounds from the
  * shifted cut array, md5 over the chunk's UTF-8 bytes. The HOF form
  * is the readable spec; the kernel exists because HOF lambdas run
  * interpreted (measured 2.1 s vs the kernel's 0.46 s floor at
  * sf0.1 — history in CdcKernel's scaladoc).
  */
class CdcKernelSpec extends SparkSpec {

  /** (doc_id, hex-md5, clen) rows via the builtin-HOF reference. */
  private def hofChunks(docs: org.apache.spark.sql.DataFrame) = {
    import VectorFunctions.md5Long
    val cuts = array_distinct(concat(array(lit(1)),
      filter(sequence(lit(1), length(col("text")) - 7),
        i => md5Long(col("text").substr(i, lit(8))) % 32 === 0)))
    docs
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        cuts.as("cuts"))
      .localCheckpoint(eager = false) // block ProjectCollapsing triple-eval
      .select(col("doc_id"), col("text"), col("len"), col("cuts"),
        posexplode(col("cuts")).as(Seq("idx", "st")))
      .select(col("doc_id"),
        md5(col("text").substr(col("st"),
          coalesce(get(col("cuts"), col("idx") + 1), col("len") + 1)
            - col("st")).cast("binary")).as("h"),
        (coalesce(get(col("cuts"), col("idx") + 1), col("len") + 1)
          - col("st")).as("clen"))
  }

  private def kernelChunks(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"),
        explode(CdcChunks(col("text"), 8, 32)).as("c"))
      .select(col("doc_id"), hex(col("c.h")).as("h"), col("c.clen").as("clen"))

  private def assertEquiv(docs: org.apache.spark.sql.DataFrame): Unit = {
    val ref = hofChunks(docs).collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase, r.getInt(2)))
      .sortBy(_.toString)
    val got = kernelChunks(docs).collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase, r.getInt(2)))
      .sortBy(_.toString)
    assert(got.nonEmpty && got.sameElements(ref),
      s"kernel=${got.take(5).toSeq} ref=${ref.take(5).toSeq}")
  }

  test("kernel ≡ HOF reference on the sf0.001 documents corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) >= 8)
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
    assertEquiv(docs)
  }

  test("kernel ≡ HOF reference on multibyte UTF-8 (char offsets ≠ byte offsets)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("d1", "héllo wörld — ünïcode çhunking test with àccénts repeated " * 8),
      ("d2", "日本語のテキストで内容定義チャンキングを検証する長めの文章です。" * 6),
      ("d3", "emoji 🎉 mixed 🚀 ascii and 4-byte codepoints 🧪 padded out " * 7),
      ("d4", "plain ascii control case long enough to cut somewhere " * 9),
      ("d5", "exactly8"), // len == 8: single gram position, one chunk
      ("d6", "ɑβɣδ mixed 2-byte αβγ with spaces and numbers 0123456789 " * 8)
    ).toDF("doc_id", "text").filter(length(col("text")) >= 8)
    assertEquiv(docs)
  }

  test("kernel chunk lengths tile the document exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) >= 8)
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
    val bad = docs
      .select(col("doc_id"), length(col("text")).as("len"),
        aggregate(CdcChunks(col("text"), 8, 32), lit(0),
          (acc, c) => acc + c.getField("clen")).as("sum_clen"))
      .filter(col("sum_clen") =!= col("len"))
      .count()
    assert(bad == 0L)
  }
}
