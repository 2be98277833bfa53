package graft

import org.apache.spark.sql.functions._
import graft.text.{Bm25, Chunker}
import graft.ann.Quant

class TextOpsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
  private def emb = Tables.embeddings(spark, sfDir)

  test("chunker: strides cover the doc, ids dense from 0, size bounded") {
    val ch = Chunker.chunkDocs(docs.limit(50), size = 500, stride = 400)
    val byDoc = ch.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("chunk_id").as("mn"), max("chunk_id").as("mx"),
           max(length(col("chunk"))).as("maxlen"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .collect()
    byDoc.foreach { r =>
      val (n, mn, mx, maxlen, len) = (r.getAs[Long]("n"), r.getAs[Long]("mn"),
        r.getAs[Long]("mx"), r.getAs[Int]("maxlen"), r.getAs[Int]("len"))
      assert(mn == 0 && mx == n - 1 && maxlen <= 500)
      // last chunk start (mx*400+1) must still be inside the doc
      assert(mx * 400 + 1 <= len && (mx + 1) * 400 + 1 > len)
    }
    // consecutive chunks overlap by size - stride = 100 chars
    val c0 = ch.filter(col("doc_id") === 0).orderBy("chunk_id")
      .select("chunk").collect().map(_.getString(0))
    if (c0.length > 1) assert(c0(0).takeRight(100) == c0(1).take(100))
  }

  test("bm25: docs containing a query term outrank docs without it") {
    val terms = Seq("spark", "hash", "merge")
    val top = Bm25.search(docs, terms, 10).collect()
    assert(top.length == 10 && top.forall(_.getAs[Double]("bm25") > 0))
    val scores = top.map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("scalar quantization roundtrip error is bounded by half a step") {
    val dec = Quant.decode(Quant.encode(emb.limit(200)))
    val maxErr = dec.select(max(aggregate(
      zip_with(col("embedding"), col("dequant"),
        (x, y) => abs(x.cast("double") - y)),
      lit(0.0), (a, v) => greatest(a, v))).as("e")).head().getDouble(0)
    // per-dim range / 255 / 2 + fp slack; embedding values are O(1)
    val dims = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg((max(col("x").cast("double")) - min(col("x").cast("double"))).as("r"))
    val maxRange = dims.agg(max("r")).head().getDouble(0)
    assert(maxErr <= maxRange / 255.0 / 2.0 + 1e-9, s"err=$maxErr range=$maxRange")
  }

  test("quantized codes stay in [0, 255]") {
    val enc = Quant.encode(emb.limit(200))
    val row = enc.agg(min(array_min(col("codes"))).as("mn"),
                      max(array_max(col("codes"))).as("mx")).head()
    assert(row.getAs[Long]("mn") >= 0 && row.getAs[Long]("mx") <= 255)
  }
}
