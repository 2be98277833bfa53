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

  test("residual quantization fidelity beats plain int8") {
    val resid = Quant.residualFidelity(emb, "label")
      .agg(avg("fid")).head().getDouble(0)
    val dec = Quant.decode(Quant.encode(emb))
    val plain = dec.select(avg(
      graft.functions.VectorFunctions.score(col("embedding"), col("dequant"))))
      .head().getDouble(0)
    // residual ranges are tighter than raw ranges, so the same 8 bits
    // must reconstruct strictly better on average
    assert(resid > plain, s"resid=$resid plain=$plain")
    assert(resid > 0.99, s"resid=$resid")
  }

  test("quantized codes stay in [0, 255]") {
    val enc = Quant.encode(emb.limit(200))
    val row = enc.agg(min(array_min(col("codes"))).as("mn"),
                      max(array_max(col("codes"))).as("mx")).head()
    assert(row.getAs[Long]("mn") >= 0 && row.getAs[Long]("mx") <= 255)
  }

  test("repetition stats: degenerate repeated doc vs all-distinct doc") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (0L, "x x x x x x"),             // one token 6×
      (1L, "a b c d e f"),             // all distinct
      (2L, "a b a b a b")              // alternating pair
    ).toDF("doc_id", "text")
    val st = graft.text.TextAnalytics.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: every gram identical
    assert(st(0L).getDouble(1) == 1.0 && st(0L).getDouble(2) == round4(1.0 / 6))
    assert(st(0L).getDouble(3) == 1.0 && st(0L).getDouble(4) == 1.0)
    // doc 1: no repetition anywhere
    assert(st(1L).getDouble(1) == round4(1.0 / 6) && st(1L).getDouble(2) == 1.0)
    assert(st(1L).getDouble(3) == round4(1.0 / 5) && st(1L).getDouble(4) == 0.0)
    // doc 2: 2 types / 6 tokens; bigrams = [ab,ba,ab,ba,ab] → top 3/5;
    // trigrams = [aba,bab,aba,bab] all duplicated
    assert(st(2L).getDouble(1) == 0.5 && st(2L).getDouble(2) == round4(2.0 / 6))
    assert(st(2L).getDouble(3) == round4(3.0 / 5) && st(2L).getDouble(4) == 1.0)
  }

  test("contamination: only docs sharing an n-gram with the bench set flag") {
    val sp = spark; import sp.implicits._
    val train = Seq(
      (0L, "p q r s t u v w x y"),     // contains the bench 4-gram r s t u
      (1L, "a b c d e f g h i j")      // clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "r s t u")).toDF("doc_id", "text")
    val out = graft.text.TextAnalytics.contamination(train, bench, 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Int]("contaminated") == 1 && out(0L).getLong(2) == 1L)
    assert(out(0L).getLong(1) == 7L) // 10 tokens → 7 4-gram shingles
    assert(out(1L).getAs[Int]("contaminated") == 0 && out(1L).getLong(2) == 0L)
  }

  test("PII redaction replaces emails/phones/IPs and counts per category") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (0L, "mail me at jo.doe+x@sub.example.org or jo@ex.io thanks"),
      (1L, "call 555-123-4567 from 10.0.0.1 now"),
      (2L, "no pii here, just words and 12345 and a.b"),   // negatives
      (3L, "v4 999.999.999.999 still matches the shape"),  // shape, not validity
      (4L, "")).toDF("doc_id", "text")
    val out = graft.text.Pii.redact(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_email") == 2 &&
      out(0L).getAs[String]("redacted") == "mail me at [EMAIL] or [EMAIL] thanks")
    assert(out(1L).getAs[Long]("n_phone") == 1 && out(1L).getAs[Long]("n_ip") == 1 &&
      out(1L).getAs[String]("redacted") == "call [PHONE] from [IP] now")
    assert(out(2L).getAs[Long]("n_email") == 0 && out(2L).getAs[Long]("n_phone") == 0 &&
      out(2L).getAs[Long]("n_ip") == 0 &&
      out(2L).getAs[String]("redacted") == "no pii here, just words and 12345 and a.b")
    // the pattern family is shape-based (like every regex scrubber);
    // out-of-range octets still redact — better safe for PII
    assert(out(3L).getAs[Long]("n_ip") == 1)
    assert(out(4L).getAs[String]("redacted") == "")
  }

  test("tf-idf top terms: corpus-unique terms outrank ubiquitous ones") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (0L, "common common rare0 rare0 rare0"),
      (1L, "common rare1"),
      (2L, "common rare2")).toDF("doc_id", "text")
    val out = graft.text.TextAnalytics.tfidfTopTerms(docs, 2).collect()
    val top = out.filter(_.getLong(5) == 1L).map(r => r.getLong(0) -> r.getString(1)).toMap
    // "common" appears in all 3 docs -> idf ln(1) = 0 -> never the top term
    assert(top == Map(0L -> "rare0", 1L -> "rare1", 2L -> "rare2"))
    val common = out.filter(_.getString(1) == "common")
    assert(common.forall(_.getDouble(4) == 0.0))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
}
