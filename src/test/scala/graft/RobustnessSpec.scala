package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input robustness: a library operator must not crash on
  * null text, empty strings, whitespace-only docs, unicode, 1-char
  * docs, or EMPTY inputs — the rows a real 100 TB corpus always
  * contains. These specs pin "no exception + sane cardinality" across
  * the text/dedup/embed/sampling surface.
  */
class RobustnessSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docsOf(rows: Seq[(java.lang.Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) =>
        org.apache.spark.sql.Row(i: java.lang.Long, t) }),
      schema)

  private val dirty = docsOf(Seq(
    (0L, "hello world hello"),
    (1L, null),
    (2L, ""),
    (3L, "   "),
    (4L, "héllo wörld 你好 мир"),
    (5L, "a")))

  test("text and dedup operators tolerate null/empty/unicode text") {
    import graft.dedup.Dedup
    import graft.text.{TextAnalytics, TextPrimitives}
    assert(Dedup.exact(dirty).collect().length >= 1)
    assert(Dedup.minhashSignatures(dirty, 5, 8).collect().length >= 1)
    // the map-side HOF form must agree with the shuffle form on which
    // docs survive (null text yields no signature in both)
    val a = Dedup.minhashSignatures(dirty, 5, 8)
      .collect().map(_.getLong(0)).toSet
    val b = Dedup.minhashSignaturesMapSide(dirty, 5, 8)
      .na.drop().collect().map(_.getLong(0)).toSet
    assert(b.subsetOf(a ++ Set(1L, 2L, 3L)), s"a=$a b=$b")
    assert(Dedup.simhash(dirty).collect().length >= 1)
    assert(TextPrimitives.charShingles(dirty, "doc_id", "text", 5)
      .collect().length >= 1)
    assert(TextAnalytics.qualityScores(dirty).collect().length >= 1)
    assert(graft.text.Chunker.chunkDocs(dirty, 500, 400).collect().length >= 1)
    assert(graft.embed.HashEmbedder.embedDocs(dirty, "doc_id", "text")
      .collect().length >= 1)
    assert(graft.ops.Sampling.bottomK(dirty, "doc_id", 3).collect().length == 3)
  }

  test("operators on EMPTY input return empty, never throw") {
    import graft.dedup.Dedup
    val empty = docsOf(Seq.empty)
    assert(Dedup.exact(empty).collect().isEmpty)
    val sig = Dedup.minhashSignatures(empty, 5, 8)
    assert(sig.collect().isEmpty)
    val pairs = Dedup.minhashLshPairs(sig, 8, 2)
    assert(pairs.collect().isEmpty)
    // CC over an empty pair graph: every doc is its own cluster; over
    // an empty doc set: empty
    assert(Dedup.connectedComponents(empty, pairs).collect().isEmpty)
    val labels = Dedup.connectedComponents(dirty, pairs)
    assert(labels.collect().forall(r => r.getLong(0) == r.getLong(1)))
    assert(graft.embed.HashEmbedder.embedDocs(empty, "doc_id", "text")
      .collect().isEmpty)
    assert(graft.ops.Packing.packSequences(
      empty.select(col("doc_id"), lit(1L).as("n_tok")),
      "doc_id", "n_tok", 512L, 100L).collect().isEmpty)
    assert(graft.ops.Sampling.weightedSample(empty, "doc_id", lit(1.0), 5)
      .collect().isEmpty)
  }

  test("quantile and heavy-hitter sketches tolerate empty and single-row groups") {
    val s = spark
    import s.implicits._
    val one = Seq(("g", 1.0)).toDF("g", "v")
    val q = graft.ops.QuantileSketch.approxQuantiles(16, Seq(0.5))
    val row = one.groupBy("g").agg(q(col("v")).as("qs"))
      .select(element_at(col("qs"), 1)).head()
    assert(row.getDouble(0) == 1.0)
    val hh = graft.ops.HeavyHitters.heavyHitters(4)
    val out = one.groupBy("g").agg(hh(col("g")).as("h"))
      .select(size(col("h"))).head()
    assert(out.getInt(0) == 1)
  }
}
