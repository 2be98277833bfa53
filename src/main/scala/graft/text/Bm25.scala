package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval over the documents table — the keyword-side
  * complement to the reference's vector search (hybrid retrieval needs
  * both). Okapi BM25 with the standard k1/b parameterization.
  *
  * Shuffle shape at scale: one explode+groupBy for term frequencies
  * (map-side combined), df and corpus stats are tiny broadcast sides.
  * Constants are written as literals (2.2 = k1+1) so an external
  * oracle reproduces the arithmetic bit-for-bit.
  */
object Bm25 {

  /** Top-k docs by BM25 for a bag of query terms (k1=1.2, b=0.75).
    * Output: doc_id, bm25 (rounded to 4).
    */
  def search(docs: DataFrame, terms: Seq[String], topK: Int): DataFrame = {
    // r17: dl rides the explode (a constant per doc, folded into the
    // (doc_id, tok) aggregate as max) instead of joining the per-doc
    // length frame back onto tf — one exchange fewer, same doubles
    // (guide §2.4; the filter stays a codegen isin, no HOF lambda)
    val toks = docs.select(col("doc_id"), TextPrimitives.tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
    val tf = toks
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).cast("double").as("tf"), max("dl").as("dl"))
    val df = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum("s"), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(topK)
  }

  /** Language-model retrieval with Dirichlet smoothing (Zhai & Lafferty
    * 2001): score(q,d) = Σ_{t∈q} ln((tf_td + μ·cf_t/T) / (dl_d + μ)).
    * The probabilistic complement to BM25 — same one-explode shuffle
    * shape, with collection term frequencies (not document df) as the
    * tiny broadcast side. Docs matching ≥1 query term are scored over
    * ALL query terms (zero-tf terms contribute the smoothed background
    * mass), so rankings are comparable across docs.
    * Output: doc_id, n_hit_terms, ql (rounded to 4).
    */
  def dirichletQL(docs: DataFrame, terms: Seq[String], topK: Int,
                  mu: Double = 2000.0): DataFrame = {
    val toks = docs.select(col("doc_id"), TextPrimitives.tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val bigT = dl.agg(sum("dl").as("t_coll"))
    val hits = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tf = hits.groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val cf = hits.groupBy("tok").agg(count(lit(1)).cast("double").as("cf"))
    // matched docs × the full query-term list, zero-tf terms kept
    val matched = tf.select("doc_id").distinct()
    val termRows = matched.sparkSession.createDataFrame(
      terms.map(Tuple1(_))).toDF("tok")
    matched.crossJoin(broadcast(termRows))
      .join(tf, Seq("doc_id", "tok"), "left")
      .join(broadcast(cf), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(bigT))
      .withColumn("s",
        log((coalesce(col("tf"), lit(0.0)) + lit(mu) * col("cf") / col("t_coll")) /
            (col("dl") + lit(mu))))
      .groupBy("doc_id")
      .agg(sum(when(col("tf").isNotNull, 1L).otherwise(0L)).as("n_hit_terms"),
           round(sum("s"), 4).as("ql"))
      .orderBy(col("ql").desc, col("doc_id")).limit(topK)
  }
}
