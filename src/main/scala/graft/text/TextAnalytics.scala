package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.md5Long

/** Text-analysis operators (token counting, quality scoring,
  * language-ID, fingerprinting) as single-pass narrow transforms —
  * no shuffle except fingerprint's shingle groupBy.
  *
  * Formulas are written with the exact same association order as the
  * DuckDB oracles so double arithmetic agrees bit-for-bit.
  */
object TextAnalytics {

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Language lexica for the n-gram/stopword language-ID heuristic. */
  val Lexica: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "une"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Whitespace + BPE-ish regex token counts per doc. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_bpe"))
      .orderBy("doc_id")

  /** Quality score ∈ [0,1] from token count, punctuation ratio, and
    * stopword ratio: score = (min(n_tok,100)/100) · (1 − punct/chars)
    * · (0.2 + 0.8·stop/n_tok).
    */
  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = TextPrimitives.tokens(col("text"))
    docs.select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(toks).as("n_tok"),
        countIn(toks, Stopwords).as("stop_cnt"),
        size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0))).as("punct_cnt"))
      .select(
        col("doc_id"),
        col("n_tok").cast("long").as("n_tok"),
        round(
          (least(col("n_tok"), lit(100)) / lit(100.0)) *
          (lit(1.0) - col("punct_cnt") * lit(1.0) / greatest(col("n_chars"), lit(1))) *
          (lit(0.2) + lit(0.8) * (col("stop_cnt") * lit(1.0) / greatest(col("n_tok"), lit(1)))),
          4).as("quality"))
      .orderBy("doc_id")
  }

  /** Stopword-lexicon language ID: argmax lexicon hits with fixed
    * priority en > es > de > fr on ties; 'und' (undetermined) when no
    * lexicon hits at all. When the input carries a `lang` ground-truth
    * column an `is_match` eval column is emitted too.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = TextPrimitives.tokens(col("text"))
    val hits = Lexica.map { case (lang, words) => lang -> countIn(toks, words) }
    val Seq(en, es, de, fr) = hits.map(_._2)
    val pred = when(en + es + de + fr === 0, lit("und"))
      .when(en >= greatest(es, de, fr), lit("en"))
      .when(es >= greatest(de, fr), lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
    if (docs.columns.contains("lang"))
      docs.select(col("doc_id"), pred.as("pred_lang"), col("lang"))
        .withColumn("is_match", (col("pred_lang") === col("lang")).cast("long"))
        .drop("lang")
        .orderBy("doc_id")
    else
      docs.select(col("doc_id"), pred.as("pred_lang")).orderBy("doc_id")
  }

  /** SQL mirror of [[languageId]]'s prediction for DuckDB. */
  def languageIdSql: String = {
    def cnt(words: Seq[String]) =
      s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    val Seq(en, es, de, fr) = Lexica.map { case (_, w) => cnt(w) }
    s"""SELECT doc_id, pred_lang, CAST(pred_lang = lang AS BIGINT) AS is_match FROM (
       |  SELECT doc_id, lang,
       |    CASE WHEN $en + $es + $de + $fr = 0 THEN 'und'
       |         WHEN $en >= greatest($es, $de, $fr) THEN 'en'
       |         WHEN $es >= greatest($de, $fr) THEN 'es'
       |         WHEN $de >= $fr THEN 'de'
       |         ELSE 'fr' END AS pred_lang
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Min-sketch fingerprint over 4-gram shingles: (min, max, distinct
    * count) of the 60-bit rolling shingle hashes — a winnowing-style
    * content signature.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    TextPrimitives.charShingles(docs, "doc_id", "text", 4)
      .withColumn("hm", md5Long(col("sh")))
      .groupBy("doc_id")
      .agg(min("hm").as("fp_min"), max("hm").as("fp_max"),
           count(lit(1)).as("n_shingles"))
      .orderBy("doc_id")

  /** C4-style normalization: casefold, strip punctuation, collapse
    * whitespace. Pure expression — usable map-side in batch or
    * streaming plans alike.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[.,;:!?]", ""), "\\s+", " "))

  /** Gopher-style repetition metrics per doc (Rae et al. 2021 §A1.1,
    * adapted to token streams): top-unigram fraction, type-token
    * ratio, top-bigram fraction, and the fraction of trigram
    * occurrences that are duplicated. Three (doc, gram) count
    * aggregates joined on doc_id — every stage keyed by doc, map-side
    * combinable, no global state.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    def gramCounts(n: Int) =
      TextPrimitives.tokenGrams(docs, "doc_id", "text", n)
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val uni = gramCounts(1).groupBy("doc_id").agg(
      round(max("c") / sum("c"), 4).as("top_tok_frac"),
      round(count(lit(1)) / sum("c"), 4).as("ttr"))
    val bi = gramCounts(2).groupBy("doc_id").agg(
      round(max("c") / sum("c"), 4).as("top_bigram_frac"))
    val tri = gramCounts(3).groupBy("doc_id").agg(
      round(coalesce(sum(when(col("c") > 1, col("c"))), lit(0)) / sum("c"), 4)
        .as("dup_trigram_frac"))
    uni.join(bi, Seq("doc_id")).join(tri, Seq("doc_id")).orderBy("doc_id")
  }

  /** DuckDB twin of [[repetitionStats]]. */
  def repetitionStatsSql: String = {
    def grams(n: Int) = TextPrimitives.tokenGramsSql("documents", "doc_id", "text", n)
    s"""WITH uni AS (SELECT doc_id, g, count(*) AS c FROM (${grams(1)}) GROUP BY doc_id, g),
       |bi  AS (SELECT doc_id, g, count(*) AS c FROM (${grams(2)}) GROUP BY doc_id, g),
       |tri AS (SELECT doc_id, g, count(*) AS c FROM (${grams(3)}) GROUP BY doc_id, g),
       |u AS (SELECT doc_id, round(max(c) / sum(c), 4) AS top_tok_frac,
       |             round(count(*) / sum(c), 4) AS ttr FROM uni GROUP BY doc_id),
       |b AS (SELECT doc_id, round(max(c) / sum(c), 4) AS top_bigram_frac
       |      FROM bi GROUP BY doc_id),
       |t AS (SELECT doc_id, round(coalesce(sum(c) FILTER (WHERE c > 1), 0) / sum(c), 4)
       |             AS dup_trigram_frac FROM tri GROUP BY doc_id)
       |SELECT u.doc_id, top_tok_frac, ttr, top_bigram_frac, dup_trigram_frac
       |FROM u JOIN b USING (doc_id) JOIN t USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Deterministic token-dropout augmentation: drop every token whose
    * content-stable hash of (doc_id, position) lands in 1/`dropOneIn`
    * of the hash space — the text-side analogue of feature dropout,
    * reproducible across runs/engines (no RNG state, so the same doc
    * always augments the same way — the property that makes augmented
    * corpora diffable and cacheable). Pure per-row map: zero shuffle.
    * Output: doc_id, n_orig, n_kept, h_aug (hash of the augmented
    * text).
    */
  def tokenDropout(docs: DataFrame, dropOneIn: Int): DataFrame =
    docs.select(col("doc_id"), TextPrimitives.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_orig"),
        filter(col("t"), (_, i) =>
          pmod(md5Long(concat(lit("aug:"), col("doc_id").cast("string"),
            lit(":"), i.cast("string"))), lit(dropOneIn)) =!= 0).as("kept"))
      .select(col("doc_id"), col("n_orig"),
        size(col("kept")).cast("long").as("n_kept"),
        md5Long(concat_ws(" ", col("kept"))).as("h_aug"))

  /** Per-doc top-k terms by tf-idf (keyword extraction — the
    * complement of BM25's query-side scoring): tf = in-doc count,
    * idf = ln(N/df) over the corpus. Plan shape: two hash aggregates
    * (tf keyed by (doc, tok), df keyed by tok), a join on tok (AQE
    * broadcasts the df side when the vocab is small; shuffles on tok
    * when it isn't — both fine at 100 TB since df is vocab-sized,
    * not corpus-sized), and a PER-DOC window for the top-k (never
    * global). Rank orders by (ROUNDED tfidf desc, tok) so the winner
    * set is engine-exact.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextPrimitives.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // r17: df = rows-per-tok OVER the tf table — a count window on the
    // tok partition attaches it in the same exchange a df-aggregate
    // would need, minus the aggregate AND the join back (guide §2.4:
    // the join re-shuffled tf by tok a second time for the same
    // partitioning). Integer row count — identical df values.
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy("tok")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
    tf.withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "tok", "tf", "df", "tfidf", "rank")
      .orderBy("doc_id", "rank")
  }

  /** Benchmark decontamination: flag training docs sharing any
    * n-token shingle with an eval/benchmark set (the 13-gram-overlap
    * family, n scaled to this corpus). The benchmark shingle set is
    * orders of magnitude smaller than the corpus, so it broadcasts
    * and the corpus side streams map-side — the only shuffle is the
    * per-doc count aggregate, keyed by doc_id.
    */
  def contamination(train: DataFrame, bench: DataFrame, n: Int): DataFrame = {
    val t = TextPrimitives.tokenShingles(train, "doc_id", "text", n)
    val b = TextPrimitives.tokenShingles(bench, "doc_id", "text", n)
      .select("sh").distinct().withColumn("hit", lit(1))
    t.join(broadcast(b), Seq("sh"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit") / col("n_grams"), 4).as("hit_frac"),
        (col("n_hit") > 0).cast("int").as("contaminated"))
      .orderBy("doc_id")
  }
}
