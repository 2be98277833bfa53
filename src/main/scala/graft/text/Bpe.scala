package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE tokenizer: train (Sennrich et al. 2016) AND apply — the step a
  * real pretraining pipeline runs between curation and sequence
  * packing (r15 ask 5: the trainer existed, nothing encoded).
  *
  * Scale shape: every per-string operation runs on the DISTINCT
  * word-type table (Heaps'-law bounded — types, never tokens), and
  * the token stream only ever joins against the finished per-type
  * encodings. Training collects the count-weighted top-`vocabCap`
  * types to the driver (bounded, like text_bpe_merges); the APPLY is
  * fully distributed: one codegen'd double-replace chain per merge
  * rule over the type table.
  *
  * Merge application = the delimiter-safe double replace on the
  * spaced-symbol form (` h e l l o `): a single leftmost-nonoverlap
  * replace pass misses every second occurrence of an adjacent run
  * because matches share a delimiter; the survivors are never
  * adjacent, so the second pass is exact. Identical string semantics
  * in DuckDB's `replace`, which is what lets the encode be oracled.
  *
  * Token ids are the lexicographic rank of the final symbol vocabulary
  * (deterministic, engine-identical under binary collation).
  */
object Bpe {

  /** ` a b c ` — the spaced-symbol form of a word. The empty-string
    * filter makes this robust to either split('', -1) trailing-empty
    * convention.
    */
  def spacedChars(w: Column): Column =
    concat(lit(" "),
      concat_ws(" ", filter(split(w, ""), s => s =!= lit(""))), lit(" "))

  /** One merge rule ("a b" → "ab") applied delimiter-safely. */
  def applyRule(spaced: Column, rule: String): Column = {
    val from = lit(" " + rule + " ")
    val to = lit(" " + rule.replace(" ", "") + " ")
    replace(replace(spaced, from, to), from, to)
  }

  /** All rules in rank order — real BPE apply semantics. */
  def applyMerges(spaced: Column, rules: Seq[String]): Column =
    rules.foldLeft(spaced)(applyRule)

  /** Train `rounds` merges on count-weighted word types (driver-side;
    * the caller bounds `types`, e.g. TakeOrdered top-2000). Same
    * pair-count / tie-break / double-replace loop as the oracled
    * text_bpe_merges trainer (QTextCorpus.scala), so the DuckDB CTE
    * chain reproduces the rules exactly. Returns rules as "a b" in
    * rank order.
    */
  def trainMerges(types: Array[(String, Long)], rounds: Int): Seq[String] = {
    var seqs = types.map { case (w, c) => (" " + w.toCharArray.mkString(" ") + " ", c) }
    val rules = Seq.newBuilder[String]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      seqs.foreach { case (sq, c) =>
        val syms = sq.trim.split(" ")
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + " " + syms(i + 1)
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val (best, _) = counts.toSeq.sortBy { case (p, cnt) => (-cnt, p) }.head
        rules += best
        val from = " " + best + " "
        val to = " " + best.replace(" ", "") + " "
        seqs = seqs.map { case (sq, c) => (sq.replace(from, to).replace(from, to), c) }
      }
    }
    rules.result()
  }

  /** (doc_id, lang, wp [1-based word position], w) — the corpus token
    * stream; empty tokens are dropped AFTER positions are assigned so
    * positions stay stable.
    */
  def tokenPositions(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        posexplode(TextPrimitives.tokens(col("text"))).as(Seq("wp0", "w")))
      .filter(col("w") =!= "")
      .select(col("doc_id"), col("lang"), (col("wp0") + 1).cast("long").as("wp"), col("w"))

  /** Distinct word types with corpus frequencies: (w, wc). */
  def wordTypes(toks: DataFrame): DataFrame =
    toks.groupBy("w").agg(count(lit(1)).as("wc"))

  /** Encode every word TYPE through the rules: (w, arr: array of
    * symbol strings in order).
    */
  def encodeTypes(types: DataFrame, rules: Seq[String]): DataFrame =
    types.select(col("w"),
      split(trim(applyMerges(spacedChars(col("w")), rules)), " ").as("arr"))

  /** Final symbol vocabulary with deterministic ids: (sym, id), id =
    * lexicographic rank (row_number over the DISTINCT symbol set —
    * bounded: ≤ |alphabet| + rounds symbols, fine for one window).
    */
  def symbolIds(encTypes: DataFrame): DataFrame =
    encTypes.select(explode(col("arr")).as("sym")).distinct()
      .withColumn("id", row_number().over(Window.orderBy("sym")).cast("long"))

  /** Per-doc token-id sequences: (doc_id, lang, ids: array<long>) —
    * word types encode once, the token stream joins the finished
    * encodings, ids concatenate in (word position, symbol position)
    * order.
    */
  def encodeDocs(docs: DataFrame, rounds: Int, vocabCap: Int): DataFrame = {
    val toks = tokenPositions(docs)
    val types = wordTypes(toks)
    val top = types.orderBy(col("wc").desc, col("w")).limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rules = trainMerges(top, rounds)
    val enc = encodeTypes(types, rules)
    val sid = symbolIds(enc)
    val typeIds = enc
      .select(col("w"), posexplode(col("arr")).as(Seq("sp", "sym")))
      .join(broadcast(sid), "sym")
      .groupBy("w")
      .agg(sort_array(collect_list(struct(col("sp"), col("id")))).as("sids"))
      .select(col("w"), transform(col("sids"), s => s.getField("id")).as("wids"))
    toks.join(typeIds, "w")
      .groupBy("doc_id", "lang")
      .agg(sort_array(collect_list(struct(col("wp"), col("wids")))).as("ws"))
      .select(col("doc_id"), col("lang"),
        flatten(transform(col("ws"), s => s.getField("wids"))).as("ids"))
  }
}
