package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives: tokenization and character shingling.
  * Kept as pure Catalyst expressions (split/explode/substr) so the
  * shuffle-heavy dedup pipelines stay inside whole-stage codegen.
  */
object TextPrimitives {

  /** Whitespace tokens of the trimmed, lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Explode distinct lowercase character n-grams:
    * (idCol, sh). For texts shorter than n a single short shingle is
    * produced (substr is clamped), matching the DuckDB oracle's
    * `substr(t, i, n)` over `generate_series(1, greatest(len-n+1,1))`.
    */
  def charShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), lower(trim(col(textCol))).as("t"))
      .withColumn("i", explode(sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1)))))
      .selectExpr(idCol, s"substr(t, i, $n) AS sh")
      .distinct()

  /** Distinct n-token w-shingles (idCol, sh) — the standard dedup
    * basis for natural text, where character n-grams over-collide
    * (e.g. digit-heavy corpora).
    */
  def tokenShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(transform(
        sequence(lit(0), greatest(size(col("toks")) - n, lit(0))),
        i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))).as("sh"))
      .distinct()

  /** SQL fragment mirroring [[tokenShingles]] for DuckDB oracles
    * (1-based end-inclusive DuckDB list slice toks[i+1 : i+n] ==
    * Spark slice(toks, i+1, n)).
    */
  def tokenShinglesSql(table: String, idCol: String, textCol: String, n: Int,
                       where: String = "TRUE"): String =
    s"""SELECT DISTINCT $idCol, array_to_string(toks[i+1:i+$n], ' ') AS sh FROM (
       |  SELECT $idCol, toks, unnest(generate_series(0, greatest(len(toks) - $n, 0))) AS i FROM (
       |    SELECT $idCol, regexp_split_to_array(lower(trim($textCol)), '\\s+') AS toks
       |    FROM $table WHERE $where))""".stripMargin

  /** Non-distinct n-token grams with multiplicity (idCol, g) — the
    * basis for repetition metrics, where duplicate grams are the
    * signal rather than noise. 1-token docs emit the lone token
    * (slice is clamped), matching [[tokenGramsSql]].
    */
  def tokenGrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(transform(
        sequence(lit(0), greatest(size(col("toks")) - n, lit(0))),
        i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))).as("g"))

  /** SQL fragment mirroring [[tokenGrams]] for DuckDB oracles. */
  def tokenGramsSql(table: String, idCol: String, textCol: String, n: Int,
                    where: String = "TRUE"): String =
    s"""SELECT $idCol, array_to_string(toks[i+1:i+$n], ' ') AS g FROM (
       |  SELECT $idCol, toks, unnest(generate_series(0, greatest(len(toks) - $n, 0))) AS i FROM (
       |    SELECT $idCol, regexp_split_to_array(lower(trim($textCol)), '\\s+') AS toks
       |    FROM $table WHERE $where))""".stripMargin

  /** SQL fragment mirroring [[charShingles]] for DuckDB oracles:
    * a CTE body producing (idCol, sh), distinct.
    */
  def charShinglesSql(table: String, idCol: String, textCol: String, n: Int,
                      where: String = "TRUE"): String =
    s"""SELECT DISTINCT $idCol, substr(t, i, $n) AS sh FROM (
       |  SELECT $idCol, lower(trim($textCol)) AS t,
       |         unnest(generate_series(1, greatest(len(trim($textCol)) - ${n - 1}, 1))) AS i
       |  FROM $table WHERE $where)""".stripMargin
}
