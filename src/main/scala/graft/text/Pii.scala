package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub stage every training-data
  * pipeline runs before text leaves the ingest boundary (the reference
  * stores raw chunk text in point payloads, document_ingestor.py:620;
  * a compliant corpus build must be able to scrub it first).
  *
  * Pure per-row map (regexp_extract_all + chained regexp_replace):
  * zero shuffle, whole-stage codegen, linear at 100 TB. Patterns stay
  * in the RE2-compatible subset (no backreferences/lookaround) so the
  * same pattern strings run in Spark (Java regex), DuckDB, and any
  * RE2-based scrubber a user already has.
  */
object Pii {

  /** One redaction rule: matches of `pattern` are replaced by `token`
    * and counted into column `n_<name>`.
    */
  final case class Rule(name: String, pattern: String, token: String)

  val email: Rule = Rule("email",
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]")
  val phone: Rule = Rule("phone",
    """\b\d{3}-\d{3}-\d{4}\b""", "[PHONE]")
  val ipv4: Rule = Rule("ip",
    """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "[IP]")

  val defaultRules: Seq[Rule] = Seq(email, phone, ipv4)

  /** All original columns + per-rule match counts `n_<name>` (counted
    * on the ORIGINAL text, so categories don't shadow each other) +
    * `redacted` = text with rules applied in order.
    */
  def redact(docs: DataFrame, textCol: String = "text",
             rules: Seq[Rule] = defaultRules): DataFrame = {
    val counts = rules.map(r =>
      size(regexp_extract_all(col(textCol), lit(r.pattern), lit(0)))
        .cast("long").as(s"n_${r.name}"))
    val redacted = rules.foldLeft(col(textCol): Column)((c, r) =>
      regexp_replace(c, r.pattern, r.token))
    docs.select(docs.columns.map(col) ++ counts :+ redacted.as("redacted"): _*)
  }
}
