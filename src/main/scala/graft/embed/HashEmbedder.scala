package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.md5Long

/** Deterministic feature-hashing text embedder — the Spark-native
  * stand-in for the reference's external embedding service
  * (reference: app/core/document_ingestor.py:605 — POST /vectorizer).
  *
  * Each token hashes to (bucket, ±1 sign) via md5; the doc vector is
  * the signed bucket-count histogram, L2-normalized. Fully
  * distributed: one explode + one groupBy (map-side combinable), no
  * UDFs, no driver state. [[embedText]] reproduces the exact same
  * vector on the driver for query-by-text parity.
  */
object HashEmbedder {

  val DefaultDim = 64

  /** (idCol, embedding array<double> L2-normalized) per document.
    * `dim` must be a power of two (sign bit = bit log2(dim) of the
    * token hash — avoids a >2^53 long/double division).
    */
  def embedDocs(docs: DataFrame, idCol: String, textCol: String,
                dim: Int = DefaultDim): DataFrame =
    embedDocsImpl(docs, idCol, textCol, dim, normalize = true)

  /** Un-normalized signed bucket counts — cosine over these equals
    * cosine over the normalized vectors but is bit-reproducible in
    * plain SQL (used by the text_search_e2e oracle).
    */
  def embedDocsRaw(docs: DataFrame, idCol: String, textCol: String,
                   dim: Int = DefaultDim): DataFrame =
    embedDocsImpl(docs, idCol, textCol, dim, normalize = false)

  private def embedDocsImpl(docs: DataFrame, idCol: String, textCol: String,
                            dim: Int, normalize: Boolean): DataFrame = {
    require(Integer.bitCount(dim) == 1, s"dim must be a power of two, got $dim")
    val shift = Integer.numberOfTrailingZeros(dim)
    val tok = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
    val h = md5Long(col("tok"))
    // one groupBy with dim conditional sums: a single map-side
    // combinable shuffle, fully codegen'd (no map materialization).
    // NOTE a two-phase (doc,bucket) sparse aggregation measures 3×
    // SLOWER here at dim=64 (interpreted map_from_entries/element_at
    // beats codegen only at much larger dim) — keep the wide agg.
    val sums = (0 until dim).map(i =>
      sum(when(col("b") === i, col("sgn")).otherwise(0.0)).as(s"v$i"))
    val buckets = tok
      .select(col(idCol), (h % dim).as("b"),
              when(shiftright(h, shift).bitwiseAND(lit(1L)) === 0L, 1.0)
                .otherwise(-1.0).as("sgn"))
      .groupBy(idCol).agg(sums.head, sums.tail: _*)
    val raw = array((0 until dim).map(i => col(s"v$i")): _*)
    if (!normalize) buckets.select(col(idCol), raw.as("embedding"))
    else {
      val nrm = sqrt(graft.functions.VectorFunctions.sqNorm(raw))
      buckets.select(col(idCol),
        when(nrm === 0.0, raw).otherwise(transform(raw, v => v / nrm)).as("embedding"))
    }
  }

  /** DuckDB CTE body computing the same raw signed bucket sums as
    * [[embedDocsRaw]] — columns (doc_id, v0..v{dim-1}). Token-order
    * independent (sums of ±1.0 are exact in double).
    */
  def rawSumsSql(dim: Int, table: String = "documents"): String = {
    require(Integer.bitCount(dim) == 1)
    val shift = Integer.numberOfTrailingZeros(dim)
    val sums = (0 until dim)
      .map(i => s"sum(CASE WHEN b = $i THEN sgn ELSE 0.0 END) AS v$i").mkString(", ")
    s"""SELECT doc_id, $sums FROM (
       |  SELECT doc_id, h % $dim AS b,
       |         CASE WHEN (h >> $shift) & 1 = 0 THEN 1.0 ELSE -1.0 END AS sgn FROM (
       |    SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM (
       |      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |      FROM $table)))
       |GROUP BY doc_id""".stripMargin
  }

  /** SQL cosine between two raw-sum rows (aliases `s` and `q`) with
    * the exact accumulation order of the native CosineSimilarity
    * expression (left-assoc i = 0..dim−1).
    */
  def cosineTermsSql(dim: Int): (String, String, String) = (
    (0 until dim).map(i => s"s.v$i * q.v$i").mkString(" + "),
    (0 until dim).map(i => s"s.v$i * s.v$i").mkString(" + "),
    (0 until dim).map(i => s"q.v$i * q.v$i").mkString(" + "))

  /** Driver-side twin of [[embedDocsRaw]]: un-normalized signed bucket
    * counts (exact integers in double — order-independent sums).
    */
  def embedTextRaw(text: String, dim: Int = DefaultDim): Array[Double] = {
    require(Integer.bitCount(dim) == 1, s"dim must be a power of two, got $dim")
    val shift = Integer.numberOfTrailingZeros(dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    val v = new Array[Double](dim)
    text.trim.toLowerCase.split("\\s+").foreach { tok =>
      md.reset()
      val dg = md.digest(tok.getBytes("UTF-8"))
      // first 15 hex digits = first 60 bits of the digest: big-endian
      // first-8-bytes >>> 4, no hex-string round-trip (the formatting
      // was 5× the cost of the MD5 itself in the service-client path)
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (dg(i) & 0xffL); i += 1 }
      h = h >>> 4
      val b = (h % dim).toInt
      val sgn = if (((h >> shift) & 1L) == 0L) 1.0 else -1.0
      v(b) += sgn
    }
    v
  }

  /** Driver-side twin of [[embedDocs]] for embedding a query string —
    * must produce the identical vector (spec-tested).
    */
  def embedText(text: String, dim: Int = DefaultDim): Array[Double] = {
    val v = embedTextRaw(text, dim)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    if (nrm == 0.0) v else v.map(_ / nrm)
  }
}
