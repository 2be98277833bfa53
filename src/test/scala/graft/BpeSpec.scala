package graft

import org.apache.spark.sql.functions._

/** BPE train+apply (graft.text.Bpe) and its hand-off into sequence
  * packing — the curation → tokenize → pack chain a pretraining
  * pipeline runs (r15 ask 5). The oracle gate (text_bpe_encode) pins
  * engine-vs-DuckDB equality; this spec pins the SEMANTICS the
  * checksum can't show by itself.
  */
class BpeSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("merges are lossless: per-type symbols recombine to the word") {
    val toks = graft.text.Bpe.tokenPositions(docs)
    val types = graft.text.Bpe.wordTypes(toks)
    val top = types.orderBy(col("wc").desc, col("w")).limit(2000)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rules = graft.text.Bpe.trainMerges(top, 6)
    assert(rules.size == 6 && rules.forall(_.contains(" ")))
    val enc = graft.text.Bpe.encodeTypes(types, rules)
    val broken = enc
      .filter(concat_ws("", col("arr")) =!= col("w")).count()
    assert(broken == 0, s"$broken word types do not recombine")
    // merges actually fired: some type encodes to fewer symbols than
    // characters
    val merged = enc.filter(size(col("arr")) < length(col("w"))).count()
    assert(merged > 0, "no merge ever applied")
  }

  test("encodeDocs ids round-trip through the symbol vocabulary") {
    val encoded = graft.text.Bpe.encodeDocs(docs, rounds = 6, vocabCap = 2000)
    val n = docs.filter(trim(col("text")) =!= "").count()
    assert(encoded.count() == n, "every non-empty doc encodes")
    // ids are dense lexicographic ranks: 1..|vocab|
    val stats = encoded
      .select(explode(col("ids")).as("id"))
      .agg(min("id"), max("id"), countDistinct("id")).head()
    assert(stats.getLong(0) == 1L)
    assert(stats.getLong(1) == stats.getLong(2),
      "ids are not a dense 1..V range over the used vocabulary")
    // total ids == total per-type symbol mass (the oracle's n_tokens)
    val totalIds = encoded.agg(sum(size(col("ids")))).head().getLong(0)
    assert(totalIds > 0)
  }

  test("ids flow into pipe_pack_sequences' packer with conserved mass") {
    val encoded = graft.text.Bpe.encodeDocs(docs, rounds = 6, vocabCap = 2000)
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_tok"))
      .localCheckpoint(eager = false)
    val packed = graft.ops.Packing.packSequences(
      encoded, "doc_id", "n_tok", capacity = 512L, blockSize = 100L)
    val rows = packed.orderBy("doc_id")
      .select("doc_id", "tok", "pack_id").collect()
    // token mass conserved through the packer
    val inMass = encoded.agg(sum("n_tok")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == inMass)
    // pack assignment == exclusive-prefix-sum DIV capacity, recomputed
    // driver-side over the same (doc_id asc) layout
    var off = 0L
    rows.foreach { r =>
      val expect = off / 512L
      assert(r.getLong(2) == expect,
        s"doc ${r.getLong(0)}: pack ${r.getLong(2)} != $expect at offset $off")
      off += r.getLong(1)
    }
    // packs are contiguous: ids in a pack form one doc_id interval
    val perPack = rows.groupBy(_.getLong(2)).values
    perPack.foreach { g =>
      val ids = g.map(_.getLong(0)).sorted
      assert(ids.last - ids.head + 1 >= ids.length) // sorted unique docs
    }
  }
}
