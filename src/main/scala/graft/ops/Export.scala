package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Totally-ordered export: range-repartition on the sort key (Spark
  * samples split points — no single reducer) then sort within each
  * partition. File i's keys all precede file i+1's, and every file is
  * internally sorted — the layout downstream consumers (tokenizer
  * shards, binary-search lookups, merge readers) want, produced with
  * a sampling pass + one shuffle instead of a global sort.
  */
object Export {

  def totallyOrdered(df: DataFrame, numFiles: Int, keys: Column*): DataFrame =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
}
