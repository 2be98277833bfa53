package graft

import org.apache.spark.sql.functions._
import graft.ops.HeavyHitters

class HeavyHittersSpec extends SparkSpec {

  test("space-saving: every N/m-frequent token reported, counts bounded") {
    val tok = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
      .select(explode(graft.text.TextPrimitives.tokens(col("text"))).as("tok"))
    val truth = tok.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val m = 8 // testdata vocab is ~31 distinct tokens; m below that forces eviction
    val hh = tok.agg(HeavyHitters.heavyHitters(m)(col("tok")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"), col("h.err")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.length == m && truth.size > m) // genuinely sketching
    // guarantee 1: anything with true count > N/m is in the summary
    val reported = hh.map(_._1).toSet
    truth.filter(_._2 > n / m).keys.foreach { k =>
      assert(reported.contains(k), s"frequent token '$k' missing")
    }
    // guarantee 2: true ≤ reported ≤ true + err
    hh.foreach { case (k, c, e) =>
      val t = truth(k)
      assert(c >= t && c - e <= t, s"'$k': reported=$c err=$e true=$t")
    }
  }

  test("exact with zero error when m exceeds the distinct domain") {
    val ev = Tables.events(spark, sfDir)
    val truth = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hh = ev.agg(HeavyHitters.heavyHitters(64)(col("event_type")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"), col("h.err")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.map(_._1).toSet == truth.keySet)
    hh.foreach { case (k, c, e) => assert(c == truth(k) && e == 0L) }
  }
}
