package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

class JoinsSpec extends SparkSpec {

  private def ev = Tables.events(spark, sfDir)

  test("asofJoin equals the brute-force max(bts <= ats) formulation") {
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      .withColumnRenamed("ts", "bts")
    val mine = Joins.asofJoin(errs, clicks, Seq("user_id"), "ts", "bts")
      .select(col("user_id"), col("event_id"), col("asof.bts").as("my_bts"))
    val brute = errs.join(clicks, Seq("user_id"), "left")
      .filter(col("bts") <= col("ts") || col("bts").isNull)
      .groupBy("user_id", "event_id").agg(max("bts").as("ref_bts"))
    val diffs = mine.join(brute, Seq("user_id", "event_id"))
      .filter(!(col("my_bts") <=> col("ref_bts"))).count()
    assert(diffs == 0)
    // left rows with no prior right row survive with a null match
    assert(mine.count() == errs.count())
  }

  test("rangeJoinBucketed equals the naive inequality join") {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
              (col("ts") - lit(300000000000L)).as("st"), col("ts").as("en"))
    val bucketed = Joins.rangeJoinBucketed(
        clicks, purch, Seq("user_id"), "ts", "st", "en", 300000000000L)
      .select("user_id", "pid", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val naive = clicks.join(purch, Seq("user_id"))
      .filter(col("ts").between(col("st"), col("en")))
      .select("user_id", "pid", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(bucketed.nonEmpty && bucketed.toSeq == naive.toSeq)
  }

  test("rangeJoinBucketed emits each qualifying pair exactly once") {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    // wide intervals spanning many buckets
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
              (col("ts") - lit(3600000000000L)).as("st"), col("ts").as("en"))
    val rj = Joins.rangeJoinBucketed(
      clicks, purch, Seq("user_id"), "ts", "st", "en", 60000000000L)
    assert(rj.count() == rj.distinct().count())
  }
}
