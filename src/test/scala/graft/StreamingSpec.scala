package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, SessionUpdate}

class StreamingSpec extends SparkSpec {

  private val H = 3600L * 1000 * 1000 * 1000 // 1h in nanos

  test("streaming sessionize: gap > 30min starts a new session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val query = StreamOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Update).start()
    try {
      input.addData(
        Event(1, 0L, 100, "click", 1.0),
        Event(2, 60L * 1000 * 1000 * 1000, 100, "view", 1.0)) // +1 min
      query.processAllAvailable()
      input.addData(Event(3, 2 * H, 100, "click", 1.0)) // 2h later: new session
      query.processAllAvailable()
      val rows = s.sql("SELECT * FROM sess").as[SessionUpdate].collect()
      // last update for user 100 must be session 2 with count 1
      val last = rows.last
      assert(last.user_id == 100L)
      assert(last.session_id == 2L)
      assert(last.n_events == 1L)
    } finally query.stop()
  }

  test("streaming windowed counts aggregate by hour and type") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val query = StreamOps.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("winc").outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        Event(1, 0L, 1, "click", 2.0),
        Event(2, 10L * 60 * 1000 * 1000 * 1000, 1, "click", 3.0), // +10min same hour
        Event(3, H + 1, 2, "view", 5.0))                          // next hour
      query.processAllAvailable()
      val rows = s.sql("SELECT event_type, n, sum_value FROM winc ORDER BY event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "click" && rows(0).getLong(1) == 2L &&
        rows(0).getDouble(2) == 5.0)
      assert(rows(1).getString(0) == "view" && rows(1).getLong(1) == 1L)
    } finally query.stop()
  }
}
