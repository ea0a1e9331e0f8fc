package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def batchEvents = Tables.events(spark, sf)

  test("streaming windowAgg matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.select("ts", "event_type", "value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF.toDF("ts", "event_type", "value")
    val q = Streaming.windowAggStream(streamDf)
      .writeStream.format("memory").queryName("wa")
      .outputMode("complete").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("wa")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = Streaming.windowAgg(batchEvents)
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("file-source readStream windowAgg matches the batch twin") {
    val q = Streaming.windowAggStream(Streaming.eventsStream(spark, sf))
      .writeStream.format("memory").queryName("fswa")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fswa")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = Streaming.windowAgg(batchEvents)
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming sessionize matches the batch twin on closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("user_id", "ts", "event_id")
      .collect().map(r => Streaming.SessEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val maxTs = evs.map(_.ts.getTime).max
    val input = MemoryStream[Streaming.SessEvent]
    val sessions = Streaming.sessionizeStream(input.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      input.addData(evs.toSeq)
      q.processAllAvailable()
      // flush event (synthetic user -1) far in the future advances the
      // watermark past every real session's timeout
      input.addData(Streaming.SessEvent(-1L, new Timestamp(maxTs + 86400000L), 0L))
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .filter(col("user_id") >= 0)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      val batch = SparkEntry.queries("st_sessionize")(spark, sf)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
