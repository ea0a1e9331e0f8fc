package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
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

  test("append-mode windowed agg drops events later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:30:00")
    def plus(h: Int) = new Timestamp(t0.getTime + h * 3600000L)
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = Streaming.windowAggStream(input.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      input.addData((t0, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past the [00:00, 01:00) window's close
      input.addData((plus(10), "click", 1.0))
      q.processAllAvailable()
      val closed = spark.table("late")
        .filter(col("window_start") === Timestamp.valueOf("2024-01-01 00:00:00"))
        .collect()
      assert(closed.length === 1 && closed.head.getAs[Long]("n_events") === 1L)
      // an event 12h behind the watermark must be DROPPED, not re-emitted
      input.addData((t0, "click", 5.0))
      q.processAllAvailable()
      val after = spark.table("late")
        .filter(col("window_start") === Timestamp.valueOf("2024-01-01 00:00:00"))
        .collect()
      assert(after.length === 1 && after.head.getAs[Long]("n_events") === 1L,
        "late event leaked past the watermark")
    } finally q.stop()
  }

  test("streaming slidingAgg matches the batch twin across overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.select("ts", "event_type", "value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF.toDF("ts", "event_type", "value")
    val q = Streaming.slidingAggStream(streamDf)
      .writeStream.format("memory").queryName("sla")
      .outputMode("complete").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("sla")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = Streaming.slidingAgg(batchEvents)
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // each event fans into exactly 4 overlapping windows
      val nTumbling = Streaming.windowAgg(batchEvents)
        .agg(sum("n_events")).head.getLong(0)
      val nSliding = Streaming.slidingAgg(batchEvents)
        .agg(sum("n_events")).head.getLong(0)
      assert(nSliding === 4 * nTumbling)
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

  test("end-to-end durable pipeline: file source → windowed agg → parquet sink") {
    // the full production shape, not a memory sink: checkpointed
    // append-mode aggregation writing closed windows to parquet; the
    // durable output must equal the batch twin for every window the
    // watermark has closed
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = Streaming.windowAggStream(Streaming.eventsStream(spark, sf))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val durable = spark.read.parquet(out)
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val maxClosed = Streaming.windowAgg(batchEvents)
        .agg(max(col("window_start"))).head().getTimestamp(0)
      val batch = Streaming.windowAgg(batchEvents)
        // append mode only emits windows the final watermark closed
        .filter(col("window_start") < new Timestamp(maxClosed.getTime - 2 * 3600 * 1000L))
        .collect().map(_.toSeq).toSet
      assert(batch.subsetOf(durable),
        s"durable sink missing ${batch.size - batch.intersect(durable).size} closed windows")
      // and nothing in the sink disagrees with the batch surface
      val full = Streaming.windowAgg(batchEvents).collect().map(_.toSeq).toSet
      assert(durable.subsetOf(full), "sink rows disagree with the batch twin")
    } finally q.stop()
  }

  test("streaming windowed top-k matches the batch twin after the rank post-pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.select("ts", "user_id")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val input = MemoryStream[(Timestamp, Long)]
    val streamDf = input.toDF.toDF("ts", "user_id")
    val q = Streaming.userWindowCountsStream(streamDf)
      .writeStream.format("memory").queryName("twk")
      .outputMode("complete").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      // the same rank post-pass st_topk applies downstream of the counts
      def rank(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).toSeq.flatMap { case (w, g) =>
          g.toSeq.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
            .map { case ((_, u, n), i) => (w, i + 1, u, n) }
        }.toSet
      val streamed = rank(spark.table("twk")
        .select("window_start", "user_id", "n_events"))
      val batch = rank(Streaming.userWindowCounts(batchEvents)
        .select("window_start", "user_id", "n_events"))
      assert(streamed === batch)
      // and the registered batch query agrees with the post-pass
      val fromQuery = SparkEntry.queries("st_topk")(spark, sf)
        .collect().map(r => (r.getTimestamp(0), r.getLong(1).toInt, r.getLong(2), r.getLong(3)))
        .toSet
      assert(fromQuery === batch.map { case (w, rk, u, n) => (w, rk, u, n) })
    } finally q.stop()
  }

  test("streaming dedup within watermark matches the batch twin on a duplicated feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    // plant exact duplicates: every 10th event arrives three times
    val feed = rows ++ rows.filter(_._1 % 10 == 0) ++ rows.filter(_._1 % 10 == 0)
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = input.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streaming.dedupStream(streamDf)
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      input.addData(feed.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("dd").collect().map(_.toSeq).toSet
      val batch = Streaming.dedup(batchEvents).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.size === rows.length) // every duplicate dropped, nothing else
    } finally q.stop()
  }

  test("spacesaving streaming top-k bounds state by windows, not users") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one hour-window with a planted heavy user among 3000 uniques; a
    // later event advances the watermark past the window end to fire the
    // event-time timeout
    val base = 3600L * 1000L
    def t(ms: Long) = new Timestamp(ms)
    val heavy = (0 until 2000).map(i => Streaming.TkEvent(t(base + i), 7L))
    val noise = (0 until 3000).map(i => Streaming.TkEvent(t(base + 500 + i), 1000L + i))
    val input = MemoryStream[Streaming.TkEvent]
    val q = Streaming.topkStateStream(input.toDS(), k = 3, cap = 64)
      .writeStream.format("memory").queryName("sstk")
      .outputMode("append").start()
    try {
      input.addData(heavy ++ noise)
      q.processAllAvailable()
      input.addData(Seq(Streaming.TkEvent(t(base + 5L * 3600L * 1000L), 1L)))
      q.processAllAvailable()
      val first = spark.table("sstk").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1.getTime == base)
      assert(first.nonEmpty, "window did not emit on watermark timeout")
      val top = first.find(_._2 == 1L).get
      assert(top._3 === 7L, s"heavy hitter not rank 1: $first")
      assert(top._4 >= 2000L, "SpaceSaving must never underestimate the heavy key")
      // state rows = open windows (2 here), never the ~3001 users the
      // exact count aggregate would hold
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2L, s"state rows $stateRows — summary must bound state")
    } finally q.stop()
  }

  test("sessionize state stays bounded under a 10k-event hot user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 10 bursts of 1000 events 1s apart, bursts separated by >30min gaps;
    // offset from epoch 0 so the first event doesn't sit ON the initial
    // watermark (ts <= watermark counts as late)
    val evs = (0 until 10000).map { i =>
      val us = 86400000000L + (i / 1000) * 10000000000L + (i % 1000) * 1000000L
      Streaming.SessEvent(7L, new Timestamp(us / 1000L), i.toLong)
    }
    val input = MemoryStream[Streaming.SessEvent]
    val q = Streaming.sessionizeStream(input.toDS())
      .writeStream.format("memory").queryName("hot")
      .outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      input.addData(Streaming.SessEvent(-1L, new Timestamp(evs.last.ts.getTime + 86400000L), 0L))
      q.processAllAvailable()
      val sessions = spark.table("hot").filter(col("user_id") === 7L)
        .select("session_start", "session_end", "n_events").collect()
      assert(sessions.length === 10, s"expected 10 gap-separated sessions, got ${sessions.length}")
      assert(sessions.forall(_.getAs[Long]("n_events") === 1000L))
      // state is one open session per user, never the event backlog
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2L, s"state rows $stateRows — hot user must not accumulate events in state")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = input.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streaming.intervalJoinStream(streamDf)
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ij").collect().map(_.toSeq).toSet
      val batch = Streaming.intervalJoin(batchEvents).collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits the null-extended rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // planted feed: u1's click has a purchase 1h before (matches), u2's
    // click has none within 24h (must emit NULL-extended once the
    // watermark passes), u3's purchase is 25h stale (outside the window)
    val t0 = Timestamp.valueOf("2024-01-01 12:00:00")
    def plus(h: Int) = new Timestamp(t0.getTime + h * 3600000L)
    val real = Seq(
      (1L, plus(-1), 10L, "purchase", 5.0),
      (2L, plus(0), 10L, "click", 0.0),
      (3L, plus(0), 20L, "click", 0.0),
      (4L, plus(-25), 30L, "purchase", 7.0),
      (5L, plus(0), 30L, "click", 0.0))
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = input.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streaming.intervalJoinLeftStream(streamDf)
      .writeStream.format("memory").queryName("ijl")
      .outputMode("append").start()
    try {
      input.addData(real)
      q.processAllAvailable()
      // NULL-extended rows need the GLOBAL watermark (min across both
      // sides) to pass the clicks' state — sentinels must advance BOTH
      // the click and the purchase side; two far-future rounds on an
      // absent user do it (their own rows are filtered out below)
      input.addData(Seq((98L, plus(24 * 40), 999L, "click", 0.0),
        (97L, plus(24 * 40 + 1), 999L, "purchase", 1.0)))
      q.processAllAvailable()
      input.addData(Seq((96L, plus(24 * 80), 999L, "click", 0.0),
        (95L, plus(24 * 80 + 1), 999L, "purchase", 1.0)))
      q.processAllAvailable()
      val streamed = spark.table("ijl").collect().map(_.toSeq).toSet
      import spark.implicits._
      val batch = Streaming.intervalJoinLeft(
          real.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map(_.toSeq).toSet
      // the real feed's full left-outer result — matched u1, null u2/u3
      assert(batch.count(_(3) == null) === 2)
      // streamed superset check modulo the sentinels' own pending rows
      val streamedReal = streamed.filterNot(r => r(1) == 999L)
      assert(streamedReal === batch)
    } finally q.stop()
  }

  test("streaming as-of join matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => Streaming.AsofEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val input = MemoryStream[Streaming.AsofEvent]
    val q = Streaming.asofStream(input.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    try {
      input.addData(evs.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("asof")
        .select("event_id", "user_id", "ts", "asof_event_id", "asof_value")
        .collect().map(_.toSeq).toSet
      val batch = SparkEntry.queries("st_asof")(spark, sf)
        .select("event_id", "user_id", "ts", "asof_event_id", "asof_value")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming CDC compaction converges to the batch snapshot across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => Streaming.CdcEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.CdcEvent]
    val q = Streaming.cdcStream(input.toDS())
      .writeStream.format("memory").queryName("cdc")
      .outputMode("update").start()
    try {
      // two micro-batches: the second batch's winners must merge against
      // state carried from the first, not just within-batch rows
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      // an upsert sink keeps each key's LAST emission — reproduce that
      // by re-compacting the update log per key
      val emissions = spark.table("cdc").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      val streamed = emissions.groupBy(_._1).map { case (_, rows) =>
        rows.maxBy(r => (r._2.getTime, r._3))
      }.toSet
      val batch = SparkEntry.queries("st_cdc")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming funnel state matches the batch funnel across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => Streaming.CdcEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts.getTime, e.event_id)) // in-order delivery contract
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.CdcEvent]
    val q = Streaming.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      // upsert semantics: keep each user's LAST emission (max stage wins;
      // stage never regresses, so re-compacting by stage is exact)
      val streamed = spark.table("funnel").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getInt(4)))
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._5) }.toSet
      val batch = SparkEntry.queries("q44_funnel")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getInt(4))).toSet
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

  test("streaming ewma matches the batch q58 bit-for-bit across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("ts"), col("o_totalprice"))
      .collect().map(r => Streaming.EwmaEvent(r.getLong(0), r.getLong(1),
        r.getTimestamp(2), math.rint(r.getDouble(3) * 100.0).toLong))
      .sortBy(e => (e.ts.getTime, e.order_id)) // in-order delivery contract
    // split mid-stream: every user's later orders arrive in batch 2 and
    // must extend the 8-value history carried in state
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.EwmaEvent]
    val q = Streaming.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ewma").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = SparkEntry.queries("q58_ewma")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      assert(streamed === batch, "exact integer arithmetic must make the twin bit-identical")
    } finally q.stop()
  }

  test("streaming expanding stats match the batch q92 bit-for-bit across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("ts"), col("o_totalprice"))
      .collect().map(r => Streaming.ExpEvent(r.getLong(0), r.getLong(1),
        r.getTimestamp(2), math.rint(r.getDouble(3) * 100.0).toLong))
      .sortBy(e => (e.ts.getTime, e.order_id)) // in-order delivery contract
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.ExpEvent]
    val q = Streaming.expandingStream(input.toDS())
      .writeStream.format("memory").queryName("expanding")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("expanding").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
      val batch = SparkEntry.queries("q92_expanding")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
      assert(streamed === batch,
        "three-number state must reproduce the batch window bit-for-bit")
    } finally q.stop()
  }

  test("streaming psi equals the batch formula; self-reference reads stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cuts = (1 to 9).map(_ * 40.0) // fixed bins over the value range
    val evs = batchEvents.select("event_id", "event_type", "value")
      .collect().map(r => Streaming.DriftEvent(r.getLong(0), r.getString(1), r.getDouble(2)))
    // reference = the click type's own empirical distribution: the
    // fully-drained monitor must read click as stable (PSI < 0.1),
    // while types with genuinely different value distributions may
    // legitimately flag against it
    val clickVals = evs.filter(_.event_type == "click").map(_.value)
    val refCounts = Array.fill(cuts.length + 1)(0L)
    clickVals.foreach(v => refCounts(cuts.count(v > _)) += 1)
    val refRates = refCounts.map(_.toDouble / clickVals.length).toSeq
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.DriftEvent]
    val q = Streaming.psiStream(input.toDS(), cuts, refRates)
      .writeStream.format("memory").queryName("psi")
      .outputMode("update").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      // final emission per type = the row with the full count
      val totals = evs.groupBy(_.event_type).view.mapValues(_.length.toLong).toMap
      val finals = spark.table("psi").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .filter { case (t, n, _) => n == totals(t) }
        .map { case (t, _, p) => t -> p }.toMap
      assert(finals.keySet === totals.keySet, "every type must reach its full count")
      // batch replica of the same formula
      val eps = 1e-6
      evs.groupBy(_.event_type).foreach { case (t, rs) =>
        val c = Array.fill(cuts.length + 1)(0L)
        rs.foreach(e => c(cuts.count(e.value > _)) += 1)
        val n = c.sum.toDouble
        val want = refRates.indices.map { i =>
          val p = math.max(c(i) / n, eps)
          val r = math.max(refRates(i), eps)
          (p - r) * math.log(p / r)
        }.sum
        assert(finals(t) === want, s"$t: streaming ${finals(t)} vs batch $want")
        assert(finals(t) >= 0.0)
      }
      assert(finals("click") < 0.1,
        s"click drifted against its own distribution: ${finals("click")}")
    } finally q.stop()
  }

  test("streaming kmv sketch equals the batch sketch after any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 64
    val evs = batchEvents.select("event_id", "user_id", "event_type")
      .collect().map(r => Streaming.KmvEvent(r.getLong(0), r.getLong(1), r.getString(2)))
    val (first, second) = evs.splitAt(evs.length / 3)
    val input = MemoryStream[Streaming.KmvEvent]
    val q = Streaming.kmvStream(input.toDS(), k)
      .writeStream.format("memory").queryName("kmv")
      .outputMode("update").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      // final estimate per type: KMV estimates are monotone
      // non-decreasing as values arrive (the k-th minimum only
      // shrinks), so the latest emission is the per-type max — an
      // order-free way to read "final" out of the update-mode sink
      val streamed = spark.table("kmv").groupBy("event_type")
        .agg(org.apache.spark.sql.functions.max("est_distinct").as("est"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val batchSk = graft.operators.Kmv.sketches(
        batchEvents.select("event_type", "user_id"), "event_type", "user_id", k)
        .collect().map(r => r.getString(0) ->
          graft.operators.Kmv.estimate(r.getSeq[Long](1), k)).toMap
      assert(streamed === batchSk,
        "order-insensitive sketch state must equal the batch sketch exactly")
      // sanity: estimates are near the true distinct-user counts
      val exact = batchEvents.groupBy("event_type")
        .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      streamed.foreach { case (t, est) =>
        assert(math.abs(est - exact(t)) / exact(t) < 0.5, s"$t: $est vs ${exact(t)}")
      }
    } finally q.stop()
  }

  test("streaming transition pairs match the batch lag window across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("event_id", "ts", "user_id", "event_type")
      .collect().map(r => Streaming.TransEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3)))
      .sortBy(e => (e.ts.getTime, e.event_id)) // in-order delivery contract
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.TransEvent]
    val q = Streaming.transitionsStream(input.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      // multiset of (prev, next) pairs must equal the batch counts
      val streamed = spark.table("trans").groupBy("prev", "next").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = SparkEntry.queries("q65_transitions")(spark, sf)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch,
        "one-state-per-user streaming must reproduce the lag window's pairs")
    } finally q.stop()
  }

  test("streaming lateness surface matches the batch high-watermark window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("event_id", "ts", "user_id")
      .collect().map(r => Streaming.LateEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .sortBy(_.event_id) // arrival order IS event_id order
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.LateEvent]
    val q = Streaming.lateStream(input.toDS())
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("late").collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3))).toSet
      // batch reference: the same per-event surface q62 aggregates
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val batch = batchEvents
        .withColumn("hwm_ms", unix_millis(max(col("ts")).over(w)))
        .withColumn("ts_ms", unix_millis(col("ts")))
        .select(col("event_id"),
          (col("ts_ms") < col("hwm_ms") - 600000L).as("late"),
          greatest(coalesce(col("hwm_ms") - col("ts_ms"), lit(0L)), lit(0L)).as("d"))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) false else r.getBoolean(1), r.getLong(2)))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static enrichment matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val maxTs = rows.map(_._2.getTime).max
    val dims = Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment"))
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = input.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streaming.enrichStream(streamDf, dims)
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      // flush: advance the watermark past every real window
      input.addData((-1L, new Timestamp(maxTs + 86400000L), -1L, "purchase", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("enrich")
        .filter(col("h") <= new Timestamp(maxTs))
        .collect().map(_.toSeq).toSet
      val batch = Streaming.enrich(batchEvents, dims).collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming gap-fill converges to the batch surface over each type's span") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => Streaming.CdcEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts.getTime, e.event_id)) // in-order delivery contract
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.CdcEvent]
    val q = Streaming.gapFillStream(input.toDS())
      .writeStream.format("memory").queryName("gapfill")
      .outputMode("update").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      // upsert: last emission per (type, hour) — re-emitted open hours
      // grow monotonically, so max n_events is the final state
      val emissions = spark.table("gapfill").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
      val streamed = emissions.groupBy(e => (e._1, e._2)).map { case (_, rows) =>
        rows.maxBy(_._3)
      }.map(e => (e._1, e._2, e._3, e._4)).toSet
      // each type's observed span (the twin cannot know the global spine)
      val spans = evs.groupBy(_.event_type).map { case (t, es) =>
        t -> (es.map(e => e.ts.getTime / 3600000L).min, es.map(e => e.ts.getTime / 3600000L).max)
      }
      val batch = SparkEntry.queries("st_gap_fill")(spark, sf).collect()
        .map(r => (r.getString(1), r.getTimestamp(0).getTime, r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
        .filter { case (t, hm, _, _) =>
          val (lo, hi) = spans(t); val h = hm / 3600000L
          h >= lo && h <= hi
        }.toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming SCD2 versions converge to the batch table across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => Streaming.CdcEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts.getTime, e.event_id)) // in-order delivery contract
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.CdcEvent]
    val q = Streaming.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2")
      .outputMode("update").start()
    try {
      // two micro-batches: versions OPEN in batch 1 must extend/close
      // against carried state, not restart
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      // upsert sink: keep each (user, version)'s final emission — the
      // closed row if one exists, else the fullest open re-emission
      val emissions = spark.table("scd2").collect()
        .map(r => Streaming.Scd2Row(r.getLong(0), r.getLong(1), r.getString(2),
          r.getTimestamp(3), r.getLong(4), r.getTimestamp(5), r.getBoolean(6)))
      val streamed = emissions.groupBy(r => (r.user_id, r.version)).map { case (_, rows) =>
        rows.maxBy(r => (r.n_events, if (r.is_current) 0 else 1))
      }.map(r => (r.user_id, r.version, r.attr, r.valid_from, r.n_events,
        r.valid_to, r.is_current)).toSet
      val batch = SparkEntry.queries("st_scd2")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getTimestamp(3), r.getLong(4), r.getTimestamp(5), r.getBoolean(6)))
        .toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
  test("sliding distinct: KMV window sketches reproduce the exact batch counts below k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // fan each event to its 4 sliding windows, keyed by window start —
    // the bounded-state scale path for st_sliding_distinct
    val slideMs = 900000L
    val evs = batchEvents.select("event_id", "ts", "user_id").collect()
      .flatMap { r =>
        val (id, tms, uid) = (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))
        (0 to 3).map { k =>
          val w = (tms / slideMs) * slideMs - k * slideMs
          Streaming.KmvEvent(id, uid, w.toString)
        }
      }
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.KmvEvent]
    val k = 512
    val q = Streaming.kmvStream(input.toDS(), k)
      .writeStream.format("memory").queryName("slidekmv")
      .outputMode("update").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("slidekmv").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).map { case (w, rows) => w -> rows.maxBy(_._2) }
      val batch = SparkEntry.queries("st_sliding_distinct")(spark, sf).collect()
        .map(r => r.getTimestamp(0).getTime.toString -> r.getLong(1)).toMap
      assert(batch.nonEmpty)
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (w, (_, nMin, est)) =>
        if (nMin < k)
          assert(est === batch(w).toDouble, s"window $w: below-k sketch must be exact")
      }
      // the small-SF corpus should exercise the exact path everywhere
      assert(streamed.values.forall(_._2 < k))
    } finally q.stop()
  }
  test("streaming growth classification matches the batch decomposition across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = batchEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => Streaming.CdcEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts.getTime, e.event_id)) // in-order delivery contract
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Streaming.CdcEvent]
    val q = Streaming.growthStream(input.toDS())
      .writeStream.format("memory").queryName("growth")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      // aggregate the emitted classifications per day
      val streamed = spark.table("growth").collect()
        .map(r => (r.getDate(1).toLocalDate.toEpochDay, r.getString(2)))
        .groupBy(_._1).map { case (d, rows) =>
          d -> (rows.count(_._2 == "new").toLong,
            rows.count(_._2 == "retained").toLong,
            rows.count(_._2 == "resurrected").toLong)
        }
      val batch = SparkEntry.queries("q129_growth_accounting")(spark, sf).collect()
        .map(r => r.getDate(0).toLocalDate.toEpochDay ->
          (r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter { case (_, (a, b, c)) => a + b + c > 0 } // spine zero-days don't emit
        .toMap
      assert(batch.nonEmpty)
      assert(streamed === batch)
      // each (user, day) classifies exactly once even across the split
      val perUserDay = spark.table("growth").collect()
        .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      assert(perUserDay.length === perUserDay.distinct.length)
    } finally q.stop()
  }

  test("streaming packer reproduces the batch tx_pack rollup across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n_w"))
      .collect().map(r => Streaming.DocTok(r.getLong(0), r.getLong(1)))
      .sortBy(_.doc_id) // in-order delivery contract (per shard it holds too)
    val thirds = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq
    val input = MemoryStream[Streaming.DocTok]
    val q = Streaming.packStream(input.toDS())
      .writeStream.format("memory").queryName("packs")
      .outputMode("append").start()
    try {
      thirds.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      // one assignment per doc, then the (shard, pack) rollup must equal
      // the batch operator's output exactly
      val assigns = spark.table("packs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      assert(assigns.length === docs.length)
      val nw = docs.map(d => d.doc_id -> d.n_w).toMap
      val streamed = assigns.groupBy(a => (a._1, a._3)).view.mapValues { as =>
        (as.length.toLong, as.map(a => nw(a._2)).sum, as.count(_._4).toLong)
      }.toMap
      val batch = SparkEntry.queries("tx_pack")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(streamed === batch,
        "one-counter-per-shard streaming state must reproduce the batch packs")
    } finally q.stop()
  }

  test("idle-key TTL evicts dormant keys without changing their emitted output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // planted feed: A active across the whole span; B dormant after day
    // 0 and never returns (eviction must not change ANY output); C
    // dormant after day 0 and RETURNING on day 10 (documented restart:
    // its post-return ewma is computed from a fresh history).
    def t(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")
    val batch1 = Seq(
      Streaming.EwmaEvent(1L, 100L, t(0), 1000L),
      Streaming.EwmaEvent(2L, 200L, t(0), 2000L),
      Streaming.EwmaEvent(3L, 300L, t(0), 4000L))
    val batch2 = Seq(Streaming.EwmaEvent(1L, 101L, t(5), 3000L))
    // batch3 advances the watermark past B's and C's timeout (keys fire
    // only when they arrive with NO data in the batch, so C's return
    // must come one batch AFTER the eviction batch)
    val batch3 = Seq(Streaming.EwmaEvent(1L, 102L, t(10), 5000L))
    val batch4 = Seq(Streaming.EwmaEvent(3L, 301L, t(12), 6000L))
    val ttlMs = 2L * 86400000L // 2 days — B and C idle past it by day 5

    def drive(ttl: Option[Long], qn: String): (Map[Long, Double], Long) = {
      val input = MemoryStream[Streaming.EwmaEvent]
      val src =
        if (ttl.isDefined) input.toDS().withWatermark("ts", "0 seconds")
        else input.toDS()
      val q = Streaming.ewmaStream(src, ttl)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        Seq(batch1, batch2, batch3, batch4).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        val rows = spark.table(qn).collect()
          .map(r => r.getLong(1) -> r.getDouble(2)).toMap // order_id -> ewma
        val stateRows = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        (rows, stateRows)
      } finally q.stop()
    }

    val (noTtl, stateNoTtl) = drive(None, "ew_nottl")
    val (ttl, stateTtl) = drive(Some(ttlMs), "ew_ttl")
    // the never-returning dormant key (B): identical output, state freed
    assert(ttl(200L) === noTtl(200L), "dormant never-returning key output changed")
    assert(ttl(100L) === noTtl(100L), "pre-eviction emissions must be identical")
    // A stays continuously under the per-batch horizon (each gap covered
    // before its timeout fires while it keeps arriving with data), so its
    // whole trajectory is unchanged
    assert(ttl(101L) === noTtl(101L) && ttl(102L) === noTtl(102L))
    // the RETURNING dormant key (C) restarts: fresh history = its own cents
    assert(ttl(301L) === 60.0, "post-eviction return must restart history")
    // no-TTL blends day-0's 4000 with day-12's 6000: (6000*128+4000*64)/192
    assert(noTtl(301L) === ((6000.0 * 128 + 4000.0 * 64) / 192 / 100.0))
    // and the state ceiling drops: no-TTL holds every key ever seen (3),
    // TTL holds only keys active inside the final watermark horizon
    assert(stateNoTtl === 3L)
    assert(stateTtl < stateNoTtl,
      s"TTL state $stateTtl must be below ever-seen $stateNoTtl")
  }
}
