package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Streaming-at-scale evidence (round-11 verdict item #8) — NOT part of
  * the driver contract. The streaming twins are spec-equal to their
  * batch plans at sf0.01 via MemoryStream; this main runs the HEAVY
  * stateful twins on the sf1 feed as a real file-source stream split
  * into K time-ordered micro-batches (maxFilesPerTrigger=1) and records
  * what a capacity plan needs per twin:
  *
  *   - throughput (input rows / summed batch wall),
  *   - peak state rows + bytes (the boundedness claim, measured: KMV is
  *     k longs per event type no matter how many events stream past,
  *     EWMA is 8 longs per key, SCD2 one open row per key),
  *   - batch count (proves the run was actually incremental).
  *
  * One JSON line on stdout → STREAM_r11.json.
  *
  * Usage: tools/run.sh graft.StreamBench <sfDir> [chunks]
  */
object StreamBench {

  /** Write `df` as `chunks` single-file parquet slices of ascending
    * `orderCol`, file mtimes ascending, so FileStreamSource replays
    * them oldest-first as one micro-batch each — a time-ordered feed,
    * the in-order delivery contract the stateful twins document.
    */
  private def writeChunked(df: DataFrame, orderCols: Seq[String],
      dir: String, chunks: Int): Unit = {
    val n = df.count()
    val per = math.max(1L, (n + chunks - 1) / chunks)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(orderCols.map(col): _*)
    // the global row_number is bench PREP (one sort to fabricate the
    // ordered feed a broker would deliver), not the plan under test
    val ranked = df.withColumn("__rn", row_number().over(w))
      .withColumn("__chunk", ((col("__rn") - 1L) / per).cast("int"))
      .drop("__rn")
    val staging = java.nio.file.Files.createTempDirectory("graft_sb_stage").toString
    new java.io.File(dir).mkdirs()
    val base = 1700000000000L
    (0 until chunks).foreach { i =>
      val stage = s"$staging/c$i"
      ranked.filter(col("__chunk") === i).drop("__chunk")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"chunk_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(base + i * 60000L)
    }
  }

  private case class Meas(rows: Long, batches: Int, wallSec: Double,
      stateRowsMax: Long, stateBytesMax: Long) {
    def json: String = {
      val rps = if (wallSec > 0) rows / wallSec else -1.0
      f"""{"rows":$rows,"batches":$batches,"wall_sec":$wallSec%.3f,"rows_per_sec":${rps.toLong},"state_rows_max":$stateRowsMax,"state_bytes_max":$stateBytesMax}"""
    }
  }

  /** Run a streaming query built over the chunked dir until the feed is
    * drained; gather progress off recentProgress (chunk count ≤ 100).
    */
  private def run(spark: SparkSession, out: DataFrame, mode: String): Meas = {
    val q = out.writeStream.format("noop").outputMode(mode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sb_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val ps = q.recentProgress.filter(_.numInputRows > 0)
      Meas(
        rows = ps.map(_.numInputRows).sum,
        batches = ps.length,
        wallSec = ps.map(_.durationMs.values().stream()
          .mapToLong(_.longValue()).sum()).map(_ / 1000.0).sum,
        stateRowsMax = if (ps.isEmpty) 0L
          else ps.map(p => p.stateOperators.map(_.numRowsTotal).sum).max,
        stateBytesMax = if (ps.isEmpty) 0L
          else ps.map(p => p.stateOperators.map(_.memoryUsedBytes).sum).max)
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val chunks = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-stream-bench").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_sb").toString

    // feed 1: events as CdcEvent (scd2 + kmv read this shape)
    val cdcDir = s"$root/cdc"
    writeChunked(
      Tables.events(spark, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")),
      Seq("ts", "event_id"), cdcDir, chunks)
    val cdcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    def cdcStream() = spark.readStream.schema(cdcSchema)
      .option("maxFilesPerTrigger", "1").parquet(cdcDir)

    // feed 2: orders as EwmaEvent
    val ewmaDir = s"$root/ewma"
    writeChunked(
      Tables.orders(spark, d)
        .select(col("o_custkey").as("user_id"), col("o_orderkey").as("order_id"),
          col("o_orderdate").cast("timestamp").as("ts"),
          (round(col("o_totalprice") * 100.0)).cast("long").as("cents")),
      Seq("ts", "order_id"), ewmaDir, chunks)
    val ewmaSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("order_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType)))
    def ewmaStream() = spark.readStream.schema(ewmaSchema)
      .option("maxFilesPerTrigger", "1").parquet(ewmaDir)

    val results = scala.collection.mutable.LinkedHashMap[String, Meas]()
    results("st_window_agg") = run(spark,
      Streaming.windowAggStream(cdcStream()), "append")
    results("st_sliding_distinct_kmv") = run(spark,
      Streaming.kmvStream(cdcStream().as[Streaming.KmvEvent], 64).toDF(), "update")
    results("st_scd2") = run(spark,
      Streaming.scd2Stream(cdcStream().as[Streaming.CdcEvent]).toDF(), "update")
    results("q58_ewma_stream") = run(spark,
      Streaming.ewmaStream(ewmaStream().as[Streaming.EwmaEvent]).toDF(), "append")

    val body = results.map { case (k, m) => s""""$k":${m.json}""" }
      .mkString("{", ",", "}")
    println(s"""{"mode":"stream_bench","sf":"$d","chunks":$chunks,"data_fp":"${DataFp.of(d)}","twins":$body}""")
    // cleanup the fabricated feed
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
