package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Driver-compare compatibility rules.
  *
  * The driver's correctness gate reads our parquet through pyarrow into
  * pandas, whose `datetime64[ns]` representation covers only
  * 1677-09-21 .. 2262-04-11. A timestamp outside that range (e.g. the
  * classic `9999-12-31` warehouse sentinel st_scd2 used through round 5)
  * round-trips DIFFERENTLY through the pandas path than through DuckDB,
  * so rows+schema match but the value hash diverges. Rule: every value
  * a query emits in a TimestampType column must lie inside the ns-safe
  * window. This spec enforces the rule over the WHOLE registry — find
  * the timestamp-emitting queries by (free) schema inspection, then run
  * only those and aggregate min/max per timestamp column.
  */
class DriverCompatSpec extends SparkSpec {

  // ns-safe window with margin: generated data is 1992+, and the only
  // future-dated value we ever emit is a sentinel, which must stay
  // below 2262-04-11 (we pin 2260 to leave room for tz shifts).
  private val loBound = java.sql.Timestamp.valueOf("1900-01-01 00:00:00")
  private val hiBound = java.sql.Timestamp.valueOf("2260-01-01 00:00:00")

  test("every timestamp column across the registry stays inside pandas datetime64[ns] range") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      val df = mk(spark, sf)
      val tsCols = df.schema.fields.collect {
        case f if f.dataType == TimestampType => f.name
      }
      if (tsCols.nonEmpty) {
        val aggs = tsCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        tsCols.zipWithIndex.foreach { case (c, i) =>
          val (mn, mx) = (row.getTimestamp(2 * i), row.getTimestamp(2 * i + 1))
          if (mn != null && mn.before(loBound)) offenders += s"$name.$c min=$mn"
          if (mx != null && mx.after(hiBound)) offenders += s"$name.$c max=$mx"
        }
      }
    }
    assert(offenders.isEmpty,
      "timestamp values outside the driver-safe range:\n" + offenders.mkString("\n"))
  }

  // The driver regenerates /root/testdata each round and has already
  // switched a physical encoding once (events.ts: TIMESTAMP(NANOS)
  // through r6 → TIMESTAMP(MICROS)/NTZ in r7), which silently killed
  // all 49 events-table queries in the r6 driver run. Pin the LOADER
  // CONTRACT — the logical types downstream operators rely on — at
  // every SF present, so the next encoding change fails loudly here
  // instead of inside 49 query plans.
  test("table loaders normalize physical encodings to the expected logical types") {
    import org.apache.spark.sql.types._
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", sf)
      .filter(d => new java.io.File(d).isDirectory).distinct
    sfs.foreach { d =>
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType === TimestampType,
        s"$d events.ts must normalize to TIMESTAMP (session-UTC), " +
          s"got ${ev.schema("ts").dataType}")
      Seq("event_id", "user_id").foreach(c =>
        assert(ev.schema(c).dataType === LongType, s"$d events.$c"))
      assert(ev.schema("value").dataType === DoubleType, s"$d events.value")
      // events must actually read (analysis exceptions surface on head)
      assert(ev.select("ts").head().getTimestamp(0) != null, s"$d events read")
      val o = Tables.orders(spark, d)
      assert(Seq(TimestampType, TimestampNTZType, DateType)
        .contains(o.schema("o_orderdate").dataType),
        s"$d o_orderdate unexpectedly ${o.schema("o_orderdate").dataType}")
      Seq("lineitem" -> "l_quantity", "orders" -> "o_totalprice").foreach {
        case (t, c) =>
          val df = Tables.t(spark, d, t)
          assert(df.schema(c).dataType === DoubleType, s"$d $t.$c")
      }
      val emb = Tables.embeddings(spark, d)
      assert(emb.schema("embedding").dataType === ArrayType(FloatType, true)
        || emb.schema("embedding").dataType === ArrayType(FloatType, false),
        s"$d embeddings.embedding must stay Array[Float], " +
          s"got ${emb.schema("embedding").dataType}")
    }
  }
}
