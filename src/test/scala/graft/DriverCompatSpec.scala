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
}
