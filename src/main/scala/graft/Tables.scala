package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see TESTDATA.md).
  *
  * Parquet carries its own schema; we read it as-is so partition pruning,
  * predicate pushdown and column pruning all reach the scan. At production
  * scale these would be a partitioned/bucketed catalog table — the
  * DataFrame-level operators downstream are unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * parquet across driver rounds. Spark's vectorized reader rejects the
    * nanos encoding, so we read nanos as long and truncate to microseconds
    * (integer floor-division — exactly what DuckDB does when it narrows
    * ns→µs, so oracle timestamps match bit-for-bit). When the file is
    * already µs the column arrives as a proper timestamp and needs nothing.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive-µs encoding: wall times are UTC; cast to LTZ (session TZ
        // is pinned UTC) so every downstream time function sees the same
        // TIMESTAMP type the ns-era loader produced.
        df.withColumn("ts", df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
