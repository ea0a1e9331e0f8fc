package graft.sources

import graft.{Q, Tables, Module}
import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SURVEY §2.I — sources/sinks: explicit-schema readers (no runtime
  * inference pass over 100 TB), semi-structured JSON parsing, and the
  * bucketed/partitioned parquet writers that make downstream joins
  * co-located.
  */
object Sources {

  /** CSV with a pinned schema: a schema-inference pass is a full extra
    * scan at scale, and silently drifting types break plan stability.
    * `nullValue = None` keeps Spark's default marker (empty field →
    * NULL), which is what externally-produced CSVs — pandas `to_csv`
    * writes NaN as empty — mean by it; pass an explicit marker only for
    * files written with one ([[csvGraft]] for graft's own).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, nullValue: Option[String] = None): DataFrame = {
    val r = spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
    nullValue.fold(r)(m => r.option("nullValue", m)).csv(path)
  }

  /** Reader for graft-written CSVs ([[writeCsv]]): the explicit \N NULL
    * marker distinguishes NULL from empty string, so the round-trip is
    * bit-exact. Scoped here rather than defaulted in [[csv]] — foreign
    * CSVs' empty unquoted fields must keep meaning NULL, not "".
    */
  def csvGraft(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    csv(spark, path, schema, header, nullValue = Some("\\N"))

  /** CSV writer — the reference persists `processed_*.csv` /
    * `featured_*.csv` (eda_processing / feature_engineering notebooks).
    * Explicit NULL marker (distinct from empty string) and Java's
    * shortest-roundtrip double rendering mean a schema-pinned [[csv]]
    * read returns the frame bit-exactly (SourcesSpec). Writes one file
    * per partition in parallel; CSV is the interchange sink — the scale
    * sinks are the parquet writers below.
    */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("header", header.toString)
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
      .csv(path)

  /** JSON-lines with a pinned schema (PERMISSIVE: corrupt rows → nulls). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC — the other columnar format large estates carry; Spark's native
    * vectorized reader gives it the same pushdown/pruning properties as
    * parquet (predicate pushdown asserted in SourcesSpec).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Parse a JSON string column into typed fields (events.props). */
  def withJsonField(df: DataFrame, jsonCol: String, fieldSchema: String): DataFrame =
    df.withColumn("_parsed", from_json(col(jsonCol), StructType.fromDDL(fieldSchema)))
      .select(df.columns.map(col) :+ col("_parsed.*"): _*)

  /** Hive-style partitioned parquet: downstream filters on the partition
    * column become directory pruning (zero data read for pruned values).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Idempotent partition refresh (the batch "MERGE by partition"): with
    * dynamic partition overwrite, an overwrite-mode write replaces ONLY
    * the partitions present in `df` and leaves every other partition's
    * files untouched — the re-run-a-day pattern of incremental
    * pipelines, without static overwrite's delete-everything footgun.
    * Scoped to this write; the session conf is restored.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Bucketed table: joins/aggregations on the bucket key become
    * shuffle-free (both sides pre-hashed into the same bucket layout).
    * Bucketing requires a catalog table, hence saveAsTable.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction (the operational chore every long-running
    * 100 TB table needs: streaming sinks and per-partition overwrites
    * accrete kilobyte files until scan task-launch overhead dominates).
    * Rewrites `path` into ⌈bytes / targetBytes⌉ files sized by the
    * table's ACTUAL on-disk footprint, via a staging directory so the
    * rewrite never reads and clobbers the same files mid-job; the swap
    * is a directory rename. Row data, not row order, is preserved —
    * the spec asserts multiset equality.
    */
  /** Close-safe Files.walk: the returned stream holds directory fds
    * until closed, so every traversal goes through this bracket.
    */
  private def withWalk[A](dir: java.nio.file.Path)(
      f: java.util.stream.Stream[java.nio.file.Path] => A): A = {
    val s = java.nio.file.Files.walk(dir)
    try f(s) finally s.close()
  }

  /** Swap `staging` into place at `dir`, parking the old data at
    * `backup` and deleting it once the swap lands. Two renames, not
    * one: a plain filesystem has no atomic directory EXCHANGE, so there
    * is a microseconds-wide window where `dir` does not exist and a
    * concurrent reader's listing fails — callers own external
    * read-exclusion during the swap (at real scale this is the
    * transaction-log commit a Delta/Iceberg table buys you). Crash
    * safety: a crash between the renames leaves the full old table
    * intact under `backup` (never half-written) — recovery is renaming
    * it back.
    */
  private def swapDir(dir: java.nio.file.Path, staging: java.nio.file.Path,
      backup: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    Files.move(dir, backup, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
    withWalk(backup)(_.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p)))
  }

  def compactParquet(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    import java.nio.file.Paths
    val dir = Paths.get(path)
    val bytes = withWalk(dir)(_.filter(p => p.toString.endsWith(".parquet"))
      .mapToLong(p => java.nio.file.Files.size(p)).sum())
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    val staging = Paths.get(path + "__compact_staging")
    spark.read.parquet(path).repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(staging.toString)
    swapDir(dir, staging, Paths.get(path + "__compact_old"))
    nFiles
  }

  /** Keyed upsert into a parquet table without a table format (the
    * MERGE-by-key sibling of [[overwritePartitions]]' MERGE-by-
    * partition): base rows whose key appears in `updates` are replaced,
    * new keys are appended, everything else is carried over byte-
    * identical. One left-anti join (keyed shuffle or broadcast when
    * `updates` is a small delta — the common CDC case) + one union; the
    * rewrite goes through a staging directory and lands as a directory
    * rename, so a failed job never half-clobbers the table. At real
    * scale this is what a Delta/Iceberg MERGE compiles to minus the
    * transaction log — and partitioning `base` keeps the anti join
    * pruned to touched partitions.
    */
  def mergeByKey(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String]): Unit = {
    import java.nio.file.Paths
    val base = spark.read.parquet(path)
    val merged = base.join(updates.select(keyCols.map(col): _*),
        keyCols, "left_anti")
      .unionByName(updates.select(base.columns.map(col).toIndexedSeq: _*))
    val staging = Paths.get(path + "__merge_staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    swapDir(Paths.get(path), staging, Paths.get(path + "__merge_old"))
  }

  /** Morton (Z-order) interleave of two 16-bit bucket ids as a pure
    * Column expression — bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1, so rows close in BOTH dimensions stay close in the
    * one-dimensional sort key.
    */
  private def morton16(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(1L), 2 * i + 1)).cast("long")
    }.reduce(_ + _)

  /** Z-order-clustered parquet write on two numeric columns (the
    * OPTIMIZE ZORDER of table formats, minus the log): each column
    * range-buckets to 16 bits against its own [min, max] (one tiny fit
    * scan), the Morton interleave becomes the range-partition + in-file
    * sort key, and the result is that a predicate box on EITHER OR BOTH
    * dimensions overlaps few files' (min, max) footers — multi-column
    * locality a single-column sort cannot give. The `_z` key column is
    * dropped before landing; at cluster scale `nFiles` is the target
    * file budget and footer pruning does the rest.
    */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.{col, least, lit, width_bucket}
    val fit = df.agg(
      org.apache.spark.sql.functions.min(col(colA)).cast("double"),
      org.apache.spark.sql.functions.max(col(colA)).cast("double"),
      org.apache.spark.sql.functions.min(col(colB)).cast("double"),
      org.apache.spark.sql.functions.max(col(colB)).cast("double")).head()
    val (loA, hiA, loB, hiB) =
      (fit.getDouble(0), fit.getDouble(1), fit.getDouble(2), fit.getDouble(3))
    def bucket(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(65536)) - 1L,
        lit(65535L))
    val z = morton16(bucket(col(colA), loA, hiA), bucket(col(colB), loB, hiB))
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}

/** q19 — semi-structured extraction: events.props JSON → typed column,
  * then a grouped aggregate over the extracted field. from_json with an
  * explicit field schema is codegen'd and single-pass.
  */
object SourcesI extends Module {
  private val q19 = Q(
    "q19_json_extract",
    (s, d) => {
      val e = Sources.withJsonField(Tables.events(s, d), "props", "k BIGINT")
      e.filter(col("k").isNotNull && col("k") >= 50)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
      |GROUP BY event_type ORDER BY event_type""".stripMargin)
  )

  override val qs: Seq[Q] = Seq(q19)
}
