package graft

import graft.operators.SkewJoin
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  test("explicit-schema csv round-trips without inference") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType.fromDDL("id BIGINT, name STRING, v DOUBLE")
    val back = Sources.csv(spark, dir, schema)
    assert(back.schema === schema)
    assert(back.count() === 2)
  }

  test("orc round-trips and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val li = Tables.lineitem(spark, sf).limit(1000)
    Sources.writeOrc(li, dir)
    val back = Sources.orc(spark, dir)
    assert(back.schema === li.schema)
    assert(back.count() === li.count())
    val p = back.filter(col("l_quantity") > 25.0)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"), p)
  }

  test("foreign CSVs keep Spark's default null semantics: empty field is NULL") {
    // pandas to_csv writes NaN as an empty field — the shared reader must
    // not reinterpret that as "" (the \N marker is scoped to csvGraft)
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_foreign").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part.csv"),
      "id,name,v\n1,,\n2,\\N,3.5\n".getBytes("UTF-8"))
    val schema = StructType.fromDDL("id BIGINT, name STRING, v DOUBLE")
    val rows = Sources.csv(spark, dir, schema).orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2),
      "empty unquoted field must stay NULL under the default reader")
    // a literal backslash-N in a foreign file is DATA, not a marker
    assert(rows(1).getString(1) === "\\N")
    // the graft-scoped reader applies the marker instead
    val graftRows = Sources.csvGraft(spark, dir, schema).orderBy("id").collect()
    assert(graftRows(1).isNullAt(1))
  }

  test("writeCsv round-trips a frame bit-exactly, nulls included") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    val rows = Seq(
      (1L, Some("alpha"), Some(1.5), Some(10)),
      (2L, None, Some(math.Pi * 1e15), None),
      (3L, Some(""), None, Some(-7)),
      (4L, Some("comma, \"quote\""), Some(-0.0625), Some(0)))
    val df = rows.toDF("id", "name", "v", "k")
      .select(col("id"), col("name"), col("v"), col("k").cast("int").as("k"))
    Sources.writeCsv(df, dir)
    val schema = StructType.fromDDL("id BIGINT, name STRING, v DOUBLE, k INT")
    val back = Sources.csvGraft(spark, dir, schema)
    assert(back.schema === schema)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ===
      df.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("withJsonField extracts typed props") {
    val e = Sources.withJsonField(Tables.events(spark, sf), "props", "k BIGINT")
    assert(e.columns.contains("k"))
    assert(e.filter(col("k").isNotNull).count() > 0)
  }

  test("partitioned parquet write prunes by partition value") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sources.writePartitioned(
      Tables.events(spark, sf).withColumn("etype", col("event_type")),
      dir, Seq("etype"))
    val back = spark.read.parquet(dir).filter(col("etype") === "click")
    val scan = back.queryExecution.executedPlan.toString
    assert(back.count() > 0)
    assert(scan.contains("PartitionFilters: [isnotnull(etype"), scan)
  }

  test("dynamic partition overwrite refreshes only the written partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dynpart").toString
    val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0))
    val day2 = Seq((3L, "2024-01-02", 30.0))
    Sources.writePartitioned(
      (day1 ++ day2).toDF("id", "day", "v"), dir, Seq("day"))
    // re-run day 2 with corrected data: day 1 must be untouched
    Sources.overwritePartitions(
      Seq((3L, "2024-01-02", 99.0), (4L, "2024-01-02", 40.0)).toDF("id", "day", "v"),
      dir, Seq("day"))
    // partition values are type-inferred (DATE) on read-back
    val back = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.get(2).toString, r.getDouble(1))).toSet
    assert(back === Set((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 99.0), (4L, "2024-01-02", 40.0)),
      s"got $back")
  }

  test("matching bucketed tables join with zero exchanges") {
    // the co-located join layout SURVEY §4 promises: both sides
    // pre-hashed into the same bucket scheme ⇒ the sort-merge join reads
    // buckets pairwise and the plan carries NO shuffle at all
    val base = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    Sources.writeBucketed(Tables.orders(spark, sf), "graft_orders_b",
      s"$base/orders", "o_custkey", 4)
    Sources.writeBucketed(Tables.customer(spark, sf), "graft_cust_b",
      s"$base/cust", "c_custkey", 4)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_orders_b")
        .join(spark.table("graft_cust_b"), col("o_custkey") === col("c_custkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), "bucketed join must be shuffle-free:\n" + p)
      val plain = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      assert(j.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_cust_b")
    }
  }

  test("salted join returns exactly the plain join's rows") {
    val l = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = l.join(o, Seq("l_orderkey")).count()
    val salted = SkewJoin.saltedEquiJoin(l, o, "l_orderkey", salts = 8)
    assert(salted.count() === plain)
    val sums = salted.agg(sum("o_totalprice")).head.getDouble(0)
    val plainSums = l.join(o, Seq("l_orderkey")).agg(sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(sums - plainSums) < 1e-6 * math.abs(plainSums))
  }

  test("schema evolution: mergeSchema unions old and new file layouts") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    // v1 files have (id, a); v2 adds column b — the add-a-column
    // evolution a long-lived table accretes
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(dir + "/batch=1")
    Seq((3L, "z", 30L)).toDF("id", "a", "b")
      .write.parquet(dir + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("a", "b", "batch", "id"))
    val rows = merged.select("id", "a", "b").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(rows === Set((1L, "x", None), (2L, "y", None), (3L, "z", Some(30L))),
      "old files must read the new column as NULL")
  }

  test("compaction rewrites a many-file table into few files, same rows") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // fragment: 64 tiny files
    val src = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    src.repartition(64).write.mode("overwrite").parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() === 64)
    val before = spark.read.parquet(dir).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val n = Sources.compactParquet(spark, dir)
    assert(files() === n.toInt)
    assert(n < 64, "tiny files must compact down")
    val after = spark.read.parquet(dir).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(after === before, "compaction must preserve the row multiset")
  }

  test("mergeByKey upserts: replaces touched keys, appends new, idempotent") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v").write.parquet(dir)
    // update key 2, insert key 9; column order deliberately scrambled to
    // prove the merge aligns by name
    val updates = Seq(("B2", 2L, 99.0), ("z", 9L, 90.0)).toDF("name", "k", "v")
    Sources.mergeByKey(spark, dir, updates, Seq("k"))
    def snap() = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("name"), r.getAs[Double]("v")))
      .toSet
    val want = Set((1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0), (9L, "z", 90.0))
    assert(snap() === want)
    // re-applying the same delta is a no-op (the CDC replay property)
    Sources.mergeByKey(spark, dir, updates, Seq("k"))
    assert(snap() === want)
  }
  test("zorderWrite clusters both dimensions: a predicate box touches few files") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"
    val hDir = java.nio.file.Files.createTempDirectory("graft_hash").toString + "/t"
    graft.sources.Sources.zorderWrite(o, zDir, "o_custkey", "o_totalprice", nFiles = 16)
    o.repartition(16).write.mode("overwrite").parquet(hDir)
    def fileBoxes(path: String) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("o_custkey").as("loK"), max("o_custkey").as("hiK"),
          min("o_totalprice").as("loP"), max("o_totalprice").as("hiP"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val stats = o.agg(min("o_custkey"), max("o_custkey"),
      min("o_totalprice"), max("o_totalprice")).head()
    val (loK, hiK) = (stats.getLong(0), stats.getLong(1))
    val (loP, hiP) = (stats.getDouble(2), stats.getDouble(3))
    // the middle-quarter box in both dimensions
    val (bkLo, bkHi) = (loK + (hiK - loK) * 3 / 8, loK + (hiK - loK) * 5 / 8)
    val (bpLo, bpHi) = (loP + (hiP - loP) * 3.0 / 8.0, loP + (hiP - loP) * 5.0 / 8.0)
    def touching(path: String): Int = fileBoxes(path).count { case (lk, hk, lp, hp) =>
      hk >= bkLo && lk <= bkHi && hp >= bpLo && lp <= bpHi
    }
    val (zTouch, hTouch) = (touching(zDir), touching(hDir))
    // hash partitioning scatters: essentially every file overlaps the box;
    // the z-order layout must prune strictly better
    assert(zTouch < hTouch, s"zorder $zTouch vs hash $hTouch files touching")
    assert(zTouch <= 8, s"zorder should confine the box to few files, got $zTouch")
    // the clustered copy is the same multiset
    assert(spark.read.parquet(zDir).count() === o.count())
  }
}
