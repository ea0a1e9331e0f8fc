package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main — NOT part of the driver contract. Times named
  * plan variants at an SF dir to decompose an operator's cost. Kept out
  * of SparkEntry; safe to delete.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val variants = args.drop(1)
    val spark = SparkSession.builder()
      .appName("graft-probe").master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def l = Tables.lineitem(spark, d)

    val plans: Map[String, () => DataFrame] = Map(
      // pure scan throughput: one double column, count+sum
      "scan1" -> (() => l.select(col("l_quantity")).agg(sum(col("l_quantity")))),
      // the 3 qzl expressions' cost without sum overflow: max() keeps the
      // round+mul+cast per-row work, accumulator can't overflow
      "scan3" -> (() => l.agg(
        max(Exact.qzl(col("l_quantity"), 1000.0)),
        max(Exact.qzl(col("l_extendedprice"), 1000.0)),
        max(Exact.qzl(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 1000000.0)))),
      // strings only: group count
      "strgrp" -> (() => l.groupBy(col("l_returnflag"), col("l_linestatus")).count()),
      // full q01 current shape
      "q01" -> (() => SparkEntry.queries("q01_agg")(spark, d)),
      // grid-sum per-row work with max accumulators, grouped (overflow-safe)
      "flat" -> (() => l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          max(Exact.qzl(col("l_quantity"), 1000.0)).as("sq"),
          max(Exact.qzl(col("l_extendedprice"), 1000.0)).as("sb"),
          max(Exact.qzl(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 1000000.0)).as("sd"),
          count(lit(1)).as("n"))),
      // the two-level shape but WITHOUT the string group keys: pid only
      "pidonly" -> (() => l.groupBy(spark_partition_id().as("_pid"))
        .agg(
          sum(Exact.qzl(col("l_quantity"), 1000.0)).as("p_sq"),
          sum(Exact.qzl(col("l_extendedprice"), 1000.0)).as("p_sb"),
          sum(Exact.qzl(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 1000000.0)).as("p_sd"),
          count(lit(1)).as("p_n"))
        .agg(Exact.mergeGrid(col("p_sq"), 1000.0),
          Exact.mergeGrid(col("p_sb"), 1000.0),
          Exact.mergeGrid(col("p_sd"), 1000000.0), sum(col("p_n")))),
      // packed int key instead of two string keys
      "pack" -> (() => {
        val k = (ascii(col("l_returnflag")) * lit(256) + ascii(col("l_linestatus"))).as("_k")
        l.select(k, col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            spark_partition_id().as("_pid"))
          .groupBy(col("_k"), col("_pid"))
          .agg(
            sum(Exact.qzl(col("l_quantity"), 1000.0)).as("p_sq"),
            sum(Exact.qzl(col("l_extendedprice"), 1000.0)).as("p_sb"),
            sum(Exact.qzl(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 1000000.0)).as("p_sd"),
            count(lit(1)).as("p_n"))
          .groupBy(col("_k"))
          .agg(Exact.mergeGrid(col("p_sq"), 1000.0).as("sum_qty"),
            Exact.mergeGrid(col("p_sb"), 1000.0).as("sum_base_price"),
            Exact.mergeGrid(col("p_sd"), 1000000.0).as("sum_disc_price"),
            sum(col("p_n")).as("count_order"))
          .select(expr("char(_k div 256)").as("l_returnflag"),
            expr("char(_k % 256)").as("l_linestatus"),
            col("sum_qty"), col("sum_base_price"), col("sum_disc_price"), col("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),
      // q03 with shuffle_hash on orders (skip SMJ sorts)
      "q03sh" -> (() => {
        val l = Tables.lineitem(spark, d)
        val o = Tables.orders(spark, d).hint("shuffle_hash")
        val c = Tables.customer(spark, d)
        l.groupBy(col("l_orderkey"))
          .agg(
            sum(Exact.qzl(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 1000000.0)).as("p_rev"),
            count(lit(1)).as("p_n"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            Exact.mergeGrid(col("p_rev"), 1000000.0).as("revenue"),
            count(lit(1)).as("n_orders"),
            sum(col("p_n")).as("n_rows"))
          .orderBy("c_mktsegment")
      }),
      "q03cur" -> (() => SparkEntry.queries("q03_join_agg")(spark, d)),
      "q10cur" -> (() => SparkEntry.queries("q10_corr")(spark, d)),
      "q05cur" -> (() => SparkEntry.queries("q05_window")(spark, d)),
      // qzl cost isolated: plain double sums, grouped
      "dblgrp" -> (() => l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), count(lit(1))))
    )

    val names = if (variants.isEmpty) plans.keys.toSeq.sorted else variants.toSeq
    for (n <- names) {
      val reps = sys.env.getOrElse("PROBE_REPS", "2").toInt
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        plans(n)().collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-8s min=${times.min}%.2f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
