package graft

import org.apache.spark.sql.functions._

/** Error bounds for the approximate scale-path operators against their
  * exact counterparts (SURVEY §4: approx_percentile / HLL are what replace
  * the exact sort/distinct at 100 TB).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct is within its configured rsd of exact") {
    val l = Tables.lineitem(spark, sf)
    val exact = l.select(countDistinct(col("l_orderkey"))).head.getLong(0)
    val approx = SparkEntry.queries("ap_distinct")(spark, sf)
      .head.getAs[Long]("approx_orders")
    val err = math.abs(approx - exact).toDouble / exact
    info(f"HLL err = $err%.4f (exact=$exact approx=$approx)")
    assert(err <= 0.06, f"error $err%.4f exceeds 3x rsd")
  }

  test("bloom membership: zero false negatives, false positives within fpp") {
    val r = SparkEntry.queries("ap_bloom")(spark, sf).head
    val n = r.getAs[Long]("n_customers")
    val nPos = r.getAs[Long]("n_with_orders")
    val fp = r.getAs[Long]("n_false_pos")
    val fn = r.getAs[Long]("n_false_neg")
    assert(fn === 0L, "a Bloom filter can NEVER produce a false negative")
    val negatives = n - nPos
    info(s"negatives=$negatives false_pos=$fp")
    // configured fpp 0.01; allow generous slack for the small probe set
    assert(negatives === 0L || fp.toDouble / negatives <= 0.05,
      s"false-positive rate ${fp.toDouble / negatives} far above configured 0.01")
  }

  test("count-min top-k brackets the exact frequencies from above") {
    val est = SparkEntry.queries("ap_topk")(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, c) =>
      // CMS never underestimates; overestimate bounded by eps·n (3x slack)
      assert(est(k) >= c, s"$k: est ${est(k)} < exact $c")
      assert(est(k) - c <= (0.003 * n).ceil.toLong + 1, s"$k: est ${est(k)} vs $c")
    }
  }

  test("space-saving candidates always contain the above-1/cap heavy hitters") {
    // planted stream: one heavy key (20%) drowned in unique noise keys —
    // the candidate summary must retain it at cap 64 (guarantee: any key
    // above n_p/cap in-partition frequency survives eviction)
    val r = new scala.util.Random(13)
    val stream = r.shuffle(
      Seq.fill(2000)("HEAVY") ++ (0 until 8000).map(i => s"noise_$i"))
    val cands = graft.operators.SpaceSaving.candidates(stream.iterator, 64).toSet
    assert(cands.size <= 64)
    assert(cands.contains("HEAVY"))
  }

  test("ap_topk hands the driver O(k) rows, never the key dictionary") {
    // the result is assembled from a TakeOrdered top-k over distributed
    // candidates — a LocalTableScan of exactly k rows, no dictionary-
    // sized collect anywhere in the final frame
    val df = SparkEntry.queries("ap_topk")(spark, sf)
    assert(df.count() === 5)
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("approx quantiles track the exact quantiles") {
    val approx = SparkEntry.queries("ap_quantiles")(spark, sf)
      .orderBy("idx").collect().map(_.getDouble(1))
    val exact = SparkEntry.queries("q07_quantiles")(spark, sf)
      .filter(col("col_name") === "l_extendedprice")
      .orderBy("q").collect().map(_.getDouble(2))
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e <= 0.02, s"approx $a vs exact $e")
    }
  }
}
