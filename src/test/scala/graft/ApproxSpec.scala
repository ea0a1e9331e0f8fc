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
    // the DuckDB oracle for ap_topk is the EXACT top-k — valid because at
    // this key cardinality (5 keys, width-2719 depth-7 sketch) some depth
    // row is collision-free per key and the CMS min equals the exact
    // count. Pin that claim so a future param change that breaks it fails
    // HERE, not in the driver's hash compare.
    assert(est === exact, "CMS estimates must be exact at 5-key cardinality")
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

  test("kmv: exact below k, accurate on planted overlap, disjoint reads zero") {
    import spark.implicits._
    import graft.operators.Kmv
    // planted universes: A = 0..999, B = 500..1499 (|∩| = 500, J = 1/3),
    // C = 2000..2009 (tiny: sketch must be EXACT), D disjoint from all
    val rows =
      (0 until 1000).map(i => ("A", s"val_$i")) ++
      (500 until 1500).map(i => ("B", s"val_$i")) ++
      (2000 until 2010).map(i => ("C", s"val_$i")) ++
      (5000 until 5800).map(i => ("D", s"other_$i"))
    val df = rows.toDF("g", "v")
    val k = 256
    val out = Kmv.overlaps(df, "g", "v", k).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    // distinct estimates: σ ≈ 1/√k ≈ 6%; assert 4σ
    val (estA, estB, jAB, uAB, iAB) = out(("A", "B"))
    assert(math.abs(estA - 1000) / 1000.0 < 0.25, s"estA $estA")
    assert(math.abs(estB - 1000) / 1000.0 < 0.25, s"estB $estB")
    assert(math.abs(jAB - 1.0 / 3.0) < 0.15, s"jaccard $jAB")
    assert(math.abs(uAB - 1500) / 1500.0 < 0.3, s"union $uAB")
    assert(math.abs(iAB - 500) / 500.0 < 0.5, s"intersection $iAB")
    // tiny group: sketch degenerates to the exact set
    val cPair = out(("A", "C"))
    assert(cPair._2 === 10.0, "below-k sketch must be exact")
    assert(cPair._3 === 0.0, "disjoint groups must estimate zero overlap")
    assert(out(("A", "D"))._3 === 0.0 && out(("B", "D"))._3 === 0.0)
  }

  test("kmv property: 8 seeded overlap fractions all estimate within 4 sigma") {
    import spark.implicits._
    import graft.operators.Kmv
    val k = 256
    val rng = new scala.util.Random(99)
    (1 to 8).foreach { trial =>
      val nA = 500 + rng.nextInt(1500)
      val nB = 500 + rng.nextInt(1500)
      val overlap = rng.nextInt(math.min(nA, nB))
      // A = [0, nA); B = [nA - overlap, nA - overlap + nB)
      val rows = (0 until nA).map(i => ("A", s"t${trial}_$i")) ++
        (0 until nB).map(i => ("B", s"t${trial}_${nA - overlap + i}"))
      val out = Kmv.overlaps(rows.toDF("g", "v"), "g", "v", k).collect()
      val r = out.find(x => x.getString(0) == "A" && x.getString(1) == "B").get
      val trueJ = overlap.toDouble / (nA + nB - overlap).toDouble
      val sigmaJ = math.sqrt(math.max(trueJ * (1 - trueJ), 0.01) / k)
      assert(math.abs(r.getDouble(4) - trueJ) <= 4 * sigmaJ + 0.02,
        s"trial $trial: jaccard ${r.getDouble(4)} vs $trueJ (σ=$sigmaJ)")
      val sigmaD = 1.0 / math.sqrt(k)
      assert(math.abs(r.getDouble(2) - nA) / nA <= 4 * sigmaD,
        s"trial $trial: |A| ${r.getDouble(2)} vs $nA")
      assert(math.abs(r.getDouble(3) - nB) / nB <= 4 * sigmaD,
        s"trial $trial: |B| ${r.getDouble(3)} vs $nB")
    }
  }
  test("kmv sketch rollup: merged hourly sketches equal the direct day sketch") {
    import org.apache.spark.sql.functions._
    import graft.operators.Kmv
    val k = 64
    val ev = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")).as("day"),
        date_trunc("hour", col("ts")).as("hour"), col("user_id"))
      .withColumn("cell", concat_ws("|", col("day"), col("hour")))
    val hourly = Kmv.sketches(ev, "cell", "user_id", k)
      .withColumn("day", split(col("cell"), "\\|").getItem(0))
    val rolled = Kmv.rollup(hourly, "day", k).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toVector.sorted).toMap
    val direct = Kmv.sketches(
        ev.withColumn("dayKey", col("day").cast("string")), "dayKey", "user_id", k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector.sorted).toMap
    assert(rolled.keySet === direct.keySet)
    rolled.foreach { case (day, mins) =>
      assert(mins === direct(day), s"day $day: rollup must equal the direct sketch")
    }
    // below k the sketch is exhaustive: estimates are EXACT distincts
    val exact = ev.groupBy(col("day").cast("string").as("d"))
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rolled.foreach { case (day, mins) =>
      if (mins.length < k)
        assert(Kmv.estimate(mins, k) === exact(day).toDouble, s"day $day exact path")
    }
    // the operator's output agrees with the rolled sketches it dumps
    val op = SparkEntry.queries("ap_sketch_rollup")(spark, sf).collect()
    assert(op.length === rolled.size)
  }
}
