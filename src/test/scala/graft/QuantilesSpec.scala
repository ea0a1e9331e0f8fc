package graft

import graft.operators.Quantiles

/** Direct unit coverage for the distributed exact-quantile algorithm —
  * the histogram-selection edge cases the q07/q08 oracles (well-behaved
  * TPC-H columns) never exercise.
  */
class QuantilesSpec extends SparkSpec {

  private val qs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)

  /** pandas-semantics reference on a driver-side array. */
  private def ref(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    val h = q * (s.length - 1.0)
    val lo = math.floor(h).toInt
    val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (s(hi) - s(lo)) * (h - math.floor(h))
  }

  private def run(xs: Seq[Double]): Map[Double, Double] = {
    import spark.implicits._
    Quantiles.exactQuantiles(xs.toDF("x"), Seq("x"), qs)
      .map { case (_, q, v) => q -> v }.toMap
  }

  test("constant column short-circuits to the single value") {
    val got = run(Seq.fill(1000)(42.5))
    qs.foreach(q => assert(got(q) === 42.5))
  }

  test("single row yields that value at every quantile") {
    val got = run(Seq(7.25))
    qs.foreach(q => assert(got(q) === 7.25))
  }

  test("point-mass skew (one dominant value) matches the reference exactly") {
    val r = new scala.util.Random(3)
    val xs = Seq.fill(9900)(42.0) ++ Seq.fill(100)(r.nextDouble() * 100.0)
    val got = run(xs)
    qs.foreach(q => assert(got(q) === ref(xs, q), s"q=$q"))
  }

  test("random doubles match the reference bit-for-bit") {
    val r = new scala.util.Random(11)
    val xs = Seq.fill(5000)(r.nextDouble() * 1e6 - 5e5)
    val got = run(xs)
    qs.foreach(q => assert(got(q) === ref(xs, q), s"q=$q"))
  }

  test("property: grouped quantiles match per-group references on mixture draws") {
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    val value: Gen[Double] = Gen.oneOf(
      Gen.const(-3.5),
      Gen.choose(-1e9, 1e9),
      Gen.choose(0.0, 1e-6),
      Gen.choose(0.0, 10.0).map(x => math.rint(x * 10) / 10))
    // groups of wildly different sizes, including singletons and
    // constant groups — the shapes the per-group short-circuits handle
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c", "d")
      v <- if (g == "d") Gen.const(9.25) else value
    } yield (g, v)
    val listGen = Gen.choose(8, 800).flatMap(n => Gen.listOfN(n, rowGen))
    (1 to 12).foreach { i =>
      val rows = listGen(Gen.Parameters.default, rng.Seed(100L + i)).get
      val got = operators.Quantiles.groupedExactQuantiles(
        rows.toDF("g", "x"), "g", "x", Seq(0.25, 0.5, 0.75))
        .map { case (g, q, v) => (g, q) -> v }.toMap
      rows.groupBy(_._1).foreach { case (g, grows) =>
        val xs = grows.map(_._2)
        Seq(0.25, 0.5, 0.75).foreach { q =>
          assert(got((g, q)) === ref(xs, q),
            s"seed=$i group=$g n=${xs.length} q=$q")
        }
      }
    }
  }

  test("property: adversarial mixture distributions match the reference (30 seeded draws)") {
    import org.scalacheck.{Gen, rng}
    // each draw mixes the histogram's hard regimes: point masses (empty
    // value ranges), 24-orders-of-magnitude spreads (bucket width
    // overflow risk), values crowded into 1e-9 (recursive refinement),
    // and grid-duplicated values (tie handling)
    val value: Gen[Double] = Gen.oneOf(
      Gen.const(7.25),
      Gen.choose(-1e12, 1e12),
      Gen.choose(0.0, 1e-9),
      Gen.choose(-5.0, 5.0).map(x => math.rint(x * 100) / 100))
    val listGen = Gen.choose(1, 1500).flatMap(n => Gen.listOfN(n, value))
    (1 to 30).foreach { i =>
      val xs = listGen(Gen.Parameters.default, rng.Seed(i.toLong)).get
      val got = run(xs)
      qs.foreach(q => assert(got(q) === ref(xs, q),
        s"seed=$i n=${xs.length} q=$q"))
    }
  }

  test("two-column stacked histogram answers both columns") {
    import spark.implicits._
    val r = new scala.util.Random(5)
    val rows = Seq.fill(2000)((r.nextDouble() * 10, r.nextGaussian()))
    val df = rows.toDF("a", "b")
    val got = Quantiles.exactQuantiles(df, Seq("a", "b"), Seq(0.5))
      .map { case (c, _, v) => c -> v }.toMap
    assert(got("a") === ref(rows.map(_._1), 0.5))
    assert(got("b") === ref(rows.map(_._2), 0.5))
  }

  test("value-crowded bucket recursively re-histograms and stays exact") {
    // adversarial shape the design doc names: 20k DISTINCT values inside
    // 1/65536th of the range (outliers at 0 and 2e9 stretch it), so one
    // bucket holds ~all rows with bmin != bmax — the point-mass fast
    // path can't answer it and a naive in-bucket sort would be ~n rows.
    import spark.implicits._
    val crowded = (0 until 20000).map(i => 1000.0 + i * 1e-6)
    val xs = crowded ++ Seq(0.0, 2.0e9)
    val got = Quantiles.exactQuantiles(xs.toDF("x"), Seq("x"), qs, refineLimit = 100L)
      .map { case (_, q, v) => q -> v }.toMap
    qs.foreach(q => assert(got(q) === ref(xs, q), s"q=$q"))
    assert(Quantiles.lastRefineCount > 0, "refinement path did not trigger")
  }

  test("refinement stays exact at ulp granularity") {
    // two distinct values 1 ulp apart inside one bucket: the recursive
    // re-histogram runs over an ulp-wide [bmin, bmax] range — the
    // floating-point edge where bucket boundaries could misbehave; it
    // must split the two point masses (fast path) and stay exact.
    import spark.implicits._
    val a = 1000.0
    val b = java.lang.Math.nextUp(a)
    val xs = Seq.fill(300)(a) ++ Seq.fill(300)(b) ++ Seq(0.0, 2.0e9)
    val got = Quantiles.exactQuantiles(xs.toDF("x"), Seq("x"), qs, refineLimit = 10L)
      .map { case (_, q, v) => q -> v }.toMap
    qs.foreach(q => assert(got(q) === ref(xs, q), s"q=$q"))
  }

  test("grouped quantiles match the per-group reference bit-for-bit") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val groups = Seq("A", "B", "C")
    val rows = Seq.fill(6000)((groups(r.nextInt(3)), r.nextDouble() * 1e4 - 5e3))
    val got = Quantiles.groupedExactQuantiles(rows.toDF("g", "x"), "g", "x", qs)
      .map { case (g, q, v) => (g, q) -> v }.toMap
    groups.foreach { g =>
      val xs = rows.filter(_._1 == g).map(_._2)
      qs.foreach(q => assert(got((g, q)) === ref(xs, q), s"g=$g q=$q"))
    }
  }

  test("groupedNth returns the exact per-group order statistic") {
    import spark.implicits._
    val r = new scala.util.Random(17)
    val groups = Seq("A", "B", "C")
    val rows = Seq.fill(4000)((groups(r.nextInt(3)), r.nextDouble() * 1e6)) ++
      Seq(("T", 5.0), ("T", 3.0)) // group smaller than nth -> max
    val got = Quantiles.groupedNth(rows.toDF("g", "x"), "g", "x", 50L)
    groups.foreach { g =>
      val xs = rows.filter(_._1 == g).map(_._2).sorted
      assert(got(g) === xs(49), s"g=$g")
      // the threshold keeps exactly nth rows
      assert(rows.count(t => t._1 == g && t._2 <= got(g)) === 50)
    }
    assert(got("T") === 5.0)
  }

  test("grouped quantiles handle constant, tiny, and crowded groups") {
    import spark.implicits._
    val crowded = (0 until 5000).map(i => ("E", 1000.0 + i * 1e-6))
    val rows = Seq.fill(500)(("D", 42.5)) ++ Seq(("F", 7.25)) ++
      crowded ++ Seq(("E", 0.0), ("E", 2.0e9))
    val got = Quantiles.groupedExactQuantiles(rows.toDF("g", "x"), "g", "x", qs,
        refineLimit = 100L)
      .map { case (g, q, v) => (g, q) -> v }.toMap
    qs.foreach { q =>
      assert(got(("D", q)) === 42.5)
      assert(got(("F", q)) === 7.25)
      assert(got(("E", q)) === ref(rows.filter(_._1 == "E").map(_._2), q), s"q=$q")
    }
    assert(Quantiles.lastRefineCount > 0, "grouped refinement path did not trigger")
  }
}
