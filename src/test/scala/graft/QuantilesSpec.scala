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
}
