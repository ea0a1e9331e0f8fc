package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The [[Exact]] conversion recipes, pinned against driver-side BigDecimal
  * ground truth — especially dec2d, whose entire reason to exist is that a
  * direct decimal→double cast stops being engine-portable past 2^53.
  */
class ExactSpec extends SparkSpec {

  test("dec2d reproduces hi*2^32+lo double arithmetic across magnitudes") {
    import spark.implicits._
    // magnitudes spanning the interesting boundaries: exact doubles,
    // 2^53±, 2^63±, 2^64±, and the observed failure values (~2.2e19)
    val values = Seq(
      BigInt(0), BigInt(1), BigInt(4294967296L), BigInt(9007199254740992L),
      BigInt(9007199254740993L), BigInt("9223372036854775807"),
      BigInt("9223372036854775809"), BigInt("18446744073709551616"),
      BigInt("18446744073709551617"), BigInt("22240711483861231690"),
      BigInt("7401464119466217487"), BigInt("999999999999999999999999"),
      // negatives: Spark decimal % and DuckDB % / // all truncate
      // toward zero, so the hi/lo split carries the sign identically
      BigInt(-1), BigInt("-9007199254740993"), BigInt("-22240711483861231690"))
    val df = values.map(_.toString).toDF("s")
      .select(col("s").cast(DecimalType(38, 0)).as("d"))
    val got = df.select(Exact.dec2d(col("d"))).collect().map(_.getDouble(0))
    values.zip(got).foreach { case (v, g) =>
      // ground truth: the same split computed in driver arithmetic —
      // this is the IEEE sequence BOTH engines replay, which for values
      // ≤ 2^53 is also the exactly-correct conversion
      val l = BigInt(4294967296L)
      val hi = ((v - (v mod l)) / l).toDouble
      val lo = (v mod l).toDouble
      val want = hi * 4294967296.0 + lo
      assert(g === want, s"dec2d($v)")
      if (v.abs < BigInt(2).pow(53))
        assert(g === v.toDouble, s"sub-2^53 value must convert exactly: $v")
      else
        // twice-rounded result stays within 1 ulp of correct
        assert(math.abs(g - BigDecimal(v).toDouble)
          <= math.ulp(BigDecimal(v).toDouble), s"dec2d($v) off by >1 ulp")
    }
  }

  test("dec2d2 reproduces the three-part split across magnitudes to 2^117") {
    import spark.implicits._
    val values = Seq(
      BigInt(0), BigInt(1), BigInt("9007199254740993"),
      BigInt("18446744073709551617"),                      // 2^64+1
      BigInt("22240711483861231690"),                      // the q90 value
      BigInt("38685626227668133590597631"),                // 2^85-ish
      BigInt("99999999999999999999999999999999"),          // 1e32 (Σz⁴ class)
      BigInt("166153499473114484112975882535043072"),      // 2^117
      BigInt("-22240711483861231690"),
      BigInt("-99999999999999999999999999999999"))
    val df = values.map(_.toString).toDF("s")
      .select(col("s").cast(DecimalType(38, 0)).as("d"))
    val got = df.select(Exact.dec2d2(col("d"))).collect().map(_.getDouble(0))
    val L = BigInt(4294967296L)
    def trunc(a: BigInt, b: BigInt): BigInt = // trunc-toward-zero division
      if (a.signum < 0) -((-a) / b) else a / b
    values.zip(got).foreach { case (v, g) =>
      val lo = v - trunc(v, L) * L
      val rest = trunc(v, L)
      val mid = rest - trunc(rest, L) * L
      val hi = trunc(rest, L)
      val want = hi.toDouble * 1.8446744073709552E19 +
        mid.toDouble * 4294967296.0 + lo.toDouble
      assert(g === want, s"dec2d2($v)")
      // thrice-rounded result stays within 2 ulp of correct
      assert(math.abs(g - BigDecimal(v).toDouble)
        <= 2 * math.ulp(BigDecimal(v).toDouble), s"dec2d2($v) off by >2 ulp")
    }
  }

  test("dec2d agrees with DuckDB's sqlDec2d shape by construction") {
    // the SQL fragment must be the literal same expression tree the
    // Column recipe builds: hi = (c - c%2^32)/2^32, then
    // hi_double * 2^32 + lo_double. Pin the fragment so a refactor of
    // one side can't silently diverge from the other.
    val sql = Exact.sqlDec2d("X")
    assert(sql.contains("// 4294967296"), "integral divide by 2^32")
    assert(sql.contains("% 4294967296"), "mod 2^32")
    assert(sql.contains("CAST(4294967296 AS DOUBLE)"), "exact 2^32 factor")
  }

  test("floorDiv equals BigInt truncating division at 100TB-like magnitudes") {
    import spark.implicits._
    // (a, n) pairs spanning the ANOVA term path: sd² up to ~1e34 over
    // group counts from tiny to fact-scale — the exact range where the
    // old round(double)→decimal image silently diverged from DuckDB
    val cases = Seq(
      (BigInt("152415787532388352"), 3L),                  // ~1.5e17 / k
      (BigInt("152415787806736454426051050"), 1999387L),   // ~1.5e26 / n_g
      (BigInt("99999999999999999999999999999999"), 24L),   // 1e32, near cap
      (BigInt("18446744073709551616"), 7L),                // 2^64
      (BigInt("9223372036854775807"), 25L),                // 2^63-1
      (BigInt("12345678901234567890123456789012"), 2000000L),
      (BigInt(0), 5L), (BigInt(24), 25L),
      // negative dividends: floorDiv TRUNCATES toward zero (BigInt `/`
      // semantics == DuckDB HUGEINT `//` == Spark decimal `%`-derived
      // quotient) — pins the r8 ADVICE contract so a future negative
      // call site can't reintroduce the pmod/trunc engine split
      (BigInt("-152415787532388352"), 3L),                 // -1.5e17 / k
      (BigInt("-99999999999999999999999999999999"), 24L),  // -1e32
      (BigInt(-24), 25L), (BigInt(-7), 3L))
    val df = cases.map { case (a, n) => (a.toString, n) }.toDF("s", "n")
      .select(col("s").cast(DecimalType(38, 0)).as("a"), col("n"))
    val got = df.select(Exact.floorDiv(col("a"), col("n"))).collect()
      .map(r => BigInt(r.getDecimal(0).toBigIntegerExact))
    cases.zip(got).foreach { case ((a, n), g) =>
      assert(g === a / n, s"floorDiv($a, $n)")
    }
  }

  test("seasonLcm is divisible by every centered-window count") {
    // the exact-integer seasonal mean (q72/q108/q110) rests on
    // (L div n) being exact for every count a ±12h window can take
    (1 to 25).foreach(n =>
      assert(Exact.seasonLcm % n === 0L, s"lcm(1..25) must cover n=$n"))
    // and the per-row L·detr identity matches BigInt arithmetic at the
    // magnitudes a 100TB-scale hourly count would produce
    import spark.implicits._
    val cases = Seq((20000L, 480000L, 25L), (1L, 13L, 13L),
      (340000L, 8000000L, 24L), (0L, 17L, 17L))
    val df = cases.toDF("y", "tw_s", "tw_n")
    val got = df.selectExpr(
      s"${Exact.seasonLcm}L * y - (${Exact.seasonLcm}L div tw_n) * tw_s")
      .collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((y, s, n), g) =>
      val L = BigInt(Exact.seasonLcm)
      assert(BigInt(g) === L * y - (L / n) * s, s"detr_l($y, $s, $n)")
    }
  }

  test("qzl grid image is exact for fixed-point inputs") {
    import spark.implicits._
    val df = Seq(12.34, 0.001, 99999.999, -5.5).toDF("x")
    val got = df.select(Exact.qzl(col("x"), 1000.0)).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(12340L, 1L, 99999999L, -5500L))
  }

  test("qzl floor(x+0.5) == BigDecimal HALF_UP round across fixed-point sweep") {
    import spark.implicits._
    // qzl images via primitive floor(x·grid + 0.5) (r9); under the
    // fixed-point precondition this must equal Spark's old
    // round()-then-cast (BigDecimal shortest-string HALF_UP) — the
    // semantics every oracle's ROUND() was verified against — for
    // either sign and up to the documented |image| ≤ 1e11 envelope.
    val grids = Seq(100.0, 1000.0, 1000000.0)
    val vals = (-2500 to 2500).map(_ / 100.0) ++ // dense 2-decimal lattice
      Seq(99999.99, -99999.99, 12345.678, -12345.678, 0.01, -0.01) ++
      Seq(99999.99999, -99999.99999) // 5 decimals near the 1e11 bound @1e6
    for (g <- grids) {
      val df = vals.toDF("x")
      val got = df.select(Exact.qzl(col("x"), g)).as[Long].collect()
      val want = vals.map { v =>
        new java.math.BigDecimal(java.lang.Double.toString(v * g))
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      }
      got.toSeq.zip(want).zip(vals).foreach { case ((a, b), v) =>
        assert(a === b, s"qzl($v, $g)")
      }
      // the image stays LONG — primitive codegen, no decimal column
      assert(df.select(Exact.qzl(col("x"), g)).schema.head.dataType ===
        org.apache.spark.sql.types.LongType)
    }
  }
}
