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
      BigInt("7401464119466217487"), BigInt("999999999999999999999999"))
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
      if (v < BigInt(2).pow(53))
        assert(g === v.toDouble, s"sub-2^53 value must convert exactly: $v")
      else
        // twice-rounded result stays within 1 ulp of correct
        assert(math.abs(g - BigDecimal(v).toDouble)
          <= math.ulp(BigDecimal(v).toDouble), s"dec2d($v) off by >1 ulp")
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

  test("qzl grid image is exact for fixed-point inputs") {
    import spark.implicits._
    val df = Seq(12.34, 0.001, 99999.999, -5.5).toDF("x")
    val got = df.select(Exact.qzl(col("x"), 1000.0)).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(12340L, 1L, 99999999L, -5500L))
  }
}
