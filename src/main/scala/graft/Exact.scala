package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bit-exact aggregation recipe shared by every oracle-checked operator.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same SQL. Floating-point SUM/AVG/STDDEV are order-dependent, so instead:
  *
  *  1. per-row arithmetic stays in DOUBLE — identical IEEE-754 ops on
  *     identical inputs give bitwise-identical results in any engine;
  *  2. aggregation inputs are cast to an exact DECIMAL (order-independent,
  *     overflow-safe at 100 TB row counts: DECIMAL(38,6) holds 1e32);
  *  3. the exact decimal aggregate is cast back to DOUBLE (deterministic
  *     nearest-double), and any derived stat (mean, stddev, corr) is then a
  *     fixed IEEE expression over those doubles, written with the same
  *     shape on both sides.
  *
  * This also makes every aggregate partial-aggregable (map-side combine),
  * which is exactly what a 1000-executor shuffle needs.
  */
object Exact {
  /** Exact decimal image of a double column; 6 fractional digits. */
  def d6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Wider variant for per-row products (price*price ~ 1e10). */
  def d6w(c: Column): Column = c.cast(DecimalType(38, 6))

  /** High-scale variant for small magnitudes (discounts, cosines). */
  def d12(c: Column): Column = c.cast(DecimalType(38, 12))

  /** Order-independent SUM(double) rendered back to double. */
  def sumd(c: Column): Column = sum(d6(c)).cast("double")

  /** Ditto for product-magnitude inputs. */
  def sumdw(c: Column): Column = sum(d6w(c)).cast("double")

  def sumd12(c: Column): Column = sum(d12(c)).cast("double")

  // ---- SQL fragments (DuckDB side of the same recipe) ----
  def sqlSumd(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlSumdw(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DOUBLE)"
  def sqlSumd12(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,12))) AS DOUBLE)"
}
