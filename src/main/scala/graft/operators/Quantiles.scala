package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact quantiles (pandas `quantile` linear-interpolation
  * semantics — RemoveOutliers.fit, reference processing.py:47-55).
  *
  * The naive exact formulation ranks with `row_number()` over an
  * unpartitioned window — Spark funnels the entire column through ONE
  * task, which dies at the 100 TB design scale. This object computes the
  * same order statistics with no single-partition stage:
  *
  *   job 1  per-column min/max/count — one codegen aggregate scan.
  *   job 2  exact row counts + min/max per uniform value bucket
  *          ([[Buckets]] = 65536), all columns stacked into one scan;
  *          map-side combined, ≤ cols·65536 metadata rows to the driver —
  *          the same bounded-metadata pattern as Spark's RangePartitioner.
  *   job 3  only the ≤ 2·|qs| buckets that bracket a requested rank are
  *          re-scanned (per-bucket range filters, pushed to the parquet
  *          scan) and ranked *within* bucket — each bucket holds ~n/65536
  *          rows, so no task ever sorts more than a sliver of the data.
  *
  * Bucket ids are monotonic in the value, so
  * global_rank = cum_count(buckets below) + local_rank, exactly. Buckets
  * where bmin == bmax (point-mass skew: one value dominating the column)
  * are answered from the histogram alone — the skewed case is the CHEAP
  * case. A bucket can exceed ~n/65536 rows only when many DISTINCT values
  * crowd into one 1/65536th of the value range; if that ever mattered the
  * fix is one recursive level (re-histogram [bmin, bmax] of the oversized
  * bucket — same jobs, 65536× finer), but with the point-mass fast path
  * the single level already covers the realistic skew shapes. The final
  * interpolation is the same fixed IEEE expression as the DuckDB oracle,
  * so bit-for-bit hash matches are preserved.
  *
  * Precondition: no NULLs in the quantile columns (the reference drops NA
  * first; the TPC-H measure columns are NOT NULL).
  */
object Quantiles {
  val Buckets = 65536

  private def bucketCol(x: Column, lo: Double, hi: Double): Column =
    least(width_bucket(x, lit(lo), lit(hi), lit(Buckets)), lit(Buckets.toLong))

  /** Job-2 shape, exposed for PlanAuditSpec: stacked per-bucket histogram —
    * must stay a pure partial+final hash aggregate (no Window, no
    * single-partition exchange).
    */
  def bucketHistogram(df: DataFrame, specs: Seq[(String, Double, Double)]): DataFrame = {
    val entries = specs.map { case (c, _, _) =>
      struct(lit(c).as("c"), col(c).cast("double").as("x"))
    }
    val stacked = df.select(explode(array(entries: _*)).as("s"))
      .select(col("s.c").as("c"), col("s.x").as("x"))
    val b = coalesce(specs.map { case (c, lo, hi) =>
      when(col("c") === c, bucketCol(col("x"), lo, hi))
    }: _*)
    stacked.groupBy(col("c"), b.as("b"))
      .agg(count(lit(1)).as("bc"), min(col("x")).as("bmin"), max(col("x")).as("bmax"))
  }

  /** Job-3 shape, exposed for PlanAuditSpec: bucket-local ranking — the
    * window partitions by bucket id, never an empty partition spec, and the
    * bucket range filters are plain comparisons the parquet scan can push.
    */
  def selectionDf(df: DataFrame, c: String, lo: Double, hi: Double,
      buckets: Seq[(Double, Double)]): DataFrame = {
    val cond = buckets.map { case (bmin, bmax) => col(c) >= bmin && col(c) <= bmax }
      .reduce(_ || _)
    df.filter(cond)
      .select(col(c).cast("double").as("x"))
      .withColumn("b", bucketCol(col("x"), lo, hi))
      .withColumn("lrn", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("x"))).cast("long"))
  }

  /** (col, q, value) for every requested quantile of every column, driver-
    * assembled from distributed order statistics. Everything collected is
    * bounded metadata (histogram rows / bracketing order statistics), never
    * data-proportional.
    */
  def exactQuantiles(df: DataFrame, cols: Seq[String],
      qs: Seq[Double]): Seq[(String, Double, Double)] = {
    // job 1 — per-column bounds + count in one aggregate
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__lo"),
      max(col(c).cast("double")).as(s"${c}__hi"),
      count(col(c)).as(s"${c}__n")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = cols.map { c =>
      c -> (r.getAs[Double](s"${c}__lo"), r.getAs[Double](s"${c}__hi"), r.getAs[Long](s"${c}__n"))
    }.toMap

    // ranks bracketing each requested quantile: h = q·(n−1), 1-based
    def ranksFor(n: Long): Seq[(Double, Double, Long, Long)] = qs.map { q =>
      val h = q * (n.toDouble - 1.0)
      val rlo = math.floor(h).toLong + 1L
      val rhi = math.min(rlo + 1L, n)
      (q, h, rlo, rhi)
    }

    // job 2 — one stacked histogram scan for all non-degenerate columns
    val histSpecs = cols.filter(c => bounds(c)._3 > 0 && bounds(c)._1 != bounds(c)._2)
      .map(c => (c, bounds(c)._1, bounds(c)._2))
    val hist: Map[String, Array[(Long, Long, Double, Double)]] =
      if (histSpecs.isEmpty) Map.empty
      else bucketHistogram(df, histSpecs).collect()
        .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getDouble(3), row.getDouble(4)))
        .groupBy(_._1)
        .map { case (c, rows) =>
          c -> rows.map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1)
        }

    cols.flatMap { c =>
      val (lo, hi, n) = bounds(c)
      if (n == 0L) Seq.empty
      else if (lo == hi) ranksFor(n).map { case (q, _, _, _) => (c, q, lo) }
      else {
        val rks = ranksFor(n)
        val needed = rks.flatMap { case (_, _, rlo, rhi) => Seq(rlo, rhi) }.distinct
        // cumulative offsets over the sorted histogram → (bucket, local rank)
        val h = hist(c)
        var cum = 0L
        val located: Map[Long, (Long, Long, Double, Double)] = {
          val m = scala.collection.mutable.Map[Long, (Long, Long, Double, Double)]()
          h.foreach { case (b, bc, bmin, bmax) =>
            needed.foreach { rn =>
              if (rn > cum && rn <= cum + bc) m(rn) = (b, rn - cum, bmin, bmax)
            }
            cum += bc
          }
          m.toMap
        }
        val fast = located.collect { case (rn, (_, _, bmin, bmax)) if bmin == bmax => rn -> bmin }
        val slowPicks = located.filter { case (_, (_, _, bmin, bmax)) => bmin != bmax }
        val slow: Map[Long, Double] =
          if (slowPicks.isEmpty) Map.empty
          else {
            // job 3 — rank only inside the bracketing buckets
            val slowBuckets = slowPicks.values.map(p => (p._3, p._4)).toSeq.distinct
            val sel = selectionDf(df, c, lo, hi, slowBuckets)
            val wanted = slowPicks.map { case (rn, (b, lrn, _, _)) => (b, lrn) -> rn }
            val cond = wanted.keys.map { case (b, lrn) =>
              col("b") === b && col("lrn") === lrn
            }.reduce(_ || _)
            sel.filter(cond).select(col("b"), col("lrn"), col("x")).collect()
              .map(row => wanted((row.getLong(0), row.getLong(1))) -> row.getDouble(2)).toMap
          }
        val at = fast ++ slow
        rks.map { case (q, hh, rlo, rhi) =>
          val xLo = at(rlo)
          val xHi = at(rhi)
          // same fixed IEEE interpolation as the DuckDB oracle
          (c, q, xLo + (xHi - xLo) * (hh - math.floor(hh)))
        }
      }
    }
  }
}
