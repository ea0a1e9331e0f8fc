package graft

import graft.operators.RelationalA
import org.apache.spark.sql.functions._

class RelationalASpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("every section-A query has an oracle and runs non-empty") {
    RelationalA.qs.foreach { q =>
      // approximate operators (HLL / GK sketches) are rows-only by design
      // — their error bounds are asserted in ApproxSpec instead
      if (!q.name.startsWith("ap_"))
        assert(q.oracle.nonEmpty, s"${q.name} must declare an oracle")
      assert(run(q.name).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q01 aggregates are consistent with a recount") {
    val total = run("q01_agg")
      .agg(sum(col("count_order"))).head.getLong(0)
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("q07 quantiles are ordered q1<=median<=q3") {
    val rows = run("q07_quantiles")
      .filter(col("col_name") === "l_extendedprice")
      .orderBy("q").select("value").collect().map(_.getDouble(0))
    assert(rows.length === 3 && rows(0) <= rows(1) && rows(1) <= rows(2))
  }

  test("q08 clips exactly the IQR-fenced values") {
    val l = Tables.lineitem(spark, sf)
    val clipped = run("q08_outlier_clip")
    assert(clipped.count() === l.count())
    val mm = clipped.agg(min("clipped_price"), max("clipped_price")).head
    val raw = l.agg(min("l_extendedprice"), max("l_extendedprice")).head
    assert(mm.getDouble(0) >= raw.getDouble(0))
    assert(mm.getDouble(1) <= raw.getDouble(1))
  }

  test("q10 correlations are within [-1, 1]") {
    val cs = run("q10_corr").select("corr").collect().map(_.getDouble(0))
    assert(cs.nonEmpty && cs.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("q15 semi+anti partition the customer table") {
    val c = Tables.customer(spark, sf).count()
    assert(run("q15_semi_anti").count() === c)
  }

  test("q18 split fractions are stable and disjoint") {
    val rows = run("q18_split").collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n === Tables.orders(spark, sf).count())
    assert(rows.map(_.getString(0)).toSet === Set("train", "test"))
  }

  test("q04 plan broadcasts the dim side and pushes filters to scan") {
    val plan = run("q04_broadcast_join").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast join")
  }

  test("q02 pushes predicates into the parquet scan") {
    val plan = run("q02_filter_project").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), s"no pushdown in:\n$plan")
  }
}
