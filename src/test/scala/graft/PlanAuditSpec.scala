package graft

/** Plan-shape regressions: these assertions encode the 100 TB design
  * claims in SURVEY §4 — if an edit reintroduces a union-of-scans, drops
  * a broadcast, or un-pushes a filter, this fails before the bench does.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def scans(p: String): Int = "Scan parquet".r.findAllIn(p).length

  test("q06/q10 aggregate in a single scan (no union-of-scans)") {
    assert(scans(plan("q06_describe")) === 1)
    assert(scans(plan("q10_corr")) === 1)
  }

  test("q07/q08 rank (global-sort) the fact table only once per column") {
    // the expensive part of exact quantiles is the rank window; cheap
    // column-count scans may repeat, the sort must not
    def windows(p: String): Int = "Window".r.findAllIn(p).length
    assert(windows(plan("q07_quantiles")) === 2) // one per quantile column
    assert(windows(plan("q08_outlier_clip")) === 1)
  }

  test("dim joins broadcast") {
    assert(plan("q04_broadcast_join").contains("BroadcastHashJoin"))
    assert(plan("q03_join_agg").contains("BroadcastHashJoin"))
  }

  test("filters and projections reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.linesIterator.toSeq.last)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"),
      "projection not pruned to the 5 needed columns")
  }

  test("st_window_agg is a single aggregation (streaming-compatible shape)") {
    val p = plan("st_window_agg")
    assert("HashAggregate".r.findAllIn(p).length <= 2, p) // partial + final only
  }
}
