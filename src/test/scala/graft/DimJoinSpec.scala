package graft

import org.apache.spark.sql.functions._

/** Pins [[Exact.dimJoin]]'s size gate on the physical plan: under the
  * threshold the dim side carries the broadcast hint (BroadcastHashJoin
  * even with Catalyst's auto-broadcast disabled — proving the HINT did
  * it); above it the hint is omitted and the plan falls back to a
  * shuffle join. Results are identical in both regimes.
  */
class DimJoinSpec extends SparkSpec {
  test("dimJoin broadcasts under the size gate and demotes above it") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    def cond = col("o_custkey") === col("c_custkey")
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // rule out Catalyst's own auto-broadcast so the hint is the only
      // mechanism under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val under = Exact.dimJoin(o, c, cond)
      val pu = under.queryExecution.executedPlan.toString
      assert(pu.contains("BroadcastHashJoin"), pu.take(2000))

      spark.conf.set("spark.graft.dim.broadcast.bytes", "1")
      val over = Exact.dimJoin(o, c, cond)
      val po = over.queryExecution.executedPlan.toString
      assert(!po.contains("BroadcastHashJoin"), po.take(2000))
      assert(po.contains("SortMergeJoin") || po.contains("ShuffledHashJoin"),
        po.take(2000))
      assert(under.count() === over.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      spark.conf.unset("spark.graft.dim.broadcast.bytes")
    }
  }

  test("dimJoin passes join type through (left join keeps unmatched facts)") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf).filter(col("c_custkey") < 0)
    val joined = Exact.dimJoin(o, c, col("o_custkey") === col("c_custkey"), "left")
    assert(joined.count() === o.count())
  }
}
