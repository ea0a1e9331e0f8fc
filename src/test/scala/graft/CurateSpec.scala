package graft

import graft.operators.Curate
import org.apache.spark.sql.functions._

/** The composed curation pipeline: funnel shape, survivor invariants,
  * budget adherence, determinism. Stage-level correctness is inherited
  * from each stage's own oracle/spec.
  */
class CurateSpec extends SparkSpec {

  test("curation funnel is monotone and every stage survives") {
    val (kept, funnel) = Curate.pipeline(spark, sf)
    val counts = funnel.map(_._2)
    assert(funnel.map(_._1) ===
      Seq("input", "quality_gate", "exact_dedup", "near_dedup", "token_budget"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel must shrink monotonically: $funnel")
    assert(counts.last > 0, s"pipeline must keep something: $funnel")
    // survivors are a subset of the input with unique ids and unique text
    val rows = kept.collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.map(_.getString(1)).distinct.length === rows.length,
      "exact dedup guarantees unique surviving text")
  }

  test("token budget is respected against the pre-budget survivors") {
    val (kept, funnel) = Curate.pipeline(spark, sf, budgetFrac = 0.4)
    val keptTok = kept
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    // reconstruct the pre-budget token total: rerun through stage 3
    val (all, _) = Curate.pipeline(spark, sf, budgetFrac = 1.0)
    val totTok = all
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(keptTok <= (0.4 * totTok).toLong + 1,
      s"kept $keptTok tokens of $totTok at frac 0.4")
    assert(keptTok > 0)
    assert(funnel.last._2 < funnel(3)._2 || funnel.last._2 === funnel(3)._2)
  }

  test("the pipeline is run-to-run deterministic") {
    val a = Curate.pipeline(spark, sf)._1.collect().map(_.getLong(0)).sorted
    val b = Curate.pipeline(spark, sf)._1.collect().map(_.getLong(0)).sorted
    assert(a === b)
  }
}
