package graft

/** Verify's disk-awareness (r12): the pre-dump gate must refuse when
  * the estimated dump exceeds free-minus-headroom, admit otherwise,
  * and the estimator must stay sane on join-heavy plans (size-only
  * stats multiply across joins; the estimate is clamped to the
  * scanned bytes so a 4-row aggregate over a lineitem⋈orders join
  * can't be refused as "petabytes").
  */
class DiskGateSpec extends SparkSpec {

  test("gate admits under budget and refuses over it, with the shortfall sized") {
    // 10 GB free, 4 GB headroom -> 6 GB budget
    val free = 10L * 1000 * 1000 * 1000
    val headroom = 4L * 1000 * 1000 * 1000
    def gb(n: Long) = Some(BigInt(n * 1000 * 1000 * 1000))
    assert(Verify.gateRefusal(gb(5), free, headroom).isEmpty)
    val r = Verify.gateRefusal(gb(9), free, headroom)
    assert(r.isDefined)
    // the refusal names the shortfall (9 - 6 = 3 GB) and the remedy
    assert(r.get.contains("3.0 GB more"), r.get)
    assert(r.get.contains("oracle_multiset"), r.get)
    // exactly-at-budget admits (<=, not <)
    assert(Verify.gateRefusal(gb(6), free, headroom).isEmpty)
    // unknown-size plans (checkpointed-RDD leaves) admit while free disk
    // clears the headroom floor, refuse below it
    assert(Verify.gateRefusal(None, free, headroom).isEmpty)
    val u = Verify.gateRefusal(None, headroom - 1, headroom)
    assert(u.isDefined && u.get.contains("unknown"), u)
  }

  test("estimate is clamped to scanned bytes even for join-multiplied stats") {
    // q03 joins lineitem x orders x customer: size-only join stats are
    // the PRODUCT of the sides (astronomical); the estimate must stay
    // within 2x the scanned leaf bytes (4x clamp, halved for parquet)
    val df = SparkEntry.queries("q03_join_agg")(spark, sf)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    val est = Verify.estimateDumpBytes(df).get
    assert(est <= leaves * 2 + BigInt(1L << 20), s"est=$est leaves=$leaves")
    assert(est > 0)
    // raw (unclamped) stats really are join-multiplied garbage here —
    // the clamp is doing work, not vacuously passing
    val raw = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(raw > leaves * 4, s"raw=$raw leaves=$leaves")
  }

  test("a per-row projection estimates at input order of magnitude") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val est = Verify.estimateDumpBytes(df).get
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    // a filtered projection of one table must estimate at no more than
    // ~2x its scan and must never be zero (the gate would be vacuous)
    assert(est > 0 && est <= leaves * 2 + BigInt(1L << 20))
  }

  test("checkpointed-fixpoint plans report unknown size, not garbage") {
    // dd_clusters runs connected components over localCheckpoint rounds;
    // its LogicalRDD leaves carry the defaultSizeInBytes sentinel — the
    // estimator must surface None rather than an astronomically-large
    // number that would refuse every dump
    val df = SparkEntry.queries("dd_clusters")(spark, sf)
    assert(Verify.estimateDumpBytes(df).isEmpty)
  }

  test("a leaf claiming more than 64x the on-disk input demotes to unknown") {
    // r14: ml_error_by_decile's fit-internal LogicalRDD claimed 5.2 TB
    // against 177 MB of input; the 4x clamp inflated with the lying
    // leaf and a deciles-sized dump was refused as "10 TB". With the
    // input volume known, an impossible leaf must push the plan into
    // the unknown-size bucket (headroom floor), not a refusal.
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    // input claimed so small every real leaf breaches 64x -> unknown
    val tiny = (leaves / 128).max(BigInt(1)).toLong
    assert(Verify.estimateDumpBytes(df, Some(tiny)).isEmpty)
    // honest input volume (>= leaves): estimate unchanged vs no cap
    val honest = leaves.toLong.max(1L)
    assert(Verify.estimateDumpBytes(df, Some(honest)) ===
      Verify.estimateDumpBytes(df))
  }
}
