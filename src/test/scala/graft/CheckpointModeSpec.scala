package graft

import org.apache.spark.sql.functions._

/** [[Exact.checkpoint]]'s two modes — local[32]'s `localCheckpoint`
  * and the cluster-safe reliable `checkpoint()` selected by
  * `spark.graft.checkpoint.dir` — must be pure implementation detail:
  * identical results on the iterative operators that route through
  * them. Pins the r8-verdict fix (localCheckpoint is not
  * executor-loss-safe; the helper is the single switch point).
  */
class CheckpointModeSpec extends SparkSpec {

  private def withReliableDir[T](body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try body
    finally {
      spark.conf.unset("spark.graft.checkpoint.dir")
      // the SparkContext checkpoint dir sticks once set; harmless for
      // other specs (they run in local mode unless the conf is set),
      // but remove the files
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  private def edgesDf = {
    import spark.implicits._
    // two components (a 6-chain and a triangle) + an isolated node via ids
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
  }

  test("connectedComponents identical under local and reliable checkpoint") {
    import spark.implicits._
    val ids = (1L to 6L).toSeq ++ Seq(10L, 11L, 12L, 99L)
    val idsDf = ids.toDF("doc_id")
    val pairs = edgesDf.select(col("src").as("id_a"), col("dst").as("id_b"))
    def run() = graft.dedup.Dedup
      .connectedComponents(idsDf, "doc_id", pairs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val local = run()
    val reliable = withReliableDir(run())
    assert(local === reliable)
    assert(local.toMap.apply(99L) === 99L) // isolated id maps to itself
  }

  test("pagerank identical under local and reliable checkpoint") {
    def run() = graft.operators.Graph
      .pagerank(edgesDf, damping = 0.85, iters = 5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val local = run()
    val reliable = withReliableDir(run())
    // bit-identical, not approximately equal: the grid-sum iteration is
    // deterministic, so any ulp drift here means the checkpoint mode
    // leaked into the arithmetic
    assert(local === reliable)
  }

  test("reliable mode actually writes to the configured dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_probe_").toString
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try {
      Exact.checkpoint(Seq(1, 2, 3).toDF("x")).count()
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asScala.count(java.nio.file.Files.isRegularFile(_))
      assert(files > 0, "reliable checkpoint left no files in the configured dir")
    } finally {
      spark.conf.unset("spark.graft.checkpoint.dir")
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }
}
