package graft

/** Testdata fingerprint for bench/timings artifacts.
  *
  * Two rounds of adjudication were spent on bench "regressions" that were
  * actually the driver regenerating /root/testdata between runs (same
  * path, different bytes — r8→r9's apparent +13%). Totals are only
  * comparable across runs whose input data is identical, so every
  * timing artifact (Bench, Verify timings.json, Solo) embeds this
  * fingerprint: FNV-1a over the sorted (relative name, byte size,
  * mtime) of every parquet entry under the SF dir. Two artifacts with
  * different `data_fp` values flag themselves as cross-generation —
  * compare code versions by rebuilding on CURRENT data instead
  * (BASELINE.md round-10 rule).
  *
  * Size+mtime (not content bytes) keeps it O(files) stat calls — free
  * at bench startup, and exactly the signal a regeneration changes.
  */
object DataFp {
  def of(sfDir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val root = new java.io.File(sfDir)
    val entries = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).toSeq
    var h = 1469598103934665603L
    def mixByte(b: Long): Unit = { h = (h ^ (b & 0xffL)) * 1099511628211L }
    def mixLong(x: Long): Unit = (0 until 8).foreach(i => mixByte(x >>> (8 * i)))
    entries.flatMap(walk).foreach { f =>
      f.getName.foreach(c => mixByte(c.toLong))
      mixLong(f.length())
      mixLong(f.lastModified())
    }
    f"$h%016x"
  }
}
