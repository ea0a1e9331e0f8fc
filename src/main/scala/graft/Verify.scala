package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: (sfDir, outDir); extra args = local-iteration
    // filter, dump only the named queries
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_SHUFFLE decouples the shuffle fan-out from the core
    // count so tools/shape_sweep.py can prove results are identical on
    // ANY cluster shape (partitions ∈ {7,32,257}, local[4] vs local[32])
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // run queries on a small thread pool: Spark's scheduler interleaves
    // the jobs and the long ML fits overlap the cheap relational dumps
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    // per-query wall seconds (build + execute + dump) → timings.json.
    // NOT a certified benchmark (queries run 4-way concurrent, one
    // sample) — a COVERAGE gauge: Bench times 10 headliners, this
    // surfaces a 10x regression in any of the other ~244 in a diff.
    val timings = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val tasks = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val t0 = System.nanoTime()
            // coalesce(1) keeps the dump a single file for the driver's
            // reader, but it also serializes the WRITE into one task —
            // at sf100 a 600M-row per-row surface takes ~10 min alone.
            // SPARK_GRAFT_VERIFY_COALESCE=0 keeps the query's own
            // parallelism (the local compare tools glob *.parquet).
            val res = fn(spark, sfDir)
            val out = if (sys.env.get("SPARK_GRAFT_VERIFY_COALESCE").contains("0")) res
              else res.coalesce(1)
            out.write.mode("overwrite").parquet(s"$outDir/$name")
            timings.put(name, (System.nanoTime() - t0) / 1e9)
          }
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    locally {
      import scala.jdk.CollectionConverters._
      val body = timings.asScala.toSeq.sortBy(_._1)
        // Locale.ROOT: the f-interpolator honors the JVM default
        // locale, and a comma decimal separator would emit invalid JSON
        .map { case (k, v) =>
          s""""$k":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))}"""
        }
        // input-data fingerprint: timings are only comparable across
        // runs with identical data (see DataFp); the underscore prefix
        // sorts it first and can't collide with a query name
        .prepended(s""""_data_fp":"${DataFp.of(sfDir)}"""")
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/timings.json"), body)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
