package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the production billion-scale ANN layout, composing the two
  * scale mechanisms this package already verifies separately:
  *
  *   - IVF ([[Ivf]]): a sample-fit coarse quantizer assigns each vector
  *     to a cell and the corpus is written `partitionBy(cluster_id)`, so
  *     probing nProbe cells is DIRECTORY PRUNING — unprobed cells are
  *     never read.
  *   - PQ ([[Pq]]): inside each cell a vector is stored as m small codes
  *     (8 longs, not 64 floats) and scored by ADC table lookups.
  *
  * Probe = prune to nProbe cells → ADC-scan their codes → exact
  * integer-grid re-rank of the top candidates. Codes here encode the
  * normalized vector itself (not the residual to the cell centroid —
  * the classic refinement, noted and skipped: with an exact re-rank
  * stage the residual variant only changes candidate quality, not
  * result exactness). Everything driver-side is bounded: the training
  * samples, the centroid table, the codebooks, and the per-query cell
  * lists + ADC tables.
  */
object IvfPq {

  case class IvfPqIndex(path: String, centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], m: Int, ksub: Int, dsub: Int)

  private def normalize(v: Array[Double]): Array[Double] = {
    var n2 = 0.0
    v.foreach(x => n2 += x * x)
    val n = math.sqrt(n2)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Coarse quantizer + PQ codebooks, both seeded driver Lloyd's on the
    * SAME bounded collected sample (coarse on raw vectors, books on the
    * normalized ones), then ONE pass assigning + encoding the corpus,
    * written partitioned by cell. The coarse fit was MLlib KMeans
    * through round 5 — profiled at 1.2 s of pure job-scheduling
    * overhead on a ≤10k sample whose driver Lloyd's takes
    * single-digit ms; with the sample already in hand for the books,
    * the distributed fit bought nothing (the full corpus never feeds
    * the quantizer at any scale — that's the IVF contract).
    */
  def buildIndex(corpus: DataFrame, idCol: String, embCol: String,
      nClusters: Int, m: Int, ksub: Int, path: String, seed: Long = 42L,
      maxTrainRows: Long = 10000L): IvfPqIndex = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val trainRaw = Similarity.boundedTrainSample(corpus, embCol, maxTrainRows, seed)
    val centroids = Pq.kmeansSub(trainRaw, nClusters, seed)
    val train = trainRaw.map(normalize)
    val dim = train(0).length
    val dsub = dim / m
    val books = Array.tabulate(m) { j =>
      Pq.kmeansSub(train.map(_.slice(j * dsub, (j + 1) * dsub)), ksub, seed + j)
    }
    val flatBooks: Seq[Double] = books.flatMap(_.flatMap(_.toSeq)).toSeq
    val assigned = Similarity.withQuantized(corpus, embCol)
      .withColumn("cluster_id", Similarity.nearestCell(col(embCol), centroids))
      .withColumn("nvec", transform(col("qvec"),
        x => x.cast("double") / sqrt(col("qnorm").cast("double"))))
      .select(col(idCol).as("corpus_id"), col("qvec").as("c_qvec"),
        col("qnorm").as("c_qnorm"),
        call_function("graft_pq_encode", col("nvec"), typedLit(flatBooks), lit(m)).as("codes"),
        col("cluster_id"))
    graft.sources.Sources.writePartitioned(assigned, path, Seq("cluster_id"))
    IvfPqIndex(path, centroids, books, m, ksub, dsub)
  }

  /** Prune → ADC → exact re-rank. The query set is bounded by contract:
    * cell choice and ADC tables are driver arithmetic.
    */
  def probeIndex(index: IvfPqIndex, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nProbe: Int, candMult: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val qRows = queries.select(col(idCol), col(embCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    // per query: nProbe nearest cells + the ADC table over the codebooks
    val probes: Seq[(Long, Seq[Int], Seq[Double])] = qRows.toSeq.map { case (qid, emb) =>
      val cells = index.centroids.zipWithIndex
        .map { case (c, i) => (sqDist(emb, c), i) }.sorted.take(nProbe).map(_._2).toSeq
      val qn = normalize(emb)
      val tbl = new Array[Double](index.m * index.ksub)
      for (j <- 0 until index.m; cc <- 0 until index.ksub) {
        var s = 0.0
        var i = 0
        while (i < index.dsub) { s += qn(j * index.dsub + i) * index.books(j)(cc)(i); i += 1 }
        tbl(j * index.ksub + cc) = s
      }
      (qid, cells, tbl.toSeq)
    }
    val allCells = probes.flatMap(_._2).distinct
    // literal IN-list → directory pruning (a join key would defeat it)
    val inv = spark.read.parquet(index.path)
      .filter(col("cluster_id").isin(allCells: _*))
    val qProbe = probes
      .flatMap { case (qid, cells, tbl) => cells.map(c => (qid, c, tbl)) }
      .toDF("query_id", "cluster_id", "tbl")
    // ADC over the pruned cells ranks only narrow (query, id, adc) rows,
    // two-phase (local per-partition prune → global rank), so per-query
    // probed-cell volume never funnels one task; the O(queries·k·candMult)
    // surviving ids are broadcast back onto the pruned index scan for the
    // exact re-rank (stored qvecs — no re-encode, no corpus shuffle).
    val scored = inv.select("corpus_id", "codes", "cluster_id")
      .join(broadcast(qProbe), "cluster_id")
      .withColumn("adc", call_function("graft_pq_adc", col("codes"), col("tbl")))
      .select(col("query_id"), col("corpus_id"), col("adc"))
    val candIds = Similarity.topKPerQuery(scored, "adc", k * candMult)
      .select("query_id", "corpus_id")
    val qExact = Similarity.withQuantized(queries, embCol)
      .select(col(idCol).as("query_id"), col("qvec").as("q_qvec"), col("qnorm").as("q_qnorm"))
    // bounded input: ≤ k·candMult rows per query reach this rank
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    inv.select(col("corpus_id"), col("c_qvec"), col("c_qnorm"))
      .join(broadcast(candIds), "corpus_id")
      .join(broadcast(qExact), "query_id")
      .select(col("query_id"), col("corpus_id"),
        Similarity.cosineQ(col("q_qvec"), col("c_qvec"),
          col("q_qnorm"), col("c_qnorm")).as("cosine"))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** One-shot index dirs created by THIS JVM, all deleted by a single
    * shutdown hook: repeated bench reps/verify runs used to leave one
    * ivfpq_index_* dir per invocation under target/ forever (r8 ADVICE
    * class). An earlier fix deleted the PREVIOUS dir at the start of the
    * NEXT ivfPqTopK call, which (a) charged a file-tree walk + deletes to
    * the timed query path (part of sim_ivfpq_topk's r14 −10%), and
    * (b) raced Verify's concurrent query pool — probeIndex returns a
    * LAZY DataFrame over spark.read.parquet(dir), and two registered
    * queries (sim_ivfpq_topk, sim_recall_eval) call ivfPqTopK in the
    * same JVM, so the delete could remove a directory another thread's
    * pending scan still needed. At shutdown every returned frame has
    * been consumed or abandoned, so deletion is race-free and costs the
    * benchmark nothing.
    */
  private val oneShotDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val cleanupHooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def trackForShutdownCleanup(dir: String): Unit = {
    oneShotDirs.add(dir)
    if (cleanupHooked.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        oneShotDirs.forEach(d => rm(new java.io.File(d)))
      }, "graft-ivfpq-index-cleanup"))
    }
  }

  /** One-shot build + probe (sim_ivfpq_topk); index lands under target/. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int, nClusters: Int, nProbe: Int,
      m: Int = 8, ksub: Int = 16): DataFrame = {
    val base = java.nio.file.Paths.get("target")
    val dir = (if (java.nio.file.Files.isDirectory(base))
        java.nio.file.Files.createTempDirectory(base, "ivfpq_index_")
      else java.nio.file.Files.createTempDirectory("ivfpq_index_")).toString
    trackForShutdownCleanup(dir)
    val index = buildIndex(corpus, idCol, embCol, nClusters, m, ksub, dir)
    probeIndex(index, queries, idCol, embCol, k, nProbe)
  }
}
