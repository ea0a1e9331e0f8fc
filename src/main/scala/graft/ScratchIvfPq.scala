package graft.similarity

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for sim_ivfpq_topk's build/probe split (manual). */
object ScratchIvfPq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter(col("vec_id") % 100 === 0).limit(10)
    val corpus = emb.filter(col("vec_id") % 100 =!= 0)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    // warm the JVM/scan once
    IvfPq.ivfPqTopK(queries, corpus, "vec_id", "embedding",
      k = 5, nClusters = 8, nProbe = 4).count()
    (1 to 2).foreach { i =>
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "ivfpq_prof_").toString
      val idx = time(s"build_$i") {
        IvfPq.buildIndex(corpus, "vec_id", "embedding", 8, 8, 16, dir)
      }
      time(s"probe_$i") {
        IvfPq.probeIndex(idx, queries, "vec_id", "embedding", 5, 4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // decompose build
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = time("count")(corpus.count())
    val trainDf = if (n <= 10000L) corpus
      else corpus.sample(withReplacement = false, 10000.0 / n, 42L)
    val featurized = trainDf.withColumn("features",
      array_to_vector(transform(col("embedding"), x => x.cast("double"))))
    val km = time("kmeans_fit") {
      new KMeans().setK(8).setSeed(42L)
        .setFeaturesCol("features").setPredictionCol("cluster_id").fit(featurized)
    }
    val train = time("sample_collect") {
      trainDf.select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    }
    time("books_fit") {
      val dsub = 64 / 8
      (0 until 8).foreach { j =>
        Pq.kmeansSub(train.map(_.slice(j * dsub, (j + 1) * dsub)), 16, 42L + j)
      }
    }
    time("assign_encode_write") {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "ivfpq_prof_").toString
      val assigned = km.transform(corpus.withColumn("features",
        array_to_vector(transform(col("embedding"), x => x.cast("double")))))
      graft.sources.Sources.writePartitioned(
        assigned.select(col("vec_id"), col("cluster_id")), dir, Seq("cluster_id"))
    }
    spark.stop()
  }
}
