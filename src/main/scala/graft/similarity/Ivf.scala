package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
  * corpus; each query probes only its nProbe nearest centroids, touching
  * nProbe/nClusters of the data. At 100 TB the quantizer is trained on a
  * sample and the corpus is written bucketed by cluster id so probing is
  * partition pruning, not a join.
  */
object Ivf {

  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int, nClusters: Int, nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val featured = corpus.withColumn("features",
      array_to_vector(transform(col(embCol), x => x.cast("double"))))
    val model = new KMeans().setK(nClusters).setSeed(42L)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(featured)

    val assigned = Similarity.withQuantized(
        model.transform(featured).withColumnRenamed("cluster", "cluster_id"), embCol)
      .select(col(idCol).as("corpus_id"), col("qvec").as("c_qvec"),
        col("qnorm").as("c_qnorm"), col("cluster_id"))

    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq
      .toDF("cluster_id", "centroid")

    val probed = Similarity.withQuantized(queries, embCol)
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        col("qvec").as("q_qvec"), col("qnorm").as("q_qnorm"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist2", aggregate(
        zip_with(col("q_emb"), col("centroid"), (x, y) => {
          val dxy = x.cast("double") - y
          dxy * dxy
        }),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist2"), col("cluster_id"))))
      .filter(col("probe_rank") <= nProbe)
      .select("query_id", "q_qvec", "q_qnorm", "cluster_id")

    val scored = assigned.join(broadcast(probed), "cluster_id")
      .select(col("query_id"), col("corpus_id"),
        Similarity.cosineQ(col("q_qvec"), col("c_qvec"),
          col("q_qnorm"), col("c_qnorm")).as("cosine"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }
}
