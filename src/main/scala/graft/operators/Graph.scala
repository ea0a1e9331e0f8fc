package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the PageRank
  * companion to [[graft.dedup.Dedup]]'s connected components. Same
  * distributed-fixpoint discipline: per-iteration localCheckpoint cuts
  * the lineage, state is one row per node, every step is a keyed
  * join + partial-aggregable sum, so the iteration scales with the
  * edge partitioning (and survives 100× more edges by raising
  * partitions, not by changing shape).
  */
object Graph {

  /** PageRank on an UNDIRECTED graph given distinct (src, dst) edge
    * pairs (each undirected edge listed once, src < dst): a fixed
    * number of damped power iterations from the uniform vector. Every
    * node in `edges` has degree ≥ 1, so there is no dangling mass.
    * Returns (id, rank); ranks sum to 1 up to float addition order.
    */
  def pagerank(edges: DataFrame, damping: Double = 0.85, iters: Int = 15): DataFrame = {
    val both = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    val degrees = both.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = both.join(degrees, "src").localCheckpoint(eager = true)
    val nodes = both.select(col("src").as("id")).distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count()
    val base = (1.0 - damping) / n.toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n.toDouble))
    for (_ <- 1 to iters) {
      val contribs = adj.join(ranks, adj("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg").cast("double")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = true)
    }
    ranks
  }
}
