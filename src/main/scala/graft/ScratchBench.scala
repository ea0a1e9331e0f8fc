package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness for aggregate formulations (not part of the
  * driver contract; invoked manually).
  */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, d)

    // A: the string-shingle pipeline (transform+substr → distinct →
    // explode strings → poly_hash each → custom agg)
    val shingled = Dedup.withShingles(docs, "text")
    val explodedStrings = graft.Exact.fanout(shingled)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .withColumn("x", expr("graft_poly_hash(sh)"))
    time("sig_string_shingles") {
      explodedStrings.groupBy(col("doc_id"))
        .agg(call_function("graft_minhash_agg", col("x")).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }

    // B: the one-expression path (graft_shingle_hashes → explode longs →
    // custom agg) — what minhashSig now runs
    time("sig_shingle_hashes_expr") {
      Dedup.minhashSig(docs, "text", "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
