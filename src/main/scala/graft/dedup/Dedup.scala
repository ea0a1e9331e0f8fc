package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed near-duplicate detection (SURVEY §2.D).
  *
  * The 100 TB shape: shingling/minhashing is a narrow map over each
  * document; LSH banding shuffles once on (band, bucket-hash) so candidate
  * generation only ever joins rows that share a bucket (~1/buckets of the
  * corpus); exact Jaccard verification touches candidate pairs only. No
  * stage holds more than one document's shingle set per row.
  *
  * All hash arithmetic stays inside [0, 2^31) so ANSI mode (Spark 4
  * default) can never overflow: h_j(x) = ((2j+1)·x + j·12345) mod p over
  * x = xxhash64(shingle) mod p, p = 2^31-1 (odd multiplier → permutation).
  */
object Dedup {
  val P: Long = 2147483647L

  /** Distinct character k-shingle set per document (narrow map). */
  def withShingles(df: DataFrame, textCol: String, k: Int = 5): DataFrame =
    df.withColumn("shingles",
      array_distinct(transform(
        sequence(lit(1), greatest(length(col(textCol)) - (k - 1), lit(1))),
        i => col(textCol).substr(i, lit(k)))))

  /** Pre-hashed shingles (one xxhash64 per shingle, reused by all perms). */
  private def hashedShingles: Column =
    transform(col("shingles"), s => pmod(xxhash64(s), lit(P)))

  /** MinHash signature: numHashes universal-hash minima per document. */
  def withMinhashSig(df: DataFrame, numHashes: Int = 64): DataFrame =
    df.withColumn("hs", hashedShingles)
      .withColumn("sig", transform(sequence(lit(0), lit(numHashes - 1)),
        j => array_min(transform(col("hs"),
          x => pmod((j * 2 + 1) * x + j * lit(12345L), lit(P))))))
      .drop("hs")

  /** LSH banding: (doc, band_idx, band_hash) rows; equal band_hash within
    * a band ⇒ candidate. bands*rowsPerBand must equal the signature length.
    */
  def lshBuckets(sigDf: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    sigDf.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))))
      .toDF(idCol, "band_idx", "band_hash")

  /** Distinct candidate pairs from shared LSH buckets (bucket-local join). */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.toDF("id_a", "band_idx", "band_hash")
    val b = buckets.toDF("id_b", "band_idx", "band_hash")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard over the shingle sets of candidate pairs only. */
  def jaccardVerify(pairs: DataFrame, shingled: DataFrame, idCol: String): DataFrame = {
    val sa = shingled.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
  }

  /** End-to-end MinHash near-dup pairs above a Jaccard threshold. */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val shingled = withShingles(df, textCol)
    val sig = withMinhashSig(shingled, numHashes)
    val pairs = candidatePairs(lshBuckets(sig, idCol, bands, numHashes / bands), idCol)
    jaccardVerify(pairs, shingled, idCol).filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens. Bit assembly uses shifts/ors
    * only (no ANSI-overflowing arithmetic).
    */
  def withSimhash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("tokens", split(col(textCol), " "))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, k) ->
          |  acc | shiftleft(CASE WHEN
          |    aggregate(tokens, 0, (a, t) ->
          |      a + CASE WHEN (xxhash64(t) >> k) & 1 = 1 THEN 1 ELSE -1 END) >= 0
          |  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END, k))""".stripMargin))
      .drop("tokens")

  /** Near-dup pairs by SimHash: band-bucket candidates + hamming verify. */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sim = withSimhash(df, textCol).select(col(idCol), col("simhash"))
    val bands = sim.select(col(idCol),
        posexplode(expr("transform(sequence(0, 3), b -> shiftrightunsigned(simhash, b * 16) & 65535)")))
      .toDF(idCol, "band_idx", "band_val")
    val a = bands.toDF("id_a", "band_idx", "band_val")
    val b = bands.toDF("id_b", "band_idx", "band_val")
    val cand = a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val ha = sim.toDF("id_a", "sim_a")
    val hb = sim.toDF("id_b", "sim_b")
    cand.join(ha, "id_a").join(hb, "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Distinct word n-gram set per document. */
  def withWordNgrams(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("words", split(col(textCol), " "))
      .withColumn("ngrams", array_distinct(transform(
        sequence(lit(1), greatest(size(col("words")) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(col("words"), i, lit(n))))))
      .drop("words")
}
