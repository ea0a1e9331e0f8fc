package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join (SURVEY §2.I, bench-only — the synthetic keys are
  * uniform, but production key distributions aren't).
  *
  * First line of defense is AQE's runtime skew split
  * (spark.sql.adaptive.skewJoin.enabled, on by default). The salted
  * variant below is the explicit fallback for skew AQE can't fix (e.g. a
  * hot key inside one partition of a sort-merge join, or pre-AQE
  * engines): every row of the large side gets a uniform salt in
  * [0, salts), the small side is exploded ×salts, and the join key
  * becomes (key, salt) — a hot key's rows now spread over `salts`
  * reducers. Result set is provably identical to the unsalted join.
  */
object SkewJoin {

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(col(key), spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
