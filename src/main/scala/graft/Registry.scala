package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle that must hash-match bit-for-bit.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

/** A group of related operators (one per SURVEY §2 section). */
trait Module {
  def qs: Seq[Q]
}
