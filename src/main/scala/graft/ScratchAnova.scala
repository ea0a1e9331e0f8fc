package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway: dump q90 ANOVA intermediates bitwise for the sf0.1 oracle
  * divergence hunt. Deleted once the shapes match.
  */
object ScratchAnova {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = Tables.lineitem(spark, "/root/testdata/sf0.1")
    val z = round(col("l_extendedprice") * lit(100.0)).cast("long")
      .cast(DecimalType(38, 0))
    val grouped = l.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_l"), sum(z).as("sd"), sum(z * z).as("ssd"))
    grouped.collect().sortBy(_.getString(0)).foreach { r =>
      println(s"GROUP ${r.getString(0)} n=${r.getLong(1)} sd=${r.getDecimal(2)} ssd=${r.getDecimal(3)}")
    }
    val term = round(col("sd").cast("double") * col("sd").cast("double")
      / col("n_l").cast("double")).cast(DecimalType(38, 0))
    val agg = grouped.agg(
      count(lit(1)).as("k"), sum(col("n_l")).as("n"),
      sum(col("sd")).cast("double").as("ts"),
      sum(col("ssd")).cast("double").as("tss"),
      sum(term).cast("double").as("sterm")).head()
    println(s"k=${agg.getLong(0)} n=${agg.getLong(1)}")
    println(s"ts=${java.lang.Double.toHexString(agg.getDouble(2))} ${agg.getDouble(2)}")
    println(s"tss=${java.lang.Double.toHexString(agg.getDouble(3))} ${agg.getDouble(3)}")
    println(s"sterm=${java.lang.Double.toHexString(agg.getDouble(4))} ${agg.getDouble(4)}")
    spark.stop()
  }
}
