package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc schema/semantics probe (dev tool, not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(col("ts")).show(3, false)
    val p = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .agg(percentile(col("value"), lit(0.9)).as("p90"),
           percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90a"))
    p.show(false)
    println(p.head().getDouble(0))
    spark.stop()
  }
}
