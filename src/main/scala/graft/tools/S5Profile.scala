package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: anatomy of s5_trace_fetch_window (VERDICT r05 §5). */
object S5Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Unit): Unit = {
      val ts = (0 until 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: median ${ts.sorted.apply(3)}%.3f s " +
        f"(min ${ts.min}%.3f max ${ts.max}%.3f)")
    }

    val fn = graft.SparkEntry.queries("s5_trace_fetch_window")
    time("s5 full query")(
      fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
