package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query timing anatomy (median of 7 noop-write runs).
  * Usage: `runMain graft.tools.S5Profile [sfDir] [query ...]` — defaults
  * to the s5 trace fetch it was born for (VERDICT r05 §5). */
object S5Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("s5_trace_fetch_window")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (0 until 7).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: median ${ts.sorted.apply(3)}%.3f s " +
        f"(min ${ts.min}%.3f max ${ts.max}%.3f)")
    }
    spark.stop()
  }
}
