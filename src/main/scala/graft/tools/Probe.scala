package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing/semantics probe (dev tool, not part of the library):
  * times the named queries (args) on SPARK_GRAFT_SF_DIR, 3 runs each,
  * after one warm-up. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("llm_text_repetition")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (0 to 3).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (r > 0) println(f"[probe] $name run$r: $dt%.3f s")
      }
    }
    spark.stop()
  }
}
