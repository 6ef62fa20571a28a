package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev timing loop for a subset of the driver queries: one warm-up +
  * SPARK_GRAFT_BENCH_RUNS (default 3) measured noop-write passes per
  * named query, median printed per query — the fast inner loop when
  * optimizing individual queries (graft.Bench times the full suite).
  * Usage: `sbt "runMain graft.tools.TimeQueries q1 [q2 ...]"`;
  * SPARK_GRAFT_SF_DIR overrides the sf0.1 default. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQueries <queryName> [more...]")
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val ts = Seq.fill(runs)(once()).sorted
      val med = ts(ts.length / 2)
      println(f"[time] $name%-28s median=$med%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
