package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` of named driver queries to files (dev
  * tool — the r16 optimization-round plan evidence): writes
  * `plans/<tag>/<query>_<suffix>.txt` for each query named in args.
  * For multi-job pipelines (persisted intermediates, driver-collected
  * scalars) the captured plan is the FINAL returned frame's — the
  * earlier jobs run as a side effect of building it, which is the
  * same thing graft.Bench times. Usage:
  * `sbt "runMain graft.tools.ExplainOne <tag> <suffix> q1 [q2 ...]"`;
  * SPARK_GRAFT_SF_DIR overrides the sf0.1 default. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainOne <tag> <suffix> <queryName> [more...]")
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        dir.resolve(s"${name}_$suffix.txt"), txt)
      spark.catalog.clearCache()
      println(s"[explain] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
