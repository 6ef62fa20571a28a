package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query slice of [[graft.Verify]] (dev tool): dumps only the
  * named queries + their oracle entries to /tmp/verify_one so
  * `tools/check_correctness.py <sfDir> /tmp/verify_one` replays just
  * them — a fast inner loop when adding or changing one oracle query.
  * Usage: `sbt "runMain graft.tools.VerifyOne q1 [q2 ...]"`;
  * SPARK_GRAFT_SF_DIR overrides the sf0.01 default. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VerifyOne <queryName> [more...]")
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = "/tmp/verify_one"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
      println(s"[verify-one] wrote $name")
    }
    // same minimal JSON string escaping as graft.Verify
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter(kv => args.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
