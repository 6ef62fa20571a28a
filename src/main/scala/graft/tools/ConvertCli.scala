package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.{RawConvert, VaexHdf5Reader}

/** HDF5 → curated-Parquet conversion CLI — the offline ingest step that
  * replaces the reference's per-session `vx.open_many` memory-mapping
  * (`analyzer.py:560`):
  *
  * {{{
  * sbt "runMain graft.tools.ConvertCli /out/store features1.hdf5 features2.hdf5 ..."
  * }}}
  *
  * Reads the vaex column layout with the pure-JVM
  * [[graft.sources.Hdf5File]] reader (no native dependency), one file
  * per task, and writes the curated event store
  * ([[graft.sources.Ingest.writeEvents]]: series partitioning,
  * (dump, event) intra-file sort, stable `event_uid`). Schema is
  * inferred from the FIRST file; every file must carry at least those
  * columns. At 100 TB this is the embarrassingly-parallel restartable
  * step — rerunning overwrites the store idempotently. */
object ConvertCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ConvertCli <output-store-path> <input.hdf5> [more.hdf5 ...]")
    val out = args.head
    val files = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reader = VaexHdf5Reader(files.head)
    println(s"[convert] schema (${reader.schema.fields.length} columns) " +
      s"inferred from ${files.head}")
    RawConvert.convertEvents(spark, files, reader, out)
    val n = spark.read.parquet(out).count()
    println(s"[convert] wrote $n events from ${files.size} file(s) to $out")
    spark.stop()
  }
}
