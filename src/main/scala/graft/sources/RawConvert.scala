package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Raw-file → curated-store converter: the engine-side replacement for
  * the reference's direct HDF5 ingestion (`vx.open_many`,
  * `analyzer.py:560`; `H5Reader.read_many_events`,
  * `analyzer.py:1030-1046`).
  *
  * The byte-level decode is PLUGGABLE (the same pattern as
  * [[graft.llm.Multimodal.Decoder]]): this container ships no HDF5
  * codec, so production binds an HDF5-backed [[RawEventReader]] (e.g.
  * over jHDF or the C library via JNI) while the conversion pipeline
  * itself — distributed per-file decode, schema enforcement, curated
  * layout (series partitioning + intra-file (dump, event) sort + stable
  * uid via [[Ingest]]) — is real and unit-tested with a fake reader.
  *
  * Scale shape: one raw file = one task (`parallelize(files,
  * files.size)`), so a 100 TB conversion is embarrassingly parallel and
  * restartable per file; decoded rows never gather on the driver.
  */
object RawConvert {

  /** Decodes one raw file into event rows. Implementations MUST be
    * serializable (they run on executors) and deterministic per file. */
  trait RawEventReader extends Serializable {
    /** Schema of the rows [[readFile]] yields. Must contain the curated
      * key columns `series_number`, `dump_number`, `event_number`. */
    def schema: StructType
    /** Stream one file's events; called once per file per task. */
    def readFile(path: String): Iterator[Row]
  }

  private val requiredCols =
    Seq("series_number", "dump_number", "event_number")

  /** Decode `files` into a DataFrame (one task per file, no driver
    * materialization). Validates the reader's schema carries the
    * curated key columns up front. */
  def decode(
      spark: SparkSession,
      files: Seq[String],
      reader: RawEventReader): DataFrame = {
    require(files.nonEmpty, "no raw files to convert")
    val missing = requiredCols.filterNot(reader.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"reader schema is missing curated key column(s): " +
        s"${missing.mkString(", ")} — got " +
        s"${reader.schema.fieldNames.mkString(", ")}")
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.size)
      .flatMap(reader.readFile)
    spark.createDataFrame(rows, reader.schema)
  }

  /** Full conversion: decode raw files and write the curated EVENT
    * store ([[Ingest.writeEvents]] — series partitioning, (dump, event)
    * intra-file sort, stable `event_uid`). */
  def convertEvents(
      spark: SparkSession,
      files: Seq[String],
      reader: RawEventReader,
      outPath: String,
      uidCols: Seq[String] = Ingest.defaultUidCols): Unit =
    Ingest.writeEvents(decode(spark, files, reader), outPath, uidCols)

  /** Full conversion for the TRACE store (co-laid-out with events;
    * [[Ingest.writeTraces]]). The reader's schema must additionally
    * carry `channel` and `trace`. */
  def convertTraces(
      spark: SparkSession,
      files: Seq[String],
      reader: RawEventReader,
      outPath: String): Unit = {
    val extra = Seq("channel", "trace")
      .filterNot(reader.schema.fieldNames.contains)
    require(extra.isEmpty,
      s"trace reader schema is missing: ${extra.mkString(", ")}")
    Ingest.writeTraces(decode(spark, files, reader), outPath)
  }
}
