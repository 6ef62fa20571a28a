package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Curated-store ingest: the replacement for the reference's HDF5
  * memory-mapping (`vx.open_many`, `analyzer.py:560`) is a ONE-TIME
  * conversion into a curated Parquet layout whose physical order
  * substitutes for vaex's mmap locality (SURVEY §4):
  *
  *   - events partitioned by `series_number` → S3-style partition
  *     pruning replaces the driver-side file-list pruning (S3);
  *   - rows sorted within partitions by `(dump_number, event_number)` →
  *     J2 key fetches and W4 ordered scans hit contiguous row groups;
  *   - a stable `event_uid` stamped at ingest (S4) — hash of the natural
  *     key, shuffle-free and reproducible across reruns.
  *
  * (The HDF5 → DataFrame decode itself needs an HDF5 reader library that
  * this container doesn't ship; any columnar source works — the curation
  * contract is this function's output layout, not its input format.)
  */
object Ingest {

  val defaultUidCols: Seq[String] = Seq("series_number", "event_number")

  /** Stamp the stable uid (idempotent — keeps an existing column). */
  def withEventUid(df: DataFrame, uidCols: Seq[String] = defaultUidCols)
      : DataFrame =
    if (df.columns.contains("event_uid")) df
    else df.withColumn("event_uid", xxhash64(uidCols.map(col): _*))

  /** Write the curated event store. */
  def writeEvents(
      df: DataFrame,
      path: String,
      uidCols: Seq[String] = defaultUidCols): Unit =
    // leading series_number satisfies the writer's required partition-
    // column ordering — otherwise FileFormatWriter inserts a second sort
    // that can destabilize the (dump, event) intra-file order
    withEventUid(df, uidCols)
      .repartition(col("series_number"))
      .sortWithinPartitions("series_number", "dump_number", "event_number")
      .write
      .partitionBy("series_number")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Write the curated trace store, co-laid-out with events so the J2
    * broadcast fetch reads contiguous row groups per series. */
  def writeTraces(df: DataFrame, path: String): Unit =
    df.repartition(col("series_number"))
      .sortWithinPartitions("series_number", "dump_number", "event_number",
        "channel")
      .write
      .partitionBy("series_number")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Bucketed form of the curated stores: events and traces bucketed on
    * the SAME join key into the SAME bucket count, so the J2 fetch join
    * (and any event⋈trace analytics) is co-located — SortMergeJoin with
    * NO Exchange on either side. Worth it when trace fetches stop being
    * key-capped (bulk reprocessing over 100 TB); the partitioned layout
    * of [[writeEvents]] remains the default for interactive fetch.
    * Bucketing requires the table catalog (`saveAsTable`). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Read back with series pruning pushed to partition level (S3: the
    * `series` filter becomes partition pruning, not a file-list loop). */
  def readEvents(
      spark: SparkSession,
      path: String,
      series: Seq[Long] = Nil): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    if (series.isEmpty) df
    else df.filter(col("series_number").isin(series: _*))
  }
}
