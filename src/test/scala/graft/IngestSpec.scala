package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Curated-store ingest: layout, uid stability, partition pruning. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = (0 until 400).map { i =>
    (i.toLong % 4 + 1, i.toLong / 100, i.toLong, ((i * 37) % 100) / 10.0)
  }.toDF("series_number", "dump_number", "event_number", "amp")

  test("write/read round trip with partition pruning on series") {
    val dir = java.nio.file.Files.createTempDirectory("curated").toString
    Ingest.writeEvents(raw, dir)
    val all = Ingest.readEvents(spark, dir)
    assert(all.count() == 400)
    assert(all.columns.contains("event_uid"))

    val pruned = Ingest.readEvents(spark, dir, series = Seq(1L, 2L))
    assert(pruned.count() == 200)
    // the series filter must prune partitions, not scan-and-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("series_number=3"))
  }

  test("bucketed event/trace tables join without an Exchange") {
    for (t <- Seq("ev_bucketed", "tr_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Ingest.writeBucketed(raw, "ev_bucketed",
      Seq("series_number", "event_number"), 4)
    Ingest.writeBucketed(
      raw.select(col("series_number"), col("event_number"),
        (col("amp") * 2).as("trace_sum")),
      "tr_bucketed", Seq("series_number", "event_number"), 4)
    // hint merge so tiny test tables don't take the broadcast path —
    // the property under test is the SortMergeJoin needing NO shuffle
    val joined = spark.table("ev_bucketed").hint("merge")
      .join(spark.table("tr_bucketed"), Seq("series_number", "event_number"))
    assert(joined.count() == 400)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-located join should not shuffle:\n$plan")
  }

  test("pruneFiles parity matches the reference's even_/odd_ prefix glob") {
    import graft.core.EventTable
    val files = Seq(
      "/data/even_20250101_000.parquet",
      "/data/even_20250101_001.parquet",
      "/data/odd_20250102_000.parquet",
      // digit-bearing names that must NOT be classified by digit parity:
      "/data/series_12_dump_3.parquet", // trailing digit 3 is a dump number
      "/data/run_7.hdf5",               // extension-free trailing digit
      "/data/series_14.hdf5")           // 'hdf5' contains digit 5
    assert(EventTable.pruneFiles(files, parity = Some("even")) ==
      Seq("/data/even_20250101_000.parquet", "/data/even_20250101_001.parquet"))
    assert(EventTable.pruneFiles(files, parity = Some("odd")) ==
      Seq("/data/odd_20250102_000.parquet"))
    // series substring selection is independent of parity
    assert(EventTable.pruneFiles(files, series = Seq("series_1")) ==
      Seq("/data/series_12_dump_3.parquet", "/data/series_14.hdf5"))
    intercept[IllegalArgumentException] {
      EventTable.pruneFiles(files, parity = Some("both"))
    }
  }

  test("multi-format load: csv and json agree with parquet") {
    import graft.core.EventTable
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = Seq((1L, 10L, 2.5, "a"), (2L, 11L, 3.5, "b"),
      (3L, 12L, 4.5, "a"))
      .toDF("series_number", "event_number", "value", "tag")
    src.write.mode("overwrite").parquet(s"$dir/pq")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    src.write.mode("overwrite").json(s"$dir/js")
    val key = Seq("series_number", "event_number")
    def rows(t: EventTable) = t.view
      .select("event_uid", "series_number", "event_number", "tag")
      .orderBy("event_number").collect().map(_.toSeq).toSeq
    // explicit schema for the text formats: inference would widen the
    // key columns differently and change the type-sensitive uid hash
    val ddl = "series_number BIGINT, event_number BIGINT, " +
      "value DOUBLE, tag STRING"
    val pq = rows(EventTable.load(spark, Seq(s"$dir/pq"), key))
    val csv = rows(EventTable.load(spark, Seq(s"$dir/csv"), key,
      format = "csv", schemaDdl = Some(ddl)))
    val js = rows(EventTable.load(spark, Seq(s"$dir/js"), key,
      format = "json", schemaDdl = Some(ddl)))
    assert(pq == csv && pq == js) // same rows, same hashed uid
    intercept[IllegalArgumentException] {
      EventTable.load(spark, Seq(s"$dir/pq"), key, format = "avro")
    }
  }

  test("raw-file converter writes the curated layout via a pluggable reader") {
    import graft.sources.RawConvert
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // fake HDF5-style reader: 20 deterministic events per "file", series
    // derived from the file name — stands in for a codec-backed reader
    val reader = new RawConvert.RawEventReader {
      val schema: StructType = StructType(Seq(
        StructField("series_number", LongType),
        StructField("dump_number", LongType),
        StructField("event_number", LongType),
        StructField("amp", DoubleType)))
      def readFile(path: String): Iterator[Row] = {
        val series = path.filter(_.isDigit).toLong
        (0 until 20).iterator.map(i =>
          Row(series, i.toLong / 10, series * 1000 + i, i * 0.5))
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("rawconv").toString
    RawConvert.convertEvents(spark,
      Seq("raw_s1.hdf", "raw_s2.hdf", "raw_s3.hdf"), reader, dir)
    val back = Ingest.readEvents(spark, dir)
    assert(back.count() == 60)
    // curated contract: series partition dirs, stable uid stamped
    val dirs = new java.io.File(dir).list().filter(_.startsWith("series_number="))
    assert(dirs.toSet == Set("series_number=1", "series_number=2", "series_number=3"))
    val uid = back.filter(col("event_number") === 1005L)
      .select("event_uid").head.getLong(0)
    val expect = Ingest.withEventUid(
        Seq((1L, 0L, 1005L)).toDF("series_number", "dump_number", "event_number"))
      .select("event_uid").head.getLong(0)
    assert(uid == expect) // same hash the ingest path stamps
    // schema validation fails fast when key columns are absent
    val bad = new RawConvert.RawEventReader {
      val schema: StructType = StructType(Seq(StructField("x", LongType)))
      def readFile(path: String): Iterator[Row] = Iterator.empty
    }
    val e = intercept[IllegalArgumentException] {
      RawConvert.decode(spark, Seq("f"), bad)
    }
    assert(e.getMessage.contains("series_number"))
  }

  test("event_uid is stable across reruns and partitioning") {
    val u1 = Ingest.withEventUid(raw).select("event_number", "event_uid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val u2 = Ingest.withEventUid(raw.repartition(13))
      .select("event_number", "event_uid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(u1 == u2)
    assert(u1.values.toSeq.distinct.size == 400)
  }

  test("S8 reload: two loads are EXACTLY identical incl. positional uid") {
    // full-row exceptAll mirror of the s8_reload_consistency query's
    // zero-shuffle checksum witness: exact multiset equality here, the
    // scale-shaped hash-sum in the driver query
    val p = "/root/testdata/sf0.001/events.parquet"
    val a = graft.core.EventTable.load(spark, Seq(p)).full
    val b = graft.core.EventTable.load(spark, Seq(p)).full
    assert(a.exceptAll(b).count() == 0L)
    assert(b.exceptAll(a).count() == 0L)
    assert(a.count() > 0L)
    a.unpersist(); b.unpersist()
  }
}
