package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Hdf5File, Ingest, PytesdaqReader, RawConvert}
import graft.traces.TraceStore
import Hdf5TestWriter._

/** Raw-trace (pytesdaq-layout) HDF5 binding — the r06 "what's missing"
  * item #1: the layout the reference reads via
  * `H5Reader.read_many_events` (`analyzer.py:1030-1046`) and
  * `read_next_event` (`vibration_analyzer.py:384-388`), proved end to
  * end: raw event HDF5 → [[PytesdaqReader]] →
  * [[RawConvert.convertTraces]] → curated trace Parquet → the S5
  * windowed fetch and W4 rechunk engine queries, against closed-form
  * oracles computed from the synthesized ADC counts. */
class Hdf5RawSpec extends SparkSpec {

  // deterministic ADC counts: channel c, sample s, global event e
  private def adc(e: Long, c: Int, s: Int): Short =
    (100 * c + s + 10 * e).toShort
  private val nSamp = 16
  private val coeffs = Array(0.5, -1.0) // volts = 0.5·adc − 1.0
  private val norm = Map("chanA" -> 2.0, "chanB" -> 4.0)
  private def amps(e: Long, c: Int, s: Int): Double =
    (0.5 * adc(e, c, s) - 1.0) / (if (c == 0) 2.0 else 4.0)

  /** One raw dump file: events `evs` (global numbers), one adc1 group.
    * `dumpInAttr` exercises the attribute path; otherwise the dump
    * number comes from the `_F<digits>` file-name token. */
  private def writeRaw(
      path: String, evs: Seq[Long], dumpInAttr: Option[Long]): Unit = {
    val gattrs = Seq(
      "sample_rate" -> ADouble(1.25e6),
      "nb_samples" -> ALong(nSamp.toLong),
      "nb_samples_pretrigger" -> ALong(4L),
      "adc_conversion_factor" -> ADoubles(coeffs),
      "channel_list" -> AStrs(Array("chanA", "chanB")),
      "series_num" -> ALong(7001L)) ++
      dumpInAttr.map(d => "dump_num" -> (ALong(d): Attr))
    val events: Map[String, Node] = evs.map { e =>
      s"event_$e" -> (DatasetNode(
        Short2Col(s"event_$e",
          Array.tabulate(2)(c => Array.tabulate(nSamp)(s => adc(e, c, s)))),
        Seq("event_num" -> ALong(e), "event_index" -> ALong(e - 1),
          "event_time" -> ADouble(1.7e9 + e),
          "trigger_index" -> ALong(e * 1000))): Node)
    }.toMap
    writeTree(path, GroupNode(Map(
      "adc1" -> GroupNode(events, gattrs))))
  }

  test("attribute round trip: scalar and array, all supported types") {
    val d = Files.createTempDirectory("attrs").toString
    val p = s"$d/a.h5"
    writeTree(p, GroupNode(
      Map("g" -> GroupNode(Map.empty,
        Seq("note" -> AStr("hello world"),
          "rate" -> ADouble(1.25e6),
          "n" -> ALong(42L),
          "tags" -> AStrs(Array("aa", "bbbb")),
          "poly" -> ADoubles(Array(0.5, -1.0)),
          "idx" -> ALongs(Array(3L, 1L, 2L)))),
        "x" -> DatasetNode(LongCol("x", Array(1L, 2L, 3L)),
          Seq("unit" -> AStr("amps"))))))
    val f = new Hdf5File(p)
    try {
      val ga = f.attributes("/g")
      assert(ga("note") == "hello world")
      assert(ga("rate") == 1.25e6)
      assert(ga("n") == 42L)
      assert(ga("tags").asInstanceOf[Array[String]].toSeq ==
        Seq("aa", "bbbb"))
      assert(ga("poly").asInstanceOf[Array[Double]].toSeq ==
        Seq(0.5, -1.0))
      assert(ga("idx").asInstanceOf[Array[Long]].toSeq == Seq(3L, 1L, 2L))
      assert(f.attributes("/x")("unit") == "amps")
      assert(f.attributes("/").isEmpty)
    } finally f.close()
  }

  test("pytesdaq raw layout: decode, metadata resolution, calibration") {
    val d = Files.createTempDirectory("raw").toString
    val p = s"$d/raw_S7001_F0001.h5"
    writeRaw(p, Seq(1L, 2L, 3L), dumpInAttr = None)
    val rows = new PytesdaqReader(norm).readFile(p).toSeq
    assert(rows.size == 6) // 3 events × 2 channels
    val r = rows.find(r => r.getLong(2) == 2L && r.getString(6) == "chanB")
      .get
    assert(r.getLong(0) == 7001L) // series from attr
    assert(r.getLong(1) == 1L) // dump from _F0001 file token
    assert(r.getLong(3) == 1L) // event_index
    assert(r.getString(4) == "adc1")
    assert(r.getLong(5) == 2000L) // trigger_index
    assert(r.getDouble(8) == 1.25e6)
    assert(r.getLong(9) == 4L)
    val tr = r.getSeq[Double](7)
    assert(tr.size == nSamp)
    tr.zipWithIndex.foreach { case (v, s) =>
      assert(math.abs(v - amps(2L, 1, s)) < 1e-12)
    }
    // uncalibrated file: fails loudly without rawCounts, counts with it
    val p2 = s"$d/raw_nocal_S7001_F0002.h5"
    writeTree(p2, GroupNode(Map("adc1" -> GroupNode(
      Map("event_1" -> (DatasetNode(Short2Col("event_1",
        Array(Array[Short](5, 6)))): Node)),
      Seq("sample_rate" -> ADouble(1e6), "series_num" -> ALong(7001L))))))
    val ex = intercept[IllegalArgumentException] {
      new PytesdaqReader().readFile(p2).toSeq
    }
    assert(ex.getMessage.contains("adc_conversion_factor"))
    val counts = new PytesdaqReader(rawCounts = true).readFile(p2).toSeq
    assert(counts.head.getSeq[Double](7) == Seq(5.0, 6.0))
  }

  test("detconfig settings resolve the amps divisor without a caller map") {
    // the DAQ's detconfig<i> sibling group: divisor = close_loop_norm ×
    // output_total_gain per channel. chanA → 0.4 × 5 = 2, chanB →
    // 0.8 × 5 = 4 — the same divisors the `norm` map supplies by hand,
    // so the expected amps are the shared closed form.
    val d = Files.createTempDirectory("rawdet").toString
    val p = s"$d/raw_det_S7001_F0001.h5"
    val gattrs = Seq(
      "sample_rate" -> ADouble(1.25e6),
      "nb_samples" -> ALong(nSamp.toLong),
      "nb_samples_pretrigger" -> ALong(4L),
      "adc_conversion_factor" -> ADoubles(coeffs),
      "channel_list" -> AStrs(Array("chanA", "chanB")),
      "series_num" -> ALong(7001L))
    val events: Map[String, Node] = Seq(1L, 2L).map { e =>
      s"event_$e" -> (DatasetNode(
        Short2Col(s"event_$e",
          Array.tabulate(2)(c => Array.tabulate(nSamp)(s => adc(e, c, s)))),
        Seq("event_num" -> ALong(e))): Node)
    }.toMap
    writeTree(p, GroupNode(Map(
      "adc1" -> GroupNode(events, gattrs),
      "detconfig1" -> GroupNode(Map.empty, Seq(
        "channel_list" -> AStrs(Array("chanA", "chanB")),
        "close_loop_norm" -> ADoubles(Array(0.4, 0.8)),
        "output_total_gain" -> ADouble(5.0))))))
    val rows = new PytesdaqReader().readFile(p).toSeq
    assert(rows.size == 4)
    for (r <- rows; (v, s) <- r.getSeq[Double](7).zipWithIndex) {
      val c = if (r.getString(6) == "chanA") 0 else 1
      assert(math.abs(v - amps(r.getLong(2), c, s)) < 1e-12,
        s"ch=${r.getString(6)} s=$s")
    }
    // the explicit ampsNorm argument overrides the file's settings
    val over = new PytesdaqReader(Map("chanA" -> 1.0)).readFile(p).toSeq
    val a0 = over.find(_.getString(6) == "chanA").get.getSeq[Double](7)
    val b0 = over.find(_.getString(6) == "chanB").get.getSeq[Double](7)
    assert(math.abs(a0.head - (0.5 * adc(1L, 0, 0) - 1.0)) < 1e-12) // volts
    assert(math.abs(b0.head - amps(1L, 1, 0)) < 1e-12) // detconfig amps
  }

  test("raw HDF5 → curated trace Parquet → S5 windowed fetch + W4 rechunk") {
    val d = Files.createTempDirectory("rawe2e").toString
    writeRaw(s"$d/raw_S7001_F0001.h5", Seq(1L, 2L, 3L), dumpInAttr = None)
    writeRaw(s"$d/raw_S7001_F0002.h5", Seq(4L, 5L, 6L),
      dumpInAttr = Some(2L)) // dump via attribute path
    val out = s"$d/traces"
    RawConvert.convertTraces(spark,
      Seq(s"$d/raw_S7001_F0001.h5", s"$d/raw_S7001_F0002.h5"),
      new PytesdaqReader(norm), out)

    // partition-column inference types series_number as int — restore
    // the curated long type before keyed ops
    val store = spark.read.parquet(out)
      .withColumn("series_number", col("series_number").cast("long"))
    assert(store.count() == 12L) // 6 events × 2 channels
    assert(store.select("series_number").distinct().head.getLong(0) ==
      7001L)
    assert(store.filter(col("dump_number") === 2L).count() == 6L)

    // S5: windowed key fetch (the s5_trace_fetch_window shape) — fetch
    // events 2 and 5 on chanA, window samples [4, 4+8)
    import spark.implicits._
    val keys = Seq((7001L, 2L), (7001L, 5L))
      .toDF("series_number", "event_number")
    val fetched = TraceStore.fetch(store, keys, channels = Seq("chanA"),
      window = Some((4, 8)))
      .select("event_number", "trace")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(fetched.keySet == Set(2L, 5L))
    fetched.foreach { case (e, tr) =>
      assert(tr.size == 8)
      tr.zipWithIndex.foreach { case (v, i) =>
        assert(math.abs(v - amps(e, 0, 4 + i)) < 1e-12,
          s"event $e sample ${4 + i}")
      }
    }

    // W4: ordered rechunk over the event_index stream (the w4_rechunk
    // shape): 6 events × 16 samples per channel → 96 samples → chunks
    // of 24, per-chunk sums against the closed form
    val chunks = TraceStore.rechunk(store, chunkLen = 24)
      .select(col("channel"), col("chunk_id"),
        aggregate(col("trace"), lit(0.0), (acc, x) => acc + x)
          .as("chunk_sum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(chunks.size == 8) // 2 channels × 4 full chunks
    val streams = Map(
      "chanA" -> (0L until 6L).flatMap(i =>
        (0 until nSamp).map(s => amps(i + 1, 0, s))),
      "chanB" -> (0L until 6L).flatMap(i =>
        (0 until nSamp).map(s => amps(i + 1, 1, s))))
    streams.foreach { case (ch, xs) =>
      xs.grouped(24).zipWithIndex.foreach { case (g, ci) =>
        if (g.size == 24)
          assert(math.abs(chunks((ch, ci.toLong)) - g.sum) < 1e-9,
            s"$ch chunk $ci")
      }
    }
  }
}
