package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.{Hdf5File, Ingest, RawConvert, VaexHdf5Reader}

/** Pure-JVM HDF5 reader (VERDICT r05 §1): round-trips against the
  * independent test writer, reads the reference's real vaex feature file,
  * and proves the full chain HDF5 → curated Parquet → engine query. */
class Hdf5Spec extends SparkSpec {

  private val demoFile = "/root/reference/demos/features.hdf5"
  private def demoExists = Files.exists(Paths.get(demoFile))

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("hdf5spec").toString
    s"$d/$name"
  }

  // ------------------------------------------------------- round trips

  test("contiguous int64/float64 round trip") {
    val f = tmp("contig.h5")
    val longs = Array.tabulate(257)(i => i.toLong * 31 - 4000)
    val doubles = Array.tabulate(257)(i => math.sin(i * 0.37) * 1e6)
    Hdf5TestWriter.write(f, Seq(
      Hdf5TestWriter.LongCol("ints", longs),
      Hdf5TestWriter.DoubleCol("floats", doubles)))
    val h = new Hdf5File(f)
    try {
      assert(h.list("/") == Seq("floats", "ints"))
      assert(h.readLongs("/ints/").toSeq == longs.toSeq)
      assert(h.readDoubles("/floats").toSeq == doubles.toSeq)
      assert(h.dataset("/ints").dims == Seq(257L))
    } finally h.close()
  }

  test("big-endian int64/float64 datasets byte-swap on read (r10)") {
    val f = tmp("bigendian.h5")
    val longs = Array.tabulate(300)(i => i.toLong * 7919 - 100000)
    val doubles = Array.tabulate(300)(i => math.cos(i * 0.21) * 1e5)
    Hdf5TestWriter.write(f, Seq(
      Hdf5TestWriter.LongCol("ints", longs, bigEndian = true),
      Hdf5TestWriter.DoubleCol("floats", doubles, bigEndian = true),
      // filters compose: shuffle de-interleaves bytes order-agnostically,
      // the swap happens after on the reassembled elements
      Hdf5TestWriter.LongCol("packed", longs, chunk = 64,
        deflate = true, shuffle = true, bigEndian = true),
      // mixed-order file: an LE column next to the BE ones
      Hdf5TestWriter.DoubleCol("le", doubles)))
    val h = new Hdf5File(f)
    try {
      assert(h.dataset("/ints").dtype.bigEndian)
      assert(!h.dataset("/le").dtype.bigEndian)
      assert(h.readLongs("/ints").toSeq == longs.toSeq)
      assert(h.readDoubles("/floats").toSeq == doubles.toSeq)
      assert(h.readLongs("/packed").toSeq == longs.toSeq)
      assert(h.readDoubles("/le").toSeq == doubles.toSeq)
      // cross-width promotion honors the order too
      assert(h.readDoubles("/ints").toSeq == longs.map(_.toDouble).toSeq)
    } finally h.close()
  }

  test("vlen-string dataset round trip via the global heap (r10)") {
    val f = tmp("vlen.h5")
    val strs = Array("plain", "", "éclair ∂x", "x" * 37,
      "trailing space ", "NUL-free")
    Hdf5TestWriter.write(f, Seq(
      Hdf5TestWriter.VlenStrCol("names", strs),
      Hdf5TestWriter.LongCol("ids", Array.tabulate(6)(_.toLong))))
    val h = new Hdf5File(f)
    try {
      val ds = h.dataset("/names")
      assert(ds.dtype.clazz == 9 && ds.dims == Seq(6L))
      // exact round trip: vlen preserves trailing spaces and length
      // (unlike the fixed-width NUL/space-trimmed class-3 path)
      assert(h.readStrings("/names").toSeq == strs.toSeq)
      assert(h.readLongs("/ids").length == 6)
    } finally h.close()
  }

  test("v2 'OHDR' headers + link-message groups round trip (r07)") {
    // the h5py libver='latest' shape: superblock v3, OHDR object
    // headers, new-style groups carrying links as compact messages
    val f = tmp("v2.h5")
    val longs = Array.tabulate(100)(i => i.toLong * 7 - 50)
    val doubles = Array.tabulate(100)(i => i * 0.25)
    Hdf5TestWriter.writeTreeV2(f, Hdf5TestWriter.GroupNode(Map(
      "grp" -> Hdf5TestWriter.GroupNode(
        Map(
          "ints" -> Hdf5TestWriter.DatasetNode(
            Hdf5TestWriter.LongCol("ints", longs),
            Seq("unit" -> Hdf5TestWriter.AStr("counts"))),
          "floats" -> Hdf5TestWriter.DatasetNode(
            Hdf5TestWriter.DoubleCol("floats", doubles))),
        Seq("sample_rate" -> Hdf5TestWriter.ADouble(1.25e6))),
      "empty" -> Hdf5TestWriter.GroupNode(Map.empty,
        Seq("note" -> Hdf5TestWriter.AStr("attrs only"))))))
    val h = new Hdf5File(f)
    try {
      assert(h.list("/") == Seq("empty", "grp"))
      assert(h.isGroup("/grp"))
      assert(h.list("/grp") == Seq("floats", "ints"))
      assert(h.readLongs("/grp/ints").toSeq == longs.toSeq)
      assert(h.readDoubles("/grp/floats").toSeq == doubles.toSeq)
      // attributes inside v2 headers (group + dataset + empty group)
      assert(h.attributes("/grp")("sample_rate") == 1.25e6)
      assert(h.attributes("/grp/ints")("unit") == "counts")
      assert(h.attributes("/empty")("note") == "attrs only")
      assert(h.list("/empty").isEmpty)
    } finally h.close()

    // a MALFORMED dense attribute layout (defined fractal heap, but no
    // name-index B-tree) still names itself instead of silently
    // returning {} — the fail-loudly contract (valid dense storage is
    // READ since r09, see the dense-storage tests)
    val fDense = tmp("dense.h5")
    val attrInfo = {
      val bb = java.nio.ByteBuffer.allocate(18)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(0.toByte); bb.put(0.toByte)
      bb.putLong(4096L) // fractal heap address: DEFINED → dense
      bb.putLong(-1L) // …but no name index: malformed
      bb.array()
    }
    Hdf5TestWriter.writeTreeV2(fDense, Hdf5TestWriter.GroupNode(Map(
      "obj" -> Hdf5TestWriter.RawV2Node(Seq((0x15, attrInfo))))))
    val hd = new Hdf5File(fDense)
    try {
      val ex = intercept[IllegalArgumentException] {
        hd.attributes("/obj")
      }
      assert(ex.getMessage.contains("dense attribute storage"))
    } finally hd.close()
  }

  test("dense link storage: fractal heap + name B-tree, root leaf") {
    import Hdf5TestWriter._
    val f = tmp("dense_links.h5")
    // 40 links > h5py's max_compact (8) → dense storage; 40 records fit
    // one 512-byte B-tree leaf ((512−10)/11 = 45)
    val children: Map[String, Node] = (0 until 40).map { i =>
      f"ds$i%02d" -> (DatasetNode(LongCol(f"ds$i%02d",
        Array.tabulate(5)(j => i * 100L + j))): Node)
    }.toMap
    writeTreeV2(f, GroupNode(Map("big" -> DenseGroupNode(children))))
    val h = new Hdf5File(f)
    try {
      assert(h.isGroup("/big"))
      assert(h.list("/big") == (0 until 40).map(i => f"ds$i%02d"))
      // every link resolves through the heap and reads its data
      assert(h.readLongs("/big/ds00").toSeq ==
        Seq(0L, 1L, 2L, 3L, 4L))
      assert(h.readLongs("/big/ds37").toSeq ==
        Seq(3700L, 3701L, 3702L, 3703L, 3704L))
    } finally h.close()
  }

  test("dense link storage: depth-1 name B-tree (internal + leaves)") {
    import Hdf5TestWriter._
    val f = tmp("dense_links_deep.h5")
    // node size 64 → 4 records per leaf → 40 links force an internal
    // root (the depth-1 reader path)
    val children: Map[String, Node] = (0 until 40).map { i =>
      f"d$i%02d" -> (DatasetNode(LongCol(f"d$i%02d",
        Array(i.toLong))): Node)
    }.toMap
    writeTreeV2(f, GroupNode(Map(
      "deep" -> DenseGroupNode(children, btNodeSize = 64))))
    val h = new Hdf5File(f)
    try {
      assert(h.list("/deep") == (0 until 40).map(i => f"d$i%02d"))
      assert((0 until 40).forall(i =>
        h.readLongs(f"/deep/d$i%02d").toSeq == Seq(i.toLong)))
    } finally h.close()
  }

  test("dense attribute storage: fractal heap + type-8 name B-tree") {
    import Hdf5TestWriter._
    val f = tmp("dense_attrs.h5")
    // 12 attributes > h5py's compact limit (8) → dense storage
    val attrs = (0 until 12).map { i =>
      f"meta$i%02d" -> (if (i % 3 == 0) ALong(i.toLong * 7)
        else if (i % 3 == 1) ADouble(i * 0.5)
        else AStr(s"v$i"): Attr)
    }
    writeTreeV2(f, GroupNode(Map(
      "obj" -> DenseGroupNode(
        Map("child" -> DatasetNode(LongCol("child", Array(1L, 2L)))),
        attrs = attrs, denseAttrs = true))))
    val h = new Hdf5File(f)
    try {
      val got = h.attributes("/obj")
      assert(got.size == 12)
      assert(got("meta00") == 0L && got("meta03") == 21L)
      assert(got("meta01") == 0.5 && got("meta04") == 2.0)
      assert(got("meta02") == "v2" && got("meta11") == "v11")
      // the dense group's links still resolve
      assert(h.readLongs("/obj/child").toSeq == Seq(1L, 2L))
    } finally h.close()
  }

  test("chunked + deflate + shuffle round trip, partial edge chunk") {
    val f = tmp("chunked.h5")
    val longs = Array.tabulate(1000)(i => (i * 2654435761L) % 100003)
    val doubles = Array.tabulate(1000)(i => i * 0.125 - 62.5)
    Hdf5TestWriter.write(f, Seq(
      // 1000 / 128 → 7 full chunks + a 104-element edge chunk
      Hdf5TestWriter.LongCol("a", longs, chunk = 128, deflate = true),
      Hdf5TestWriter.DoubleCol("b", doubles, chunk = 128,
        deflate = true, shuffle = true),
      Hdf5TestWriter.LongCol("c", longs, chunk = 128))) // chunked, no filter
    val h = new Hdf5File(f)
    try {
      assert(h.readLongs("/a").toSeq == longs.toSeq)
      assert(h.readDoubles("/b").toSeq == doubles.toSeq)
      assert(h.readLongs("/c").toSeq == longs.toSeq)
    } finally h.close()
  }

  test("rank-2 chunked round trip with partial chunks on both axes") {
    val f = tmp("rank2.h5")
    val m = Array.tabulate(37, 19)((r, c) => r * 100.0 + c)
    Hdf5TestWriter.write(f, Seq(
      Hdf5TestWriter.Double2Col("m", m, chunkRows = 16, chunkCols = 8,
        deflate = true)))
    val h = new Hdf5File(f)
    try {
      val ds = h.dataset("/m")
      assert(ds.dims == Seq(37L, 19L))
      val flat = h.readDoubles("/m")
      assert(flat.length == 37 * 19)
      for (r <- 0 until 37; c <- 0 until 19)
        assert(flat(r * 19 + c) == m(r)(c), s"($r,$c)")
    } finally h.close()
  }

  test("malformed input fails loudly, never misreads") {
    // not an HDF5 file
    val junk = tmp("junk.bin")
    Files.write(Paths.get(junk), Array.fill[Byte](256)(0x42))
    val e1 = intercept[IllegalArgumentException] {
      new Hdf5File(junk)
    }
    assert(e1.getMessage.contains("not an HDF5 file"))

    // valid file, missing object path → error names siblings
    val ok = tmp("ok.h5")
    Hdf5TestWriter.write(ok, Seq(
      Hdf5TestWriter.LongCol("present", Array(1L, 2L, 3L))))
    val h = new Hdf5File(ok)
    try {
      val e2 = intercept[NoSuchElementException] {
        h.dataset("/absent")
      }
      assert(e2.getMessage.contains("present"))
      // truncated file: structural reads fail with exceptions, not
      // silent wrong values
      val full = Files.readAllBytes(Paths.get(ok))
      val trunc = tmp("trunc.h5")
      Files.write(Paths.get(trunc), java.util.Arrays.copyOf(full, 96))
      val h2 = new Hdf5File(trunc)
      try intercept[Exception] { h2.readLongs("/present") }
      finally h2.close()
    } finally h.close()
  }

  test("multi-file vaex-layout conversion (vx.open_many semantics)") {
    // two synthetic feature files in the reference's vaex column layout
    // (/table/columns/<name>/data), distinct series — the multi-file
    // open the reference does with vx.open_many (analyzer.py:560)
    def mk(path: String, series: Long, n: Int): Unit =
      Hdf5TestWriter.writeVaex(path, Seq(
        Hdf5TestWriter.DoubleCol("series_number",
          Array.fill(n)(series.toDouble)),
        Hdf5TestWriter.DoubleCol("dump_number",
          Array.tabulate(n)(i => (i / 100).toDouble)),
        Hdf5TestWriter.DoubleCol("event_number",
          Array.tabulate(n)(i => (i + 1).toDouble)),
        Hdf5TestWriter.DoubleCol("amp",
          Array.tabulate(n)(i => i * 0.5 + series), chunk = 64,
          deflate = true)))
    val d = Files.createTempDirectory("multih5").toString
    mk(s"$d/f1.h5", 11L, 300)
    mk(s"$d/f2.h5", 22L, 200)
    val reader = VaexHdf5Reader(s"$d/f1.h5")
    assert(reader.schema("series_number").dataType ==
      org.apache.spark.sql.types.LongType)
    val out = s"$d/curated"
    RawConvert.convertEvents(spark, Seq(s"$d/f1.h5", s"$d/f2.h5"),
      reader, out)
    val all = Ingest.readEvents(spark, out)
    assert(all.count() == 500L)
    // stable uid is unique ACROSS files (series disambiguates)
    assert(all.select(countDistinct("event_uid")).head.getLong(0) == 500L)
    // S3: series restriction prunes at the partition level
    assert(Ingest.readEvents(spark, out, series = Seq(22L)).count() == 200L)
    // values survive the chunked+deflate write → read → convert chain
    val ampSum = all.filter(col("series_number") === 11L)
      .agg(sum("amp")).head.getDouble(0)
    val expect = (0 until 300).map(i => i * 0.5 + 11L).sum
    assert(math.abs(ampSum - expect) < 1e-9)
  }

  // ------------------------------------------ the reference's real file

  test("reads the reference vaex feature file structure") {
    assume(demoExists, s"$demoFile not present")
    val h = new Hdf5File(demoFile)
    try {
      val cols = h.list("/table/columns")
      // the 2-channel RQ schema (analyzer.py:539-573)
      Seq("series_number", "event_number", "dump_number", "event_time",
        "trigger_amplitude", "baseline_CPDv21Ge", "group_name")
        .foreach(c => assert(cols.contains(c), s"missing column $c"))
      val ds = h.dataset("/table/columns/event_number/data")
      assert(ds.dims == Seq(1000L))
      val evs = h.readLongs("/table/columns/event_number/data")
      assert(evs.length == 1000 && evs.distinct.length > 1)
      val series = h.readLongs("/table/columns/series_number/data")
      assert(series.forall(_ > 0))
      // Arrow-style string column: chars + offsets
      val names = h.readArrowStrings("/table/columns/group_name")
      assert(names.length == 1000)
      assert(names.forall(_.nonEmpty))
    } finally h.close()
  }

  test("HDF5 → curated Parquet → engine query end to end") {
    assume(demoExists, s"$demoFile not present")
    val reader = VaexHdf5Reader(demoFile)
    // schema sanity: curated keys present and integral
    Seq("series_number", "dump_number", "event_number").foreach { k =>
      assert(reader.schema.fieldNames.contains(k))
      assert(reader.schema(k).dataType ==
        org.apache.spark.sql.types.LongType)
    }
    val out = tmp("curated")
    RawConvert.convertEvents(spark, Seq(demoFile), reader, out)
    val curated = Ingest.readEvents(spark, out)
    assert(curated.count() == 1000L)
    assert(curated.columns.contains("event_uid"))
    assert(curated.select(countDistinct("event_uid")).head.getLong(0)
      == 1000L)

    // engine operators over the converted table: a named cut + grouped
    // aggregate + histogram — the reference's daily loop on this file
    val table = graft.core.EventTable(curated)
      .registerCut("baseline_ok",
        graft.core.Cut.Sql("baseline_CPDv21Ge IS NOT NULL"))
    val agg = table.filter(graft.core.Cut.Named("baseline_ok"))
      .groupBy("dump_number")
      .agg(count(lit(1)).as("n"),
        avg("trigger_amplitude").as("mean_amp"))
      .orderBy("dump_number")
    assert(agg.count() > 0)

    // oracle: aggregate computed straight from the HDF5 arrays
    val h = new Hdf5File(demoFile)
    val (dumps, amps) =
      try (h.readLongs("/table/columns/dump_number/data"),
        h.readDoubles("/table/columns/trigger_amplitude/data"))
      finally h.close()
    val expect = dumps.zip(amps).groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum / v.length))
      .toMap
    agg.collect().foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == expect(d)._1, s"count mismatch dump $d")
      assert(math.abs(r.getDouble(2) - expect(d)._2) < 1e-9 *
        math.max(1.0, math.abs(expect(d)._2)), s"mean mismatch dump $d")
    }

    // and a histogram (A7) over an RQ column of the converted store
    val hist = graft.stats.Hist.hist1d(
      curated, col("trigger_amplitude"), 32,
      0.0, curated.agg(max("trigger_amplitude")).head.getDouble(0))
    assert(hist.agg(sum("cnt")).head.getLong(0) > 0L)
  }

  // --------------------------- pandas fixed-format (PyTables) legacy path

  /** CPython 3.11 + numpy 1.26 `pickle.dumps(block_values.T, 5)` of the
    * object block [[group_name, processing_id] × 5 rows] below —
    * genuine bytes from the same pickler PyTables' ObjectAtom uses, so
    * the decode side is tested against an independent writer. */
  private val pandasObjBlockPickle = java.util.Base64.getDecoder.decode(
    "gAWVwQAAAAAAAACMFW51bXB5LmNvcmUubXVsdGlhcnJheZSMDF9yZWNvbnN0cnVjdJST" +
    "lIwFbnVtcHmUjAduZGFycmF5lJOUSwCFlEMBYpSHlFKUKEsBSwVLAoaUaAOMBWR0eXBl" +
    "lJOUjAJPOJSJiIeUUpQoSwOMAXyUTk5OSv////9K/////0s/dJRiiF2UKIwHcnVuMTdf" +
    "YZSMBXByb2NBlGgTTowHcnVuMTdfYpSMBXByb2NClGgTaBRoFYwGcHJvY8SGlGV0lGIu")

  private def writePandasFixture(path: String): Unit = {
    import Hdf5TestWriter._
    val n = 5
    val axis0 = Array("event_number", "baseline_ch1", "group_name",
      "series_number", "amp_ch1", "processing_id", "dump_number",
      "event_time", "trigger_type")
    // float block (stored TRANSPOSED: nrows × nitems)
    val f64Items = Array("baseline_ch1", "amp_ch1", "event_time",
      "trigger_type")
    val f64 = Array.tabulate(n, f64Items.length)((r, c) => c match {
      case 0 => 0.1 * r + 5.0
      case 1 => 2.0 * r
      case 2 => 1.7e9 + r
      case 3 => if (r % 2 == 0) 3.0 else 4.0
    })
    val i64Items = Array("event_number", "series_number", "dump_number")
    val i64 = Array.tabulate(n, i64Items.length)((r, c) => c match {
      case 0 => 100L + r
      case 1 => 20230901L
      case 2 => r.toLong / 2
    })
    val frameAttrs: Seq[(String, Attr)] = Seq(
      "pandas_type" -> AStr("frame"),
      "pandas_version" -> AStr("0.15.2"),
      "encoding" -> AStr("UTF-8"), "errors" -> AStr("strict"),
      "ndim" -> ALong(2), "nblocks" -> ALong(3),
      "axis0_variety" -> AStr("regular"),
      "axis1_variety" -> AStr("regular"),
      "block0_items_variety" -> AStr("regular"),
      "block1_items_variety" -> AStr("regular"),
      "block2_items_variety" -> AStr("regular"))
    def items(v: Array[String]) =
      FixedStrCol("x", v, v.map(_.getBytes("UTF-8").length).max)
    writeTree(path, GroupNode(Map("detprocess_df" -> GroupNode(Map(
      "axis0" -> DatasetNode(items(axis0).copy(name = "axis0")),
      "axis1" -> DatasetNode(LongCol("axis1",
        Array.tabulate(n)(_.toLong))),
      "block0_items" -> DatasetNode(
        items(f64Items).copy(name = "block0_items")),
      "block0_values" -> DatasetNode(
        Double2Col("block0_values", f64, n, f64Items.length)),
      "block1_items" -> DatasetNode(
        items(i64Items).copy(name = "block1_items")),
      "block1_values" -> DatasetNode(Long2Col("block1_values", i64)),
      "block2_items" -> DatasetNode(items(
        Array("group_name", "processing_id")).copy(name = "block2_items")),
      "block2_values" -> DatasetNode(
        VlenBytesCol("block2_values", Array(pandasObjBlockPickle)))),
      frameAttrs))))
  }

  test("pandas fixed-format frame reads like pd.read_hdf (r11)") {
    import graft.sources.PandasHdfReader
    val f = tmp("pandas_fixed.h5")
    writePandasFixture(f)

    val schema = PandasHdfReader.inferSchema(f)
    // axis0 order preserved; dtypes mapped; integral float keys → long
    assert(schema.fieldNames.toSeq == Seq("event_number", "baseline_ch1",
      "group_name", "series_number", "amp_ch1", "processing_id",
      "dump_number", "event_time", "trigger_type"))
    import org.apache.spark.sql.types._
    assert(schema("event_number").dataType == LongType)
    assert(schema("baseline_ch1").dataType == DoubleType)
    assert(schema("group_name").dataType == StringType)
    assert(schema("trigger_type").dataType == LongType) // float-stored key

    val df = RawConvert.decode(spark, Seq(f), PandasHdfReader(f))
      .orderBy("event_number").collect()
    assert(df.length == 5)
    val r0 = df(0)
    assert(r0.getLong(0) == 100L)
    assert(math.abs(r0.getDouble(1) - 5.0) < 1e-12)
    assert(r0.getString(2) == "run17_a")
    assert(r0.getLong(3) == 20230901L)
    assert(math.abs(r0.getDouble(4) - 0.0) < 1e-12)
    assert(r0.getString(5) == "procA")
    assert(r0.getLong(6) == 0L)
    assert(r0.getLong(8) == 3L)
    // pandas NaN/None marker in an object column → null
    assert(df(1).isNullAt(5))
    // unicode string survives the pickle decode
    assert(df(4).getString(5) == "procĆ")
    assert(df.map(_.getString(2)).toSeq ==
      Seq("run17_a", "run17_a", "run17_b", "run17_a", "run17_b"))

    // full chain: legacy file → curated store → engine query
    val outDir = tmp("curated_pandas")
    RawConvert.convertEvents(spark, Seq(f), PandasHdfReader(f), outDir)
    val curated = spark.read.parquet(outDir)
    assert(curated.count() == 5)
    assert(curated.filter(col("trigger_type") === 4L).count() == 2)
  }

  // ---------------------- pandas format='table' (PyTables Table, r12)

  // genuine CPython pickle bytes (protocol 2), the payloads PyTables'
  // AttributeSet writes for Python-object attrs:
  //   kind0 = pickle.dumps(['amp_ch1','baseline_ch1'])
  //   kind1 = pickle.dumps(['event_number','series_number','dump_number'])
  //   kindT = pickle.dumps(['group_name'])
  //   nia   = pickle.dumps([(0, [all six column names])])
  private val tblKind0 = java.util.Base64.getDecoder.decode(
    "gAJdcQAoWAcAAABhbXBfY2gxcQFYDAAAAGJhc2VsaW5lX2NoMXECZS4=")
  private val tblKind1 = java.util.Base64.getDecoder.decode(
    "gAJdcQAoWAwAAABldmVudF9udW1iZXJxAVgNAAAAc2VyaWVzX251bWJlcnEC" +
      "WAsAAABkdW1wX251bWJlcnEDZS4=")
  private val tblKindT = java.util.Base64.getDecoder.decode(
    "gAJdcQBYCgAAAGdyb3VwX25hbWVxAWEu")
  private val tblNia = java.util.Base64.getDecoder.decode(
    "gAJdcQBLAF1xAShYBwAAAGFtcF9jaDFxAlgMAAAAYmFzZWxpbmVfY2gxcQNY" +
      "DAAAAGV2ZW50X251bWJlcnEEWA0AAABzZXJpZXNfbnVtYmVycQVYCwAAAGR1" +
      "bXBfbnVtYmVycQZYCgAAAGdyb3VwX25hbWVxB2WGcQhhLg==")

  /** Table-format fixture: records (index i64 | values_block_0 f64×2
    * [amp_ch1, baseline_ch1] | values_block_1 i64×3 [event_number,
    * series_number, dump_number] | group_name S8 data column), three
    * compound-member encodings. v1 = inline member dims; v2 =
    * class-10 array members (what libhdf5 writes for PyTables by
    * default), chunked+shuffle+zlib like a real PyTables table; v3 =
    * unpadded names + minimal offsets (libver='latest'), chunked
    * plain. */
  private def writePandasTableFixture(path: String, ver: Int): Unit = {
    import Hdf5TestWriter._
    val recSize = 8 + 16 + 24 + 8
    val n = 3
    val amp = Array(1.5, 2.5, 3.5)
    val base0 = Array(-1.0, 0.125, 0.25)
    val evt = Array(100L, 101L, 102L)
    val ser = Array(20230901L, 20230901L, 20230901L)
    val dmp = Array(0L, 0L, 1L)
    val grp = Array("run17a", "r", "runĆ") // multi-byte UTF-8 in S8
    val rec = java.nio.ByteBuffer.allocate(recSize * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { r =>
      rec.putLong(r.toLong)
      rec.putDouble(amp(r)); rec.putDouble(base0(r))
      rec.putLong(evt(r)); rec.putLong(ser(r)); rec.putLong(dmp(r))
      val tb = grp(r).getBytes("UTF-8")
      val slot = new Array[Byte](8)
      System.arraycopy(tb, 0, slot, 0, tb.length)
      rec.put(slot)
    }
    val dtBody = ver match {
      case 1 => dtCompoundBody(1, recSize, Seq(
        ("index", 0, Nil, memberInt64),
        ("values_block_0", 8, Seq(2), memberFloat64),
        ("values_block_1", 24, Seq(3), memberInt64),
        ("group_name", 48, Nil, memberString(8))))
      case v => dtCompoundBody(v, recSize, Seq(
        ("index", 0, Nil, memberInt64),
        ("values_block_0", 8, Nil, dtArrayBody(v, Seq(2), memberFloat64)),
        ("values_block_1", 24, Nil, dtArrayBody(v, Seq(3), memberInt64)),
        ("group_name", 48, Nil, memberString(8))))
    }
    val tableCol = RawRecordsCol("table", dtBody, recSize,
      rec.array(), n,
      chunk = if (ver == 1) 0 else 2,
      deflate = ver == 2, shuffle = ver == 2)
    writeTree(path, GroupNode(Map("detprocess_df" -> GroupNode(Map(
      "table" -> DatasetNode(tableCol, Seq(
        "values_block_0_kind" -> ABytes(tblKind0),
        "values_block_1_kind" -> ABytes(tblKind1),
        "group_name_kind" -> ABytes(tblKindT),
        "NROWS" -> ALong(n)))),
      Seq(
        "pandas_type" -> AStr("frame_table"),
        "pandas_version" -> AStr("0.15.2"),
        "table_type" -> AStr("appendable_frame"),
        "non_index_axes" -> ABytes(tblNia))))))
  }

  test("pandas format='table' frame reads: compound v1/v2/v3 member " +
      "encodings, array members, pickled kinds, chunk+shuffle+zlib") {
    import graft.sources.PandasHdfReader
    for (ver <- Seq(1, 2, 3)) {
      val f = tmp(s"pandas_table_v$ver.h5")
      writePandasTableFixture(f, ver)
      // compound member parse straight through Hdf5File
      val h5 = new graft.sources.Hdf5File(f)
      try {
        val ms = h5.compoundMembers("detprocess_df/table")
        assert(ms.map(_.name) ==
          Seq("index", "values_block_0", "values_block_1", "group_name"))
        assert(ms.map(_.offset) == Seq(0, 8, 24, 48))
        assert(ms(1).dims == Seq(2) && ms(1).dtype.clazz == 1)
        assert(ms(2).dims == Seq(3) && ms(2).dtype.clazz == 0)
        assert(ms(3).dims.isEmpty && ms(3).dtype.size == 8)
      } finally h5.close()
      // schema: non_index_axes order, dtype map
      val schema = PandasHdfReader.inferSchema(f)
      assert(schema.fieldNames.toSeq == Seq("amp_ch1", "baseline_ch1",
        "event_number", "series_number", "dump_number", "group_name"),
        s"v$ver schema order")
      import org.apache.spark.sql.types._
      assert(schema("amp_ch1").dataType == DoubleType)
      assert(schema("event_number").dataType == LongType)
      assert(schema("group_name").dataType == StringType)
      // values: index skipped, blocks unpacked, UTF-8 string trimmed
      val rows = RawConvert.decode(spark, Seq(f), PandasHdfReader(f))
        .orderBy("event_number").collect()
      assert(rows.length == 3, s"v$ver rows")
      assert(rows.map(_.getDouble(0)).toSeq == Seq(1.5, 2.5, 3.5))
      assert(rows.map(_.getDouble(1)).toSeq == Seq(-1.0, 0.125, 0.25))
      assert(rows.map(_.getLong(2)).toSeq == Seq(100L, 101L, 102L))
      assert(rows.map(_.getLong(3)).toSeq ==
        Seq(20230901L, 20230901L, 20230901L))
      assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 0L, 1L))
      assert(rows.map(_.getString(5)).toSeq == Seq("run17a", "r", "runĆ"))
    }
  }

  test("pandas series_table and malformed frame_table fail loudly") {
    import Hdf5TestWriter._
    import graft.sources.PandasHdfReader
    val f = tmp("pandas_series_table.h5")
    writeTree(f, GroupNode(Map("detprocess_df" -> GroupNode(
      Map.empty, Seq("pandas_type" -> AStr("series_table"))))))
    val e = intercept[UnsupportedOperationException] {
      PandasHdfReader.inferSchema(f)
    }
    assert(e.getMessage.contains("series_table"))
    // frame_table WITHOUT the table dataset: loud, names the object
    val f2 = tmp("pandas_table_empty.h5")
    writeTree(f2, GroupNode(Map("detprocess_df" -> GroupNode(
      Map.empty, Seq("pandas_type" -> AStr("frame_table"))))))
    val e2 = intercept[Exception] {
      PandasHdfReader.inferSchema(f2)
    }
    assert(e2.getMessage.contains("table"))
  }

  test("PandasPickle: CPython object-array pickle decodes exactly") {
    val (shape, flat) = graft.sources.PandasPickle
      .objectNdArray(pandasObjBlockPickle)
    assert(shape == Seq(5, 2))
    assert(flat.toSeq == Seq("run17_a", "procA", "run17_a", null,
      "run17_b", "procB", "run17_a", "procA", "run17_b", "procĆ"))
    // memoized back-references (BINGET) resolved: run17_a appears 3×
    assert(flat.count(_ == "run17_a") == 3)
  }
}
