package graft

import org.apache.spark.sql.functions._

import graft.core.Layout

/** Z-order layout (r12): the declarative Morton-code kernel against an
  * independent bit-twiddling reference, and the write path's file-level
  * contract — globally disjoint per-file z ranges (that's what makes
  * min/max stats PRUNE at the file list). */
class LayoutSpec extends SparkSpec {

  /** Driver-side reference interleave: bit b of column c → 2b+c. */
  private def zRef(x: Long, y: Long, nBits: Int): Long = {
    var z = 0L
    for (b <- 0 until nBits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("zValue: matches the reference interleave, masks out-of-range " +
      "inputs, generalizes to 3 columns") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L),
      (170L, 85L), (256L, 257L)) // last row exceeds 8 bits → masked
    val got = rows.toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => zRef(x % 256, y % 256, 8) })
    // x=170 (10101010), y=85 (01010101): perfect alternation — x bits
    // land at even positions, y at odd → 0110 repeated
    assert(zRef(170L, 85L, 8) == java.lang.Long.parseLong(
      "0110011001100110", 2))
    // 3 columns: bit b of column c at position 3b+c
    val z3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(Layout.zValue(
        Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .as[Long].head()
    assert(z3 == 7L) // 0b111: three low bits
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a")), 63)
    }
  }

  test("zorderWrite: per-file z ranges are globally disjoint and a " +
      "selective filter touches a strict subset of files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString +
      "/t"
    val df = (0L until 4096L).toDF("id")
      .select(col("id"), pmod(col("id") * 37, lit(256)).as("x"),
        pmod(col("id") * 91, lit(256)).as("y"))
    Layout.zorderWrite(df, Seq("x", "y"), dir, nFiles = 8, nBits = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 4) // range exchange may merge tiny tails
    // disjoint contract: [min, max] of z per FILE never overlaps
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("z_value"), max("z_value")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2,
        s"overlapping file z ranges: $hi >= $lo2")
      case _ =>
    }
    // nothing lost, z recomputes to the same curve
    val back = spark.read.parquet(dir)
    assert(back.count() == 4096)
    assert(back.filter(Layout.zValue(
      Seq(col("x"), col("y")), 8) =!= col("z_value")).count() == 0)
    // a selective z-range read needs only the files whose [min,max]
    // intersects — the pruning the disjoint layout exists for
    val cut = ranges(ranges.length / 2)._1
    val needed = ranges.count { case (lo, hi) => hi >= cut }
    assert(needed < ranges.length)
    // refuses to overwrite silently
    intercept[Exception] {
      Layout.zorderWrite(df, Seq("x", "y"), dir, nFiles = 8)
    }
  }

  /** Driver-side Hilbert reference: the textbook xy2d loop. */
  private def hRef(x0: Long, y0: Long, nBits: Int): Long = {
    val n = 1L << nBits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertValue: matches the reference transform, is a bijection " +
      "on the grid, and consecutive indices are grid-adjacent (r15)") {
    import spark.implicits._
    // the full 16×16 grid in one pass
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), 4).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // reference agreement on every cell
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == hRef(x, y, 4), s"($x,$y)")
    }
    // bijection: every d in [0, 256) exactly once
    assert(got.values.toSeq.sorted == (0L until 256L))
    // THE Hilbert property (and what zValue lacks): walking d = 0..255
    // never jumps — each step moves one grid unit. This is what makes
    // a curve range cover a compact blob of the plane
    val byD = got.map(_.swap)
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) → ($x2,$y2)")
    }
    // out-of-range inputs mask like zValue
    val m = Seq((17L, 33L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 4)).as[Long].head()
    assert(m == hRef(1L, 1L, 4))
    intercept[IllegalArgumentException] {
      Layout.hilbertValue(col("x"), col("y"), 32)
    }
  }

  // independent d-D reference: the published transpose-form loops
  // (Skilling 2004) followed by the plane-group bit interleave —
  // deliberately the LOOP formulation so the engine's fold+finish
  // expression is checked against a different shape of the same math
  private def hNRef(coords: Array[Long], b: Int): Long = {
    val n = coords.length
    val x = coords.clone()
    var q = 1L << (b - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (b - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    var h = 0L
    for (p <- 0 until b; j <- 0 until n)
      h |= ((x(j) >> p) & 1L) << (p * n + (n - 1 - j))
    h
  }

  test("hilbertValueN: matches the Skilling reference, full-grid " +
      "bijection and unit-step adjacency at d=3 and d=4 (r16)") {
    import spark.implicits._
    val b = 3 // 8×8×8 grid, 512 cells
    val grid =
      for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
        yield (x, y, z)
    val got = grid.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        Layout.hilbertValueN(Seq(col("x"), col("y"), col("z")), b)
          .as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    grid.foreach { case (x, y, z) =>
      assert(got((x, y, z)) == hNRef(Array(x, y, z), b), s"($x,$y,$z)")
    }
    assert(got.values.toSeq.sorted == (0L until 512L))
    val byD = got.map(_.swap)
    (0L until 511L).foreach { d =>
      val (x1, y1, z1) = byD(d)
      val (x2, y2, z2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"jump at d=$d: ($x1,$y1,$z1) → ($x2,$y2,$z2)")
    }
    // d = 4 at 2 bits: 256 cells — bijection + adjacency again
    val g4 = for (a <- 0L until 4L; c <- 0L until 4L;
      d <- 0L until 4L; e <- 0L until 4L) yield (a, c, d, e)
    val got4 = g4.toDF("a", "b", "c", "d")
      .select(Layout.hilbertValueN(
        Seq(col("a"), col("b"), col("c"), col("d")), 2).as("h"))
      .as[Long].collect().sorted.toSeq
    assert(got4 == (0L until 256L))
    // masking matches zValue's contract; guards are loud
    val m = Seq((9L, 3L, 17L)).toDF("x", "y", "z")
      .select(Layout.hilbertValueN(
        Seq(col("x"), col("y"), col("z")), 3)).as[Long].head()
    assert(m == hNRef(Array(1L, 3L, 1L), 3))
    intercept[IllegalArgumentException] {
      Layout.hilbertValueN(Seq(col("x")), 4)
    }
    intercept[IllegalArgumentException] {
      Layout.hilbertValueN(Seq(col("x"), col("y"), col("z")), 21)
    }
    // d-D clustered write: disjoint per-file curve ranges, lifecycle
    // shared with z-order by value-column name
    val dir = java.nio.file.Files.createTempDirectory("hilbertN")
      .toString + "/t"
    val df3 = (0L until 4096L).toDF("id")
      .select(col("id"), pmod(col("id") * 7L, lit(16L)).as("x"),
        pmod(col("id") * 13L, lit(16L)).as("y"),
        pmod(col("id") * 29L, lit(16L)).as("z"))
    Layout.hilbertWriteN(df3, Seq("x", "y", "z"), dir, nFiles = 8,
      nBits = 4)
    val ranges = Layout.fileZRanges(spark, dir, "h_value")
    assert(ranges.length == 8)
    assert(!Layout.zRangesOverlap(ranges))
  }

  test("hilbertWrite: disjoint per-file curve ranges; the z-order " +
      "optimize lifecycle is curve-agnostic (r15)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hilbert")
      .toString + "/t"
    val df = (0L until 4096L).toDF("id")
      .select(col("id"), pmod(col("id") * 37, lit(256)).as("x"),
        pmod(col("id") * 91, lit(256)).as("y"))
    Layout.hilbertWrite(df, "x", "y", dir, nFiles = 8, nBits = 8)
    val ranges = Layout.fileZRanges(spark, dir, "h_value")
    assert(ranges.length >= 4)
    assert(!Layout.zRangesOverlap(ranges))
    // nothing lost; h recomputes to the same curve
    val back = spark.read.parquet(dir)
    assert(back.count() == 4096)
    assert(back.filter(Layout.hilbertValue(col("x"), col("y"), 8)
      =!= col("h_value")).count() == 0)
    // append decays, optimize restores — same lifecycle, value column
    // selected by name
    val df2 = (4096L until 8192L).toDF("id")
      .select(col("id"), pmod(col("id") * 37, lit(256)).as("x"),
        pmod(col("id") * 91, lit(256)).as("y"))
    df2.withColumn("h_value",
        Layout.hilbertValue(col("x"), col("y"), 8))
      .repartitionByRange(8, col("h_value"))
      .sortWithinPartitions("h_value")
      .write.mode("append").parquet(dir)
    assert(Layout.zRangesOverlap(Layout.fileZRanges(spark, dir, "h_value")))
    assert(Layout.zorderOptimize(spark, dir, "h_value") >= 2)
    assert(!Layout.zRangesOverlap(Layout.fileZRanges(spark, dir, "h_value")))
    assert(spark.read.parquet(dir).count() == 8192)
  }

  test("zorderAppend decays disjointness; zorderOptimize restores it " +
      "rewriting only overlapping files, results unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zopt").toString +
      "/t"
    def mk(ids: Range) = ids.map(_.toLong).toDF("id")
      .select(col("id"), pmod(col("id") * 37, lit(256)).as("x"),
        pmod(col("id") * 91, lit(256)).as("y"))
    // day 1: clustered write; day 2: an append overlapping in z
    Layout.zorderWrite(mk(0 until 2048), Seq("x", "y"), dir,
      nFiles = 6, nBits = 8)
    Layout.zorderAppend(mk(2048 until 4096), Seq("x", "y"), dir,
      nFiles = 6, nBits = 8)
    val before = Layout.fileZRanges(spark, dir)
    assert(Layout.zRangesOverlap(before),
      "append should have decayed the layout (test fixture)")
    // a disjoint SENTINEL file above every possible z (9th bit set —
    // zValue of 8-bit inputs caps at 65535) must survive byte-untouched
    val sentinel = dir + "/part-sentinel.parquet"
    Seq((99999L, 0L, 0L, 1L << 17)).toDF("id", "x", "y", "z_value")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/.sent")
    val sentSrc = new java.io.File(dir + "/.sent").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(sentSrc.toPath,
      java.nio.file.Paths.get(sentinel))
    val sentBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sentinel))
    val rewritten = Layout.zorderOptimize(spark, dir)
    assert(rewritten >= 2 && rewritten <= before.length,
      s"rewrote $rewritten of ${before.length} overlapping files")
    val after = Layout.fileZRanges(spark, dir)
    assert(!Layout.zRangesOverlap(after), "disjointness restored")
    // the sentinel was outside every overlap group: bit-identical
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sentinel)).toSeq == sentBytes.toSeq)
    // no row lost or duplicated, z values still the same curve
    val back = spark.read.parquet(dir).filter(col("id") < 99999L)
    assert(back.count() == 4096)
    assert(back.select(sum(col("id"))).head.getLong(0)
      == (0L until 4096L).sum)
    assert(back.filter(Layout.zValue(
      Seq(col("x"), col("y")), 8) =!= col("z_value")).count() == 0)
    // idempotent: a second optimize rewrites nothing
    assert(Layout.zorderOptimize(spark, dir) == 0)
  }
}
