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
