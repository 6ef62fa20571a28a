package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan locality — the write-side half of
  * predicate pushdown: parquet keeps per-file (and per-row-group)
  * min/max statistics, but they only PRUNE if the writer clustered
  * related rows together. Z-ordering (bit-interleaved space-filling
  * curve, the Delta/Iceberg `OPTIMIZE ZORDER BY` idea) gives multi-
  * column locality: rows close in ANY of the z-columns land in few
  * files, so a selective filter on any one of them skips most of a
  * 100 TB table at the file list, before a single byte is read.
  *
  * Everything is declarative bit algebra (`shiftright`/`& 1`/
  * `shiftleft` — whole-stage codegen, no UDF) and the write is one
  * range repartition: `repartitionByRange(z)` gives globally
  * DISJOINT per-file z ranges (range exchange), `sortWithinPartitions`
  * tightens row-group stats inside each file. */
object Layout {

  /** Z-value: bit-interleave of the `nBits` low bits of each column
    * (column c contributes bit b to output position `b·k + c`, so
    * low-order bits of every column stay low-order in z — the classic
    * Morton code for k dimensions). Inputs must be non-negative and
    * fit `nBits` bits: values are masked (`% 2^nBits`) first, which
    * the caller typically arranges via bucketing/quantile-ranking
    * upstream (z-order clusters RANKS, not raw magnitudes, when the
    * distribution is skewed). `k · nBits` must fit a long (≤ 62). */
  def zValue(cols: Seq[Column], nBits: Int): Column = {
    val k = cols.length
    require(k >= 1, "zValue needs at least one column")
    require(nBits >= 1 && k * nBits <= 62,
      s"k·nBits = ${k * nBits} exceeds the long z-value budget")
    val masked = cols.map(c =>
      pmod(c.cast("long"), lit(1L << nBits)))
    val terms = for {
      b <- 0 until nBits
      c <- 0 until k
    } yield shiftleft(
      shiftright(masked(c), b).bitwiseAND(lit(1L)), b * k + c)
    terms.reduce(_ + _)
  }

  /** Cluster `df` by the z-order of `zCols` and write `nFiles`
    * parquet files under `path`: one range exchange on the z value
    * (per-file z ranges come out globally disjoint), rows sorted by z
    * inside each file (tight row-group stats). The z column itself is
    * kept in the output (`zColName`) so readers can range-filter on
    * it directly; drop it downstream if unwanted. */
  def zorderWrite(
      df: DataFrame,
      zCols: Seq[String],
      path: String,
      nFiles: Int,
      nBits: Int = 16,
      zColName: String = "z_value"): Unit = {
    require(nFiles >= 1, "nFiles must be positive")
    df.withColumn(zColName, zValue(zCols.map(col), nBits))
      .repartitionByRange(nFiles, col(zColName))
      .sortWithinPartitions(zColName)
      .write.mode("error").parquet(path)
  }
}
