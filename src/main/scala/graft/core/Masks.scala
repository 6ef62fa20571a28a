package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Scale paths for mask filters (F2/J1, `analyzer.py:218-223,236-252`):
  * keep only rows whose key appears in a mask key set.
  *
  * - Mask fits in a broadcast (≤ low millions of uids): plain broadcast
  *   left-semi join — what [[EventTable.filter]] does.
  * - Mask is huge (10⁹+ uids at the 100 TB corpus scale): a shuffle
  *   semi-join would move the ENTIRE event table. [[bloomSemiJoin]]
  *   builds a Bloom sketch of the mask (one aggregation pass; the
  *   sketch is MBs for billions of keys at 1% fpp), prefilters the big
  *   side with the codegen'd
  *   [[graft.functions.BloomMightContain]] probe — eliminating
  *   ~(1−fpp) of non-members BEFORE the shuffle — then confirms with
  *   the exact semi-join over the surviving fraction.
  */
object Masks {

  /** Build a Bloom sketch of `keyCol` in `mask`. `expectedItems` sizes
    * the bit array (overestimate is safe); `fpp` is the false-positive
    * probability. One aggregation job. */
  def bloomOfKeys(
      mask: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    mask.select(col(keyCol).cast("long")).stat
      .bloomFilter(keyCol, expectedItems, fpp)

  /** Exact mask semi-join with a Bloom prefilter on the big side.
    * Result is IDENTICAL to a plain semi-join (the sketch only ever
    * passes supersets); the win is the shuffle volume of `df` at scale. */
  def bloomSemiJoin(
      df: DataFrame,
      mask: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom = bloomOfKeys(mask, keyCol, expectedItems, fpp)
    df.filter(graft.functions.BloomMightContain(col(keyCol), bloom))
      .join(mask.select(keyCol).distinct(), Seq(keyCol), "left_semi")
  }

  /** Bloom sketch over ARBITRARY-type keys via `xxhash64` (the sketch
    * API is long-keyed; hashing first extends it to strings — the URL
    * dedup shape). One aggregation job. */
  def bloomOfHashedKeys(
      mask: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    mask.select(xxhash64(col(keyCol)).as("__h")).stat
      .bloomFilter("__h", expectedItems, fpp)

  /** Exact ANTI-join (keep rows whose key is NOT in `seen`) with a
    * Bloom SHORT-CIRCUIT — the cross-crawl URL-dedup shape: day N's
    * batch against the billions-of-URLs seen set. Bloom filters have
    * NO false negatives, so a might-contain=false row is DEFINITELY
    * novel and bypasses the shuffle entirely; only the might-contain
    * fraction (true members + fpp of the rest) pays the exact
    * anti-join. Result is IDENTICAL to a plain `left_anti` join; the
    * win is that at a typical novel-heavy daily batch, ~(1−fpp) of
    * novel rows never shuffle. Keys hash through `xxhash64` for the
    * sketch only — the confirming join is on the exact key column. */
  def bloomAntiJoin(
      df: DataFrame,
      seen: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    // Spark's stat.bloomFilter NPEs on an empty input (the aggregate
    // yields a null buffer) — day 0 of an incremental crawl has no
    // seen set yet, so guard with a limit-1 probe.
    if (seen.isEmpty) return df
    val bloom = bloomOfHashedKeys(seen, keyCol, expectedItems, fpp)
    val probe =
      graft.functions.BloomMightContain(xxhash64(col(keyCol)), bloom)
    val definitelyNew = df.filter(!probe)
    val maybeSeen = df.filter(probe)
      .join(seen.select(keyCol).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(maybeSeen)
  }
}
