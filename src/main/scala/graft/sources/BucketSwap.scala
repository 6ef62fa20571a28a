package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Rename-aside compaction for directory-bucketed parquet artifacts —
  * the crash-safe small-files maintenance discipline shared by the
  * persisted retrieval index ([[graft.llm.Rank.optimizeIndex]], r14)
  * and the persisted IVF index
  * ([[graft.llm.Similarity.optimizeIvfIndex]], r15).
  *
  * A bucket rewrite is never delete-then-rename (a crash between the
  * two strands the bucket's only copy under a reader-invisible
  * dot-name): the compacted copy is written to `.opt_<bucket>`, the
  * live bucket renamed aside to `.old_<bucket>`, the copy renamed in,
  * then the old copy deleted — at every instant at least one complete
  * copy of the bucket sits under a recoverable name, and every crash
  * point is UNAMBIGUOUS:
  *
  *  - `.opt_` next to a live bucket  = torn tmp write → delete tmp;
  *  - `.old_` with the bucket missing = crash between the renames →
  *    roll the old copy back in;
  *  - `.old_` next to a live bucket  = crash before the final delete →
  *    drop the old copy.
  *
  * Renames are atomic on HDFS-like filesystems; on object stores (no
  * atomic rename) run compaction in the ingest pause — the same caveat
  * as every rename-swapped artifact in this engine.
  */
object BucketSwap {

  /** Heal the unambiguous crash leftovers enumerated above. Run before
    * compacting; serving paths instead call [[requireNoStranded]]. */
  def healSwapLeftovers(fs: FileSystem, dir: Path): Unit = {
    val entries = fs.listStatus(dir)
    // .old_ first: rolling an aside bucket back in must happen before
    // the .opt_ pass judges its (now live again) bucket
    entries.filter(_.getPath.getName.startsWith(".old_")).foreach { s =>
      val live = new Path(dir, s.getPath.getName.substring(5))
      if (fs.exists(live)) fs.delete(s.getPath, true) // final delete died
      else require(fs.rename(s.getPath, live), // died between the renames
        s"failed to roll ${s.getPath} back in as $live")
    }
    entries.filter(_.getPath.getName.startsWith(".opt_")).foreach { s =>
      val live = new Path(dir, s.getPath.getName.substring(5))
      // live always exists here (the bucket moves aside only after the
      // tmp write completes, and the .old_ pass above rolled it back)
      if (fs.exists(live)) fs.delete(s.getPath, true) // torn tmp write
    }
  }

  /** Compact every bucket directory under `dir` whose name starts with
    * `prefix` and whose parquet file count reached `minFiles` into ONE
    * file, swapped in by the rename-aside protocol; buckets below the
    * threshold stay byte-untouched (bounded rewrite). Content is
    * unchanged, so serving results are identical before and after.
    * Returns the number of buckets rewritten — an immediate second
    * call returns 0. Callers run [[healSwapLeftovers]] first. */
  def compactBuckets(
      spark: SparkSession, dir: Path, prefix: String, minFiles: Int): Int = {
    require(minFiles >= 2, "minFiles must be at least 2")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var rewritten = 0
    fs.listStatus(dir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .foreach { b =>
        val nFiles = fs.listStatus(b.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))
        if (nFiles >= minFiles) {
          val name = b.getPath.getName
          val tmp = new Path(dir, s".opt_$name")
          val old = new Path(dir, s".old_$name")
          spark.read.parquet(b.getPath.toString)
            .coalesce(1).write.parquet(tmp.toString)
          require(fs.rename(b.getPath, old),
            s"failed to rename ${b.getPath} aside as $old")
          require(fs.rename(tmp, b.getPath),
            s"failed to swap $tmp into place as ${b.getPath}")
          fs.delete(old, true)
          rewritten += 1
        }
      }
    rewritten
  }

  /** Serve-time guard: a bucket stranded mid-swap (its only copy under
    * a dot-prefixed name the parquet reader skips) would silently serve
    * without its rows — fail loudly instead. `what` names the artifact
    * in the error. */
  def requireNoStranded(fs: FileSystem, dir: Path, what: String): Unit = {
    if (fs.exists(dir)) {
      val stranded = fs.listStatus(dir).map(_.getPath.getName)
        .filter(n => n.startsWith(".old_") || n.startsWith(".opt_"))
        .map(_.replaceFirst("^\\.(old|opt)_", ""))
        .filterNot(n => fs.exists(new Path(dir, n)))
      require(stranded.isEmpty,
        s"$what has bucket(s) stranded mid-swap " +
          s"(${stranded.mkString(", ")} exist only under a tmp name) — " +
          "serving would silently drop their rows; run the artifact's " +
          "optimize to heal the interrupted compaction first")
    }
  }
}
