package graft.core

import org.apache.spark.sql.DataFrame

/** Fan-out for CPU-bound map stages (signature hashing, codec decode):
  * when the input is coarser-partitioned than the cluster — the
  * single-small-file scan case — a cheap round-robin exchange first
  * lets every core work; at real scale the scan already yields ≥cores
  * splits and this is a no-op.
  *
  * The probe uses optimizer plan statistics (size estimate vs the
  * per-split target), NOT `df.rdd` — an RDD probe materializes the
  * lineage at plan-build time, a surprise job under AQE (VERDICT r03
  * finding 4).
  */
object FanOut {

  def cpuBound(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val sizeEst = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (sizeEst < BigInt(maxSplit) * cores) df.repartition(cores) else df
  }
}
