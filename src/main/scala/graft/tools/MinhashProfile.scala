package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Stage-by-stage timing of the minhash near-dup pipeline (dev tool). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sigs = Dedup.minhashSignatures(d, "text", "doc_id", k = 64).persist()
    time("signatures")(sigs.count())
    val cands = Dedup.lshCandidates(sigs, "doc_id", 16, 4).persist()
    val nc = time("candidates")(cands.count())
    println(s"candidate pairs: $nc")
    time("estimate")(
      Dedup.estimateJaccard(cands, sigs, "doc_id").count())
    time("verify")(
      Dedup.verifyJaccard(cands, d, "text", "doc_id").count())
    spark.stop()
  }
}
