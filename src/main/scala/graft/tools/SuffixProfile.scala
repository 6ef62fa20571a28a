package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase-level timing of the llm_suffix_dedup pipeline (dev tool, r16
  * optimization round): mirrors SuffixDedup.duplicatedWindowStarts-
  * Releasable's materialization points (the r16 range-window shape)
  * with wall timers so the resident decomposes into base / doubling
  * rounds / final-key / rewrite. Usage:
  * `sbt "runMain graft.tools.SuffixProfile [k]"`;
  * SPARK_GRAFT_SF_DIR overrides the sf0.1 default. */
object SuffixProfile {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 6
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 to 1).foreach { pass =>
      def now() = System.nanoTime()
      var t0 = now()
      def lap(label: String, extra: String = ""): Unit = {
        val dt = (now() - t0) / 1e9
        if (pass == 1) println(f"[suffix] $label%-22s $dt%7.3f s  $extra")
        t0 = now()
      }
      val toks = split(trim(col("text")), "\\s+")
      val docs = df
        .withColumn("__toks", toks)
        .filter(col("__toks").isNotNull && size(col("__toks")) >= k &&
          !(size(col("__toks")) === 1 && element_at(col("__toks"), 1) === ""))
        .select(col("doc_id").as("__id"), col("__toks"),
          size(col("__toks")).cast("long").as("__n"))
      val base = docs
        .select(col("__id"), col("__n"),
          posexplode(col("__toks")).as(Seq("__pos", "__tok")))
        .select(col("__id"), col("__pos").cast("long").as("__pos"),
          col("__tok"),
          (col("__pos") + k <= col("__n")).as("__valid"))
        .withColumn("__g", struct(col("__id"), col("__pos")))
        .persist()
      val nBase = base.count()
      lap("base", s"rows=$nBase")
      val cls0 = base.groupBy("__tok")
        .agg(min("__g").as("__cls"), count(lit(1)).as("__nc"))
        .filter(col("__nc") > 1)
        .select(col("__tok"), col("__cls"))
      var ranks = base
        .join(cls0.hint("shuffle_hash"), Seq("__tok"))
        .select(col("__id"), col("__pos"), col("__g"), col("__valid"),
          col("__cls"))
      var prev: org.apache.spark.sql.DataFrame = base
      val a = (31 - Integer.numberOfLeadingZeros(k))
      val wDoc = Window.partitionBy("__id").orderBy("__pos")
      var j = 1
      while (j <= a) {
        val h = 1L << (j - 1)
        val paired = ranks
          .withColumn("__cls2",
            max("__cls").over(wDoc.rangeBetween(h, h)))
          .filter(col("__cls2").isNotNull)
          .persist()
        val np = paired.count()
        prev.unpersist(); prev = paired
        lap(s"round j=$j paired", s"rows=$np")
        val classes = paired.groupBy("__cls", "__cls2")
          .agg(min("__g").as("__ncls"), count(lit(1)).as("__nc"))
          .filter(col("__nc") > 1)
          .select(col("__cls"), col("__cls2"), col("__ncls"))
        ranks = paired.join(classes.hint("shuffle_hash"),
            Seq("__cls", "__cls2"))
          .select(col("__id"), col("__pos"), col("__g"), col("__valid"),
            col("__ncls").as("__cls"))
        j += 1
      }
      val h2 = 1L << a
      val keys = ranks
        .withColumn("__cls2",
          max("__cls").over(wDoc.rangeBetween(k - h2, k - h2)))
        .filter(col("__valid") && col("__cls2").isNotNull)
        .select(col("__id"), col("__pos"), col("__cls"), col("__cls2"))
        .persist()
      val nKeys = keys.count()
      prev.unpersist()
      lap("final-key: keys", s"rows=$nKeys")
      val hot = keys.groupBy("__cls", "__cls2")
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c") > 1)
        .select("__cls", "__cls2")
      val out = keys.join(hot.hint("shuffle_hash"), Seq("__cls", "__cls2"))
        .select(col("__id").as("doc_id"), col("__pos").as("start"))
      val nOut = out.count()
      lap("final-key: out", s"rows=$nOut")
      // mergeIslands is private[llm]; replay its two-window shape
      val wI = Window.partitionBy("doc_id").orderBy("start")
      val spans = out
        .withColumn("__brk",
          when(coalesce(col("start") - lag("start", 1).over(wI),
            lit(0L)) > k, 1L).otherwise(0L))
        .withColumn("__span", sum("__brk").over(
          wI.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("__span"))
        .agg(min("start").as("span_start"),
          (max("start") + k).as("span_end"), count(lit(1)).as("n_grams"))
      val nSpans = spans.count()
      lap("merge-islands", s"rows=$nSpans")
      keys.unpersist()
      spark.catalog.clearCache()
      t0 = now()
      val (removed, release) = graft.llm.SuffixDedup
        .dedupExactSubstringsReleasable(df, "text", "doc_id", k)
      removed.select(col("doc_id"), md5(col("text")).as("h"),
        length(col("text")).cast("long").as("len"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
      release()
      lap("full-e2e (library)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
