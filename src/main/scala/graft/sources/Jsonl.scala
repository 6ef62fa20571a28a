package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Newline-delimited JSON egest/ingest — the interchange format LLM
  * training stacks actually exchange (jsonl / jsonl.gz per shard).
  * Spark's json source does the parsing/formatting; what this wrapper
  * pins down is the OPERATIONAL contract a pipeline needs and the raw
  * sink leaves open:
  *
  *  - REPRODUCIBLE egest: rows are hash-routed to a fixed shard count
  *    by a caller-named key and sorted by that key inside each shard,
  *    so the same input produces byte-identical shard files on every
  *    run (the [[graft.llm.Mixing.writeShards]] discipline — diffable
  *    artifacts, stable checksums for provenance manifests);
  *  - SCHEMA-PINNED ingest: the reader takes an explicit schema and
  *    runs FAILFAST — no inference scan over 100 TB, no silent
  *    null-out of corrupt lines (the default PERMISSIVE mode turns a
  *    torn shard into quiet data loss; here it fails loudly);
  *  - non-empty targets are refused (the WET/tar/index commit
  *    discipline: never silently merge into an existing egest).
  *
  * Scale shape: write is one hash exchange + in-partition sort (the
  * shard layout IS the training-loader layout); read is one gzip
  * stream per shard file per task (gzip is unsplittable — shard count
  * chosen at write time is the read parallelism, exactly like the
  * WebDataset tar shards). */
object Jsonl {

  /** Write `df` as `shards` gzip JSONL files, hash-routed by `keyCol`
    * and sorted inside each shard by `keyCol` then every other
    * ORDERABLE column — byte-reproducible for identical input even
    * when the key is not unique (ADVICE r13: sorting by the key alone
    * leaves tied rows in nondeterministic relative order, silently
    * breaking the checksum contract).
    *
    * Frames carrying UNORDERABLE (map-typed) columns get one extra
    * synthetic tie-break: the `to_json` render of the whole row (r15,
    * VERDICT r14 §7 — previously a documented residual tie). The
    * render is exactly what the sink writes, so ordering by it makes
    * the contract TOTAL: rows that still tie render identical bytes,
    * and rows whose maps differ only in entry order — which WOULD
    * produce different output lines — sort deterministically. The
    * column is dropped before the write; orderable-only frames skip
    * the render entirely. */
  def write(df: DataFrame, keyCol: String, shards: Int, path: String)
      : Unit = {
    require(shards >= 1, "shards must be at least 1")
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(p) || fs.listStatus(p).isEmpty,
      s"jsonl target $path exists and is not empty")
    val tiebreak = df.schema.fields
      .filter(f => f.name != keyCol && isOrderable(f.dataType))
      .map(f => col(f.name))
    val hasUnorderable = df.schema.fields.exists(f => !isOrderable(f.dataType))
    val renderCol = "__graft_jsonl_render"
    require(!df.columns.contains(renderCol),
      s"column name $renderCol is reserved by Jsonl.write")
    val routed = df.repartition(shards, col(keyCol))
    val sorted =
      if (hasUnorderable)
        routed
          .withColumn(renderCol, to_json(struct(df.columns.map(col)
            .toIndexedSeq: _*)))
          .sortWithinPartitions(
            (col(keyCol) +: tiebreak.toIndexedSeq) :+ col(renderCol): _*)
          .drop(renderCol)
      else
        routed.sortWithinPartitions(col(keyCol) +: tiebreak.toIndexedSeq: _*)
    sorted.write.option("compression", "gzip").json(path)
  }

  private def isOrderable(dt: org.apache.spark.sql.types.DataType)
      : Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case s: StructType => s.fields.forall(f => isOrderable(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => isOrderable(a.elementType)
    case _ => true
  }

  /** Read a JSONL directory under an EXPLICIT schema, FAILFAST on any
    * malformed line (a torn gzip member or truncated line is corpus
    * loss — it must stop the job, not null out). */
  def read(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
