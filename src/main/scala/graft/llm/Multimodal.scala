package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode/feature-extract
  * plumbing.
  *
  * The decode step itself is STUBBED (this container ships no
  * image/audio codecs): [[FakeDecoder]] derives a deterministic
  * fixed-shape feature vector from the bytes so that the Spark-side
  * plumbing — schema, batching, partitioning, UDF signature — is real
  * and testable. Swap [[Decoder]] implementations to bind a real codec.
  */
object Multimodal {

  /** Typed media metadata carried next to the binary payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),          // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", DoubleType),
    StructField("n_frames", LongType)))

  /** Attach cheap byte-level metadata (no decode): size, content hash. */
  def withBinaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("content_hash", md5(col(binCol)))

  /** A batched decoder: bytes → fixed-dim feature vector. Implementations
    * MUST be deterministic per byte content. */
  trait Decoder extends Serializable {
    def dim: Int
    def decodeBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** Deterministic stand-in for a real image/audio decoder (===> the
    * `???` decode step): features are a byte-histogram projection.
    * Replace with a codec-backed Decoder in production. */
  final class FakeDecoder(val dim: Int = 16) extends Decoder {
    def decodeBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
      batch.map { bytes =>
        val f = Array.ofDim[Float](dim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) {
            f((bytes(i) & 0xFF) % dim) += 1.0f
            i += 1
          }
          val n = math.max(bytes.length, 1)
          var j = 0
          while (j < dim) { f(j) /= n; j += 1 }
        }
        f
      }
  }

  /** Batched feature extraction over partitions: groups rows into
    * `batchSize` chunks per partition (the vectorized-UDF batch shape),
    * calls the decoder once per chunk, and emits `(id, features)`.
    * No shuffle; preserves input partitioning. */
  def extractFeatures(
      df: DataFrame,
      binCol: String,
      idCol: String,
      decoder: Decoder,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pair: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
    pair.mapPartitions { it =>
      it.grouped(batchSize).flatMap { chunk =>
        val feats = decoder.decodeBatch(chunk.map(_._2))
        chunk.map(_._1).zip(feats)
      }
    }.toDF(idCol, "features")
  }

  /** Frame sampling plumbing for video-like payloads: split the payload
    * into `frameBytes`-sized frames and keep every `stride`-th — the
    * partition-local slice/sample pattern (no decode). */
  def sampleFrames(
      df: DataFrame,
      binCol: String,
      frameBytes: Int,
      stride: Int): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameBytes).cast("int")
    df.withColumn("frames",
      when(nFrames > 0,
        transform(
          filter(sequence(lit(0), nFrames - 1), i => i % stride === 0),
          i => substring(col(binCol), (i * frameBytes + 1).cast("int"),
            lit(frameBytes))))
        .otherwise(array()))
  }
}
