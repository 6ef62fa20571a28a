package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the memory lever for
  * corpus-scale ANN: a float32 embedding column is 4× the bytes of its
  * int8 form, and at 100 TB the quantized index is the difference
  * between fitting executor memory and spilling. Symmetric per-vector
  * max-abs scaling (the faiss/SQ8 baseline): `q_i = round(x_i/scale·127)`
  * with `scale = max|x|`, dequant `q_i·scale/127`.
  *
  * Everything is declarative column arithmetic in DOUBLE (casts fixed
  * on both engines), map-only — no shuffle, no UDF — and the DuckDB
  * oracle mirrors the identical expression tree, so quantized codes
  * and reconstruction errors are bit-exact across engines.
  */
object Quantize {

  private def xd(e: Column): Column = e.cast("double")

  /** Per-vector max-abs scale. */
  def maxAbsScale(emb: Column): Column =
    array_max(transform(emb, x => abs(xd(x))))

  private def quantizeWith(emb: Column, s: Column): Column =
    transform(emb, x =>
      when(s === 0d, lit(0))
        .otherwise(round(xd(x) / s * 127d).cast("int")))

  /** Quantized codes (array<int> in [-127, 127]; an all-zero vector
    * quantizes to zeros). Declared int rather than tinyint so the
    * oracle comparison is dialect-neutral; a writer would cast to
    * byte at the sink. */
  def quantizeInt8(emb: Column): Column =
    quantizeWith(emb, maxAbsScale(emb))

  /** Dequantized vector for given codes + scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => xd(v) * scale / 127d)

  /** Quantization QA table: per vector the scale, the code checksum
    * (sum of codes — cheap drift detector), and the L2 reconstruction
    * error, fold-ordered so the oracle's sequential sum matches. */
  def quantizationReport(df: DataFrame, embCol: String, idCol: String)
      : DataFrame = {
    // scale materialized once per row, then codes/recon read the column
    // (inlining it would re-derive array_max per ELEMENT in the lambda)
    val staged = df.select(col(idCol), col(embCol).as("__e"),
      maxAbsScale(col(embCol)).as("scale"))
    val q = quantizeWith(col("__e"), col("scale"))
    val withQ = staged.select(col(idCol), col("__e"), col("scale"),
      q.as("__q"))
    val recon = dequantize(col("__q"), col("scale"))
    val err = sqrt(aggregate(
      zip_with(col("__e"), recon, (x, r) => (xd(x) - r) * (xd(x) - r)),
      lit(0.0d), (acc, v) => acc + v))
    // round in a SEPARATE projection: aliasing the rounded value as
    // "scale" next to expressions that reference col("scale") makes
    // Spark's implicit lateral-column-alias resolution feed the
    // ROUNDED scale into the reconstruction (observed: l2_err off in
    // the 6th decimal on ~9% of rows)
    withQ.select(col(idCol), col("scale"),
        aggregate(col("__q"), lit(0L), (acc, v) => acc + v).as("q_sum"),
        err.as("__l2"))
      .select(col(idCol),
        round(col("scale"), 6).as("scale"),
        col("q_sum"),
        round(col("__l2"), 6).as("l2_err"))
  }
}
