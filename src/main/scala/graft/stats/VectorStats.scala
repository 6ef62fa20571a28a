package graft.stats

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise ensemble statistics over array columns (SURVEY A13-A15).
  *
  * Reference: mean pulse `np.mean(traces, axis=0)`
  * (`photon_calibration.py:959-1017`), complex per-bin mean/std of FFT
  * ensembles (`:1330-1410`), PSD as mean power (`:1392`).
  *
  * Buffers are flat Array[Double] (mergeable by element-wise add), so
  * partial aggregation is exact up to float-sum reordering.
  */
object VectorStats {

  /** A13: element-wise mean of equal-length Array[Double] rows.
    * Buffer = [count, sum_0 … sum_{n-1}]. */
  final class VectorMean(dim: Int)
      extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    def zero: Array[Double] = Array.ofDim[Double](dim + 1)
    def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
      require(x.length == dim, s"expected $dim, got ${x.length}")
      b(0) += 1
      var i = 0
      while (i < dim) { b(i + 1) += x(i); i += 1 }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): Array[Double] = {
      val n = if (b(0) > 0) b(0) else 1.0
      Array.tabulate(dim)(i => b(i + 1) / n)
    }
    def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** A14 result: per-bin complex mean and `stdcomplex` (K10):
    * std = sqrt(⟨|z|²⟩ − |⟨z⟩|²), err-of-mean = std/√N
    * (`photon_calibration.py:1330-1410`, qetpy `stdcomplex`). */
  final case class ComplexEnsemble(
      n: Long,
      meanRe: Array[Double],
      meanIm: Array[Double],
      stdComplex: Array[Double])

  /** A14/A15: complex ensemble stats over interleaved [re,im,…] rows of
    * length 2·dim. Buffer = [count, sumRe…, sumIm…, sumAbs2…]. */
  final class ComplexMeanStd(dim: Int)
      extends Aggregator[Seq[Double], Array[Double], ComplexEnsemble] {
    def zero: Array[Double] = Array.ofDim[Double](3 * dim + 1)
    def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
      require(x.length == 2 * dim, s"expected ${2 * dim}, got ${x.length}")
      b(0) += 1
      var k = 0
      while (k < dim) {
        val re = x(2 * k); val im = x(2 * k + 1)
        b(1 + k) += re
        b(1 + dim + k) += im
        b(1 + 2 * dim + k) += re * re + im * im
        k += 1
      }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): ComplexEnsemble = {
      val n = if (b(0) > 0) b(0) else 1.0
      val mre = Array.tabulate(dim)(k => b(1 + k) / n)
      val mim = Array.tabulate(dim)(k => b(1 + dim + k) / n)
      val std = Array.tabulate(dim) { k =>
        val meanAbs2 = b(1 + 2 * dim + k) / n
        val d = meanAbs2 - (mre(k) * mre(k) + mim(k) * mim(k))
        math.sqrt(math.max(d, 0.0))
      }
      ComplexEnsemble(b(0).toLong, mre, mim, std)
    }
    def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[ComplexEnsemble] =
      Encoders.product[ComplexEnsemble]
  }
}
