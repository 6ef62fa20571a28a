package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass fixed-memory 2-D histogram aggregate (SURVEY §2.12's
  * optional perf variant of A8).
  *
  * The `groupBy(xbin, ybin).count()` formulation shuffles up to
  * xbins·ybins rows per partition; this `TypedImperativeAggregate` keeps
  * ONE dense Long array per partition and shuffles exactly one buffer —
  * preferable when the grid is dense (256² cells × many partitions) or
  * when the histogram feeds further per-group processing.
  *
  * Bucket semantics match [[graft.stats.Hist.bucket]]: equal-width,
  * values at the top edge land in the last bin, out-of-range rows are
  * dropped (numpy `range=` convention). Output: flattened row-major
  * counts `[x*ybins + y]`.
  */
case class Histogram2D(
    x: Expression,
    y: Expression,
    xlo: Double, xhi: Double, xbins: Int,
    ylo: Double, yhi: Double, ybins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(xbins > 0 && ybins > 0)
  private val xw = (xhi - xlo) / xbins
  private val yw = (yhi - ylo) / ybins

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.ofDim[Long](xbins * ybins)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val xv = x.eval(row)
    val yv = y.eval(row)
    if (xv != null && yv != null) {
      val xd = xv.asInstanceOf[Double]
      val yd = yv.asInstanceOf[Double]
      if (xd >= xlo && xd <= xhi && yd >= ylo && yd <= yhi) {
        val i = math.min(math.floor((xd - xlo) / xw).toInt, xbins - 1)
        val j = math.min(math.floor((yd - ylo) / yw).toInt, ybins - 1)
        buf(i * ybins + j) += 1L
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = Array.ofDim[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): Histogram2D =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Histogram2D =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Histogram2D =
    copy(x = newChildren(0), y = newChildren(1))

  override def prettyName: String = "histogram2d"
}

object Histogram2D {
  /** Column API: dense flattened counts as one array row. Children are
    * cast to double so any numeric input works. */
  def apply(
      x: Column, y: Column,
      xlim: (Double, Double), xbins: Int,
      ylim: (Double, Double), ybins: Int): Column = {
    import org.apache.spark.sql.functions.col
    val xe = GraftSqlBridge.expression(x.cast("double"))
    val ye = GraftSqlBridge.expression(y.cast("double"))
    GraftSqlBridge.column(
      Histogram2D(xe, ye, xlim._1, xlim._2, xbins, ylim._1, ylim._2, ybins)
        .toAggregateExpression())
  }
}
