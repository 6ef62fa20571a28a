package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped list collection for LSH-style bucketing: like
  * `collect_list` but the aggregation buffer NEVER holds more than
  * `cap + 1` elements — once a bucket is known to be oversized (the
  * +1 makes `size > cap` detectable downstream) further inserts are
  * dropped on the floor, in update AND in merge.
  *
  * Why not `collect_list` + `filter(size <= cap)`: the filter runs
  * AFTER the aggregation materializes the full list, so a pathological
  * mega-bucket (the exact input `maxBucket` caps exist for — boilerplate
  * shared by millions of docs) is an executor-memory blow-up risk before
  * the filter ever sees it (ADVICE r05). Here the buffer is bounded by
  * construction: memory per group is O(cap), map-side combine included.
  *
  * Contract: buckets at or under the cap are collected EXACTLY (every
  * element, unordered — callers sort with `sort_array`); oversized
  * buckets keep an arbitrary cap+1-subset whose only downstream use is
  * `size(...) > cap` → dropped whole. Null child values are skipped
  * (they cannot participate in candidate pairs).
  */
final class CappedLongBuffer(val cap: Int) {
  // growable, doubling; hard ceiling cap+1 — small buckets stay small
  var xs: Array[Long] = new Array[Long](8)
  var ys: Array[Long] = null // lazily allocated by the pair variant
  var size: Int = 0

  def insert(x: Long): Unit = {
    if (size > cap) return
    if (size == xs.length) grow()
    xs(size) = x
    size += 1
  }

  def insertPair(x: Long, y: Long): Unit = {
    if (size > cap) return
    if (ys == null) ys = new Array[Long](xs.length)
    if (size == xs.length) grow()
    xs(size) = x
    ys(size) = y
    size += 1
  }

  private def grow(): Unit = {
    val n = math.min(xs.length * 2, cap + 1)
    xs = java.util.Arrays.copyOf(xs, n)
    if (ys != null) ys = java.util.Arrays.copyOf(ys, n)
  }
}

/** `capped_collect_long(id, cap)` → `array<bigint>` (unordered; at most
  * cap+1 elements retained — see [[CappedLongBuffer]] contract). */
case class CappedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongBuffer] {

  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CappedLongBuffer =
    new CappedLongBuffer(cap)

  override def update(buf: CappedLongBuffer, row: InternalRow): CappedLongBuffer = {
    val v = child.eval(row)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: CappedLongBuffer, b: CappedLongBuffer): CappedLongBuffer = {
    var i = 0
    while (i < b.size && a.size <= a.cap) { a.insert(b.xs(i)); i += 1 }
    a
  }

  override def eval(buf: CappedLongBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.xs, buf.size))

  override def serialize(buf: CappedLongBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.xs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new CappedLongBuffer(cap)
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollectLong =
    copy(child = newChildren(0))

  override def prettyName: String = "capped_collect_long"
}

/** `capped_collect_long_pairs(id, payload, cap)` →
  * `array<struct<id:bigint, v:bigint>>` — the two-column variant for
  * buckets that must carry a per-member payload (e.g. SimHash banding,
  * where the pair expansion needs each member's full 64-bit signature
  * to compute hamming distance without a re-join). Rows where either
  * side is null are skipped. Same cap semantics as
  * [[CappedCollectLong]]. */
case class CappedCollectLongPairs(
    id: Expression,
    payload: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongBuffer] {

  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = Seq(id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): CappedLongBuffer =
    new CappedLongBuffer(cap)

  override def update(buf: CappedLongBuffer, row: InternalRow): CappedLongBuffer = {
    val x = id.eval(row)
    val y = payload.eval(row)
    if (x != null && y != null)
      buf.insertPair(x.asInstanceOf[Long], y.asInstanceOf[Long])
    buf
  }

  override def merge(a: CappedLongBuffer, b: CappedLongBuffer): CappedLongBuffer = {
    var i = 0
    while (i < b.size && a.size <= a.cap) {
      a.insertPair(b.xs(i), b.ys(i)); i += 1
    }
    a
  }

  override def eval(buf: CappedLongBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](buf.size) { i =>
      new GenericInternalRow(Array[Any](buf.xs(i), buf.ys(i)))
    })

  override def serialize(buf: CappedLongBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.xs(i)); bb.putLong(buf.ys(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new CappedLongBuffer(cap)
    var i = 0
    while (i < n) { buf.insertPair(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectLongPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectLongPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollectLongPairs =
    copy(id = newChildren(0), payload = newChildren(1))

  override def prettyName: String = "capped_collect_long_pairs"
}

object CappedCollectLong {
  def apply(child: Column, cap: Int): Column =
    GraftSqlBridge.column(
      CappedCollectLong(
        GraftSqlBridge.expression(child.cast("bigint")), cap)
        .toAggregateExpression())
}

object CappedCollectLongPairs {
  def apply(id: Column, payload: Column, cap: Int): Column =
    GraftSqlBridge.column(
      CappedCollectLongPairs(
        GraftSqlBridge.expression(id.cast("bigint")),
        GraftSqlBridge.expression(payload.cast("bigint")), cap)
        .toAggregateExpression())
}
