package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate: `topk_by(score, id, k)` →
  * `array<struct<score:double, id:bigint>>`, the k largest rows of the
  * group under (score DESC, id ASC), already sorted.
  *
  * The declarative form — `Window.partitionBy(g).orderBy(...)` +
  * `row_number ≤ k` — SORTS every group in full to keep k rows: the
  * shuffle carries the whole table and the sort is O(n log n) per
  * group. This aggregate keeps a k-bounded buffer per partition
  * (map-side combine!), so the exchange moves at most k rows per
  * (partition × group) and nothing is ever globally sorted. The
  * standard "top documents per source / largest events per channel"
  * shape at 100 TB.
  *
  * Determinism: (score DESC, id ASC) is a total order whenever ids are
  * unique, so results are exactly mirrorable by a `row_number` window
  * in ANSI SQL.
  *
  * Null/NaN contract (ADVICE r05): rows with a NULL score or NULL id
  * are DROPPED — they never enter the buffer and never count toward k.
  * A `row_number` window mirror must therefore filter
  * `score IS NOT NULL AND id IS NOT NULL` first (Spark's default
  * `desc` ordering would otherwise rank null-score rows last but still
  * count them toward k when a group has fewer than k non-null rows).
  * NaN scores follow Spark's sort order — NaN is GREATER than any
  * double, so NaN rows rank FIRST under `desc` (the buffer compares
  * with `java.lang.Double.compare`, which implements exactly that
  * total order), matching the window mirror on NaN inputs.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, row: InternalRow): TopKBuffer = {
    val s = score.eval(row)
    val i = id.eval(row)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](buf.size) { i =>
      new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_by"
}

/** Sorted bounded buffer ordered by (score DESC, id ASC); insertion is
  * a binary search + arraycopy — O(log k) compare, O(k) move, O(1)
  * rejection for rows below the current floor. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // java.lang.Double.compare implements Spark's sort total order for
  // doubles (NaN greater than everything, so NaN first under desc) —
  // primitive > / == would sink NaN last instead (ADVICE r05)
  @inline private def before(s: Double, i: Long, pos: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(pos))
    c > 0 || (c == 0 && i < ids(pos))
  }

  def insert(s: Double, i: Long): Unit = {
    if (size == k && !before(s, i, size - 1)) return
    // binary search for the insertion point in the (desc, asc) order
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(s, i, mid)) hi = mid else lo = mid + 1
    }
    if (lo >= k) return
    val last = math.min(size, k - 1)
    System.arraycopy(scores, lo, scores, lo + 1, last - lo)
    System.arraycopy(ids, lo, ids, lo + 1, last - lo)
    scores(lo) = s
    ids(lo) = i
    if (size < k) size += 1
  }
}

object TopKByScore {

  /** Column API: `topK(score, id, k)` as an aggregate column. */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByScore(
        GraftSqlBridge.expression(score.cast("double")),
        GraftSqlBridge.expression(id.cast("bigint")),
        k).toAggregateExpression())
}
