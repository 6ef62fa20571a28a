package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `misra_gries_terms(text, capacity)` → the mergeable Misra–Gries
  * heavy-hitter summary of the corpus token stream, as
  * `array<struct<term:string, count:bigint>>` ordered by
  * (count DESC, term ASC).
  *
  * Tokenization is the engine's exact whitespace walker
  * ([[TextTokenize.tokenize]] — `split(trim(text), "\\s+", -1)`
  * semantics), applied inside the aggregate so the token stream is
  * never exploded: the shuffle carries one ≤`capacity`-entry summary
  * per (partition × group) instead of one row per token. That is THE
  * heavy-hitter shape at 100 TB — the exact alternative
  * (explode + groupBy(term)) shuffles the entire token stream.
  *
  * Guarantee (Misra–Gries, preserved under the Agarwal et al. 2012
  * merge used here): every summary count is an UNDERestimate by at
  * most N/(capacity+1), where N is the total token count; therefore
  * every term with true frequency > N/(capacity+1) is guaranteed
  * present in the final summary. Counts are approximate — callers that
  * need exact figures recount the (bounded) candidate set with
  * [[TermCounts]]; [[graft.llm.TextAnalysis.heavyHitterTerms]] wires
  * the two passes together and yields the provably-exact top-k
  * whenever the k-th true count clears the N/(capacity+1) bound.
  *
  * Null text contributes nothing (like the tokenize-then-count form
  * after a null filter). The reference has no corpus-vocabulary
  * operator; this is engine surface for the training-data pipeline.
  */
case class MisraGriesTerms(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries_terms expects string, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, row: InternalRow): MgSummary = {
    val v = child.eval(row)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val (starts, ends, n) = TextTokenize.tokenize(bytes)
      var i = 0
      while (i < n) {
        buf.offer(new String(bytes, starts(i), ends(i) - starts(i), "UTF-8"))
        i += 1
      }
    }
    buf
  }

  override def merge(a: MgSummary, b: MgSummary): MgSummary = { a.absorb(b); a }

  override def eval(buf: MgSummary): Any = {
    val entries = buf.sortedEntries
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes("UTF-8")
      out.writeInt(tb.length); out.write(tb); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MgSummary(capacity)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len); in.readFully(tb)
      buf.counts.put(new String(tb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTerms =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTerms =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTerms =
    copy(child = newChildren(0))

  override def prettyName: String = "misra_gries_terms"
}

object MisraGriesTerms {
  def apply(text: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      MisraGriesTerms(GraftSqlBridge.expression(text), capacity)
        .toAggregateExpression())
}

/** Mutable Misra–Gries summary: at most `capacity` (term → count)
  * entries. `offer` is the classic stream update (decrement-all when
  * full — amortized O(1): each decrement cancels a prior increment);
  * `absorb` is the mergeable-summaries combine (sum counts, then
  * subtract the (capacity+1)-th largest and drop non-positives), which
  * preserves the N/(capacity+1) undercount bound. */
final class MgSummary(val capacity: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)

  def size: Int = counts.size

  def offer(term: String): Unit = {
    val cur = counts.get(term)
    if (cur != null) counts.put(term, cur + 1L)
    else if (counts.size < capacity) counts.put(term, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove()
        else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Add a pre-counted (term, count) entry, then re-bound if needed —
    * the absorb path for both whole summaries and persisted rows. */
  def addEntry(term: String, count: Long): Unit = {
    val cur = counts.get(term)
    counts.put(term, if (cur == null) count else cur + count)
  }

  /** Re-impose the capacity bound after [[addEntry]] calls: subtract
    * the (capacity+1)-th largest count from all entries and drop the
    * non-positive ones (Agarwal et al. 2012 — keeps the undercount
    * bound additive across merges). */
  def truncate(): Unit = if (counts.size > capacity) {
    val all = new Array[Long](counts.size)
    var i = 0
    val vit = counts.values().iterator()
    while (vit.hasNext) { all(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(all)
    val threshold = all(all.length - capacity - 1)
    val eit = counts.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      if (e.getValue <= threshold) eit.remove()
      else e.setValue(e.getValue - threshold)
    }
  }

  def absorb(other: MgSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      addEntry(e.getKey, e.getValue)
    }
    truncate()
  }

  /** Entries ordered (count DESC, term ASC). */
  def sortedEntries: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); arr(i) = (e.getKey, e.getValue.longValue); i += 1
    }
    scala.util.Sorting.stableSort(arr,
      (x: (String, Long), y: (String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    arr
  }
}

/** `merge_term_summaries(summary, capacity)` → re-aggregate PERSISTED
  * Misra–Gries summaries (rows of `array<struct<term:string,
  * count:bigint>>`, the [[MisraGriesTerms]] output shape) into one
  * bounded summary. This is the incremental-corpus path at 100 TB:
  * sketch each day's partition once, persist the KB-scale summary rows,
  * and answer "top terms over any window of days" by merging stored
  * sketches — no rescan of the text. The Agarwal et al. merge keeps the
  * total undercount ≤ N/(capacity+1) across any merge tree, and when
  * capacity exceeds the true vocabulary every summary is exact, so
  * incremental == direct == true counts (the oracle-gated case). Null
  * summary rows contribute nothing. */
case class MergeTermSummaries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == StringType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "merge_term_summaries expects array<struct<term:string," +
        s"count:bigint>>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, row: InternalRow): MgSummary = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val e = arr.getStruct(i, 2)
        buf.addEntry(e.getUTF8String(0).toString, e.getLong(1))
        i += 1
      }
      buf.truncate()
    }
    buf
  }

  override def merge(a: MgSummary, b: MgSummary): MgSummary = { a.absorb(b); a }

  override def eval(buf: MgSummary): Any = {
    val entries = buf.sortedEntries
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buf: MgSummary): Array[Byte] =
    MisraGriesTerms(child, capacity).serialize(buf)
  override def deserialize(bytes: Array[Byte]): MgSummary =
    MisraGriesTerms(child, capacity).deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MergeTermSummaries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MergeTermSummaries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MergeTermSummaries =
    copy(child = newChildren(0))

  override def prettyName: String = "merge_term_summaries"
}

object MergeTermSummaries {
  def apply(summary: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      MergeTermSummaries(GraftSqlBridge.expression(summary), capacity)
        .toAggregateExpression())
}

/** `long_vector_sum(arr, dim)` → element-wise sum of fixed-length
  * `array<long>` rows (null rows skipped). Map-side combining keeps the
  * exchange at one `dim`-length vector per (partition × group) — the
  * bounded-recount reducer for [[TermCounts]] candidate counting (the
  * posexplode + groupBy(pos) mirror shuffles rows × dim). */
case class LongVectorSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "dim must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"long_vector_sum: expected length $dim, got ${arr.numElements()}")
      var i = 0
      while (i < dim) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * dim)
    var i = 0
    while (i < dim) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): LongVectorSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LongVectorSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVectorSum =
    copy(child = newChildren(0))

  override def prettyName: String = "long_vector_sum"
}

object LongVectorSum {
  def apply(arr: Column, dim: Int): Column =
    GraftSqlBridge.column(
      LongVectorSum(GraftSqlBridge.expression(arr), dim)
        .toAggregateExpression())
}
