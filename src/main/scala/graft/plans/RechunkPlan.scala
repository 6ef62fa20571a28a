package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._

/** W4 trace re-chunking as a first-class operator (the full
  * LogicalPlan → Strategy → SparkPlan stack, SURVEY §2.12 preference
  * tier (c)).
  *
  * The declarative form ([[graft.traces.TraceStore.rechunk]]) is
  * order-correct but pays a per-SAMPLE explode and a shuffle keyed by
  * chunk id — the moved data is `samples × (channel, pos, value)`.
  * This operator instead DECLARES its needs to the planner:
  * clustered-by-channel distribution and (channel, event_index)
  * ordering. EnsureRequirements inserts exactly one hash exchange of
  * the un-exploded trace rows plus a partition-local sort, and the
  * physical node then chops each channel's ordered run in a single
  * linear pass with carry-over — the same remainder-discard semantics,
  * with the shuffle volume of the ROWS, not the samples.
  *
  * Reference semantics: `vibration_analyzer.py:406-437` (sequential
  * concat-and-chop with remainder discard).
  */
final case class RechunkPlan(
    child: LogicalPlan,
    chunkLen: Int,
    channelAttr: Attribute,
    indexAttr: Attribute,
    traceAttr: Attribute,
    outAttrs: Seq[Attribute])
    extends UnaryNode {
  override def output: Seq[Attribute] = outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : RechunkPlan = copy(child = newChild)
}

object RechunkPlan {

  /** Column API: re-chunk `traces` into fixed `chunkLen` windows with
    * carry-over, via the custom physical operator. Output columns:
    * (channel, chunk_id, trace) — same schema and semantics as
    * `TraceStore.rechunk`. Registers the planner strategy on the
    * session on first use. */
  def rechunkExec(
      traces: DataFrame,
      chunkLen: Int,
      indexCol: String = "event_index",
      traceCol: String = "trace",
      channelCol: String = "channel"): DataFrame = {
    require(chunkLen > 0, "chunkLen must be positive")
    val spark = traces.sparkSession
    if (!spark.experimental.extraStrategies.contains(RechunkStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RechunkStrategy
    val lp = traces.queryExecution.analyzed
    def attr(name: String): Attribute = lp.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column '$name' not found in ${lp.output.map(_.name)}"))
    val ch = attr(channelCol)
    val tr = attr(traceCol)
    // Fail at plan-build, not at runtime: the physical operator's row
    // accessors are monomorphic (getUTF8String / toDoubleArray). A
    // non-string channel would silently misread the UnsafeRow word as
    // offset/length; a non-double element type would corrupt or throw
    // mid-job (ADVICE r03).
    require(ch.dataType == StringType,
      s"rechunkExec requires a string '$channelCol' column, got " +
        s"${ch.dataType.catalogString}")
    val elemType = tr.dataType match {
      case ArrayType(DoubleType, _) => DoubleType
      case ArrayType(et, _) => throw new IllegalArgumentException(
        s"rechunkExec requires '$traceCol' to be array<double>, got " +
          s"array<${et.catalogString}> — cast the elements first")
      case other => throw new IllegalArgumentException(
        s"'$traceCol' must be an array column, got ${other.catalogString}")
    }
    val out = Seq(
      AttributeReference(channelCol, ch.dataType, nullable = false)(),
      AttributeReference("chunk_id", LongType, nullable = false)(),
      AttributeReference(traceCol, ArrayType(elemType, containsNull = false),
        nullable = false)())
    GraftSqlBridge.ofRows(spark,
      RechunkPlan(lp, chunkLen, ch, attr(indexCol), tr, out))
  }
}

/** Planner strategy: lowers [[RechunkPlan]] to [[RechunkExec]]. */
object RechunkStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RechunkPlan(child, len, ch, idx, tr, out) =>
      RechunkExec(planLater(child), len, ch, idx, tr, out) :: Nil
    case _ => Nil
  }
}

/** Physical re-chunk: requires channel-clustered, (channel, index)-sorted
  * input; single linear pass per partition with per-channel carry-over. */
final case class RechunkExec(
    child: SparkPlan,
    chunkLen: Int,
    channelAttr: Attribute,
    indexAttr: Attribute,
    traceAttr: Attribute,
    outAttrs: Seq[Attribute])
    extends UnaryExecNode {

  override def output: Seq[Attribute] = outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(channelAttr)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(channelAttr, Ascending),
      SortOrder(indexAttr, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val chOrd = child.output.indexWhere(_.exprId == channelAttr.exprId)
    val trOrd = child.output.indexWhere(_.exprId == traceAttr.exprId)
    require(chOrd >= 0 && trOrd >= 0,
      "rechunk attributes not found in child output")
    val len = chunkLen
    val schema = outAttrs
    child.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(schema.map(_.dataType).toArray)
      var curChannel: AnyRef = null
      var buf = new scala.collection.mutable.ArrayBuffer[Double]()
      var nextChunk = 0L
      iter.flatMap { row =>
        val ch = row.getUTF8String(chOrd)
        if (curChannel == null || ch.compareTo(
            curChannel.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
            != 0) {
          // new channel: previous channel's tail (< chunkLen samples) is
          // the discarded remainder
          curChannel = ch.clone()
          buf = new scala.collection.mutable.ArrayBuffer[Double]()
          nextChunk = 0L
        }
        buf ++= row.getArray(trOrd).toDoubleArray()
        val outRows = Seq.newBuilder[InternalRow]
        while (buf.length >= len) {
          val chunk = buf.take(len).toArray
          buf = buf.drop(len)
          val r = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(3)
          r.update(0, curChannel)
          r.setLong(1, nextChunk)
          r.update(2, new GenericArrayData(chunk))
          nextChunk += 1
          outRows += proj.apply(r).copy()
        }
        outRows.result()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : RechunkExec = copy(child = newChild)
}
