package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a long key against a
  * pre-built [[org.apache.spark.util.sketch.BloomFilter]].
  *
  * `bloom_might_contain(key)` → boolean. False ⇒ definitely absent;
  * true ⇒ present with probability 1−fpp. The sketch rides along as a
  * plan reference object (`ctx.addReferenceObj`), NOT a literal — a
  * 100 MB bit array never gets embedded/pretty-printed in the plan, and
  * the probe stays inside whole-stage codegen.
  *
  * This is the scale path for mask filters (F2/J1,
  * `analyzer.py:218-223`) when the mask uid set is too large to
  * broadcast exactly: prefilter the big side with the sketch (shrinking
  * its shuffle input by ~(1−fpp) of the non-members), then confirm with
  * the exact semi-join. See [[graft.core.Masks.bloomSemiJoin]].
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects an integral key, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Number].longValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bloomRef.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"

  // the sketch has no usable toString; keep plan output readable
  override def toString: String = s"bloom_might_contain($child)"
}

object BloomMightContain {
  /** Column API: `BloomMightContain(keyCol, bloom)`. */
  def apply(c: Column, bloom: BloomFilter): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(c), bloom))
}
