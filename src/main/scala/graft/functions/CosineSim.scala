package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two numeric arrays
  * in double precision.
  *
  * `cosine_sim(a, b)` → double. Bit-identical to the HOF formulation
  * `aggregate(zip_with(a,b,*))/(sqrt(aggregate(..))·sqrt(aggregate(..)))`
  * — same sequential accumulation order — but one codegen'd loop over
  * the raw `ArrayData` instead of three lambda-driven folds with per-
  * element closure dispatch. This is the hot kernel of every exact
  * rerank (brute-force top-k, LSH/IVF ANN verify, embedding near-dup).
  *
  * Accepts any integral/floating element type, widening to double like
  * the HOF chain's `cast("double")` did (ADVICE r03: rejecting
  * array<int> embeddings broke callers the HOF form accepted).
  * Null semantics mirror the HOF chain: null arrays, length mismatch,
  * or a null element → null.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _) => 4
    case ArrayType(ByteType, _) => 5
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(left.dataType) >= 0 && elemCode(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects arrays of integral or floating elements, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemCode(left.dataType), elemCode(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val lc = elemCode(left.dataType)
    val rc = elemCode(right.dataType)
    // fresh name: a fixed identifier collides when two cosine_sim calls
    // over non-nullable inputs land in one codegen scope (ADVICE r03)
    val r = ctx.freshName("cosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = graft.functions.CosineSim.compute($a, $b, $lc, $rc);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {

  /** Column API: `CosineSim(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  private def get(a: ArrayData, i: Int, code: Int): Double = (code: @annotation.switch) match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case 4 => a.getShort(i).toDouble
    case 5 => a.getByte(i).toDouble
  }

  /** Shared kernel; returns java.lang.Double or null. Accumulation
    * order matches the sequential HOF folds exactly. */
  def compute(a: ArrayData, b: ArrayData, aCode: Int, bCode: Int)
      : java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += get(a, i, aCode) * get(b, i, bCode)
      i += 1
    }
    i = 0
    while (i < n) {
      val x = get(a, i, aCode)
      na += x * x
      i += 1
    }
    i = 0
    while (i < n) {
      val y = get(b, i, bCode)
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
