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
  * Null semantics mirror the HOF chain: null arrays, length mismatch,
  * or a null element → null.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = graft.functions.CosineSim.compute($a, $b, $lf, $rf);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) r).doubleValue(); }
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

  /** Shared kernel; returns java.lang.Double or null. Accumulation
    * order matches the sequential HOF folds exactly. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean)
      : java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      na += x * x
      i += 1
    }
    i = 0
    while (i < n) {
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
